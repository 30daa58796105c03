"""Minimal Bayesian optimization (GP + UCB), self-contained.

The reference depends on the `bayes_opt` package for threshold search
(tasks/anomaly_detection.py:246-260, tasks/segmentation.py:294-323); this
is an in-repo equivalent with the same interface and the same defaults
(Matern-2.5 GP, UCB kappa=2.576, seeded random init + acquisition search).
"""

from __future__ import annotations

import numpy as np
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import Matern


class BayesianOptimization:
    def __init__(self, f, pbounds: dict, random_state: int = 0, verbose: int = 0,
                 allow_duplicate_points: bool = True):
        self.f = f
        self.keys = sorted(pbounds.keys())
        self.bounds = np.array([pbounds[k] for k in self.keys], dtype=float)
        self.rng = np.random.RandomState(random_state)
        self.verbose = verbose
        self.X: list[np.ndarray] = []
        self.y: list[float] = []
        self._gp = GaussianProcessRegressor(
            kernel=Matern(nu=2.5),
            alpha=1e-6,
            normalize_y=True,
            n_restarts_optimizer=2,
            random_state=random_state,
        )

    def _sample(self, n: int) -> np.ndarray:
        lo, hi = self.bounds[:, 0], self.bounds[:, 1]
        return lo + (hi - lo) * self.rng.uniform(size=(n, len(self.keys)))

    def _evaluate(self, x: np.ndarray) -> float:
        val = float(self.f(**dict(zip(self.keys, x))))
        self.X.append(np.asarray(x, dtype=float))
        self.y.append(val)
        return val

    def _suggest(self, kappa: float = 2.576, n_candidates: int = 512) -> np.ndarray:
        X = np.stack(self.X)
        y = np.asarray(self.y)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            self._gp.fit(X, y)
        cand = self._sample(n_candidates)
        mu, sigma = self._gp.predict(cand, return_std=True)
        ucb = mu + kappa * sigma
        return cand[int(np.argmax(ucb))]

    def maximize(self, init_points: int = 5, n_iter: int = 25):
        for x in self._sample(init_points):
            self._evaluate(x)
        for _ in range(n_iter):
            self._evaluate(self._suggest())

    @property
    def max(self) -> dict:
        i = int(np.argmax(self.y))
        return {"target": self.y[i],
                "params": dict(zip(self.keys, self.X[i]))}
