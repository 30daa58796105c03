"""Per-window classification task.

The reference has no classification trainer — its models only expose
classification heads (e.g. dlinear.py:86-91, gpt4ts.py:178-189,
TimesNet.py:166-180) that no registered task consumes
(tasks/__init__.py:9-20). This trainer closes that gap: models emit
[B, n_classes] logits per window, the loss is cross-entropy over valid
rows, and eval scores accuracy/F1/precision/recall (+AUROC when binary)
over the flat per-window predictions — no stitching, since each window
is one sample. The window -> label rule lives in the data layer
(data/base.py::window_label, `tasks.classification.window_label`).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score, f1_score, precision_score, recall_score, roc_auc_score,
)

from .base import BaseTask


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


class ClassificationTask(BaseTask):

    def _eval_split(self, pipeline, split):
        probs, labels = self.predict(pipeline)
        scores = {f"{split}/{k}": v for k, v in self.score(probs, labels).items()}
        self.log_scores(scores)
        self.logger.log_figure(self.plot_predictions(probs, labels),
                               f"{split}/confusion")
        return scores

    def val(self):
        return self._eval_split(self.val_pipeline, "val")

    def test(self):
        return self._eval_split(self.test_pipeline, "test")

    def predict(self, pipeline):
        out = self.run_eval(pipeline, extra_keys=("labels",))
        logits = out["pred"].reshape(out["pred"].shape[0], -1)  # [n, C]
        return _softmax(logits.astype(np.float64)), out["labels"].astype(np.int64)

    def score(self, probs, target):
        n_classes = probs.shape[1]
        avg = "binary" if n_classes == 2 else "macro"
        pred = probs.argmax(axis=1).astype(np.int64)
        scores = {
            "accuracy": accuracy_score(target, pred),
            "f1": f1_score(target, pred, average=avg, zero_division=0),
            "precision": precision_score(target, pred, average=avg, zero_division=0),
            "recall": recall_score(target, pred, average=avg, zero_division=0),
        }
        if n_classes == 2:
            scores["auroc"] = (roc_auc_score(target, probs[:, 1])
                               if len(np.unique(target)) > 1 else float("nan"))
        return scores

    def plot_predictions(self, probs, target):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        n_classes = probs.shape[1]
        pred = probs.argmax(axis=1)
        cm = np.zeros((n_classes, n_classes), dtype=np.int64)
        np.add.at(cm, (target, pred), 1)
        fig, ax = plt.subplots(figsize=(4.5, 4))
        im = ax.imshow(cm, cmap="Blues")
        for i in range(n_classes):
            for j in range(n_classes):
                ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                        fontsize=8)
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        return fig
