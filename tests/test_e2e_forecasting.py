"""End-to-end slice: DLinear forecasting on synthetic data
(train -> val -> test -> checkpoint -> resume)."""

import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer, task_lookup
from conftest import make_config


@pytest.fixture
def fast_config(tmp_path):
    cfg = make_config(task="forecasting", model="dlinear",
                      hist=32, pred=16, step=8)
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 2
    cfg.datasets.synthetic.n_points = 512
    return cfg


def test_train_eval_checkpoint_resume(fast_config, tmp_path):
    trainer = get_trainer("testrun", fast_config)
    trainer.train()
    scores = trainer.test()
    assert np.isfinite(scores["test/mse"])
    trainer.log_end()

    # resume from checkpoint and verify identical test metrics
    cls = task_lookup["forecasting"]
    restored = cls.from_run_id("testrun", basepath=str(tmp_path / "logs"))
    scores2 = restored.test()
    assert scores2["test/mse"] == pytest.approx(scores["test/mse"], rel=1e-5)
    assert restored.epoch == trainer.epoch


def test_resume_continues_not_restarts(fast_config, tmp_path):
    """Preemption-resume semantics (reference SIGUSR1 + from_run_id,
    tasks/base.py:277-306): a resumed run continues from the saved epoch
    (and keeps best_score) instead of retraining from scratch."""
    trainer = get_trainer("resumerun", fast_config)
    trainer.train()  # epochs = 2 -> epoch rests at 3
    best = trainer.best_score
    trainer.log_end()

    cls = task_lookup["forecasting"]
    restored = cls.from_run_id("resumerun",
                               cfg={"training": {"epochs": 3}},
                               basepath=str(tmp_path / "logs"))
    assert restored.epoch == 3  # next epoch to run
    assert restored.best_score == pytest.approx(best)
    # deep merge kept the rest of [training] intact
    assert restored.config.training.batch_size == \
        fast_config.training.batch_size
    restored.train()  # runs exactly the one new epoch
    assert restored.epoch == 4
    restored.log_end()


def test_loss_decreases(fast_config):
    trainer = get_trainer("lossrun", fast_config)
    first = trainer.val()["val/mse"]
    trainer.train()
    last = trainer.val()["val/mse"]
    assert last < first


def test_individual_mode(fast_config):
    fast_config.models.dlinear.individual = True
    trainer = get_trainer("indrun", fast_config)
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_univariate_mode(fast_config):
    fast_config.data.mode = "univariate"
    trainer = get_trainer("unirun", fast_config)
    preds, targets = trainer.predict(trainer.val_pipeline)
    assert preds.shape == targets.shape
    assert preds.shape[1] == 3  # real_features columns stitched back


def test_reconstruction_task(fast_config):
    fast_config.task = "reconstruction"
    fast_config.pred_len = fast_config.history_len = 32
    trainer = get_trainer("reconrun", fast_config)
    trainer.train()
    scores = trainer.test()
    assert np.isfinite(scores["test/mse"])
