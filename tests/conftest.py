"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the sandbox's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel);
# unit tests must run on the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")

import warnings  # noqa: E402

warnings.filterwarnings("ignore", message=".*synthetic fixture.*")

import numpy as np  # noqa: E402,F401
import pytest  # noqa: E402

from medtsllm_tpu.config import loads_config  # noqa: E402


BASE_TOML = """
task = "{task}"
model = "{model}"
history_len = {hist}
pred_len = {pred}

[data]
dataset = "{dataset}"
mode = "multivariate"
cols = "all"
normalize = true
step = {step}

[training]
epochs = 1
batch_size = 4
optimizer = "adam"
learning_rate = 1e-3
dropout = 0.0
loss = "{loss}"
eval_metric = "{eval_metric}"
eval_metric_direction = "{eval_dir}"

[tasks.anomaly_detection]
threshold = "auto"
score_metric = "mse"
normalize_by_feature = false

[tasks.segmentation]
mode = "boundary-prediction"
distance_thresh = "auto"

[datasets.synthetic]
n_points = 1024
n_features = 3

[setup]
seed = 0
device = "auto"
dtype = "float32"
num_workers = 0
logger = "print"
"""


def make_config(task="forecasting", model="dlinear", dataset="synthetic",
                hist=64, pred=64, step=32, loss="mse",
                eval_metric="mse", eval_dir="min", **overrides):
    cfg = loads_config(BASE_TOML.format(
        task=task, model=model, dataset=dataset, hist=hist, pred=pred,
        step=step, loss=loss, eval_metric=eval_metric, eval_dir=eval_dir))
    for key, val in overrides.items():
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node:
                node[p] = {}
            node = node[p]
        node[parts[-1]] = val
    return cfg


@pytest.fixture
def base_config():
    return make_config()


@pytest.fixture
def tmp_logdir(tmp_path):
    return str(tmp_path / "outputs" / "logs")
