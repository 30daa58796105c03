"""Config system: TOML files -> attribute-access config trees.

Reproduces the reference config surface (reference utils.py:19-95 and
configs/*.toml): a TOML file selects one task, one model, and one dataset
family; section access is attribute-style with `.get`/`in`/`[]` semantics.

TPU-specific additions live under `[setup]` (mesh axes, precision policy)
and are optional — every reference TOML loads unchanged.
"""

from __future__ import annotations

import copy as _copy
import datetime
import io
import tomllib
from typing import Any


class Config:
    """Recursive attribute-access wrapper over a nested dict.

    Mirrors the semantics of the reference `dict_to_object` (utils.py:19-39):
    attribute and item access, `in`, `.get(key, default)`, `.copy()`, and
    transparent wrapping of nested dicts (including dicts inside lists).
    """

    __slots__ = ("_data",)

    def __init__(self, data: dict | None = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[k] = _wrap(v)

    # -- mapping/attribute protocol ------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError:
            raise AttributeError(f"Config has no key {key!r}") from None

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, _wrap(default))

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def values(self):
        return self._data.values()

    def copy(self) -> "Config":
        return Config(_copy.deepcopy(self.to_dict()))

    def merge(self, other: "Config | dict") -> "Config":
        """Deep-merge `other` on top of self, returning a new Config."""
        base = self.to_dict()
        upd = other.to_dict() if isinstance(other, Config) else dict(other)
        return Config(_deep_merge(base, upd))

    def to_dict(self) -> dict:
        return {k: _unwrap(v) for k, v in self._data.items()}


def _wrap(v: Any) -> Any:
    if isinstance(v, dict):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return [_wrap(x) for x in v]
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v.to_dict()
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def _deep_merge(base: dict, upd: dict) -> dict:
    out = dict(base)
    for k, v in upd.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def dict_to_object(d: dict) -> Config:
    """Reference-compatible name (utils.py:19)."""
    return Config(d)


def load_config(path: str) -> Config:
    with open(path, "rb") as f:
        return Config(tomllib.load(f))


def loads_config(text: str) -> Config:
    return Config(tomllib.loads(text))


# ---------------------------------------------------------------------------
# TOML writing (stdlib has no writer; the run registry persists config.toml
# like the reference loggers/base_logger.py:22-27 does).
# ---------------------------------------------------------------------------

def _fmt_toml_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt_toml_value(x) for x in v) + "]"
    raise TypeError(f"Cannot serialize {type(v)} to TOML")


def dumps_toml(d: dict | Config, _prefix: str = "") -> str:
    if isinstance(d, Config):
        d = d.to_dict()
    buf = io.StringIO()
    tables = {}
    for k, v in d.items():
        if isinstance(v, dict):
            tables[k] = v
        else:
            buf.write(f"{k} = {_fmt_toml_value(v)}\n")
    for k, v in tables.items():
        name = f"{_prefix}{k}"
        body = dumps_toml(v, _prefix=f"{name}.")
        # only emit the table header if the table has non-table entries
        has_scalars = any(not isinstance(x, dict) for x in v.values())
        if has_scalars or not v:
            buf.write(f"\n[{name}]\n")
        buf.write(body)
    return buf.getvalue()


def save_config(config: dict | Config, path: str) -> None:
    with open(path, "w") as f:
        f.write(dumps_toml(config))


# ---------------------------------------------------------------------------
# Config summarization for logging (reference utils.py:42-83)
# ---------------------------------------------------------------------------

def summarize_config(config: Config) -> Config:
    """Prune the config tree down to the active model/task/dataset sections."""
    cfg = config.copy()
    active_model = cfg.get("model")
    active_task = cfg.get("task")
    active_dataset = cfg.get("data", Config()).get("dataset")

    # "timellm" is the historical section name for the medtsllm model
    model_aliases = {active_model}
    if active_model == "medtsllm":
        model_aliases.add("timellm")
    if active_model == "timellm":
        model_aliases.add("medtsllm")

    for section, active in (
        ("models", model_aliases),
        ("tasks", {active_task}),
        ("datasets", {active_dataset}),
    ):
        if section in cfg:
            pruned = {k: v for k, v in cfg[section].items() if k in active}
            cfg[section] = Config(pruned)
    return cfg


def flatten_dict(d: dict | Config, prefix: str = "", sep: str = "/") -> dict:
    if isinstance(d, Config):
        d = d.to_dict()
    out = {}
    for k, v in d.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out


def get_logging_tags(config: Config) -> list[str]:
    tags = [config.get("task", ""), config.get("model", "")]
    if "data" in config:
        tags.append(config.data.get("dataset", ""))
    if "study" in config:
        tags.append(str(config.study))
    return [t for t in tags if t]


# ---------------------------------------------------------------------------
# Schema validation — the reference enforces these with scattered asserts
# (SURVEY.md §4); here they are centralized so misconfigurations fail fast
# with a clear message before any compilation happens.
# ---------------------------------------------------------------------------

KNOWN_TASKS = (
    "forecasting",
    "reconstruction",
    "anomaly_detection",
    "segmentation",
    "semantic_segmentation",
    "pretraining",
    "classification",
    "imputation",
)
KNOWN_MODELS = ("medtsllm", "timellm", "gpt4ts", "dlinear", "patchtst", "timesnet", "fedformer")
KNOWN_OPTIMIZERS = ("adam", "adamw", "sgd", "ranger", "ranger21",
                    "ranger_classic")
KNOWN_SCHEDULERS = ("none", "constant", "cosine", "linear")
KNOWN_DTYPES = ("bfloat16", "bf16", "float16", "half", "fp16", "16",
                "float32", "float", "fp32", "32", "mixed")


class ConfigError(ValueError):
    pass


def validate_config(config: Config) -> Config:
    def require(cond, msg):
        if not cond:
            raise ConfigError(msg)

    require("task" in config, "config missing top-level `task`")
    require("model" in config, "config missing top-level `model`")
    require(config.task in KNOWN_TASKS, f"unknown task {config.task!r}")
    require(config.model in KNOWN_MODELS, f"unknown model {config.model!r}")
    require("history_len" in config and "pred_len" in config,
            "config missing history_len/pred_len")
    require("data" in config and "dataset" in config.data,
            "config missing [data] dataset")
    require("training" in config, "config missing [training]")

    t = config.training
    require(t.get("optimizer", "adam") in KNOWN_OPTIMIZERS,
            f"invalid optimizer {t.get('optimizer')!r}")
    require(t.get("lr_scheduler") in (None,) + KNOWN_SCHEDULERS,
            f"invalid lr_scheduler {t.get('lr_scheduler')!r}")
    require(int(t.get("grad_accum_steps", 1) or 1) >= 1,
            "training.grad_accum_steps must be >= 1")
    require(float(t.get("grad_clip_norm", 0) or 0) >= 0,
            "training.grad_clip_norm must be >= 0")
    if "setup" in config:
        dt = config.setup.get("dtype", "float32")
        require(dt in KNOWN_DTYPES or isinstance(dt, int),
                f"invalid dtype {dt!r}")
        if int(config.setup.get("expert_parallel", 1) or 1) > 1:
            require(config.model in ("medtsllm", "timellm"),
                    "setup.expert_parallel applies to MoE LLM backbones "
                    f"(model medtsllm); {config.model!r} has no experts "
                    "to shard")

    if config.task in ("reconstruction", "anomaly_detection",
                       "semantic_segmentation", "segmentation",
                       "classification", "imputation"):
        require(config.history_len == config.pred_len,
                f"{config.task} requires history_len == pred_len "
                f"(got {config.history_len} != {config.pred_len})")

    if config.task == "anomaly_detection":
        ad = config.get("tasks", Config()).get("anomaly_detection", None)
        require(ad is not None and "threshold" in ad
                and "normalize_by_feature" in ad,
                "anomaly_detection requires [tasks.anomaly_detection] with "
                "`threshold` and `normalize_by_feature` (otherwise the run "
                "fails only at first eval, after a full training epoch)")
    if config.task == "segmentation":
        sg = config.get("tasks", Config()).get("segmentation", None)
        require(sg is not None and "mode" in sg and "distance_thresh" in sg,
                "segmentation requires [tasks.segmentation] with `mode` "
                "and `distance_thresh`")

    if config.task == "classification":
        cl = config.get("tasks", Config()).get("classification", Config())
        wl = cl.get("window_label", "majority")
        require(wl in ("majority", "last", "any"),
                f"classification window_label must be majority/last/any, "
                f"got {wl!r}")
        loss = config.training.get("loss", "ce")
        require(loss in ("ce", "cross_entropy", "auto"),
                f"classification requires loss ce/cross_entropy/auto, "
                f"got {loss!r}")

    if config.task == "imputation":
        imp = config.get("tasks", Config()).get("imputation", Config())
        rate = imp.get("mask_rate", 0.25)
        require(0.0 < float(rate) < 1.0,
                f"imputation mask_rate must be in (0, 1), got {rate!r}")

    if config.model == "fedformer":
        dt = config.get("setup", Config()).get("dtype", "float32")
        require(dt in ("float32", "float", "fp32", "32", 32, "mixed"),
                "fedformer only supports float32 params")

    if "finetuning" in config and config.finetuning.get("enabled", False):
        f = config.finetuning
        require(not (f.get("frozen_epochs", 0) > 0 and f.get("warmup_epochs", 0) > 0),
                "finetuning frozen_epochs and warmup_epochs are mutually exclusive")

    return config
