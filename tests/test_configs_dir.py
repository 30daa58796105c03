"""Every shipped TOML config must parse, validate, and round-trip."""

from pathlib import Path

import pytest

from medtsllm_tpu.config import dumps_toml, load_config, loads_config, validate_config

CONFIGS = sorted((Path(__file__).parent.parent / "configs").rglob("*.toml"))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_config_valid(path):
    cfg = load_config(str(path))
    validate_config(cfg)
    # writer round-trip
    again = loads_config(dumps_toml(cfg))
    assert again.to_dict() == cfg.to_dict()


def test_configs_exist():
    assert len(CONFIGS) >= 9


# The baseline-models studies mirror the reference's multi-model configs
# (reference configs/baseline-models/*.toml:4 "model = ... # gpt4ts,
# dlinear, patchtst, fedformer, timesnet"): one file, model switched on
# the CLI. Every advertised switch must validate.
STUDIES = sorted((Path(__file__).parent.parent / "configs" / "baseline-models").glob("*.toml"))
BASELINE_MODELS = ("gpt4ts", "dlinear", "patchtst", "fedformer", "timesnet")


@pytest.mark.parametrize("path", STUDIES, ids=lambda p: p.stem)
def test_baseline_study_model_switches(path):
    base = load_config(str(path))
    if not all(m in base.models for m in BASELINE_MODELS):
        pytest.skip("single-model config")
    for m in BASELINE_MODELS:
        cfg = load_config(str(path))
        cfg.model = m
        validate_config(cfg)
