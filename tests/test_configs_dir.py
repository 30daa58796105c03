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
