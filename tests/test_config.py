import pytest

from medtsllm_tpu.config import (
    Config, ConfigError, dumps_toml, flatten_dict, loads_config,
    summarize_config, validate_config,
)
from conftest import make_config


def test_attribute_access():
    c = Config({"a": 1, "b": {"c": 2, "d": [1, {"e": 3}]}})
    assert c.a == 1
    assert c.b.c == 2
    assert c.b.d[1].e == 3
    assert "a" in c and "z" not in c
    assert c.get("z", 5) == 5
    assert c["b"]["c"] == 2


def test_copy_is_deep():
    c = Config({"a": {"b": 1}})
    c2 = c.copy()
    c2.a.b = 99
    assert c.a.b == 1


def test_merge():
    c = Config({"a": {"b": 1, "c": 2}, "x": 1})
    m = c.merge({"a": {"b": 10}, "y": 2})
    assert m.a.b == 10 and m.a.c == 2 and m.x == 1 and m.y == 2


def test_toml_roundtrip():
    cfg = make_config()
    text = dumps_toml(cfg)
    cfg2 = loads_config(text)
    assert cfg2.to_dict() == cfg.to_dict()


def test_flatten():
    f = flatten_dict({"a": {"b": 1}, "c": 2})
    assert f == {"a/b": 1, "c": 2}


def test_summarize_prunes_inactive():
    cfg = make_config()
    cfg["models"] = {"dlinear": {"x": 1}, "patchtst": {"y": 2}}
    s = summarize_config(cfg)
    assert "dlinear" in s.models and "patchtst" not in s.models


def test_validation_errors():
    cfg = make_config(task="reconstruction", pred=32, hist=64)
    with pytest.raises(ConfigError):
        validate_config(cfg)
    cfg2 = make_config()
    cfg2.model = "nonexistent"
    with pytest.raises(ConfigError):
        validate_config(cfg2)
    cfg3 = make_config(model="fedformer")
    cfg3.setup.dtype = "bfloat16"
    with pytest.raises(ConfigError):
        validate_config(cfg3)


def test_validation_passes():
    validate_config(make_config())
    validate_config(make_config(task="anomaly_detection", loss="mse"))
