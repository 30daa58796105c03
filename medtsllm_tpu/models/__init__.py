"""Model zoo registry (reference models/__init__.py:10-18).

Each model is a flax.linen Module with:
  - class attrs `supported_tasks`, `supported_modes`
  - classmethod `from_config(config, dataset) -> Module`
  - `__call__(inputs: dict, training: bool=False) -> prediction`
"""

from __future__ import annotations


def _lazy_lookup():
    from .dlinear import DLinear
    from .patchtst import PatchTST
    from .timesnet import TimesNet
    from .fedformer import FEDformer
    from .gpt4ts import GPT4TS
    from .medtsllm import MedTsLLM
    return {
        "medtsllm": MedTsLLM,
        "timellm": MedTsLLM,   # historical alias (reference models/__init__.py)
        "gpt4ts": GPT4TS,
        "dlinear": DLinear,
        "patchtst": PatchTST,
        "timesnet": TimesNet,
        "fedformer": FEDformer,
    }


class _ModelLookup(dict):
    def __missing__(self, key):
        self.update(_lazy_lookup())
        return dict.__getitem__(self, key)


model_lookup = _ModelLookup()


def build_model(config, dataset):
    cls = model_lookup[config.model]
    if config.task not in cls.supported_tasks:
        raise ValueError(f"{config.task} not supported by {config.model}")
    return cls.from_config(config, dataset)
