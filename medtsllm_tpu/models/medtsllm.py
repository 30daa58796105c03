"""Placeholder: implemented later this round."""

import flax.linen as nn


class MedTsLLM(nn.Module):
    supported_tasks = ()
    supported_modes = ()

    @classmethod
    def from_config(cls, config, dataset):
        raise NotImplementedError("MedTsLLM is not implemented yet")
