"""Placeholder: implemented later this round."""

import flax.linen as nn


class FEDformer(nn.Module):
    supported_tasks = ()
    supported_modes = ()

    @classmethod
    def from_config(cls, config, dataset):
        raise NotImplementedError("FEDformer is not implemented yet")
