"""Placeholder: implemented later this round."""

import flax.linen as nn


class GPT4TS(nn.Module):
    supported_tasks = ()
    supported_modes = ()

    @classmethod
    def from_config(cls, config, dataset):
        raise NotImplementedError("GPT4TS is not implemented yet")
