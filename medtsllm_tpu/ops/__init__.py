"""Neural-net ops library (reference models/layers/, SURVEY.md §2.6),
rebuilt as pure-functional flax modules + jnp functions.

TPU notes: everything here is shape-static and jit-traceable; FFT ops use
jnp.fft (XLA-lowered); the LLM-side attention has a Pallas flash kernel in
ops/pallas/.
"""

from .decomp import moving_avg, series_decomp, series_decomp_multi  # noqa: F401
from .revin import revin_norm, revin_denorm, RevINAffine  # noqa: F401
from .embed import (  # noqa: F401
    positional_embedding, TokenEmbedding, FixedEmbedding, TemporalEmbedding,
    TimeFeatureEmbedding, DataEmbedding, DataEmbedding_wo_pos,
    DataEmbedding_wo_time, PatchEmbedding,
)
from .attention import FullAttention, AttentionLayer, DSAttention, ProbAttention  # noqa: F401
from .heads import FlattenHead  # noqa: F401
