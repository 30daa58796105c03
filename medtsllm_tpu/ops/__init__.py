"""Neural-net ops library (reference models/layers/, SURVEY.md §2.6),
rebuilt as pure-functional flax modules + jnp functions.

TPU notes: everything here is shape-static and jit-traceable; frequency
ops use matmul-DFT real pairs (ops/dft.py); the LLM-side attention has a
Pallas flash kernel in ops/pallas/.
"""

from .decomp import (  # noqa: F401
    moving_avg, my_layernorm_bias_correction, series_decomp,
    series_decomp_multi,
)
from .revin import revin_norm, revin_denorm, RevINAffine  # noqa: F401
from .embed import (  # noqa: F401
    positional_embedding, TokenEmbedding, FixedEmbedding, TemporalEmbedding,
    TimeFeatureEmbedding, DataEmbedding, DataEmbedding_wo_pos,
    DataEmbedding_wo_time, PatchEmbedding, patch_unfold,
)
from .attention import (  # noqa: F401
    AttentionLayer, DSAttention, FullAttention, ProbAttention,
)
from .autocorr import AutoCorrelation, AutoCorrelationLayer  # noqa: F401
from .autoformer import (  # noqa: F401
    AutoformerDecoder, AutoformerDecoderLayer, AutoformerEncoder,
    AutoformerEncoderLayer, MyLayerNorm,
)
from .crossformer import TwoStageAttentionLayer  # noqa: F401
from .dft import irfft, irfft_ri, rfft, rfft_ri  # noqa: F401
from .fourier import FourierBlock, FourierCrossAttention  # noqa: F401
from .heads import FlattenHead  # noqa: F401
from .inception import (  # noqa: F401
    InceptionBlockV1, InceptionBlockV2, fft_for_period, fold_conv2d,
)
from .masks import prob_mask, triangular_causal_mask  # noqa: F401
from .transformer import (  # noqa: F401
    ConvLayer, Decoder, DecoderLayer, Encoder, EncoderLayer,
)
from .wavelets import (  # noqa: F401
    MultiWaveletCross, MultiWaveletTransform, MWT_CZ1d, get_filter,
)
