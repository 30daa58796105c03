"""Pallas TPU kernels for the hot ops.

Every kernel has a pure-jnp fallback selected automatically off-TPU (unit
tests run on the CPU backend); on TPU the Pallas path is the default and
can be disabled with MEDTSLLM_DISABLE_PALLAS=1.
"""

from .flash_attention import flash_attention  # noqa: F401
