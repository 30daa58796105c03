"""LLM backbone runtime (SURVEY.md §7 stage 6).

The reference loads arbitrary HF AutoModel backbones eagerly on GPU
(models/medtsllm.py:129-233). Here backbones are flax decoder stacks
(GPT-2-style and LLaMA-style) with:
  - HF safetensors weight loading from a local path (zero-egress safe),
    with deterministic random init as fallback,
  - layer truncation (`llm_layers`, medtsllm.py:145-146),
  - frozen-backbone / LoRA parameter partitioning,
  - Pallas flash attention on TPU (jnp fallback elsewhere),
  - tensor-parallel sharding rules over a ("data", "tensor") mesh.
"""

from .transformer import DecoderConfig, TransformerDecoder  # noqa: F401
from .loader import load_backbone, PRESETS  # noqa: F401
from .tokenizer import get_tokenizer  # noqa: F401
