"""medtsllm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multimodal
medical time-series analysis with LLM backbones.

Re-implements the full capability surface of flixpar/med-ts-llm (MLHC 2024,
arXiv 2408.07773) with a TPU-first architecture:

- pure-functional flax models compiled to single XLA step functions,
- host-side fixed-shape batch pipelines (no dynamic shapes under jit),
- Pallas kernels for the hot ops (flash attention, reprogramming fusion),
- `jax.sharding.Mesh` ("data", "tensor") parallelism for the LLM backbone,
- Orbax-style checkpointing with frozen-LLM weight exclusion.

Layer map mirrors the reference (see SURVEY.md §1):
  tasks/    — training-loop runtimes per task (6 tasks)
  models/   — model zoo (6 families) + LLM backbones
  ops/      — neural-net ops library (+ ops/pallas TPU kernels)
  data/     — windowed dataset readers and batch pipeline
  loggers/  — run registry, metrics, checkpoints
  parallel/ — mesh + sharding rules
  native/   — C++ kernels for host-side eval post-processing
"""

__version__ = "0.1.0"
