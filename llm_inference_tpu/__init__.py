"""llm_inference_tpu — a TPU-native LLM inference framework.

A from-scratch JAX/XLA/Pallas inference engine with the full capability set of
the reference CUDA engine (oneLLM, /root/reference) redesigned TPU-first:

- The reference's ~16 hand-written CUDA kernels (reference src/kernels/) become
  either XLA-fused jnp ops or Pallas TPU kernels (see `llm_inference_tpu.ops`).
- The reference's C++ layer/TensorMap/allocator machinery (reference
  src/layers/, src/memory/) disappears: models are pure functions over weight
  pytrees, XLA plans memory, `jax.jit` compiles whole prefill/decode programs.
- New first-class capabilities beyond the reference: weight-only INT8/INT4
  quantization with dequant fused into every matmul, quantized KV cache,
  continuous batching, and tensor/data sharding over a `jax.sharding.Mesh`.
"""

from llm_inference_tpu.config import (  # noqa: F401
    ModelConfig,
    QuantConfig,
    ShardingConfig,
    EngineConfig,
    GenerationConfig,
)

__version__ = "0.1.0"
