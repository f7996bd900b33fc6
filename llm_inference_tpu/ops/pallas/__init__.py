"""Pallas TPU kernels for the ops XLA can't fuse optimally.

Kernel inventory (each has a jnp golden model in the parent package and a
parity test in tests/):

- quant_matmul.py   — fused INT8/INT4 dequant matmul (weight-only), the
                      decode-roofline kernel (reference analogue: cuBLAS
                      GEMM + no quant support at all).
- decode_attention.py — fused single-step cached attention (reference
                      analogue: fused_decoder_self_attention.cu).
- flash_attention.py — blockwise prefill attention (reference analogue:
                      the QKᵀ→softmax→PV chain in context_attention.cpp).
- rmsnorm.py        — fused residual+RMSNorm (reference analogue:
                      fused_addresidual_norm.cu).

All kernels run in interpret mode off-TPU so CPU CI exercises them.
"""

import jax


def use_interpret() -> bool:
    """True when the default backend cannot compile Mosaic/TPU kernels —
    every kernel module uses this to flip pl.pallas_call(interpret=...)."""
    return jax.default_backend() != "tpu"
