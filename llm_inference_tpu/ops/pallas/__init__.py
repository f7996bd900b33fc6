"""Pallas TPU kernels for the ops XLA can't fuse optimally.

Kernel inventory (each has a jnp golden model in the parent package and a
parity test in tests/):

- quant_matmul.py   — fused INT8/INT4 dequant matmul (weight-only), the
                      decode-roofline kernel (reference analogue: cuBLAS
                      GEMM + no quant support at all).
- decode_attention.py — fused single-step cached attention, bf16 or INT8 KV
                      (reference analogue: fused_decoder_self_attention.cu).
- flash_attention.py — blockwise online-softmax prefill attention (reference
                      analogue: the QKᵀ→softmax→PV chain in
                      context_attention.cpp, which materializes full scores).

Deliberately NOT a kernel: fused residual-add+RMSNorm (the reference needs
fused_addresidual_norm.cu; XLA already fuses the elementwise chain — traced
at ~0.5 µs/layer, so a custom kernel has nothing to win).

All kernels run in interpret mode off-TPU so CPU CI exercises them.
"""

import jax


def use_interpret() -> bool:
    """True when the default backend cannot compile Mosaic/TPU kernels —
    every kernel module uses this to flip pl.pallas_call(interpret=...)."""
    return jax.default_backend() != "tpu"
