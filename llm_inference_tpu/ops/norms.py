"""RMSNorm and fused residual+RMSNorm.

Equivalents of the reference's vectorized warp-reduce kernels
`launchRMSNorm` (reference: src/kernels/rmsnorm_kernel.cu:62-204) and
`launchFusedAddBiasResidualRMSNorm` (reference:
src/kernels/fused_addresidual_norm.cu:62-224). On TPU these are expressed in
jnp and XLA fuses the reduction + scale into neighbouring ops; a Pallas
version exists in ops/pallas/rmsnorm.py for the cases XLA doesn't fuse
(fusion across the residual stream in the decode step).

Numerics match HF LlamaRMSNorm: reduce in float32, cast back to the input
dtype, then multiply by the weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm: x * rsqrt(mean(x^2) + eps) * weight, reduced in fp32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed.astype(dtype) * weight).astype(dtype)


def add_residual_rms_norm(
    residual: jnp.ndarray,
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 1e-5,
):
    """Fused `residual += x; out = rms_norm(residual)`.

    Returns (normed, new_residual) — mirrors the reference kernel writing
    both the updated residual and the normed output (reference:
    src/kernels/fused_addresidual_norm.cu:210-224).
    """
    new_residual = residual + x
    return rms_norm(new_residual, weight, eps), new_residual
