"""Linear / matmul dispatch.

Replaces the reference's cuBLAS wrapper + launchLinearGemm shape plumbing
(reference: src/kernels/cublas_utils.h:15-76, src/kernels/linear.cu:38-229):
on TPU a plain `jnp.dot` under jit IS the tuned GEMM (XLA tiles it onto the
MXU), so the only real content here is the quantized-weight dispatch. The
row-major/col-major transpose gymnastics the reference documents at
linear.cu:106-171 have no equivalent — weights are stored [in, out] and
activations right-multiply.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from llm_inference_tpu.ops.quantization import ArrayOrQ, QTensor, qmatmul_ref


def matmul(x: jnp.ndarray, w: ArrayOrQ, bias: Optional[jnp.ndarray] = None,
           use_pallas: bool = True, layer=None) -> jnp.ndarray:
    """y = x @ W (+ bias). W may be a dense array or a QTensor; a QTensor
    stacked over layers takes `layer` to select the slice inside the kernel
    (so stacked weights are never materialized per layer — see
    ops/pallas/quant_matmul._quant_matmul_blocked).

    For QTensor weights this dispatches to the fused dequant matmul kernel
    (ops/pallas/quant_matmul.py) on TPU, falling back to the jnp reference
    path elsewhere.
    """
    if isinstance(w, QTensor):
        if use_pallas:
            from llm_inference_tpu.ops.pallas import quant_matmul as qm
            y = qm.quant_matmul(x, w, layer=layer)
        else:
            if layer is not None:
                from llm_inference_tpu.ops.pallas.quant_matmul import _index_layer
                w = _index_layer(w, layer)
            y = qmatmul_ref(x, w)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32
                    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def norm_matmul(x: jnp.ndarray, w: ArrayOrQ, gamma: jnp.ndarray,
                eps: float, *, residual: Optional[jnp.ndarray] = None,
                bias: Optional[jnp.ndarray] = None, layer=None,
                want_x_out: bool = False):
    """y = rms_norm(x (+ residual), gamma, eps) @ W (+ bias) with the
    norm/residual fused INTO the quantized GEMV kernel (QTensor path) —
    the decode step drops the separate reduce/apply/add XLA ops and their
    dispatch gaps. want_x_out also returns x + residual (the updated
    residual stream). Dense weights use the plain jnp chain."""
    if isinstance(w, QTensor):
        from llm_inference_tpu.ops.pallas import quant_matmul as qm
        out = qm.quant_matmul(x, w, layer=layer, norm_gamma=gamma,
                              norm_eps=eps, residual=residual,
                              want_x_out=want_x_out)
        y, x_full = out if want_x_out else (out, None)
    else:
        from llm_inference_tpu.ops import norms
        x_full = x
        if residual is not None:
            x_full = (x.astype(jnp.float32)
                      + residual.astype(jnp.float32)).astype(x.dtype)
        y = matmul(norms.rms_norm(x_full, gamma, eps), w, layer=layer)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return (y, x_full) if want_x_out else y
