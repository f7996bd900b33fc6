"""Gated activations (SwiGLU and friends).

Equivalent of the reference's `launchAct` SwiGLU kernel (reference:
src/kernels/act_kernel.cu:18-78), which consumes the fused gate∥up GEMM
output. Here the silu·mul is a two-liner that XLA fuses into the surrounding
matmuls — no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(gate_up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU on a fused gate∥up tensor.

    Args:
      gate_up: [..., 2 * inter] — gate in the first half, up in the second
        (same convention as the reference's pre-concatenated gate_up_proj,
        reference: src/kernels/linear.cu:24-35).

    Returns: [..., inter] silu(gate) * up.
    """
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up


def swiglu_split(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU on separate gate/up tensors."""
    return jax.nn.silu(gate) * up
