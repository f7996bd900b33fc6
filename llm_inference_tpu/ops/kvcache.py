"""KV cache: layout, init, and in-place update.

Equivalent of the reference's dense contiguous cache
`[num_layers, bs, kv_heads, max_seq_len, head_size]` (reference:
src/models/llama/llama.cpp:77-78,102-103) and its append kernel
`launchConcatKVCache` (reference: src/kernels/concat_past_kv.cu:17-145).

TPU-first layout: [layers, batch, kv_heads, max_seq, head_dim] — head_dim=128
is the lane dimension and max_seq the sublane dimension, so per-(batch, head)
cache pages are MXU/VPU-native [S, 128] tiles. Updates are vmapped
`lax.dynamic_update_slice` (per-sequence offsets), which XLA lowers to an
in-place scatter thanks to jit donation — no copy of the cache.

Unlike the reference (batch=1, shared history offset), offsets are per-sequence
so continuous batching can mix requests at different positions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KVCache:
    """Dense KV cache for all layers.

    k, v: [layers, batch, kv_heads, max_seq, head_dim]
    """
    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def init_cache(
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    max_seq: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    shape = (num_layers, batch, num_kv_heads, max_seq, head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def update_kv_cache(
    k_cache: jnp.ndarray,   # [B, Hkv, S, D]  (single layer)
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,     # [B, T, Hkv, D]
    v_new: jnp.ndarray,
    offsets: jnp.ndarray,   # [B] int32 — write position per sequence
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write T new tokens per sequence into the cache at per-seq offsets."""
    k_new = k_new.transpose(0, 2, 1, 3).astype(k_cache.dtype)  # [B, Hkv, T, D]
    v_new = v_new.transpose(0, 2, 1, 3).astype(v_cache.dtype)

    def write_one(cache_b, new_b, off):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, off, 0))

    k_cache = jax.vmap(write_one)(k_cache, k_new, offsets)
    v_cache = jax.vmap(write_one)(v_cache, v_new, offsets)
    return k_cache, v_cache
