"""KV cache: layout, init, and in-place update.

Equivalent of the reference's dense contiguous cache
`[num_layers, bs, kv_heads, max_seq_len, head_size]` (reference:
src/models/llama/llama.cpp:77-78,102-103) and its append kernel
`launchConcatKVCache` (reference: src/kernels/concat_past_kv.cu:17-145).

TPU-first layout: BOTH caches are [layers, batch, kv_heads, max_seq,
head_dim] — token writes land on contiguous [head_dim] rows (a transposed-K
variant was measured: it makes q·Kᵀ marginally cheaper but each decode-step
K write becomes a strided lane-column RMW costing ~12 µs/layer, 8× the
natural-layout write; the attention kernels instead use TN/NT dot_general
forms that contract head_dim directly from the natural layout with no
in-kernel transposes).

Decode-step updates (T == 1) are ONE Pallas RMW-scatter call for the whole
batch (ops/pallas/kv_write.py, cache aliased in place); prefill updates are
chains of per-sequence `lax.dynamic_update_slice` ops (see _write_pages for
why neither vmap nor a batched scatter works), kept fully in place by jit
donation / while-carry aliasing. Unlike the reference (batch=1, shared
history offset), offsets are per-sequence so continuous batching can mix
requests at different positions.
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

    INT8 mode (new capability per the north star; no reference analogue):
    k/v hold int8 codes and k_scale/v_scale hold per-(slot, head) float32
    scales stored SLOT-MAJOR: [layers, batch, max_seq, kv_heads]. Slot-major
    matters: the decode kernel consumes scales as [S, hb] blocks with slots
    on sublanes — the head-major layout needed a lane-vector reshape that
    XLA materialized as a relayout copy of the whole scale array every
    layer every decode step (measured 3.1 ms/step at B=8). The kernels
    dequantize K/V codes in VMEM with these scales right after the DMA;
    dequantized pages never exist in HBM.
    """
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None
    # code width: 16 = bf16/f32 (k_scale None), 8 = int8, 4 = packed int4
    # (codes hold TWO dims per byte, split-half along head_dim —
    # quantization.quantize_kv4; k/v are [L, B, Hkv, S, D/2] int8)
    bits: int = struct.field(pytree_node=False, default=16)

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def head_dim(self) -> int:
        return self.k.shape[4] * (2 if self.bits == 4 else 1)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def _fused_kvq() -> bool:
    """Fused int8 quantize+write decode kernel (kv_write.
    quantize_write_token). LLMI_FUSED_KVQ=0 reverts to the two-step
    quantize_kv → write path for A/B."""
    import os
    return os.environ.get("LLMI_FUSED_KVQ") != "0"


def init_cache(
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    max_seq: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    shape = (num_layers, batch, num_kv_heads, max_seq, head_dim)
    sshape = (num_layers, batch, max_seq, num_kv_heads)
    if dtype == jnp.int8 or dtype == "int8":
        return KVCache(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32), bits=8)
    if dtype == "int4":
        pshape = shape[:-1] + (head_dim // 2,)
        return KVCache(k=jnp.zeros(pshape, jnp.int8),
                       v=jnp.zeros(pshape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32), bits=4)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def update_kv_cache(
    k_cache: jnp.ndarray,   # [B, Hkv, S, D]  (single layer)
    v_cache: jnp.ndarray,   # [B, Hkv, S, D]
    k_new: jnp.ndarray,     # [B, T, Hkv, D]
    v_new: jnp.ndarray,
    offsets: jnp.ndarray,   # [B] int32 — write position per sequence
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write T new tokens per sequence into the cache at per-seq offsets.

    Delegates to _write_pages (the single home of the DUS-chain write
    invariant — no vmap, no batched scatter) via a unit layer axis."""
    k_all, v_all = _write_pages(k_cache[None], v_cache[None], jnp.int32(0),
                                k_new, v_new, offsets)
    return k_all[0], v_all[0]


def update_cache_layer(
    cache: KVCache,         # full stacked cache (all layers)
    layer: jnp.ndarray,     # scalar int32 — layer index
    k_new: jnp.ndarray,     # [B, T, Hkv, D]
    v_new: jnp.ndarray,
    offsets: jnp.ndarray,   # [B] int32 — write position per sequence
) -> KVCache:
    """Write into ONE layer of the full stacked cache.

    The model threads the whole cache through the layer scan as CARRY and
    writes with this function: XLA's while-loop carry aliasing keeps the
    update in place. (Threading per-layer slices as scan xs/ys instead
    re-materializes the entire stacked ys output every step — measured ~2 ms
    per decode step for a 7B cache on v5e.)

    INT8/INT4 caches quantize at write time: per-(head, token) symmetric
    scales over the head_dim axis (ops.quantization.quantize_kv /
    quantize_kv4 semantics); int4 packs two dims per byte so the write
    slices are [B, T, H, D/2].
    """
    if cache.quantized:
        from llm_inference_tpu.ops.pallas import kv_write
        from llm_inference_tpu.ops.quantization import (quantize_kv,
                                                        quantize_kv4)
        T = k_new.shape[1]
        if (cache.bits == 8 and T == 1
                and cache.k.shape[3] % kv_write._SLOT_BLK == 0
                and _fused_kvq()):
            # decode int8: quantize INSIDE the write kernel — one call
            # replaces quantize_kv's fusions + both write kernels
            k_all, v_all, ks_all, vs_all = kv_write.quantize_write_token(
                cache.k, cache.v, cache.k_scale, cache.v_scale, layer,
                k_new.transpose(0, 2, 1, 3), v_new.transpose(0, 2, 1, 3),
                offsets)
            return cache.replace(k=k_all, v=v_all, k_scale=ks_all,
                                 v_scale=vs_all)
        qfn = quantize_kv4 if cache.bits == 4 else quantize_kv
        kq, ks = qfn(k_new)             # int8 codes, f32 [B,T,H,1]
        vq, vs = qfn(v_new)
        k_all, v_all = _write_pages(cache.k, cache.v, layer,
                                    kq, vq, offsets)
        ks_all, vs_all = _write_scales_pair(cache.k_scale, cache.v_scale,
                                            layer, ks[..., 0], vs[..., 0],
                                            offsets)
        return cache.replace(k=k_all, v=v_all, k_scale=ks_all,
                             v_scale=vs_all)
    k_all, v_all = _write_pages(cache.k, cache.v, layer, k_new, v_new,
                                offsets)
    return cache.replace(k=k_all, v=v_all)


def _write_pages(k_all, v_all, layer, k_new, v_new, offsets):
    """Decode steps (T == 1): ONE Pallas RMW-scatter call for all B rows
    (ops/pallas/kv_write.py — the cache is aliased in place; the B-chain of
    DUS ops it replaces cost ~1 ms/step in per-op overhead at B=16).

    Prefill (T > 1): per-sequence chain of dynamic_update_slice (B is
    static and small; runs once per request). NOT a vmapped DUS over the
    batch axis — vmap(in_axes=1) physically transposes the whole cache to
    [B, L, ...] and back EVERY LAYER (measured 4 × 2.1 GB of copies per
    layer-step at B=8 on a 7B cache). NOT a batched advanced-index scatter
    either — XLA assigns the scatter a non-default operand layout, forcing
    two full-cache layout copies per layer at the Pallas-call boundary. A
    chain of plain DUS ops keeps the carry aliased in place (verified: zero
    cache copies in the trace)."""
    from llm_inference_tpu.ops.pallas import kv_write
    B, T = k_new.shape[:2]
    k_new = k_new.transpose(0, 2, 1, 3).astype(k_all.dtype)   # [B, Hkv, T, D]
    v_new = v_new.transpose(0, 2, 1, 3).astype(v_all.dtype)
    if T == 1 and k_all.shape[3] % kv_write._SLOT_BLK == 0:
        return kv_write.write_token(k_all, v_all, layer, k_new, v_new,
                                    offsets)
    zero = jnp.int32(0)
    for b in range(B):
        idx = (layer, jnp.int32(b), zero, offsets[b], zero)
        k_all = jax.lax.dynamic_update_slice(k_all, k_new[b][None, None], idx)
        v_all = jax.lax.dynamic_update_slice(v_all, v_new[b][None, None], idx)
    return k_all, v_all


def _write_scales(s_all, layer, s_new, offsets):
    """s_all: [L, B, S, Hkv] (slot-major); s_new: [B, T, Hkv].

    Slot-major writes are also the cheaper DUS: each lands T contiguous
    lane rows at sublane offset `offsets[b]` (the head-major layout wrote a
    strided lane column across Hkv sublanes)."""
    B = s_new.shape[0]
    s_new = s_new.astype(s_all.dtype)
    zero = jnp.int32(0)
    for b in range(B):
        s_all = jax.lax.dynamic_update_slice(
            s_all, s_new[b][None, None], (layer, jnp.int32(b),
                                          offsets[b], zero))
    return s_all


def _write_scales_pair(ks_all, vs_all, layer, ks_new, vs_new, offsets):
    """K and V scales in one shot; decode (T == 1) goes through the Pallas
    scatter (kv_write.write_token_scales), prefill through the DUS chain."""
    from llm_inference_tpu.ops.pallas import kv_write
    if ks_new.shape[1] == 1 and ks_all.shape[2] % kv_write._SLOT_BLK == 0:
        return kv_write.write_token_scales(
            ks_all, vs_all, layer, ks_new.astype(ks_all.dtype),
            vs_new.astype(vs_all.dtype), offsets)
    return (_write_scales(ks_all, layer, ks_new, offsets),
            _write_scales(vs_all, layer, vs_new, offsets))


def update_kv_cache_layer(k_all, v_all, layer, k_new, v_new, offsets):
    """Back-compat wrapper for unquantized caches (see update_cache_layer)."""
    return _write_pages(k_all, v_all, layer, k_new, v_new, offsets)
