"""Paged KV cache: fixed-size token pages + per-sequence page tables.

No reference analogue (the reference preallocates a dense
[layers, bs, kv_heads, max_seq, hs] cache, src/models/llama/llama.cpp:77-78);
this is the vLLM-style memory model the north star asks for, laid out for
TPU:

- One global page pool per cache tensor: [L, P, Hkv, page_size, D] — a page
  holds `page_size` consecutive tokens of ONE sequence for ALL kv heads, so
  the attention kernel's per-(page, head-group) DMA [hb, ps, D] is a
  contiguous chunk, exactly like a dense-cache slice.
- A page table [B, max_blocks] int32 maps each sequence's token blocks to
  pool pages. It rides scalar prefetch into the Pallas kernel
  (ops/pallas/paged_attention.py), which resolves the indirection in its
  BlockSpec index_map — pages are never gathered into contiguous storage.
- Allocation is host-side (PageAllocator): a free-list stack; the scheduler
  grabs pages at admission (prompt) and ahead of each decode chunk, and
  returns them at retirement. Fragmentation is zero by construction (all
  pages equal size) — memory waste is bounded by < 1 page per sequence,
  vs a dense cache's (max_seq − actual_len) per sequence.

Writes go through jnp scatter updates on the pool (in place under jit
donation / scan-carry aliasing, like the dense cache).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PagedKVCache:
    """k/v page pools + page table.

    k_pages, v_pages: [L, P, Hkv, page_size, D]
    page_table:       [B, max_blocks] int32 (pool page id per token block;
                      unallocated entries may hold any valid page id — reads
                      beyond a sequence's length are masked by position)

    INT8 mode: pages hold int8 codes and k_scale/v_scale hold per-(row,
    head) float32 scales stored SLOT-MAJOR [L, P, page_size, Hkv] — same
    rationale as the dense int8 cache (ops/kvcache.py): the attention
    kernel consumes [ps, hb] scale blocks with rows on sublanes and
    dequantizes codes in VMEM; head-major storage forced a relayout copy
    of the whole scale pool every layer every step.
    """
    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    page_table: jnp.ndarray
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None
    # code width: 16 = bf16/f32, 8 = int8, 4 = packed int4 (two dims per
    # byte, split-half offset-lo — quantization.quantize_kv4; pages are
    # [L, P, Hkv, ps, D/2] int8)
    bits: int = struct.field(pytree_node=False, default=16)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def head_dim(self) -> int:
        return self.k_pages.shape[4] * (2 if self.bits == 4 else 1)

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def max_blocks(self) -> int:
        return self.page_table.shape[1]


def init_paged_cache(num_layers: int, num_pages: int, num_kv_heads: int,
                     page_size: int, head_dim: int, batch: int,
                     max_blocks: int, dtype=jnp.bfloat16) -> PagedKVCache:
    shape = (num_layers, num_pages, num_kv_heads, page_size, head_dim)
    sshape = (num_layers, num_pages, page_size, num_kv_heads)
    pt = jnp.zeros((batch, max_blocks), jnp.int32)
    if dtype == jnp.int8 or dtype == "int8":
        return PagedKVCache(k_pages=jnp.zeros(shape, jnp.int8),
                            v_pages=jnp.zeros(shape, jnp.int8),
                            page_table=pt,
                            k_scale=jnp.zeros(sshape, jnp.float32),
                            v_scale=jnp.zeros(sshape, jnp.float32), bits=8)
    if dtype == "int4":
        pshape = shape[:-1] + (head_dim // 2,)
        return PagedKVCache(k_pages=jnp.zeros(pshape, jnp.int8),
                            v_pages=jnp.zeros(pshape, jnp.int8),
                            page_table=pt,
                            k_scale=jnp.zeros(sshape, jnp.float32),
                            v_scale=jnp.zeros(sshape, jnp.float32), bits=4)
    return PagedKVCache(k_pages=jnp.zeros(shape, dtype),
                        v_pages=jnp.zeros(shape, dtype), page_table=pt)


class PageAllocator:
    """Host-side free-list page allocator (one per pool).

    `reserve` pages at the front are never handed out (default 1): page 0 is
    the null page that unallocated page-table entries point at. It absorbs
    garbage writes from retired-but-not-yet-reused decode slots (whose
    outputs the scheduler discards host-side); live sequences only read it
    through their position-masked tail blocks, and write_token sanitizes
    non-finite values so those masked reads can never produce 0·Inf = NaN."""

    def __init__(self, num_pages: int, reserve: int = 1):
        self._free: List[int] = list(range(num_pages - 1, reserve - 1, -1))
        self.num_pages = num_pages

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def allocate(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"page pool exhausted: want {n}, have {len(self._free)}")
        return [self._free.pop() for _ in range(n)]

    def release(self, pages: Sequence[int]) -> None:
        self._free.extend(int(p) for p in pages)


def write_token(cache: PagedKVCache, layer: jnp.ndarray,
                k_new: jnp.ndarray, v_new: jnp.ndarray,
                positions: jnp.ndarray) -> PagedKVCache:
    """Decode-step write: one new token per sequence.

    k_new/v_new: [B, 1, Hkv, D]; positions: [B] absolute token index. The
    target page comes from the (device-resident) page table.
    """
    B = k_new.shape[0]
    ps = cache.page_size
    # clamp: retired slots keep decoding garbage with growing positions;
    # their table rows point at the reserved null page, which absorbs the
    # writes (it is never allocated, and reads of it are position-masked)
    block = jnp.minimum(positions // ps, cache.max_blocks - 1)
    row = positions % ps
    pages = jnp.take_along_axis(cache.page_table, block[:, None],
                                axis=1)[:, 0]                    # [B]
    # retired slots write garbage into the shared null page, whose masked
    # reads multiply by exactly-zero probabilities — sanitize non-finite
    # garbage (overflowed bf16 activations) or 0 x Inf would NaN-poison
    # every live sequence whose tail blocks alias the null page
    # sanitize BEFORE quantizing: an Inf activation would otherwise turn
    # into scale=Inf (quantize_kv absmax), and the int8-code nan_to_num
    # below would be a no-op on the poisoned SCALE rows
    k_in = jnp.nan_to_num(k_new[:, 0])
    v_in = jnp.nan_to_num(v_new[:, 0])
    ks_rows = vs_rows = None
    if cache.quantized:
        from llm_inference_tpu.ops.quantization import (quantize_kv,
                                                        quantize_kv4)
        qfn = quantize_kv4 if cache.bits == 4 else quantize_kv
        k_in, ks = qfn(k_in)                    # codes, scale [B, Hkv, 1]
        v_in, vs = qfn(v_in)
        ks_rows, vs_rows = ks[..., 0], vs[..., 0]
    k_rows = k_in.astype(cache.k_pages.dtype)
    v_rows = v_in.astype(cache.v_pages.dtype)
    # per-sequence chain of dynamic_update_slice — the batched-scatter and
    # vmapped forms force full-pool copies inside the decode scan (see
    # kvcache._write_pages for the measurements)
    k_pages, v_pages = cache.k_pages, cache.v_pages
    k_sc, v_sc = cache.k_scale, cache.v_scale
    zero = jnp.int32(0)
    for b in range(B):
        idx = (layer, pages[b], zero, row[b], zero)
        k_pages = jax.lax.dynamic_update_slice(
            k_pages, k_rows[b][None, None, :, None], idx)
        v_pages = jax.lax.dynamic_update_slice(
            v_pages, v_rows[b][None, None, :, None], idx)
        if cache.quantized:
            sidx = (layer, pages[b], row[b], zero)
            k_sc = jax.lax.dynamic_update_slice(
                k_sc, ks_rows[b][None, None, None, :], sidx)
            v_sc = jax.lax.dynamic_update_slice(
                v_sc, vs_rows[b][None, None, None, :], sidx)
    return cache.replace(k_pages=k_pages, v_pages=v_pages,
                         k_scale=k_sc, v_scale=v_sc)


def write_prompt(cache: PagedKVCache, layer: jnp.ndarray, seq: int,
                 k_seq: jnp.ndarray, v_seq: jnp.ndarray) -> PagedKVCache:
    """Prefill insert for ONE sequence starting at pos 0 (single-seq
    convenience over write_prompt_batch; same semantics)."""
    ps = cache.page_size
    nb = k_seq.shape[0] // ps
    one = cache.replace(page_table=cache.page_table[seq:seq + 1])
    out = write_prompt_batch(one, layer, k_seq[None], v_seq[None], nb)
    return out.replace(page_table=cache.page_table)


def write_prompt_batch(cache: PagedKVCache, layer: jnp.ndarray,
                       k_new: jnp.ndarray, v_new: jnp.ndarray,
                       num_blocks: int,
                       start_blocks: jnp.ndarray | None = None
                       ) -> PagedKVCache:
    """Prefill write for a whole batch.

    k_new/v_new: [B, T, Hkv, D] with T = num_blocks · page_size. Each
    sequence's page-table entries [start, start + num_blocks) must be
    allocated; `start_blocks` ([B] int32, default 0) is the per-sequence
    first block — non-zero for a prefix-cache suffix prefill, where the
    blocks below it are SHARED pages that must not be written
    (engine/prefix_cache.py)."""
    B, T, H = k_new.shape[:3]
    ps = cache.page_size
    k_sc, v_sc = cache.k_scale, cache.v_scale
    if cache.quantized:
        from llm_inference_tpu.ops.quantization import (quantize_kv,
                                                        quantize_kv4)
        qfn = quantize_kv4 if cache.bits == 4 else quantize_kv
        k_new, ks = qfn(k_new)         # codes [B, T, H, D'], [B, T, H, 1]
        v_new, vs = qfn(v_new)
        sb = ks[..., 0].reshape(B, num_blocks, ps, H)     # slot-major pages
        vb_s = vs[..., 0].reshape(B, num_blocks, ps, H)
    # k/v widths may differ (deepseek MLA: latent_dim vs kv_lora_rank) —
    # page the two pools independently
    kb = k_new.reshape(B, num_blocks, ps, H,
                       k_new.shape[-1]).transpose(0, 1, 3, 2, 4)
    vb = v_new.reshape(B, num_blocks, ps, H,
                       v_new.shape[-1]).transpose(0, 1, 3, 2, 4)
    if start_blocks is None:
        pages = cache.page_table[:, :num_blocks]              # [B, nb]
    else:
        cols = start_blocks[:, None] + jnp.arange(num_blocks,
                                                  dtype=jnp.int32)[None]
        pages = jnp.take_along_axis(cache.page_table, cols, axis=1)
    idx_l = jnp.broadcast_to(layer, (B, num_blocks))
    k_pages = cache.k_pages.at[idx_l, pages].set(
        kb.astype(cache.k_pages.dtype))
    v_pages = cache.v_pages.at[idx_l, pages].set(
        vb.astype(cache.v_pages.dtype))
    if cache.quantized:
        k_sc = k_sc.at[idx_l, pages].set(sb)
        v_sc = v_sc.at[idx_l, pages].set(vb_s)
    return cache.replace(k_pages=k_pages, v_pages=v_pages,
                         k_scale=k_sc, v_scale=v_sc)


def gather_dense(cache: PagedKVCache, layer: int,
                 seq: int, length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Golden/debug helper: materialize a sequence's pages as dense
    [Hkv, length, D] arrays."""
    ps = cache.page_size
    nb = (length + ps - 1) // ps
    pages = cache.page_table[seq, :nb]
    k = cache.k_pages[layer, pages]            # [nb, Hkv, ps, D]
    v = cache.v_pages[layer, pages]
    k = k.transpose(1, 0, 2, 3).reshape(k.shape[1], nb * ps, -1)
    v = v.transpose(1, 0, 2, 3).reshape(v.shape[1], nb * ps, -1)
    return k[:, :length], v[:, :length]
