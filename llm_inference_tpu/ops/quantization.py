"""Weight-only quantization: INT8 and packed INT4, symmetric, per-channel or
group-wise sub-channel scales.

New capability vs the reference (FP32/FP16 only; its DataType enum lists INT8
but no kernel consumes it — reference: src/utils/tensor.h:20). This module is
the *representation + golden dequant path*; the fused dequant-matmul Pallas
kernels that hit HBM roofline live in ops/pallas/quant_matmul.py.

Conventions:
- Weights are stored [in_features (K), out_features (N)] so activations
  right-multiply: y = x @ W.
- INT8: q int8 [K, N]; INT4: two values packed per int8 along K — row 2k in
  the low nibble, row 2k+1 in the high nibble → q int8 [K//2, N].
- scale float32 [K/G, N] where G = group_size (G=K ⇒ per-channel, one group).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QTensor:
    """Quantized 2-D weight. Static (non-pytree) fields carry the format.

    INT4 packing is *block-local split-half*: the packed rows are divided
    into blocks of `block_rows` packed rows; within a block, packed row r
    holds original rows r (low nibble) and r + block_rows (high nibble).
    `block_rows` is invariant under slicing the row axis at block boundaries,
    which is exactly what tensor-parallel `shard_map` does to row-sharded
    weights — a local shard is itself a valid QTensor with the same
    `block_rows`. Single-chip weights use one block (block_rows = K//2).
    """
    q: jnp.ndarray                   # int8 [K, N] (int8) or [K//2, N] (int4 packed)
    scale: jnp.ndarray               # float32 [num_groups, N]
    bits: int = struct.field(pytree_node=False, default=8)
    group_size: int = struct.field(pytree_node=False, default=0)  # 0 = per-channel
    orig_dtype: str = struct.field(pytree_node=False, default="bfloat16")
    block_rows: int = struct.field(pytree_node=False, default=0)  # 0 = q.shape[0]
    # Column-blocked streaming layout (see to_blocked): 0 = row-major [K', N];
    # >0 = q is [..., N/block_n, K', block_n] and scale [..., N/block_n, G,
    # block_n], so one (n-block, k-tile) weight chunk is CONTIGUOUS in HBM —
    # the Pallas decode GEMV streams these at ~87% of HBM bandwidth vs ~25%
    # for strided [bk, bn] tiles of a row-major weight (measured on v5e).
    block_n: int = struct.field(pytree_node=False, default=0)
    # Asymmetric quantization: dequant is w = q·scale + zbias with zbias
    # float32 [num_groups, N] (None = symmetric). The matmul correction is
    # a per-group activation row-sum times zbias — one FMA per group per
    # output element, folded into the same pass as the scales.
    zbias: jnp.ndarray = None
    # INT4 nibble axis: "k" (default, block-local split-half along rows —
    # see class docstring) or "n" (N-PAIR: byte (k, j) of an output block of
    # width block_n holds column j's code + 8 in the low nibble and column
    # j + block_n/2's code, signed, in the high nibble, both at the SAME
    # row k). "n" packing exists only in the blocked layout
    # (to_blocked_npair) and enables the difference-of-dots unpack in the
    # Pallas kernel: dot(x, raw_bytes) and dot(x, bytes & 0xF) recover the
    # hi-nibble dot as (d1 − d2)/16 — no floor/mul hi extraction on the VPU
    # (scripts/proto_int4_unpack.py kern_diffdot).
    pack_axis: str = struct.field(pytree_node=False, default="k")

    @property
    def in_features(self) -> int:
        if self.bits == 4 and self.pack_axis == "n":
            return self.q.shape[-2]          # rows are unpacked K
        # packed-K is axis -2 in both layouts: [..., K', N] / [..., NB, K', bn]
        return self.q.shape[-2] * (2 if self.bits == 4 else 1)

    @property
    def out_features(self) -> int:
        if self.block_n:
            return self.q.shape[-3] * self.block_n
        return self.q.shape[-1]

    @property
    def shape(self):
        return (self.in_features, self.out_features)


ArrayOrQ = Union[jnp.ndarray, QTensor]


def _pack_int4(q: jnp.ndarray, blocks: int = 1) -> jnp.ndarray:
    """Pack int4 values in [-8, 7] (held in int8 [..., K, N]) → int8
    [..., K//2, N].

    Block-local split-half layout (see QTensor docstring): within each of
    `blocks` equal row-blocks, packed row r holds original row r in the low
    nibble and row r + block_K/2 in the high nibble. Unpacking is two
    arithmetic shifts + a concat along the sublane axis — no row interleave —
    which the Pallas dequant-matmul kernel exploits.
    """
    *ld, K, N = q.shape
    assert K % (2 * blocks) == 0, (K, blocks)
    qb = q.reshape(*ld, blocks, K // blocks, N)
    half = K // blocks // 2
    lo = qb[..., :half, :] & 0x0F
    hi = (qb[..., half:, :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8).reshape(*ld, K // 2, N)


def _unpack_int4(packed: jnp.ndarray, block_rows: int = 0) -> jnp.ndarray:
    """Unpack int8 [K//2, N] → int4 values as int8 [K, N] (sign-extended)."""
    P, N = packed.shape
    block_rows = block_rows or P
    blocks = P // block_rows
    pb = packed.reshape(blocks, block_rows, N)
    lo = jnp.right_shift(jnp.left_shift(pb, 4), 4)  # arithmetic ⇒ sign-extend
    hi = jnp.right_shift(pb, 4)
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * P, N)


def quantize(
    w: jnp.ndarray,
    bits: int = 8,
    group_size: int = 0,
    pack_blocks: int = 1,
    asymmetric: bool = False,
) -> QTensor:
    """Quantization of a [K, N] weight.

    Symmetric (default): scale = max|w| per (group, column) / qmax;
    q = round(w / scale).
    Asymmetric: scale = (max−min)/(2^bits−1), zbias = min + 2^(bits−1)·scale
    so q = round((w − zbias)/scale) uses the full signed code range —
    dequant is w ≈ q·scale + zbias. Halves the effective step for skewed
    weight groups (the usual INT4 Δppl win).

    `pack_blocks`: number of row-blocks for INT4 packing — set to the
    tensor-parallel degree for row-sharded weights so each shard's slice is
    self-contained (see QTensor docstring).
    """
    assert w.ndim == 2, f"expected 2-D weight, got {w.shape}"
    K, N = w.shape
    if group_size <= 0 or group_size >= K:
        group_size_eff = K
    else:
        assert K % group_size == 0, (K, group_size)
        group_size_eff = group_size
    num_groups = K // group_size_eff
    qmax = float(2 ** (bits - 1) - 1)

    w32 = w.astype(jnp.float32).reshape(num_groups, group_size_eff, N)
    zbias = None
    if asymmetric:
        wmin = jnp.min(w32, axis=1, keepdims=True)                 # [G#,1,N]
        wmax = jnp.max(w32, axis=1, keepdims=True)
        scale = jnp.maximum((wmax - wmin) / (2 ** bits - 1), 1e-8)
        zb = wmin + (qmax + 1) * scale           # code −2^(b−1) ↦ wmin
        q = jnp.clip(jnp.round((w32 - zb) / scale), -qmax - 1, qmax)
        zbias = zb[:, 0, :]
    else:
        absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)      # [G#,1,N]
        scale = jnp.maximum(absmax / qmax, 1e-8)
        q = jnp.clip(jnp.round(w32 / scale), -qmax - 1, qmax)
    q = q.reshape(K, N).astype(jnp.int8)
    block_rows = 0
    if bits == 4:
        q = _pack_int4(q, pack_blocks)
        block_rows = K // 2 // pack_blocks
    elif bits != 8:
        raise ValueError(f"unsupported bits={bits}")
    return QTensor(q=q, scale=scale.reshape(num_groups, N),
                   bits=bits, group_size=group_size,
                   orig_dtype=str(w.dtype), block_rows=block_rows,
                   zbias=zbias)


def choose_block_n(K_packed: int, N: int, target_bytes: int = 3 << 20,
                   itemsize: int = 1, quantum: int = 128) -> int:
    """Pick a streaming column-block width: a multiple of `quantum` dividing
    N, keeping one [K', bn] chunk at or under target_bytes (VMEM
    double-buffer budget), as large as possible. 0 if N has no
    quantum-multiple divisor. quantum=256 for the N-pair int4 layout (its
    kernel slices scale rows at bn/2, which must be lane-aligned)."""
    best = 0
    bn = quantum
    while bn <= N:
        if N % bn == 0:
            if K_packed * bn * itemsize <= target_bytes:
                best = bn
            else:
                break
        bn += quantum
    return best


def to_blocked(qt: QTensor, block_n: int) -> QTensor:
    """Re-lay a row-major QTensor into the column-blocked streaming layout:
    q [..., K', N] → [..., N/bn, K', bn]; scale [..., G, N] → [..., N/bn, G,
    bn]. Pure transpose — values unchanged. See QTensor.block_n."""
    assert qt.block_n == 0, "already blocked"
    *lead, Kp, N = qt.q.shape
    assert N % block_n == 0, (N, block_n)
    return QTensor(q=_blk(qt.q, block_n), scale=_blk(qt.scale, block_n),
                   bits=qt.bits, group_size=qt.group_size,
                   orig_dtype=qt.orig_dtype, block_rows=qt.block_rows,
                   block_n=block_n,
                   zbias=None if qt.zbias is None else _blk(qt.zbias,
                                                            block_n))


def to_blocked_dense(w: jnp.ndarray, block_n: int) -> QTensor:
    """Wrap a DENSE [..., K, N] weight as a bits=16 column-blocked
    streaming QTensor: q = bf16 codes [..., N/bn, K, bn] (each chunk
    contiguous in HBM — the same ~87%-of-bandwidth streaming the int8
    kernel gets), scale = ones (never applied by the kernel). This is the
    dense-bf16 decode attack (VERDICT r3 #4): XLA's own [1,K]×[K,N] GEMV
    reads the row-major weight at a fraction of bandwidth; the blocked
    kernel path reuses the whole quantized dispatch (stacked layer
    indexing, fused norm prologue, pair-carry) with dequant skipped."""
    *lead, K, N = w.shape
    assert N % block_n == 0, (N, block_n)
    q = _blk(w.astype(jnp.bfloat16), block_n)
    scale = jnp.ones((*lead, N // block_n, 1, block_n), jnp.float32)
    return QTensor(q=q, scale=scale, bits=16, group_size=0,
                   orig_dtype=str(w.dtype), block_n=block_n)


def dense_blocked_qtensor(q: jnp.ndarray) -> QTensor:
    """Wrap an ALREADY-blocked bf16 array [..., NB, K, bn] as a bits=16
    QTensor (bench path: random weights are generated straight into the
    blocked layout — no 2x-HBM re-layout transient on a 16 GB chip)."""
    *lead, NB, K, bn = q.shape
    scale = jnp.ones((*lead, NB, 1, bn), jnp.float32)
    return QTensor(q=q.astype(jnp.bfloat16), scale=scale, bits=16,
                   group_size=0, orig_dtype="bfloat16", block_n=bn)


def _blk(a, block_n):
    *ld, r, n = a.shape
    return a.reshape(*ld, r, n // block_n, block_n).swapaxes(-3, -2)


def _unblk(a):
    *ld, nb, r, bn = a.shape
    return a.swapaxes(-3, -2).reshape(*ld, r, nb * bn)


def to_blocked_npair(qt: QTensor, block_n: int) -> QTensor:
    """Re-lay a row-major split-half INT4 QTensor into the column-blocked
    streaming layout with N-PAIR nibble packing (QTensor.pack_axis == "n"):
    q [..., K/2, N] → [..., N/bn, K, bn/2] where byte (k, j) of block n
    holds the codes of output columns n·bn+j (low nibble, stored +8,
    unsigned) and n·bn+bn/2+j (high nibble, signed) at row k. Values
    unchanged. Requires bn % 256 == 0 (the kernel's scale-row slice at
    offset bn/2 must be lane-aligned)."""
    assert qt.bits == 4 and qt.pack_axis == "k" and qt.block_n == 0, (
        qt.bits, qt.pack_axis, qt.block_n)
    assert block_n % 256 == 0, block_n
    *lead, Kp, N = qt.q.shape
    assert N % block_n == 0, (N, block_n)
    br = qt.block_rows or Kp

    def pack2d(q2):                                   # [Kp, N] → [nb, K, bnp]
        nb, bnp = N // block_n, block_n // 2
        # unpack split-half codes → [K, N] int8 in [-8, 7]
        pb = q2.reshape(Kp // br, br, N)
        lo = jnp.right_shift(jnp.left_shift(pb, 4), 4)
        hi = jnp.right_shift(pb, 4)
        codes = jnp.concatenate([lo, hi], axis=-2).reshape(2 * Kp, N)
        # pair columns (j, j + bn/2) within each bn block
        cb = codes.reshape(2 * Kp, nb, 2, bnp).astype(jnp.int32)
        lo_u = cb[..., 0, :] + 8                      # [K, nb, bnp]
        hi_s = cb[..., 1, :]
        packed = (((hi_s & 0xF) << 4) | lo_u).astype(jnp.int8)
        return jnp.moveaxis(packed, -2, -3)           # [nb, K, bnp]

    if lead:
        # layer-by-layer: at full [L, K, N] the int32 unpack intermediates
        # transiently need ~4x the packed bytes in HBM (a 7B gate-up stack
        # OOM'd a 16 GB chip); lax.map runs one layer's transform at a time
        packed = jax.lax.map(pack2d, qt.q.reshape(-1, Kp, N))
        packed = packed.reshape(*lead, *packed.shape[1:])
    else:
        packed = pack2d(qt.q)
    return QTensor(q=packed, scale=_blk(qt.scale, block_n), bits=4,
                   group_size=qt.group_size, orig_dtype=qt.orig_dtype,
                   block_rows=0, block_n=block_n, pack_axis="n",
                   zbias=None if qt.zbias is None else _blk(qt.zbias,
                                                            block_n))


def _unpack_npair_blocked(packed: jnp.ndarray) -> jnp.ndarray:
    """Unpack blocked N-pair int4 [..., NB, K, bn/2] → codes
    [..., NB, K, bn] int8 in [-8, 7] (block-local natural column order)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8         # undo the +8 offset
    hi = jnp.right_shift(packed, 4)                  # arithmetic ⇒ signed
    return jnp.concatenate([lo, hi], axis=-1)


def from_blocked(qt: QTensor) -> QTensor:
    """Inverse of to_blocked (row-major [..., K', N] layout)."""
    if not qt.block_n:
        return qt
    if qt.pack_axis == "n":
        # unpack to codes, re-lay row-major, re-pack split-half (one block)
        codes = _unblk(_unpack_npair_blocked(qt.q))  # [..., K, N]
        return QTensor(q=_pack_int4(codes), scale=_unblk(qt.scale),
                       bits=4, group_size=qt.group_size,
                       orig_dtype=qt.orig_dtype,
                       block_rows=codes.shape[-2] // 2, block_n=0,
                       zbias=None if qt.zbias is None else _unblk(qt.zbias))
    return QTensor(q=_unblk(qt.q), scale=_unblk(qt.scale), bits=qt.bits,
                   group_size=qt.group_size, orig_dtype=qt.orig_dtype,
                   block_rows=qt.block_rows, block_n=0,
                   zbias=None if qt.zbias is None else _unblk(qt.zbias))


def dequantize(qt: QTensor, dtype=None) -> jnp.ndarray:
    """Golden dequantization back to a dense [K, N] array."""
    qt = from_blocked(qt)
    dtype = dtype or qt.orig_dtype
    q = qt.q if qt.bits == 8 else _unpack_int4(qt.q, qt.block_rows)
    K, N = q.shape
    num_groups = qt.scale.shape[0]
    gsize = K // num_groups
    w = q.astype(jnp.float32).reshape(num_groups, gsize, N) * qt.scale[:, None, :]
    if qt.zbias is not None:
        w = w + qt.zbias[:, None, :]
    return w.reshape(K, N).astype(dtype)


def qmatmul_ref(x: jnp.ndarray, qt: QTensor, dtype=None) -> jnp.ndarray:
    """Reference quantized matmul: x [..., K] @ dequant(W) [K, N].

    For per-channel scales the dot runs on the raw int8 weight and the scale
    is applied to the OUTPUT (one multiply per output element instead of one
    per weight) — mathematically identical for symmetric quant, and it lets
    XLA feed int8→bf16-converted tiles straight into the MXU.
    """
    dtype = dtype or x.dtype
    if qt.block_n:
        return _qmatmul_ref_blocked(x, qt, dtype)
    q = (qt.q if qt.bits in (8, 16)
         else _unpack_int4(qt.q, qt.block_rows))
    num_groups = qt.scale.shape[0]
    if num_groups == 1:
        y = jnp.dot(x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        y = y * qt.scale[0][(None,) * (y.ndim - 1)]
        if qt.zbias is not None:
            xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
            y = y + xsum * qt.zbias[0][(None,) * (y.ndim - 1)]
        return y.astype(dtype)
    K, N = q.shape
    gsize = K // num_groups
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], num_groups, gsize)
    wg = q.astype(jnp.float32).reshape(num_groups, gsize, N)
    # per-group partial dots, scaled then summed: [..., G#, N]
    partial = jnp.einsum("...gk,gkn->...gn", xg, wg,
                         preferred_element_type=jnp.float32)
    partial = partial * qt.scale[:, :]
    if qt.zbias is not None:
        # asymmetric correction: per-group activation row-sums × zbias
        partial = partial + xg.sum(-1)[..., None] * qt.zbias[:, :]
    y = jnp.sum(partial, axis=-2)
    return y.astype(dtype)


def _unpack_int4_blocked(packed: jnp.ndarray, block_rows: int) -> jnp.ndarray:
    """Unpack blocked int4 [NB, Kp, bn] → int8 values [NB, 2·Kp, bn]."""
    NB, Kp, bn = packed.shape
    br = block_rows or Kp
    blocks = Kp // br
    pb = packed.reshape(NB, blocks, br, bn)
    lo = jnp.right_shift(jnp.left_shift(pb, 4), 4)
    hi = jnp.right_shift(pb, 4)
    return jnp.concatenate([lo, hi], axis=2).reshape(NB, 2 * Kp, bn)


def _qmatmul_ref_blocked(x: jnp.ndarray, qt: QTensor, dtype) -> jnp.ndarray:
    """XLA path for the blocked layout — used for prefill (M large, MXU-bound)
    and as the golden model; avoids ever re-laying the weight at call time."""
    if qt.bits in (8, 16):
        q3 = qt.q
    elif qt.pack_axis == "n":
        q3 = _unpack_npair_blocked(qt.q)
    else:
        q3 = _unpack_int4_blocked(qt.q, qt.block_rows)
    NB, K, bn = q3.shape
    G = qt.scale.shape[-2]
    x2 = x.reshape(-1, K)
    if G == 1:
        y3 = jnp.einsum("mk,nkb->mnb", x2.astype(jnp.bfloat16),
                        q3.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        y3 = y3 * qt.scale[:, 0, :][None]
        if qt.zbias is not None:
            xsum = jnp.sum(x2.astype(jnp.float32), -1)       # [M]
            y3 = y3 + xsum[:, None, None] * qt.zbias[:, 0, :][None]
    else:
        gsize = K // G
        w3 = (q3.astype(jnp.float32).reshape(NB, G, gsize, bn)
              * qt.scale[:, :, None, :])
        if qt.zbias is not None:
            w3 = w3 + qt.zbias[:, :, None, :]
        w3 = w3.reshape(NB, K, bn)
        y3 = jnp.einsum("mk,nkb->mnb", x2.astype(jnp.bfloat16),
                        w3.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return y3.reshape(*x.shape[:-1], NB * bn).astype(dtype)


# ---------------------------------------------------------------------------
# KV-cache INT8 quantization (per-token, per-head scales).
# ---------------------------------------------------------------------------

def quantize_kv(x: jnp.ndarray):
    """Quantize KV entries [..., D] → (int8 [..., D], scale float32 [..., 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_kv4(x: jnp.ndarray):
    """INT4 KV quantization: [..., D] → (packed int8 [..., D/2],
    scale float32 [..., 1]).

    Split-half nibble packing along head_dim with OFFSET-LO encoding:
    packed byte d holds dim d + 8 (unsigned, low nibble) and dim d + D/2
    (signed, high nibble), i.e. the signed byte value is 16·hi + lo_u.
    This makes every unpack in the attention kernels a LINEAR fold:
    hi = byte >> 4 exactly (arithmetic shift, since lo_u ∈ [0,15]);
    the lo dot's −8 offset folds into one rowsum-FMA; and the V-side
    hi dot falls out of a difference of dots, (dot(p, bytes) −
    dot(p, lo_u))/16 — no floor/mul nibble extraction on the VPU.
    Scales are per-(token, head) like the int8 path (absmax/7)."""
    D = x.shape[-1]
    assert D % 2 == 0, D
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7
                 ).astype(jnp.int32)
    lo_u = q[..., :D // 2] + 8                        # [0, 15]
    hi = q[..., D // 2:]
    return (((hi & 0xF) << 4) | lo_u).astype(jnp.int8), scale


def unpack_kv4(packed: jnp.ndarray) -> jnp.ndarray:
    """Unpack int4 KV codes [..., D/2] → int8 values [..., D] (split-half
    order, offset-lo encoding — see quantize_kv4)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = jnp.right_shift(packed, 4)                   # arithmetic ⇒ exact
    return jnp.concatenate([lo, hi], axis=-1)


def dequantize_kv4(packed: jnp.ndarray, scale: jnp.ndarray,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    return (unpack_kv4(packed).astype(jnp.float32) * scale).astype(dtype)
