"""Fused weight-dequant matmul (INT8 / packed INT4) — Pallas TPU kernel.

The decode-roofline kernel: at batch≲32 every decoder matmul is HBM-bound on
weight bytes, so the win over a dense bf16 matmul is exactly the 2×/4×
byte reduction — PROVIDED the dequant happens in VMEM after the DMA, never
materializing dequantized weights in HBM. XLA cannot guarantee that fusion;
this kernel does it by construction.

(Reference analogue: none — the reference is FP32/FP16 cuBLAS only,
src/kernels/cublas_utils.h:15-76. This is a new capability from the north
star: "weight-only INT8/INT4 dequant fused into every matmul".)

Design:
- Grid (N/bn, K/bk), k innermost ("arbitrary"), n parallel. The weight tile
  [bk, bn] streams HBM→VMEM double-buffered by the pallas pipeline while the
  MXU consumes the previous tile; an f32 scratch accumulates per n-tile.
- Activations [M, K] sit wholly in VMEM (M ≤ 64 after padding) and are sliced
  per k-step — decode batches are tiny, so this costs ≤ a few hundred KB.
- INT8 per-channel: the dot runs on the raw int8 tile converted to bf16 and
  the per-column scale is applied once to the f32 accumulator at the last
  k-step (exact for symmetric quant, cheaper and more precise than scaling
  weights).
- Group-wise (sub-channel) scales: the scale rows for each k-tile arrive via
  their own blocked input (Mosaic can't prove alignment of an in-kernel
  sublane-dim dynamic slice) and the weight tile is dequantized in VMEM (VPU
  multiply) before the dot.
- INT4 uses block-local split-half packing (quantization.QTensor): a packed
  tile maps to two x/scale slices (low/high nibbles) whose offsets are pure
  functions of the grid index, so both ride the pipeline as separate blocked
  inputs.

Large-M (prefill) inputs fall back to the XLA path (qmatmul_ref): prefill is
MXU-bound, where dense bf16 dots are already optimal.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret
from llm_inference_tpu.ops.quantization import QTensor, qmatmul_ref

# Above this many rows the XLA dense path wins (MXU-bound regime).
_PALLAS_MAX_M = 64


def _pick_block(dim: int, preferred: int, step: int = 128) -> Optional[int]:
    """Largest multiple of `step` that is ≤ preferred and divides dim."""
    b = min(preferred, dim)
    b -= b % step
    while b >= step:
        if dim % b == 0:
            return b
        b -= step
    return None


def _kernel(x_ref, w_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref, *,
            bits: int, bk: int, block_rows: int, group_size: int,
            per_channel: bool, tiles_per_block: int):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpt = max(bk // group_size, 1)   # scale rows per (half-)tile

    if bits == 8:
        xk = x_ref[:, pl.ds(pl.multiple_of(k * bk, bk), bk)]
        if per_channel:
            acc_ref[:] += jnp.dot(xk, w_ref[:].astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
        else:
            w = w_ref[:].astype(jnp.float32)
            w = w.reshape(-1, group_size, w.shape[-1])
            w = (w * s_lo_ref[0:gpt][:, None, :]).reshape(bk, -1)
            acc_ref[:] += jnp.dot(xk, w.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
    else:  # int4, block-local split-half packed (quantization.QTensor):
        # packed tile k sits inside block b = k // tiles_per_block; it covers
        # original rows [lo_start, +bk) (low nibbles) and [lo_start +
        # block_rows, +bk) (high nibbles). Tiles never straddle blocks.
        b = k // tiles_per_block
        lo_tile = k + b * tiles_per_block
        lo_start = pl.multiple_of(lo_tile * bk, bk)
        hi_start = pl.multiple_of(lo_start + block_rows, bk)
        # nibble extraction in i32 — Mosaic has no i8 vector shifts; the
        # shl/ashr pair sign-extends the 4-bit values
        p32 = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
        x_lo = x_ref[:, pl.ds(lo_start, bk)]
        x_hi = x_ref[:, pl.ds(hi_start, bk)]
        if per_channel:
            acc_ref[:] += jnp.dot(x_lo, lo.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.dot(x_hi, hi.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
        else:
            n_cols = p32.shape[-1]
            w_lo = (lo.astype(jnp.float32).reshape(-1, group_size, n_cols)
                    * s_lo_ref[0:gpt][:, None, :]).reshape(bk, n_cols)
            w_hi = (hi.astype(jnp.float32).reshape(-1, group_size, n_cols)
                    * s_hi_ref[0:gpt][:, None, :]).reshape(bk, n_cols)
            acc_ref[:] += jnp.dot(x_lo, w_lo.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.dot(x_hi, w_hi.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[:]
        if per_channel:
            acc = acc * s_lo_ref[0, :][None, :]
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size",
                                             "block_rows", "block_n",
                                             "block_k", "interpret"))
def _quant_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                     *, bits: int, group_size: int, block_rows: int,
                     block_n: int, block_k: int, interpret: bool) -> jnp.ndarray:
    M, K = x.shape
    N = q.shape[1]
    num_groups = scale.shape[0]
    per_channel = num_groups == 1
    kdim = q.shape[0]                    # packed rows for int4, K for int8
    nk = kdim // block_k
    gsize = K // num_groups              # == group_size or K
    gpt = block_k // gsize if not per_channel else 1   # scale rows per tile
    tiles_per_block = max(block_rows // block_k, 1)    # int4 only

    # Per-k-tile scale layout: Mosaic requires block sublane dims divisible
    # by 8 (or full), and can't prove alignment of in-kernel sublane-dim
    # dynamic slices — so gather each tile's scale rows into its own padded
    # 8-row-aligned band and let the pipeline deliver band k at step k.
    if per_channel:
        s_lo = s_hi = scale
        s_block = (1, block_n)
        s_lo_map = s_hi_map = lambda n, k: (0, n)
    else:
        srows = ((gpt + 7) // 8) * 8
        if bits == 8:
            lo_idx = np.arange(nk)[:, None] * gpt + np.arange(gpt)[None, :]
            hi_idx = lo_idx
        else:
            R = tiles_per_block
            t = np.arange(nk)
            lo_group0 = (t + (t // R) * R) * (block_k // gsize)
            lo_idx = lo_group0[:, None] + np.arange(gpt)[None, :]
            hi_idx = lo_idx + block_rows // gsize

        def tile_scales(idx):
            s = jnp.take(scale, idx.reshape(-1), axis=0)     # [nk*gpt, N]
            s = s.reshape(nk, gpt, N)
            s = jnp.pad(s, ((0, 0), (0, srows - gpt), (0, 0)))
            return s.reshape(nk * srows, N)

        s_lo = tile_scales(lo_idx)
        s_hi = tile_scales(hi_idx) if bits == 4 else s_lo
        s_block = (srows, block_n)
        s_lo_map = s_hi_map = lambda n, k: (k, n)

    grid = (N // block_n, nk)
    kernel = functools.partial(
        _kernel, bits=bits, bk=block_k, block_rows=block_rows,
        group_size=gsize, per_channel=per_channel,
        tiles_per_block=tiles_per_block)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s_block, s_lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(s_block, s_hi_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=q.size * q.dtype.itemsize + M * K * 2 + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, q, s_lo, s_hi)
    return out


def quant_matmul(x: jnp.ndarray, qt: QTensor,
                 block_n: int = 256, block_k: int = 512) -> jnp.ndarray:
    """y = x @ dequant(qt). x: [..., K]; returns [..., N] in x.dtype."""
    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    if M > _PALLAS_MAX_M:
        return qmatmul_ref(x, qt)

    N = qt.out_features
    kdim = qt.q.shape[0]
    num_groups = qt.scale.shape[0]
    gsize = K // num_groups

    block_rows = (qt.block_rows or kdim) if qt.bits == 4 else kdim
    bn = _pick_block(N, block_n)
    bk = _pick_block(min(kdim, block_rows), block_k)
    # group boundaries must align with k-tiles (each int4 packed tile spans
    # `bk` original rows in each half, so the same bk % gsize == 0 condition
    # applies to both formats)
    if bk is not None and num_groups > 1 and bk % gsize != 0:
        bk = _pick_block(kdim, gsize) if gsize % 128 == 0 else None
    ok = bn is not None and bk is not None
    if ok and qt.bits == 4:
        # tiles must not straddle pack blocks; groups must not either
        ok = (block_rows % bk == 0 and
              (num_groups == 1 or block_rows % gsize == 0))
    if not ok:
        return qmatmul_ref(x, qt)

    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    m_pad = max(8, M)
    if m_pad != M:
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
    out = _quant_matmul_2d(x2, qt.q, qt.scale,
                           bits=qt.bits, group_size=qt.group_size,
                           block_rows=block_rows,
                           block_n=bn, block_k=bk,
                           interpret=use_interpret())
    out = out[:M].reshape(*lead, N)
    return out.astype(x.dtype)
