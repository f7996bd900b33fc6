"""Fused weight-dequant matmul (INT8 / packed INT4) — Pallas TPU kernel.

The decode-roofline kernel: at batch≲32 every decoder matmul is HBM-bound on
weight bytes, so the win over a dense bf16 matmul is exactly the 2×/4×
byte reduction — PROVIDED the dequant happens in VMEM after the DMA, never
materializing dequantized weights in HBM. XLA cannot guarantee that fusion;
this kernel does it by construction.

(Reference analogue: none — the reference is FP32/FP16 cuBLAS only,
src/kernels/cublas_utils.h:15-76. This is a new capability from the north
star: "weight-only INT8/INT4 dequant fused into every matmul".)

Design (v2 — column-blocked streaming layout):
- The weight lives in HBM as q3 [N/bn, K', bn] (quantization.to_blocked), so
  grid step n DMAs ONE CONTIGUOUS K'×bn chunk. Measured on v5e: contiguous
  chunks stream at ~87% of HBM bandwidth, vs ~25% for [bk, bn] tiles of a
  row-major [K', N] weight (bn-byte stride defeats the DMA engine).
- Grid (N/bn,) only — the full contraction runs inside one grid step as a
  static loop over row-chunks, each chunk dequantized in VMEM (VPU) and fed
  to the MXU, accumulating in f32. No k-grid, no scratch accumulator, no
  dynamic slices: everything the Mosaic compiler sees is static.
- bn is chosen at weight-load time (quantization.choose_block_n) so one
  chunk is ≤ ~3 MB: big enough to hit bandwidth, small enough that the
  pipeline's two in-flight chunks + activations fit in ~16 MB VMEM.
- INT8 per-channel: the dot runs on the raw int8 chunk converted to bf16 and
  the per-column scale hits the f32 accumulator once (exact for symmetric
  quant, cheaper and more precise than scaling weights).
- Group-wise (sub-channel) scales: the full [G, bn] scale block rides along;
  row-chunks are dequantized with their static scale-row slice before the dot.
- INT4 block-local split-half packing (quantization.QTensor): each pack
  block's low/high nibbles map to two static x/scale row ranges; the row-
  chunk loop never straddles a pack block.

Activations [M, K] sit wholly in VMEM (M ≤ 64 after padding) — decode
batches are tiny. Large-M (prefill) inputs use the XLA path (qmatmul_ref):
prefill is MXU-bound, where dense bf16 dots are already optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret
from llm_inference_tpu.ops.quantization import QTensor, qmatmul_ref

# Above this many rows the XLA dense path wins (MXU-bound regime). 128 keeps
# the default prefill bucket on the kernel path — critical for INT4, where
# the XLA fallback re-unpacks nibbles elementwise and multiplies TTFT ~5x.
_PALLAS_MAX_M = 128
# Static row-chunk for in-VMEM dequant intermediates (int8 rows / packed rows).
_ROW_CHUNK = 2048


def _npair_unpack_floor():
    """npair hi-nibble extraction strategy. floor (default candidate):
    f = bytes→f32 (1 op), hi = floor(f·1/16) (2 ops) and the lo dot falls
    out ALGEBRAICALLY (d_lo = d1 − 16·d_hi − 8·xsum) — 3 VPU ops/byte.
    The AND path (LLMI_NPAIR_UNPACK=and) needs i8→i32, AND, i32→f32 for
    the lo operand plus i8→f32 for the raw bytes — 4 ops/byte. The GEMV
    measured marginally VPU-bound at decode widths, so the 25% VPU cut
    is the lever (chip A/B)."""
    import os
    return os.environ.get("LLMI_NPAIR_UNPACK", "floor") == "floor"


def _npair_dot_dtype():
    """MXU dot dtype for the npair difference-of-dots (exact either way —
    the operands are small integers). f32 is the measured default: the
    i8→f32 convert is one VPU op where i8→bf16 costs extra, and the GEMV
    is DMA-bound so the MXU's slower f32 path rides free (round-3 chip
    A/B: f32 5.82 ms/step vs bf16 6.08 end-to-end; 53.7 vs 69.8 µs on the
    standalone gate_up block). LLMI_NPAIR_DOT=bf16 re-runs that A/B."""
    import os
    return (jnp.bfloat16 if os.environ.get("LLMI_NPAIR_DOT") == "bf16"
            else jnp.float32)


def _npair_groupdot():
    """Round-5 experiment (LLMI_NPAIR_GROUPDOT=1): merge several scale
    groups into ONE M-stacked MXU dot. The grouped npair GEMV issues two
    [1, gsize]×[gsize, bn] dots PER GROUP (64 MXU invocations per 4096-K
    block at g=128); stacking G groups as a block-diagonal [G, K_chunk]
    activation matrix computes the same per-group partial dots as rows of
    one [G, K_chunk]×[K_chunk, bn] dot — the MXU processes M ≤ 8 rows in
    the same passes as M = 1, so the dot count drops ~4× and the VPU→MXU
    ping-pong with it. Scale application moves to a [G, bn] weighted
    column-sum on the VPU (cheap). Exactness unchanged: same dots, same
    f32 accumulation, scales still applied post-dot per group."""
    import os
    return os.environ.get("LLMI_NPAIR_GROUPDOT") == "1"


def _pad8_m():
    """Whether to pad GEMV activations 1→8 rows outside the kernel
    (round-2 behavior; LLMI_QMM_PAD8=1 restores it for A/B). Unpadded
    M=1 removes ~4 jnp.pad + output-slice XLA ops per layer per step."""
    import os
    return os.environ.get("LLMI_QMM_PAD8") == "1"


def _prefill_kernel_on():
    """Whether M > _PALLAS_MAX_M (prefill-sized) matmuls use the m-tiled
    Pallas path instead of the XLA einsum fallback (LLMI_QMM_PREFILL=0
    reverts). Chip-validated default: each packed weight block unpacks
    ONCE into a raw-bf16-code VMEM scratch and serves every m-tile
    (_tiled_kernel) — 7B T=4096 int8 runs the four GEMMs at ~89-90% of
    the MXU SoL (302 ms vs the XLA einsum's 323), and int4 prefill stays
    on kernels instead of the elementwise-unpack XLA path (int4 T=4096
    TTFT 548 ms ≈ int8's)."""
    import os
    return os.environ.get("LLMI_QMM_PREFILL") != "0"


# m-tile rows for the prefill-sized kernel path: 2 MXU row-passes per dot,
# x tile [bm, K] ≤ 2 MB at K=4096.
_PREFILL_BM = 256


def _kernel(lyr_ref, x_ref, w_ref, s_ref, *rest, bits: int,
            block_rows: int, gsize: int, per_channel: bool,
            asym: bool, npair: bool, norm_eps: float = 0.0,
            has_res: bool = False, want_x_out: bool = False):
    """rest order: [z_ref if asym][g_ref if norm_eps][res_ref if has_res]
    then o_ref [, xout_ref if want_x_out].

    norm_eps > 0 fuses the layer-entry RMSNorm (and optional residual
    add) into the GEMV: x ← rms_norm(x (+ res)) · gamma computed in f32
    in VMEM — the separate XLA reduce/apply/add fusions (and their
    per-op dispatch gaps) disappear from the decode step. want_x_out
    additionally writes the PRE-norm sum (the new residual stream) once,
    at grid step 0."""
    rest = list(rest)
    z_ref = rest.pop(0) if asym else None
    g_ref = rest.pop(0) if norm_eps > 0.0 else None
    res_ref = rest.pop(0) if has_res else None
    o_ref = rest.pop(0)
    xout_ref = rest.pop(0) if want_x_out else None
    xn_ref = rest.pop(0) if (has_res or norm_eps > 0.0) else None
    x = x_ref[:]                       # [M, K] bf16
    if has_res or norm_eps > 0.0:
        # fused prologue ONCE, into VMEM scratch — later grid steps reuse
        @pl.when(pl.program_id(0) == 0)
        def _():
            x32 = x.astype(jnp.float32)
            if has_res:
                x32 = x32 + res_ref[:].astype(jnp.float32)
            if want_x_out:
                xout_ref[:] = x32.astype(xout_ref.dtype)
            if norm_eps > 0.0:
                var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
                x32 = x32 * jax.lax.rsqrt(var + norm_eps)
                x32 = x32 * g_ref[0].astype(jnp.float32)  # [1, K] bcast
            xn_ref[:] = x32
        x = xn_ref[:]                  # f32; branches cast per chunk
    w = w_ref[0, 0]                    # [Kp, bn] int8 (packed rows for int4)
    Kp, bn = w.shape
    M = x.shape[0]

    if bits == 16:                     # DENSE bf16 streaming (no dequant):
        acc = jnp.dot(x.astype(jnp.bfloat16), w,   # scale is ones, unused
                      preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)
        return

    if npair:                          # int4, N-pair difference-of-dots
        # Byte (k, j) packs output columns j (lo, stored +8, unsigned) and
        # j + bn of this block at the SAME row k (quantization
        # to_blocked_npair), so the hi-nibble dot falls out of two dots
        # that SHARE the x operand: d_hi = (dot(x, bytes) − dot(x,
        # bytes & 0xF))/16 — the floor/mul hi extraction leaves the VPU
        # entirely (2 converts + 1 AND per byte vs 3 converts + floor +
        # mul for the split-half path). Dot dtype (_npair_dot_dtype): raw
        # bytes are ints in [-128, 127] and lo-nibbles in [0, 15], both
        # EXACT in bf16 as well as f32 — bf16 dots take the MXU's native
        # single-pass path where f32 dots take several passes, and at
        # GEMV widths the two back-to-back dots can make the MXU the
        # bottleneck. LLMI_NPAIR_DOT=f32|bf16 picks (chip A/B).
        dd = _npair_dot_dtype()
        floor_unpack = _npair_unpack_floor()
        acc_lo = jnp.zeros((M, bn), jnp.float32)
        acc_hi = jnp.zeros((M, bn), jnp.float32)
        # grouped: one chunk per scale group; per-channel: bound the f32
        # nibble intermediates ([ch, bn] ×2) to ~0.5 MB each
        ch = (min(Kp, _ROW_CHUNK, max(128, (1 << 19) // (bn * 4)))
              if per_channel else gsize)
        if (not per_channel and M == 1 and Kp % gsize == 0
                and _npair_groupdot()):
            # groups per stacked dot, bounded by the same ~0.5 MB f32
            # intermediate budget as the chunked path
            GP = max(1, min(4, ((1 << 19) // (bn * 4)) // gsize))
        else:
            GP = 1
        if GP > 1:
            s_all = s_ref[0, 0]                       # [nG, 2·bn]
            z_all = z_ref[0, 0] if asym else None
            acc_lo1 = jnp.zeros((1, bn), jnp.float32)
            acc_hi1 = jnp.zeros((1, bn), jnp.float32)
            for c0 in range(0, Kp, gsize * GP):
                gp = min(GP, (Kp - c0) // gsize)
                ch2 = gp * gsize
                wb = w[c0:c0 + ch2]
                xg = x[:, c0:c0 + ch2].astype(dd)     # [1, ch2]
                # block-diagonal [gp, ch2]: row r = x masked to group r.
                # Built from static lane-aligned concats — a broadcast of
                # the (possibly replicated-layout) x vector over sublanes
                # is rejected by Mosaic when the fused-norm prologue
                # produced x in VMEM scratch, and dynamic_update_slice has
                # no in-kernel lowering.
                rows = []
                for r in range(gp):
                    seg = xg[:, r * gsize:(r + 1) * gsize]
                    if r:
                        seg = jnp.concatenate(
                            [jnp.zeros((1, r * gsize), dd), seg], 1)
                    if r < gp - 1:
                        seg = jnp.concatenate(
                            [seg, jnp.zeros((1, (gp - 1 - r) * gsize),
                                            dd)], 1)
                    rows.append(seg)
                Xg = jnp.concatenate(rows, 0)
                f = wb.astype(jnp.float32)
                hi_s = jnp.floor(f * 0.0625)
                d1 = jnp.dot(Xg, f.astype(dd),
                             preferred_element_type=jnp.float32)
                d_hi = jnp.dot(Xg, hi_s.astype(dd),
                               preferred_element_type=jnp.float32)
                xsum_g = jnp.sum(Xg.astype(jnp.float32), -1,
                                 keepdims=True)       # [gp, 1]
                d_lo = d1 - 16.0 * d_hi - 8.0 * xsum_g
                g0 = c0 // gsize
                s_blk = s_all[g0:g0 + gp]             # [gp, 2·bn]
                acc_lo1 += jnp.sum(d_lo * s_blk[:, :bn], 0, keepdims=True)
                acc_hi1 += jnp.sum(d_hi * s_blk[:, bn:], 0, keepdims=True)
                if asym:
                    z_blk = z_all[g0:g0 + gp]
                    acc_lo1 += jnp.sum(xsum_g * z_blk[:, :bn], 0,
                                       keepdims=True)
                    acc_hi1 += jnp.sum(xsum_g * z_blk[:, bn:], 0,
                                       keepdims=True)
            o_ref[:] = jnp.concatenate([acc_lo1, acc_hi1],
                                       axis=1).astype(o_ref.dtype)
            return
        xsum_all = jnp.zeros((M, 1), jnp.float32)
        for c0 in range(0, Kp, ch):
            wb = w[c0:c0 + ch]
            xg = x[:, c0:c0 + ch].astype(dd)
            xsum = jnp.sum(xg.astype(jnp.float32), -1, keepdims=True)
            if floor_unpack:
                # byte = 16·hi_s + lo_u exactly; d_lo falls out of the
                # raw-byte dot algebraically — one convert+mul+floor per
                # byte, no integer ALU (see _npair_unpack_floor)
                f = wb.astype(jnp.float32)
                hi_s = jnp.floor(f * 0.0625)
                d1 = jnp.dot(xg, f.astype(dd),
                             preferred_element_type=jnp.float32)
                d_hi = jnp.dot(xg, hi_s.astype(dd),
                               preferred_element_type=jnp.float32)
                d_lo = d1 - 16.0 * d_hi - 8.0 * xsum
            else:
                bf = wb.astype(dd)
                lo_u = (wb & 0xF).astype(dd)
                d1 = jnp.dot(xg, bf, preferred_element_type=jnp.float32)
                d2 = jnp.dot(xg, lo_u, preferred_element_type=jnp.float32)
                d_lo = d2 - 8.0 * xsum              # undo the +8 offset
                d_hi = (d1 - d2) * 0.0625
            if per_channel:
                acc_lo += d_lo
                acc_hi += d_hi
                xsum_all += xsum
            else:
                g = c0 // gsize                     # ch == gsize
                # 2-D static row slices: a 1-D `s[g][None, :bn]` take
                # lowers as a >2-D gather, which Mosaic rejects
                s = s_ref[0, 0][g:g + 1]            # [1, 2·bn] f32
                acc_lo += d_lo * s[:, :bn]
                acc_hi += d_hi * s[:, bn:]
                if asym:
                    z = z_ref[0, 0][g:g + 1]
                    acc_lo += xsum * z[:, :bn]
                    acc_hi += xsum * z[:, bn:]
        acc = jnp.concatenate([acc_lo, acc_hi], axis=1)    # [M, 2·bn]
        if per_channel:
            # full-width [1, 2·bn] ops AFTER the concat: broadcasting a
            # lane-OFFSET slice (s[:, bn:]) trips a Mosaic layout error
            acc = acc * s_ref[0, 0][0:1]
            if asym:
                acc = acc + xsum_all * z_ref[0, 0][0:1]
        o_ref[:] = acc.astype(o_ref.dtype)
        return

    acc = jnp.zeros((M, bn), jnp.float32)

    # Group-wise scales are applied to the OUTPUT of per-group raw-code dots
    # (exact for symmetric quant: y_n = Σ_g s[g,n]·(x_g·Wq_g)_n). Dequantizing
    # weights in VMEM instead costs ~20 bytes of f32/bf16 intermediate
    # traffic per weight byte and measures ~10% slower on v5e.
    # Asymmetric quant adds the per-group zero-point as an OUTPUT-side
    # correction too: + rowsum(x_g)·zbias[g] — one reduce + FMA per group,
    # never a dequantized weight in VMEM.
    if bits == 8:
        if per_channel:
            acc = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            if asym:
                acc = acc * s_ref[0, 0][0][None, :]
                xsum = jnp.sum(x.astype(jnp.float32), -1, keepdims=True)
                acc = acc + xsum * z_ref[0, 0][0][None, :]
        else:
            for g in range(Kp // gsize):
                r0 = g * gsize
                xg = x[:, r0:r0 + gsize].astype(jnp.bfloat16)
                d = jnp.dot(xg, w[r0:r0 + gsize].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                acc += d * s_ref[0, 0][g][None, :]
                if asym:
                    xs = jnp.sum(xg.astype(jnp.float32), -1,
                                 keepdims=True)
                    acc += xs * z_ref[0, 0][g][None, :]
    else:  # int4, block-local split-half packing
        blocks = Kp // block_rows
        # the unpack materializes i32 lo/hi chunks in VMEM — bound them to
        # ~0.5 MB each so the scoped-vmem budget holds at any bn
        ch = min(block_rows, _ROW_CHUNK, max(128, (1 << 19) // (bn * 4)))
        if not per_channel:
            ch = gsize if gsize >= 8 else max(gsize, ch - ch % gsize)
        for b in range(blocks):
            base = b * block_rows           # packed-row base of this block
            xbase = b * 2 * block_rows      # original-row base
            for c0 in range(0, block_rows, ch):
                c1 = min(c0 + ch, block_rows)
                p32 = w[base + c0:base + c1].astype(jnp.int32)
                # f32 nibbles feeding f32 MXU dots: one convert per element
                # instead of two (i32→bf16 lowers via f32 anyway on v5e) —
                # the unpack is VPU-bound, the MXU is idle headroom at GEMV
                # widths; measured 38.9 → 37.4 µs on the 7B fused-qkv block
                # (scripts/proto_int4_unpack.py, interleaved 3-rep A/B)
                lo = jnp.right_shift(jnp.left_shift(p32, 28),
                                     28).astype(jnp.float32)
                hi = jnp.right_shift(jnp.left_shift(p32, 24),
                                     28).astype(jnp.float32)
                lo_r = xbase + c0               # original rows of lo nibbles
                hi_r = lo_r + block_rows
                x_lo = x[:, lo_r:lo_r + (c1 - c0)].astype(jnp.float32)
                x_hi = x[:, hi_r:hi_r + (c1 - c0)].astype(jnp.float32)
                d_lo = jnp.dot(x_lo, lo,
                               preferred_element_type=jnp.float32)
                d_hi = jnp.dot(x_hi, hi,
                               preferred_element_type=jnp.float32)
                if per_channel:
                    acc += d_lo + d_hi
                else:
                    # ch == gsize ⇒ each chunk is exactly one scale group
                    acc += d_lo * s_ref[0, 0][lo_r // gsize][None, :]
                    acc += d_hi * s_ref[0, 0][hi_r // gsize][None, :]
                    if asym:
                        acc += (jnp.sum(x_lo, -1, keepdims=True)
                                * z_ref[0, 0][lo_r // gsize][None, :])
                        acc += (jnp.sum(x_hi, -1, keepdims=True)
                                * z_ref[0, 0][hi_r // gsize][None, :])
        if per_channel:
            acc = acc * s_ref[0, 0][0][None, :]
            if asym:   # y = (Σ raw dots)·s + rowsum(x)·z — z NOT scaled
                xsum = jnp.sum(x.astype(jnp.float32), -1, keepdims=True)
                acc = acc + xsum * z_ref[0, 0][0][None, :]

    if bits == 8 and per_channel and not asym:
        acc = acc * s_ref[0, 0][0][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "block_rows", "gsize",
                                             "per_channel", "npair",
                                             "interpret"))
def _quant_matmul_tiled(x, q4, s4, lyr, z4=None, *, bits, block_rows,
                        gsize, per_channel, npair=False, interpret):
    """Prefill-sized (M > _PALLAS_MAX_M) variant: grid (NB, M/bm) with the
    m-tiles INNER, so each weight block is DMA'd once (its index map is
    constant across the inner dim) and re-used against every x tile —
    total traffic = weights once + x·NB + out once, with the same exact
    per-group output-side-scaled raw-code dots as the GEMV kernel. The
    XLA fallback this replaces pays weight-convert/dequant material per
    call, which is pure overhead in the MXU-bound prefill regime.
    M must be a multiple of _PREFILL_BM (caller pads)."""
    M, K = x.shape
    L, NB, Kp, bn = q4.shape
    out_bn = 2 * bn if npair else bn
    G = s4.shape[2]
    asym = z4 is not None
    bm = _PREFILL_BM
    kernel = functools.partial(_tiled_kernel, bits=bits,
                               block_rows=block_rows, gsize=gsize,
                               per_channel=per_channel, asym=asym,
                               npair=npair, K=K)
    sspec = pl.BlockSpec((1, 1, G, out_bn),
                         lambda n, m, lyr: (lyr[0], n, 0, 0))
    in_specs = [
        pl.BlockSpec((bm, K), lambda n, m, lyr: (m, 0)),
        pl.BlockSpec((1, 1, Kp, bn), lambda n, m, lyr: (lyr[0], n, 0, 0)),
        sspec,
    ] + ([sspec] if asym else [])
    operands = (lyr, x, q4, s4) + ((z4,) if asym else ())
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB, M // bm),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, out_bn), lambda n, m, lyr: (m, n)),
            # raw bf16 CODES of the current weight block, built once at
            # m == 0 and re-used by every m-tile (the first tiled variant
            # re-converted the block per tile — 16x the VPU work at
            # T=4096, which kept TTFT near the XLA fallback's)
            scratch_shapes=[pltpu.VMEM((K, out_bn), jnp.bfloat16)],
        ),
        out_shape=jax.ShapeDtypeStruct((M, NB * out_bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * NB * out_bn,
            bytes_accessed=q4.size // L + s4.size * 4 // L
            + M * K * 2 * NB + M * NB * out_bn * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def _tiled_kernel(lyr_ref, x_ref, w_ref, s_ref, *rest, bits: int,
                  block_rows: int, gsize: int, per_channel: bool,
                  asym: bool, npair: bool, K: int):
    """Prefill-tile body: at m == 0 the packed block unpacks ONCE into a
    raw-bf16-code scratch [K, out_bn] in NATURAL row/column order (codes
    are small ints — exact in bf16); every m-tile then runs plain
    per-group dots with output-side scales, same math as the GEMV."""
    if asym:
        z_ref, o_ref, wdeq_ref = rest
    else:
        o_ref, wdeq_ref = rest
    w = w_ref[0, 0]
    Kp, bn = w.shape
    out_bn = wdeq_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        if npair:
            f = w.astype(jnp.float32)
            hi = jnp.floor(f * 0.0625)
            lo = f - 16.0 * hi - 8.0          # signed lo codes
            wdeq_ref[:, :bn] = lo.astype(jnp.bfloat16)
            wdeq_ref[:, bn:] = hi.astype(jnp.bfloat16)
        elif bits == 4:
            blocks = Kp // block_rows
            for b in range(blocks):
                base = b * block_rows
                xbase = b * 2 * block_rows
                p32 = w[base:base + block_rows].astype(jnp.int32)
                lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
                hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
                wdeq_ref[xbase:xbase + block_rows] = lo.astype(jnp.bfloat16)
                wdeq_ref[xbase + block_rows:xbase + 2 * block_rows] = (
                    hi.astype(jnp.bfloat16))
        else:
            wdeq_ref[:] = w.astype(jnp.bfloat16)

    x = x_ref[:]
    M = x.shape[0]
    acc = jnp.zeros((M, out_bn), jnp.float32)
    if per_channel:
        acc = jnp.dot(x, wdeq_ref[:], preferred_element_type=jnp.float32)
        acc = acc * s_ref[0, 0][0][None, :]
        if asym:
            xsum = jnp.sum(x.astype(jnp.float32), -1, keepdims=True)
            acc = acc + xsum * z_ref[0, 0][0][None, :]
    else:
        for g in range(K // gsize):
            r0 = g * gsize
            xg = x[:, r0:r0 + gsize]
            d = jnp.dot(xg, wdeq_ref[r0:r0 + gsize],
                        preferred_element_type=jnp.float32)
            acc += d * s_ref[0, 0][g][None, :]
            if asym:
                xs = jnp.sum(xg.astype(jnp.float32), -1, keepdims=True)
                acc += xs * z_ref[0, 0][g][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "block_rows", "gsize",
                                             "per_channel", "npair",
                                             "norm_eps", "want_x_out",
                                             "interpret"))
def _quant_matmul_blocked(x, q4, s4, lyr, z4=None, gamma=None, res=None, *,
                          bits, block_rows, gsize, per_channel,
                          npair=False, norm_eps=0.0, want_x_out=False,
                          interpret):
    """q4/s4 are STACKED over a leading layer axis ([L, NB, Kp, bn] /
    [L, NB, G, bn]) and `lyr` (shape [1], scalar-prefetched) picks the layer
    inside the kernel's index maps. This matters: when the layer scan slices
    a stacked weight and feeds it to an (opaque) Pallas custom call, XLA
    MATERIALIZES the slice — an HBM→HBM copy of every weight every step that
    doubles decode weight traffic (measured ~350 ms of a 557 ms 32-step
    trace). Indexing inside the kernel makes the DMA read the original.
    z4 (asymmetric zero-point bias, scale-shaped) rides as one more
    scale-sized operand when present. gamma [1, K] + norm_eps fuse the
    layer-entry RMSNorm; res [M, K] a preceding residual add; want_x_out
    returns (y, x + res) — see _kernel."""
    M, K = x.shape
    L, NB, Kp, bn = q4.shape
    out_bn = 2 * bn if npair else bn    # npair blocks pack two columns/byte
    G = s4.shape[2]
    asym = z4 is not None
    kernel = functools.partial(_kernel, bits=bits, block_rows=block_rows,
                               gsize=gsize, per_channel=per_channel,
                               asym=asym, npair=npair, norm_eps=norm_eps,
                               has_res=res is not None,
                               want_x_out=want_x_out)
    sspec = pl.BlockSpec((1, 1, G, out_bn), lambda n, lyr: (lyr[0], n, 0, 0))
    xspec = pl.BlockSpec((M, K), lambda n, lyr: (0, 0))
    in_specs = [
        xspec,
        pl.BlockSpec((1, 1, Kp, bn), lambda n, lyr: (lyr[0], n, 0, 0)),
        sspec,
    ] + ([sspec] if asym else [])
    operands = [lyr, x, q4, s4] + ([z4] if asym else [])
    if norm_eps > 0.0:
        if gamma.ndim == 2 and gamma.shape[0] == L and L > 1:
            # STACKED per-layer gammas [L, 1, K], indexed by the prefetched
            # layer like the weights — no per-layer XLA slice op. The unit
            # middle dim satisfies Mosaic's sublane block rule (a [1, K]
            # block of an [L, K] array does not).
            gamma = gamma[:, None, :]
            in_specs.append(pl.BlockSpec((1, 1, K),
                                         lambda n, lyr: (lyr[0], 0, 0)))
        else:
            gamma = gamma.reshape(1, 1, K)
            in_specs.append(pl.BlockSpec((1, 1, K),
                                         lambda n, lyr: (0, 0, 0)))
        operands.append(gamma)
    if res is not None:
        in_specs.append(xspec)
        operands.append(res)
    out_specs = pl.BlockSpec((M, out_bn), lambda n, lyr: (0, n))
    out_shape = jax.ShapeDtypeStruct((M, NB * out_bn), x.dtype)
    if want_x_out:
        out_specs = [out_specs, xspec]
        out_shape = [out_shape, jax.ShapeDtypeStruct((M, K), x.dtype)]
    scratch = ([pltpu.VMEM((M, K), jnp.float32)]
               if (norm_eps > 0.0 or res is not None) else [])
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * NB * out_bn,
            bytes_accessed=q4.size // L + s4.size * 4 // L + M * K * 2
            + M * NB * out_bn * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def _group_dots_npair(x_f32, w, s_blk, gsize, floor_unpack):
    """Shared npair group loop (symmetric): x_f32 [M, K] f32, w [K, bnp]
    packed bytes, s_blk [G, 2·bnp] scales. Returns [M, 2·bnp] f32."""
    Kp, bnp = w.shape
    M = x_f32.shape[0]
    acc_lo = jnp.zeros((M, bnp), jnp.float32)
    acc_hi = jnp.zeros((M, bnp), jnp.float32)
    for c0 in range(0, Kp, gsize):
        wb = w[c0:c0 + gsize]
        xg = x_f32[:, c0:c0 + gsize]
        xsum = jnp.sum(xg, -1, keepdims=True)
        if floor_unpack:
            f = wb.astype(jnp.float32)
            hi_s = jnp.floor(f * 0.0625)
            d1 = jnp.dot(xg, f, preferred_element_type=jnp.float32)
            d_hi = jnp.dot(xg, hi_s, preferred_element_type=jnp.float32)
            d_lo = d1 - 16.0 * d_hi - 8.0 * xsum
        else:
            d1 = jnp.dot(xg, wb.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
            d2 = jnp.dot(xg, (wb & 0xF).astype(jnp.float32),
                         preferred_element_type=jnp.float32)
            d_lo = d2 - 8.0 * xsum
            d_hi = (d1 - d2) * 0.0625
        g = c0 // gsize
        s = s_blk[g:g + 1]
        acc_lo += d_lo * s[:, :bnp]
        acc_hi += d_hi * s[:, bnp:]
    return jnp.concatenate([acc_lo, acc_hi], axis=1)


def _ffn_kernel(lyr_ref, x_ref, g_ref, res_ref, wg_ref, sg_ref,
                wd_ref, sd_ref, o_ref, h2_ref, xn_ref, gu_ref, act_ref, *,
                gsize_g: int, gsize_d: int, NBg: int, outg: int,
                I_half: int, norm_eps: float, floor_unpack: bool):
    """FFN megakernel (npair symmetric): norm(x + res) → gate-up GEMV →
    in-VMEM SwiGLU → down GEMV, ONE pallas_call. The single grid
    (NBg + NBd) lets Mosaic's pipeline prefetch down-projection blocks
    while the last gate-up blocks compute — the separate-kernel chain
    paid a cold DMA ramp per GEMV per layer (~5 µs × 32 layers of the 7B
    decode step). Scratch: xn (normed input), gu (f32 gate∥up — never
    rounds to bf16 between the projections), act (f32 swiglu)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        x32 = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
        h2_ref[:] = x32.astype(h2_ref.dtype)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        xn_ref[:] = (x32 * jax.lax.rsqrt(var + norm_eps)
                     * g_ref[0].astype(jnp.float32))

    @pl.when(j < NBg)
    def _():
        acc = _group_dots_npair(xn_ref[:], wg_ref[0, 0], sg_ref[0, 0],
                                gsize_g, floor_unpack)
        gu_ref[:, pl.dslice(j * outg, outg)] = acc

    @pl.when(j == NBg)
    def _():
        gate = gu_ref[:, :I_half]
        up = gu_ref[:, I_half:]
        act_ref[:] = gate * jax.lax.logistic(gate) * up    # SwiGLU, f32

    @pl.when(j >= NBg)
    def _():
        acc = _group_dots_npair(act_ref[:], wd_ref[0, 0], sd_ref[0, 0],
                                gsize_d, floor_unpack)
        o_ref[:] = acc.astype(o_ref.dtype)


def _layer_tail_kernel(lyr_ref, h_ref, g_ref, attn_ref, wo_ref, so_ref,
                       wg_ref, sg_ref, wd_ref, sd_ref, o_ref, h2_ref,
                       wout_ref, xn_ref, gu_ref, act_ref, *,
                       gsize_o: int, gsize_g: int, gsize_d: int,
                       NBo: int, NBg: int, outw: int, outg: int,
                       I_half: int, norm_eps: float, floor_unpack: bool):
    """Single-chip layer tail: wo GEMV → (+h, RMSNorm) → gate-up GEMV →
    SwiGLU → down GEMV as ONE pallas call — three kernel boundaries (and
    their DMA ramps) removed per layer. TP cannot use this (wo partials
    must psum before the residual/norm); ffn_fused covers that case."""
    j = pl.program_id(0)

    @pl.when(j < NBo)
    def _():
        acc = _group_dots_npair(attn_ref[:].astype(jnp.float32),
                                wo_ref[0, 0], so_ref[0, 0], gsize_o,
                                floor_unpack)
        wout_ref[:, pl.dslice(j * outw, outw)] = acc

    @pl.when(j == NBo)
    def _():
        x32 = h_ref[:].astype(jnp.float32) + wout_ref[:]
        h2_ref[:] = x32.astype(h2_ref.dtype)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        xn_ref[:] = (x32 * jax.lax.rsqrt(var + norm_eps)
                     * g_ref[0].astype(jnp.float32))

    @pl.when((j >= NBo) & (j < NBo + NBg))
    def _():
        acc = _group_dots_npair(xn_ref[:], wg_ref[0, 0], sg_ref[0, 0],
                                gsize_g, floor_unpack)
        gu_ref[:, pl.dslice((j - NBo) * outg, outg)] = acc

    @pl.when(j == NBo + NBg)
    def _():
        gate = gu_ref[:, :I_half]
        up = gu_ref[:, I_half:]
        act_ref[:] = gate * jax.lax.logistic(gate) * up

    @pl.when(j >= NBo + NBg)
    def _():
        acc = _group_dots_npair(act_ref[:], wd_ref[0, 0], sd_ref[0, 0],
                                gsize_d, floor_unpack)
        o_ref[:] = acc.astype(o_ref.dtype)


def _npair_ok_for_fuse(qt, rows):
    return (isinstance(qt, QTensor) and qt.block_n != 0
            and qt.pack_axis == "n" and qt.zbias is None
            and qt.q.ndim == 4 and qt.scale.shape[-2] > 1
            and qt.q.shape[-2] == rows)


def layer_tail_fused(h, attn2d, wo_qt: QTensor, gu_qt: QTensor,
                     dn_qt: QTensor, gamma, eps: float, layer):
    """wo → residual+norm → gate-up → SwiGLU → down, one pallas call.
    Returns (down_out, h2 = h + wo_out) or None when unsupported
    (caller falls back; see _layer_tail_kernel). SINGLE-CHIP ONLY — the
    caller must not be inside a sharded forward."""
    *lead, K = h.shape
    Ko = attn2d.shape[-1]
    M = 1
    for d in lead:
        M *= d
    if M > 32:
        return None
    if not (_npair_ok_for_fuse(wo_qt, Ko) and _npair_ok_for_fuse(gu_qt, K)):
        return None
    L, NBo, _, bno = wo_qt.q.shape
    _, NBg, _, bng = gu_qt.q.shape
    if NBo * 2 * bno != K:
        return None
    I2 = NBg * 2 * bng
    I_half = I2 // 2
    if not _npair_ok_for_fuse(dn_qt, I_half):
        return None
    _, NBd, _, bnd = dn_qt.q.shape
    gsize_o = Ko // wo_qt.scale.shape[-2]
    gsize_g = K // gu_qt.scale.shape[-2]
    gsize_d = I_half // dn_qt.scale.shape[-2]
    if min(gsize_o, gsize_g, gsize_d) < 8:
        return None
    if Ko % gsize_o or K % gsize_g or I_half % gsize_d:
        return None

    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    h2d = h.reshape(M, K).astype(jnp.bfloat16)
    a2d = attn2d.reshape(M, Ko).astype(jnp.bfloat16)
    g_stacked = gamma.ndim == 2 and gamma.shape[0] == L and L > 1
    gam = gamma[:, None, :] if g_stacked else gamma.reshape(1, 1, K)
    gmap = ((lambda j, lyr: (lyr[0], 0, 0)) if g_stacked
            else (lambda j, lyr: (0, 0, 0)))
    outw, outg, outd = 2 * bno, 2 * bng, 2 * bnd
    H_out = NBd * outd

    kernel = functools.partial(
        _layer_tail_kernel, gsize_o=gsize_o, gsize_g=gsize_g,
        gsize_d=gsize_d, NBo=NBo, NBg=NBg, outw=outw, outg=outg,
        I_half=I_half, norm_eps=eps, floor_unpack=_npair_unpack_floor())

    def wmap(nb, off):
        return lambda j, lyr: (lyr[0], jnp.clip(j - off, 0, nb - 1), 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBo + NBg + NBd,),
            in_specs=[
                pl.BlockSpec((M, K), lambda j, lyr: (0, 0)),
                pl.BlockSpec((1, 1, K), gmap),
                pl.BlockSpec((M, Ko), lambda j, lyr: (0, 0)),
                pl.BlockSpec((1, 1, Ko, bno), wmap(NBo, 0)),
                pl.BlockSpec((1, 1, wo_qt.scale.shape[-2], outw),
                             wmap(NBo, 0)),
                pl.BlockSpec((1, 1, K, bng), wmap(NBg, NBo)),
                pl.BlockSpec((1, 1, gu_qt.scale.shape[-2], outg),
                             wmap(NBg, NBo)),
                pl.BlockSpec((1, 1, I_half, bnd), wmap(NBd, NBo + NBg)),
                pl.BlockSpec((1, 1, dn_qt.scale.shape[-2], outd),
                             wmap(NBd, NBo + NBg)),
            ],
            out_specs=[
                pl.BlockSpec((M, outd),
                             lambda j, lyr: (0, jnp.clip(j - NBo - NBg, 0,
                                                         NBd - 1))),
                pl.BlockSpec((M, K), lambda j, lyr: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((M, K), jnp.float32),       # wo_out
                pltpu.VMEM((M, K), jnp.float32),       # xn (normed)
                pltpu.VMEM((M, I2), jnp.float32),      # gate∥up
                pltpu.VMEM((M, I_half), jnp.float32),  # swiglu act
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((M, H_out), h.dtype),
                   jax.ShapeDtypeStruct((M, K), h.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (Ko * K + K * I2 + I_half * H_out),
            bytes_accessed=(wo_qt.q.size + gu_qt.q.size + dn_qt.q.size) // L
            + (wo_qt.scale.size + gu_qt.scale.size
               + dn_qt.scale.size) * 4 // L,
            transcendentals=M * I_half),
        interpret=use_interpret(),
    )(lyr, h2d, gam, a2d, wo_qt.q, wo_qt.scale, gu_qt.q, gu_qt.scale,
      dn_qt.q, dn_qt.scale)
    y, h2 = out
    return (y.reshape(*lead, H_out).astype(h.dtype),
            h2.reshape(*lead, K).astype(h.dtype))


def ffn_fused(x, residual, gamma, eps: float, gu_qt: QTensor,
              dn_qt: QTensor, layer):
    """Fused FFN block for the decode path: returns (down_out, h2) or
    None when this case is unsupported (caller falls back to the
    separate norm_matmul/matmul chain). Supported: stacked blocked npair
    SYMMETRIC gate-up AND down, grouped scales, M ≤ 32."""
    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    if M > 32:
        return None
    for qt in (gu_qt, dn_qt):
        if (not isinstance(qt, QTensor) or qt.block_n == 0
                or qt.pack_axis != "n" or qt.zbias is not None
                or qt.q.ndim != 4 or qt.scale.shape[-2] <= 1):
            return None
    L, NBg, Kg, bng = gu_qt.q.shape
    _, NBd, Kd, bnd = dn_qt.q.shape
    gsize_g = K // gu_qt.scale.shape[-2]
    I2 = NBg * 2 * bng                    # gate∥up width (shard-local)
    I_half = I2 // 2
    gsize_d = I_half // dn_qt.scale.shape[-2]
    if Kg != K or Kd != I_half or gsize_g < 8 or gsize_d < 8:
        return None
    if K % gsize_g or I_half % gsize_d:
        return None

    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    res2 = residual.reshape(M, K)
    g_stacked = gamma.ndim == 2 and gamma.shape[0] == L and L > 1
    gam = gamma[:, None, :] if g_stacked else gamma.reshape(1, 1, K)
    gmap = ((lambda j, lyr: (lyr[0], 0, 0)) if g_stacked
            else (lambda j, lyr: (0, 0, 0)))
    outg = 2 * bng
    outd = 2 * bnd
    H_out = NBd * outd

    kernel = functools.partial(
        _ffn_kernel, gsize_g=gsize_g, gsize_d=gsize_d, NBg=NBg, outg=outg,
        I_half=I_half, norm_eps=eps, floor_unpack=_npair_unpack_floor())

    xspec = pl.BlockSpec((M, K), lambda j, lyr: (0, 0))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBg + NBd,),
            in_specs=[
                xspec,
                pl.BlockSpec((1, 1, K), gmap),
                xspec,
                pl.BlockSpec((1, 1, Kg, bng),
                             lambda j, lyr: (lyr[0], jnp.minimum(j, NBg - 1),
                                             0, 0)),
                pl.BlockSpec((1, 1, gu_qt.scale.shape[-2], outg),
                             lambda j, lyr: (lyr[0], jnp.minimum(j, NBg - 1),
                                             0, 0)),
                pl.BlockSpec((1, 1, Kd, bnd),
                             lambda j, lyr: (lyr[0],
                                             jnp.clip(j - NBg, 0, NBd - 1),
                                             0, 0)),
                pl.BlockSpec((1, 1, dn_qt.scale.shape[-2], outd),
                             lambda j, lyr: (lyr[0],
                                             jnp.clip(j - NBg, 0, NBd - 1),
                                             0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((M, outd),
                             lambda j, lyr: (0, jnp.clip(j - NBg, 0,
                                                         NBd - 1))),
                xspec,
            ],
            scratch_shapes=[
                pltpu.VMEM((M, K), jnp.float32),       # xn (normed)
                pltpu.VMEM((M, I2), jnp.float32),      # gate∥up
                pltpu.VMEM((M, I_half), jnp.float32),  # swiglu act
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((M, H_out), x.dtype),
                   jax.ShapeDtypeStruct((M, K), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (K * I2 + I_half * H_out),
            bytes_accessed=(gu_qt.q.size + dn_qt.q.size) // L
            + (gu_qt.scale.size + dn_qt.scale.size) * 4 // L,
            transcendentals=M * I_half),
        interpret=use_interpret(),
    )(lyr, x2, gam, res2, gu_qt.q, gu_qt.scale, dn_qt.q, dn_qt.scale)
    y, h2 = out
    return (y.reshape(*lead, H_out).astype(x.dtype),
            h2.reshape(*lead, K).astype(x.dtype))


def _index_layer(qt: QTensor, layer) -> QTensor:
    """Slice one layer out of a stacked QTensor (XLA fallback paths)."""
    return QTensor(
        q=jax.lax.dynamic_index_in_dim(qt.q, layer, 0, keepdims=False),
        scale=jax.lax.dynamic_index_in_dim(qt.scale, layer, 0, keepdims=False),
        bits=qt.bits, group_size=qt.group_size, orig_dtype=qt.orig_dtype,
        block_rows=qt.block_rows, block_n=qt.block_n, pack_axis=qt.pack_axis,
        zbias=None if qt.zbias is None else jax.lax.dynamic_index_in_dim(
            qt.zbias, layer, 0, keepdims=False))


def quant_matmul(x: jnp.ndarray, qt: QTensor, layer=None, *,
                 norm_gamma=None, norm_eps: float = 1e-5,
                 residual=None, want_x_out: bool = False):
    """y = x @ dequant(qt). x: [..., K]; returns [..., N] in x.dtype.

    qt may be a single weight ([NB, Kp, bn] blocked / [Kp, N] row-major) or
    stacked over layers (one more leading axis) with `layer` selecting the
    slice — the fast path streams directly out of the stacked array.
    Fast path requires the blocked layout (qt.block_n > 0, set at weight
    load); everything else falls back to the XLA reference path.

    norm_gamma [..., K] fuses the layer-entry RMSNorm into the kernel:
    y = rms_norm(x (+ residual), norm_gamma, norm_eps) @ W — computed in
    f32 in VMEM (strictly tighter than the bf16-cast jnp chain it
    replaces). want_x_out returns (y, x + residual) — the updated
    residual stream, written once by the kernel. Fallback paths apply
    the same math in jnp before the reference matmul."""
    fused = norm_gamma is not None or residual is not None

    def jnp_prologue():
        # same math as the kernel's fused prologue (all-f32), for the
        # fallback/tiled paths
        x32 = x.astype(jnp.float32)
        if residual is not None:
            x32 = x32 + residual.astype(jnp.float32)
        x_full = x32.astype(x.dtype)
        if norm_gamma is not None:
            g = norm_gamma
            if g.ndim == 2 and g.shape[0] != 1:     # stacked [L, K]
                g = jax.lax.dynamic_index_in_dim(
                    g, layer if layer is not None else 0, 0, keepdims=False)
            var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
            x32 = x32 * jax.lax.rsqrt(var + norm_eps)
            x32 = x32 * g.astype(jnp.float32)
        return x32.astype(x.dtype), x_full

    def ret(y, x_full=None):
        return (y, x_full) if want_x_out else y

    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    stacked = qt.q.ndim == (4 if qt.block_n else 3)
    # bits=16 (dense streaming) stays off the tiled prefill path: XLA's
    # dense GEMM is already optimal at large M, no dequant to rescue
    tiled = (M > _PALLAS_MAX_M and qt.block_n != 0
             and _prefill_kernel_on() and qt.bits != 16)
    if (M > _PALLAS_MAX_M and not tiled) or qt.block_n == 0:
        if stacked:
            qt = _index_layer(qt, layer if layer is not None else 0)
        if fused:
            xn, x_full = jnp_prologue()
            return ret(qmatmul_ref(xn, qt), x_full)
        return ret(qmatmul_ref(x, qt))

    q4 = qt.q if stacked else qt.q[None]
    s4 = qt.scale if stacked else qt.scale[None]
    lyr = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
           else jnp.zeros((1,), jnp.int32))
    L, NB, Kp, bn = q4.shape
    npair = qt.bits == 4 and qt.pack_axis == "n"
    num_groups = s4.shape[2]
    per_channel = num_groups == 1
    gsize = K // num_groups
    block_rows = (qt.block_rows or Kp) if qt.bits == 4 and not npair else Kp
    # static-slice preconditions (quantize() guarantees these for supported
    # configs; bail to the reference path otherwise)
    ok = True
    if not per_channel:
        # group chunks are unpacked/converted whole in VMEM
        ok = 8 <= gsize and gsize * bn * 4 <= (2 << 20)
    if npair:
        # scale-row slice at offset bn must be lane-aligned
        ok = ok and bn % 128 == 0 and (per_channel or K % gsize == 0)
    elif qt.bits == 4 and ok:
        ok = Kp % block_rows == 0 and (per_channel or block_rows % gsize == 0)
    if not ok:
        qt2 = (_index_layer(qt, layer if layer is not None else 0)
               if stacked else qt)
        if fused:
            xn, x_full = jnp_prologue()
            return ret(qmatmul_ref(xn, qt2), x_full)
        return ret(qmatmul_ref(x, qt2))

    x_full = None
    if tiled:
        if fused:                        # tiled grid has no fused prologue
            x, x_full = jnp_prologue()
        x2 = x.reshape(M, K).astype(jnp.bfloat16)
        z4 = None
        if qt.zbias is not None:
            z4 = qt.zbias if stacked else qt.zbias[None]
        m_pad = -(-M // _PREFILL_BM) * _PREFILL_BM
        if m_pad != M:
            x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
        out = _quant_matmul_tiled(x2, q4, s4, lyr, z4, bits=qt.bits,
                                  block_rows=block_rows, gsize=gsize,
                                  per_channel=per_channel, npair=npair,
                                  interpret=use_interpret())
    else:
        x2 = x.reshape(M, K).astype(jnp.bfloat16)
        z4 = None
        if qt.zbias is not None:
            z4 = qt.zbias if stacked else qt.zbias[None]
        m_pad = max(8, M) if _pad8_m() else M
        if m_pad != M:
            x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
            if fused:                    # fused prologue needs exact rows
                x, x_full = jnp_prologue()
                x2 = jnp.pad(x.reshape(M, K).astype(jnp.bfloat16),
                             ((0, m_pad - M), (0, 0)))
        gam = res2 = None
        krn_fused = fused and m_pad == M
        if krn_fused:
            # gamma rides in its native dtype (the kernel converts once in
            # VMEM); stacked [L, K] gammas pass through whole and index by
            # the prefetched layer inside the kernel
            gam = norm_gamma
            res2 = (residual.reshape(M, K) if residual is not None
                    else None)
        out = _quant_matmul_blocked(
            x2, q4, s4, lyr, z4,
            gamma=gam, res=res2,
            bits=qt.bits, block_rows=block_rows, gsize=gsize,
            per_channel=per_channel, npair=npair,
            norm_eps=(norm_eps if (krn_fused and norm_gamma is not None)
                      else 0.0),
            want_x_out=krn_fused and want_x_out,
            interpret=use_interpret())
        if krn_fused and want_x_out:
            out, x_full = out
            # the kernel's x operand (and so this output) is bf16; give
            # the caller back its own dtype
            x_full = x_full.reshape(*lead, K).astype(x.dtype)
    y = out[:M].reshape(*lead, NB * bn * (2 if npair else 1)).astype(x.dtype)
    return ret(y, x_full)
