"""Batched decode-step KV-cache write — Pallas TPU kernel.

Reference analogue: the decode half of `launchConcatKVCache` (reference:
src/kernels/concat_past_kv.cu:17-145), which appends the new token's k/v
into the dense cache.

Why a kernel at all: the jnp write (ops.kvcache._write_pages) is a chain of
per-sequence `dynamic_update_slice` ops — the only XLA form that keeps the
cache carry aliased in place (vmap transposes the whole cache; a batched
scatter forces full-cache layout copies). But a CHAIN is 2·B HLO ops per
layer (4·B quantized): at B=16 that is ~1 ms of a 13 ms decode step in
per-op overhead alone (profiled via utils/profiling on chip). This kernel
does all B writes in ONE call per layer:

- Grid (B,). The cache is passed as BOTH input and output with identical
  index maps and `input_output_aliases`, so each grid step is a
  read-modify-write of one [Hkv, 8, D] sublane-aligned block around the
  sequence's write slot — the rest of the cache is never touched and the
  buffer stays in place through the scan carry (verified: no cache-sized
  copies in the decode trace).
- The write offset rides scalar prefetch; the in-block sublane index is
  `offsets[b] % 8`, a dynamic store Mosaic supports on the sublane axis.
- Works for bf16/int8/int4-packed codes (the packed case's 64-lane minor
  dim is the full array dim, satisfying Mosaic's block rule) and the
  slot-major [L, B, S, Hkv] scale arrays.

Decode only (T == 1): prefill writes land T tokens per sequence and stay
on the DUS chain (once per request, not per step — see kvcache.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret

_SLOT_BLK = 8   # sublane tile: smallest natural RMW granularity


def _kernel(off_ref, layer_ref, kn_ref, vn_ref, ki_ref, vi_ref,
            ko_ref, vo_ref):
    b = pl.program_id(0)
    s = off_ref[b] % _SLOT_BLK
    # read-modify-write as a one-hot sublane BLEND (a dynamic single-
    # sublane store needs a statically 8-aligned index on Mosaic): select
    # the new row on slot-sublane s, the DMA'd-in block elsewhere. The
    # in/out HBM buffers alias; the VMEM blocks may not, so the blend
    # reads from the input ref.
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, _SLOT_BLK, 1), 1)
           == s)                                       # [1, 8, 1]
    kn = kn_ref[0]                                     # [Hkv, 1, D]
    vn = vn_ref[0]
    ko_ref[0, 0] = jnp.where(sel, kn, ki_ref[0, 0])
    vo_ref[0, 0] = jnp.where(sel, vn, vi_ref[0, 0])


def _skernel(off_ref, layer_ref, ksn_ref, vsn_ref, ksi_ref, vsi_ref,
             kso_ref, vso_ref):
    b = pl.program_id(0)
    s = off_ref[b] % _SLOT_BLK
    # scale rows arrive [1, 1, Hkv]; slot-major cache block is [8, Hkv]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (_SLOT_BLK, 1), 0)
           == s)                                       # [8, 1]
    kso_ref[0, 0] = jnp.where(sel, ksn_ref[0], ksi_ref[0, 0])
    vso_ref[0, 0] = jnp.where(sel, vsn_ref[0], vsi_ref[0, 0])


@jax.jit
def write_token(k_all, v_all, layer, k_new, v_new, offsets):
    """Write ONE new token per sequence into [L, B, Hkv, S, Dc] caches.

    k_new/v_new: [B, Hkv, 1, Dc] (codes already quantized/packed upstream).
    Returns the updated caches (same buffers — aliased in place).
    """
    B, Hkv, _, Dc = k_new.shape
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    # clamp at capacity: offsets[b] >= S must degrade to a last-slot write
    # (dynamic_update_slice semantics of the jnp path) — unclamped, the
    # block index below goes out of bounds, which is UB in Mosaic
    off = jnp.minimum(offsets.reshape(B), k_all.shape[3] - 1).astype(jnp.int32)

    def cache_map(b, off, lyr):
        return (lyr[0], b, 0, off[b] // _SLOT_BLK, 0)

    cache_spec = pl.BlockSpec((1, 1, Hkv, _SLOT_BLK, Dc), cache_map)
    new_spec = pl.BlockSpec((1, Hkv, 1, Dc), lambda b, off, lyr: (b, 0, 0, 0))
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                   jax.ShapeDtypeStruct(v_all.shape, v_all.dtype)],
        # inputs are (off, lyr, k_new, v_new, k_all, v_all) → k_all is
        # operand 4, v_all operand 5 (scalar-prefetch args count)
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret(),
    )(off, lyr, k_new, v_new, k_all, v_all)


def _qkernel(off_ref, layer_ref, kn_ref, vn_ref, ki_ref, vi_ref,
             ksi_ref, vsi_ref, ko_ref, vo_ref, kso_ref, vso_ref):
    """INT8 quantize + RMW write, fused: per-(head, token) symmetric
    scales over D (quantization.quantize_kv semantics), codes and
    slot-major scale rows blended into their aliased blocks — one kernel
    call replaces quantize_kv's clamp/round/reduce fusions plus the two
    write kernels (~0.09 ms/step of XLA small-ops at 7B bs=1)."""
    b = pl.program_id(0)
    s = off_ref[b] % _SLOT_BLK
    Hkv = kn_ref.shape[1]

    def quant(rows):                                   # [Hkv, 1, D] bf16
        r = rows.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(r), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-8)      # [Hkv, 1, 1]
        codes = jnp.clip(jnp.round(r / scale), -128, 127).astype(jnp.int8)
        # scale column [Hkv, 1] → lane row [1, Hkv] on the MXU (a
        # sublane↔lane reshape is not a VPU op on v5e)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 1)
               ).astype(jnp.float32)
        # HIGHEST precision: the default MXU path truncates f32 operands
        # to bf16 — a lossy scale would mismatch the codes it quantized
        # (measured rel 6.7e-4 on chip)
        srow = jax.lax.dot_general(scale[:, 0], eye,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        return codes, srow                             # [Hkv,1,D], [1,Hkv]

    kq, ks = quant(kn_ref[0])
    vq, vs = quant(vn_ref[0])
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, _SLOT_BLK, 1), 1)
           == s)                                       # codes blend
    ko_ref[0, 0] = jnp.where(sel, kq, ki_ref[0, 0])
    vo_ref[0, 0] = jnp.where(sel, vq, vi_ref[0, 0])
    sel8 = (jax.lax.broadcasted_iota(jnp.int32, (_SLOT_BLK, 1), 0)
            == s)                                      # scale-row blend
    kso_ref[0, 0] = jnp.where(sel8, ks, ksi_ref[0, 0])
    vso_ref[0, 0] = jnp.where(sel8, vs, vsi_ref[0, 0])


@jax.jit
def quantize_write_token(k_all, v_all, ks_all, vs_all, layer,
                         k_new, v_new, offsets):
    """Fused INT8 quantize + decode write for codes AND slot-major scales.

    k_new/v_new: [B, Hkv, 1, D] bf16/f32 (UNquantized rows); caches:
    codes [L, B, Hkv, S, D] int8 + scales [L, B, S, Hkv] f32, all four
    aliased in place. Same math as quantize_kv → write_token →
    write_token_scales, in one kernel call per layer."""
    B, Hkv, _, kD = k_new.shape
    vD = v_new.shape[3]            # k/v widths may DIFFER (deepseek MLA:
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)   # latent vs kv_lora)
    off = jnp.minimum(offsets.reshape(B), k_all.shape[3] - 1).astype(jnp.int32)

    def cache_map(b, off, lyr):
        return (lyr[0], b, 0, off[b] // _SLOT_BLK, 0)

    def scale_map(b, off, lyr):
        return (lyr[0], b, off[b] // _SLOT_BLK, 0)

    kcache_spec = pl.BlockSpec((1, 1, Hkv, _SLOT_BLK, kD), cache_map)
    vcache_spec = pl.BlockSpec((1, 1, Hkv, _SLOT_BLK, vD), cache_map)
    sspec = pl.BlockSpec((1, 1, _SLOT_BLK, Hkv), scale_map)
    knew_spec = pl.BlockSpec((1, Hkv, 1, kD),
                             lambda b, off, lyr: (b, 0, 0, 0))
    vnew_spec = pl.BlockSpec((1, Hkv, 1, vD),
                             lambda b, off, lyr: (b, 0, 0, 0))
    return pl.pallas_call(
        _qkernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[knew_spec, vnew_spec, kcache_spec, vcache_spec,
                      sspec, sspec],
            out_specs=[kcache_spec, vcache_spec, sspec, sspec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                   jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
                   jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
                   jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype)],
        # operands: (off, lyr, k_new, v_new, k_all, v_all, ks_all, vs_all)
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret(),
    )(off, lyr, k_new, v_new, k_all, v_all, ks_all, vs_all)


def _qrows_kernel(off_ref, layer_ref, kn_ref, vn_ref, ki_ref, vi_ref,
                  ksi_ref, vsi_ref, ko_ref, vo_ref, kso_ref, vso_ref):
    """B=1 variant of _qkernel taking the new rows as plain [Hkv, D]
    (the whole-layer megakernel's natural output layout — no [1,Hkv,1,D]
    relayout copy between the two kernels). The row→slot-sublane
    replication runs on the MXU (0/1 dot, exact at HIGHEST)."""
    s = off_ref[0] % _SLOT_BLK
    Hkv, D = kn_ref.shape

    eye = (jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 1)
           ).astype(jnp.float32)
    rep = (jax.lax.broadcasted_iota(jnp.int32, (Hkv * _SLOT_BLK, Hkv), 0)
           // _SLOT_BLK ==
           jax.lax.broadcasted_iota(jnp.int32, (Hkv * _SLOT_BLK, Hkv), 1)
           ).astype(jnp.float32)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (Hkv * _SLOT_BLK, 1), 0)
           % _SLOT_BLK == s)

    def quant(rows):                                   # [Hkv, D] bf16
        r = rows.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(r), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-8)      # [Hkv, 1]
        codes = jnp.clip(jnp.round(r / scale), -128, 127)
        srow = jax.lax.dot_general(scale, eye, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        return codes, srow                             # [Hkv,D] f32, [1,Hkv]

    kq, ks = quant(kn_ref[:])
    vq, vs = quant(vn_ref[:])
    kq_rep = jax.lax.dot_general(rep, kq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    vq_rep = jax.lax.dot_general(rep, vq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    ki = ki_ref[0, 0].reshape(Hkv * _SLOT_BLK, D)
    vi = vi_ref[0, 0].reshape(Hkv * _SLOT_BLK, D)
    ko_ref[0, 0] = jnp.where(sel, kq_rep.astype(jnp.int8), ki
                             ).reshape(Hkv, _SLOT_BLK, D)
    vo_ref[0, 0] = jnp.where(sel, vq_rep.astype(jnp.int8), vi
                             ).reshape(Hkv, _SLOT_BLK, D)
    sel8 = (jax.lax.broadcasted_iota(jnp.int32, (_SLOT_BLK, 1), 0) == s)
    kso_ref[0, 0] = jnp.where(sel8, ks, ksi_ref[0, 0])
    vso_ref[0, 0] = jnp.where(sel8, vs, vsi_ref[0, 0])


@jax.jit
def quantize_write_rows(k_all, v_all, ks_all, vs_all, layer,
                        k_new, v_new, offset):
    """Fused INT8 quantize + decode write, B=1, rows-layout inputs:
    k_new/v_new [Hkv, D] bf16/f32 (the megakernel's outputs, no reshape).
    offset: scalar int32. Caches aliased in place like
    quantize_write_token."""
    Hkv, D = k_new.shape
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    off = jnp.minimum(jnp.asarray(offset, jnp.int32).reshape(1),
                      k_all.shape[3] - 1)

    def cache_map(b, off, lyr):
        return (lyr[0], 0, 0, off[0] // _SLOT_BLK, 0)

    def scale_map(b, off, lyr):
        return (lyr[0], 0, off[0] // _SLOT_BLK, 0)

    cache_spec = pl.BlockSpec((1, 1, Hkv, _SLOT_BLK, D), cache_map)
    sspec = pl.BlockSpec((1, 1, _SLOT_BLK, Hkv), scale_map)
    new_spec = pl.BlockSpec((Hkv, D), lambda b, off, lyr: (0, 0))
    return pl.pallas_call(
        _qrows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[new_spec, new_spec, cache_spec, cache_spec,
                      sspec, sspec],
            out_specs=[cache_spec, cache_spec, sspec, sspec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                   jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
                   jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
                   jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype)],
        # operands: (off, lyr, k_new, v_new, k_all, v_all, ks_all, vs_all)
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=use_interpret(),
    )(off, lyr, k_new, v_new, k_all, v_all, ks_all, vs_all)


def _rows_kernel(off_ref, layer_ref, kn_ref, vn_ref, ki_ref, vi_ref,
                 ko_ref, vo_ref):
    """bf16 twin of _qrows_kernel (no quantization)."""
    s = off_ref[0] % _SLOT_BLK
    Hkv, D = kn_ref.shape
    rep = (jax.lax.broadcasted_iota(jnp.int32, (Hkv * _SLOT_BLK, Hkv), 0)
           // _SLOT_BLK ==
           jax.lax.broadcasted_iota(jnp.int32, (Hkv * _SLOT_BLK, Hkv), 1)
           ).astype(jnp.float32)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (Hkv * _SLOT_BLK, 1), 0)
           % _SLOT_BLK == s)

    def rep_rows(rows):
        return jax.lax.dot_general(
            rep, rows.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # exact for bf16

    ki = ki_ref[0, 0].reshape(Hkv * _SLOT_BLK, D)
    vi = vi_ref[0, 0].reshape(Hkv * _SLOT_BLK, D)
    ko_ref[0, 0] = jnp.where(sel, rep_rows(kn_ref[:]).astype(ko_ref.dtype),
                             ki).reshape(Hkv, _SLOT_BLK, D)
    vo_ref[0, 0] = jnp.where(sel, rep_rows(vn_ref[:]).astype(vo_ref.dtype),
                             vi).reshape(Hkv, _SLOT_BLK, D)


@jax.jit
def write_rows(k_all, v_all, layer, k_new, v_new, offset):
    """Dense-cache (bf16) B=1 rows-layout decode write: k_new/v_new
    [Hkv, D], offset scalar. Caches aliased in place."""
    Hkv, D = k_new.shape
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    off = jnp.minimum(jnp.asarray(offset, jnp.int32).reshape(1),
                      k_all.shape[3] - 1)

    def cache_map(b, off, lyr):
        return (lyr[0], 0, 0, off[0] // _SLOT_BLK, 0)

    cache_spec = pl.BlockSpec((1, 1, Hkv, _SLOT_BLK, D), cache_map)
    new_spec = pl.BlockSpec((Hkv, D), lambda b, off, lyr: (0, 0))
    return pl.pallas_call(
        _rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                   jax.ShapeDtypeStruct(v_all.shape, v_all.dtype)],
        input_output_aliases={4: 0, 5: 1},
        interpret=use_interpret(),
    )(off, lyr, k_new, v_new, k_all, v_all)


@jax.jit
def write_token_scales(ks_all, vs_all, layer, ks_new, vs_new, offsets):
    """Write ONE token's per-head scales into slot-major [L, B, S, Hkv]."""
    B, _, Hkv = ks_new.shape
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    # same capacity clamp as write_token (see comment there)
    off = jnp.minimum(offsets.reshape(B),
                      ks_all.shape[2] - 1).astype(jnp.int32)

    def cache_map(b, off, lyr):
        return (lyr[0], b, off[b] // _SLOT_BLK, 0)

    cache_spec = pl.BlockSpec((1, 1, _SLOT_BLK, Hkv), cache_map)
    new_spec = pl.BlockSpec((1, 1, Hkv), lambda b, off, lyr: (b, 0, 0))
    return pl.pallas_call(
        _skernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
                   jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype)],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret(),
    )(off, lyr, ks_new, vs_new, ks_all, vs_all)
