"""Blockwise (flash) prefill attention over a PAGED KV pool — Pallas TPU.

Reference analogue: none — the reference has neither paging nor prefix
reuse (its dense cache and full-rectangle prefill chain are covered by
flash_attention.py, reference: src/layers/attention/context_attention.cpp:
146-161); this is the paged twin of that kernel, for prefills whose keys
live in the page pool rather than a dense cache: prefix-cache suffix
prefill (fresh tokens attending over SHARED history pages,
engine/prefix_cache.py) and chunked paged admissions (later chunks
attending over the earlier chunks' pages). The jnp fallback for these
paths gathers every sequence's pages into a dense [B, Hkv, NB·ps, D]
array EVERY LAYER (llama._gather_paged) — tripling the attention-side HBM
traffic (read pages + write dense + read dense) and materializing the
full rectangle of scores. This kernel reads each page exactly once,
straight out of the pool via the page-table indirection in its BlockSpec
index maps (same pattern as paged_attention.py), with the online-softmax
recurrence over pages.

Grid (B, Hq, T/bt, NB), pages innermost. The kernel BODIES are the ones
from flash_attention.py (_flash_body/_flash_body4 — online softmax,
causal/window block skipping, traced sliding window, int8 scale folding,
int4 linear-fold unpack), shared so a fix or Mosaic workaround lands in
both kernels at once; only the host-side index maps (page-table
indirection, one extra prefetch operand) differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret
from llm_inference_tpu.ops.pallas.flash_attention import (_flash_body,
                                                          _flash_body4)


def _kernel(lyr_ref, qposf_ref, ptf_ref, win_ref, qpos_ref, *rest, **kw):
    # paged wrapper: drop the prefetch refs the shared body doesn't need
    # (win rides prefetch AND feeds the body)
    _flash_body(qpos_ref, win_ref, *rest, **kw)


def _kernel4(lyr_ref, qposf_ref, ptf_ref, win_ref, qpos_ref, *rest, **kw):
    _flash_body4(qpos_ref, win_ref, *rest, **kw)


_DEF_BT = 256


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "bt",
                                             "kvbits", "interpret"))
def _paged_flash(q, k_pages, v_pages, ks_pages, vs_pages, qpos, pt, lyr,
                 win, *, scale, softcap, bt, kvbits, interpret):
    B, Hq, Tp = q.shape[:3]
    L, P, Hkv, ps, Dk = k_pages.shape
    G = Hq // Hkv
    NB = pt.shape[0] // B
    grid = (B, Hq, Tp // bt, NB)
    quantized = ks_pages is not None

    def live(b, h, t, s, qposf, win):
        # clamp page index into the t-block's live range (see
        # flash_attention._flash.live) — elided DMAs for masked pages
        hi = jnp.maximum(qposf[b * Tp + (t + 1) * bt - 1], 0) // ps
        lo = jnp.where(win[0] > 0,
                       jnp.maximum(qposf[b * Tp + t * bt] - win[0] + 1,
                                   0) // ps,
                       0)
        return jnp.minimum(jnp.maximum(s, lo), hi)

    def kv_map(b, h, t, s, lyr, qposf, pt, win):
        return (lyr[0], pt[b * NB + live(b, h, t, s, qposf, win)],
                h // G, 0, 0)

    if kvbits == 4:
        D2 = Dk                       # pool pages are packed [.., ps, D/2]
        D = 2 * D2
        # q/out ride FULL-D; the kernel lane-concats the unpacked halves
        # (see flash_attention._flash_body4)
        qspec = pl.BlockSpec((1, 1, bt, D),
                             lambda b, h, t, s, lyr, qposf, pt, win:
                             (b, h, t, 0))
        qspecs = [qspec]
        out_specs = qspec
        out_shape = jax.ShapeDtypeStruct((B, Hq, Tp, D), jnp.bfloat16)
        q_ops = (q,)
        kernel = functools.partial(_kernel4, scale=scale, softcap=softcap,
                                   bs=ps, G=G)
        scratch = [pltpu.VMEM((bt, D), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32)]
    else:
        qspec = pl.BlockSpec((1, 1, bt, Dk),
                             lambda b, h, t, s, lyr, qposf, pt, win:
                             (b, h, t, 0))
        qspecs = [qspec]
        out_specs = qspec
        out_shape = jax.ShapeDtypeStruct(q.shape, jnp.bfloat16)
        q_ops = (q,)
        kernel = functools.partial(_kernel, scale=scale, softcap=softcap,
                                   bs=ps, G=G, quantized=quantized)
        scratch = [pltpu.VMEM((bt, Dk), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32)]
    in_specs = [
        # [B, 1, Tp] with a (1, 1, bt) block — see flash_attention._flash
        # (a [B, Tp] (1, bt) block only lowers when B == 1)
        pl.BlockSpec((1, 1, bt),
                     lambda b, h, t, s, lyr, qposf, pt, win: (b, 0, t)),
        *qspecs,
        pl.BlockSpec((1, 1, 1, ps, Dk), kv_map),
        pl.BlockSpec((1, 1, 1, ps, Dk), kv_map),
    ]
    if quantized:
        def s_map(b, h, t, s, lyr, qposf, pt, win):
            return (lyr[0], pt[b * NB + live(b, h, t, s, qposf, win)],
                    0, 0)

        in_specs += [pl.BlockSpec((1, 1, ps, Hkv), s_map),
                     pl.BlockSpec((1, 1, ps, Hkv), s_map)]
        operands = (qpos[:, None], *q_ops, k_pages, v_pages, ks_pages,
                    vs_pages)
    else:
        dummy = jnp.zeros((1, 1, 1, 128), jnp.float32)
        zmap = (lambda b, h, t, s, lyr, qposf, pt, win:
                (0, 0, 0, 0))
        in_specs += [pl.BlockSpec((1, 1, 1, 128), zmap),
                     pl.BlockSpec((1, 1, 1, 128), zmap)]
        operands = (qpos[:, None], *q_ops, k_pages, v_pages, dummy, dummy)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * Tp * NB * ps * (Dk * (2 if kvbits == 4
                                                     else 1)),
            bytes_accessed=2 * B * Hkv * NB * ps * Dk
            * k_pages.dtype.itemsize * (Tp // bt),
            transcendentals=B * Hq * Tp * NB * ps),
        interpret=interpret,
    )(lyr, qpos.reshape(-1), pt, win, *operands)
    return out


def paged_flash_attention(
    q: jnp.ndarray,            # [B, T, Hq, D] — fresh suffix tokens
    k_pages: jnp.ndarray,      # [L, P, Hkv, ps, D(/2)] pool (pages written)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # [B, max_blocks] int32
    layer: jnp.ndarray,        # scalar int32
    positions: jnp.ndarray,    # [B, T] absolute query positions
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sliding_window=0,          # int or traced scalar; 0 = global
    k_scale: jnp.ndarray | None = None,   # [L, P, ps, Hkv]
    v_scale: jnp.ndarray | None = None,
    block_t: int = _DEF_BT,
) -> jnp.ndarray:
    """Blockwise masked attention over the page pool; [B, T, Hq, D].

    Rows of `positions` must be non-decreasing (contiguous prefill
    ranges); all pages covering positions ≤ each row's max must be
    allocated in the page table (masked tail entries may alias any
    valid page, as in paged_attention)."""
    B, T, Hq, D = q.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    bt = min(block_t, T)
    pad_t = (-T) % bt
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, 0), (0, pad_t)), mode="edge")
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    win = jnp.asarray(sliding_window, jnp.int32).reshape(1)
    pt = page_table.reshape(-1).astype(jnp.int32)
    kvbits = 4 if k_pages.shape[4] * 2 == D else (
        8 if k_scale is not None else 16)
    qt = q.transpose(0, 2, 1, 3)
    out = _paged_flash(qt, k_pages, v_pages, k_scale, v_scale,
                       positions.astype(jnp.int32), pt, lyr, win,
                       scale=scale, softcap=logit_softcap, bt=bt,
                       kvbits=kvbits, interpret=use_interpret())
    out = out.transpose(0, 2, 1, 3)
    if pad_t:
        out = out[:, :T]
    return out.astype(q.dtype)


def supports(q_shape, page_size: int) -> bool:
    B, T, Hq, D = q_shape
    # one page per grid step: ps is the score tile's lane width — gate to
    # full lanes (the serving default ps=128); smaller pages fall back to
    # the gather path
    return (T > 1 and T >= 8 and D in (64, 128, 256)
            and page_size % 128 == 0)
