"""Paged decode attention — Pallas TPU kernel over a page-table-indexed pool.

The paged twin of decode_attention.py (see there for the head-batching and
masking design; reference analogue launchDecoderMaskedMHA, which only knows
the dense contiguous cache). The difference: KV pages live anywhere in a
global pool (ops/paged_kvcache.py) and the PAGE TABLE rides scalar prefetch,
so each grid step's BlockSpec index_map resolves `page_table[b, j]` to pick
the next [hb, ps, D] chunk to DMA — the vLLM PagedAttention indirection,
expressed as data-dependent block indices instead of pointer chasing.

Grid (B, Hkv/hb, max_blocks) with the classic online-softmax recurrence over
the page-block axis (running max / sum / [HG, D] accumulator in VMEM
scratch); output written once on the last block. Unallocated tail blocks
alias page 0 and are fully masked by `token <= position`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret
from llm_inference_tpu.ops.pallas.decode_attention import _dynamic_grid

NEG_INF = -1e30


def _kernel(pos_ref, layer_ref, pt_ref, win_ref, q_ref, k_ref, v_ref,
            ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref, *, hb: int,
            scale: float, softcap: float, quantized: bool):
    b = pl.program_id(0)
    # page-block grid dim is DYNAMIC (decode_attention._dynamic_grid);
    # j counts from the window base block
    j = win_ref[1] + pl.program_id(2)
    pos = pos_ref[b]
    win = win_ref[0]     # sliding window (tokens), 0 = global attention
    _, _, G, D = q_ref.shape
    ps = k_ref.shape[3]
    HG = hb * G
    HS = hb * ps

    @pl.when(pl.program_id(2) == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # skip page blocks past the fill and, for windowed layers, wholly
    # below the window start (the index maps alias their DMA to a live
    # page; block j covers tokens [j·ps, (j+1)·ps), window (pos-win, pos])
    @pl.when((j * ps <= pos) & ((win <= 0) | ((j + 1) * ps > pos - win + 1)))
    def _():
        q = q_ref[0].reshape(HG, D).astype(jnp.bfloat16)   # rows (h, g)
        kb = k_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)  # rows (h, t)
        vb = v_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)
        if quantized:
            # Per-(slot, head) scales arrive as the natural slot-major
            # [ps, hb] block; the score/probability COLUMNS are indexed
            # r = h·ps + t (head-major flat). Fold the scales into the
            # f32 score/p tiles instead of dequantizing codes in VMEM —
            # decode_attention.py measured the per-head VPU dequant at
            # ~2.4x the streamed-KV DMA time. Its 128-aligned strip
            # trick doesn't apply here (ps < 128), so build the flat
            # [1, HS] scale row directly: one tiny MXU dot broadcasts
            # each head's scale column across its strip, an iota mask
            # picks the matching slot, a sublane reduce flattens to one
            # lane row. Exact: int8 codes are exact in bf16; scales hit
            # the f32 tiles.
            rr = jax.lax.broadcasted_iota(jnp.int32, (hb, HS), 1)
            selT = (rr // ps == jax.lax.broadcasted_iota(
                jnp.int32, (hb, HS), 0)).astype(jnp.float32)
            rt = jax.lax.broadcasted_iota(jnp.int32, (ps, HS), 1)
            tsel = (rt % ps == jax.lax.broadcasted_iota(
                jnp.int32, (ps, HS), 0)).astype(jnp.float32)

            def flat_row(s):                           # [ps, hb] → [1, HS]
                exp = jax.lax.dot_general(
                    s, selT, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.sum(exp * tsel, axis=0, keepdims=True)

            krow = flat_row(ks_ref[0, 0])
            vrow = flat_row(vs_ref[0, 0])
        scores = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if quantized:
            scores = scores * krow
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        row = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 1)
        token = j * ps + col % ps
        ok = ((col // ps) == (row // G)) & (token <= pos)
        ok &= (win <= 0) | (token > pos - win)
        scores = jnp.where(ok, scores, NEG_INF)

        m_prev = m_ref[:]                                  # [HG, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                        # [HG, HS]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        if quantized:
            # fold V scales into p's columns (= dequantizing V), after l
            p = p * vrow
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(jnp.bfloat16), vb, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # token `pos` is always written and unmasked → l > 0
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(hb, G, D
                                                   ).astype(o_ref.dtype)


def _kernel4(pos_ref, layer_ref, pt_ref, win_ref, q_ref, k_ref,
             v_ref, ks_ref, vs_ref, o_ref, acc_ref,
             m_ref, l_ref, *, hb: int, scale: float,
             softcap: float):
    """INT4-page variant (quantize_kv4 offset-lo packing): K unpacks with
    one arithmetic shift + AND, lane-concatenated into a full-D operand
    (one 128-wide MXU contraction, zero host q/out copies — see
    decode_attention._kernel4), with a losum(q) offset fold; the V
    hi-nibble dot is a difference of dots. Scales fold through the
    MXU-built flat scale row as in the int8 kernel."""
    b = pl.program_id(0)
    j = win_ref[1] + pl.program_id(2)   # dynamic grid: j from base block
    pos = pos_ref[b]
    win = win_ref[0]
    _, _, G, D = q_ref.shape
    D2 = D // 2
    ps = k_ref.shape[3]
    HG = hb * G
    HS = hb * ps

    @pl.when(pl.program_id(2) == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((j * ps <= pos) & ((win <= 0) | ((j + 1) * ps > pos - win + 1)))
    def _():
        q = q_ref[0].reshape(HG, D).astype(jnp.float32)
        kp = k_ref[0, 0].reshape(HS, D2).astype(jnp.int32)
        k_hi = jnp.right_shift(kp, 4).astype(jnp.float32)
        k_lo = (kp & 0xF).astype(jnp.float32)
        kfull = jnp.concatenate([k_lo, k_hi], axis=1)      # [HS, D]
        lane = jax.lax.broadcasted_iota(jnp.int32, (HG, D), 1)
        q_losum = jnp.sum(jnp.where(lane < D2, q, 0.0), axis=1,
                          keepdims=True)
        scores = (jax.lax.dot_general(
            q, kfull, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            - 8.0 * q_losum) * scale
        # flat [1, HS] per-slot scale rows (see the int8 kernel above)
        rr = jax.lax.broadcasted_iota(jnp.int32, (hb, HS), 1)
        selT = (rr // ps == jax.lax.broadcasted_iota(
            jnp.int32, (hb, HS), 0)).astype(jnp.float32)
        rt = jax.lax.broadcasted_iota(jnp.int32, (ps, HS), 1)
        tsel = (rt % ps == jax.lax.broadcasted_iota(
            jnp.int32, (ps, HS), 0)).astype(jnp.float32)

        def flat_row(s):
            exp = jax.lax.dot_general(
                s, selT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.sum(exp * tsel, axis=0, keepdims=True)

        scores = scores * flat_row(ks_ref[0, 0])
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        row = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 1)
        token = j * ps + col % ps
        ok = ((col // ps) == (row // G)) & (token <= pos)
        ok &= (win <= 0) | (token > pos - win)
        scores = jnp.where(ok, scores, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        p = p * flat_row(vs_ref[0, 0])                 # fold V scales
        # i32 before the AND — Mosaic v5e has no i8 ALU
        vp = v_ref[0, 0].reshape(HS, D2).astype(jnp.int32)
        d1 = jnp.dot(p, vp.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        d2 = jnp.dot(p, (vp & 0xF).astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        psum = jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.concatenate(
            [d2 - 8.0 * psum, (d1 - d2) * 0.0625], axis=1)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(
            hb, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "interpret"))
def _paged_attn4(qg, k_pages, v_pages, ks_pages, vs_pages, pt, pos,
                 layer, win, *, scale, softcap, interpret):
    """INT4-page twin of _paged_attn: q and the output ride FULL-D (zero
    copies); the kernel lane-concats the unpacked K halves (see _kernel4).
    Pools are packed [L, P, Hkv, ps, D/2]."""
    B, Hkv, G, D = qg.shape
    D2 = D // 2
    L, P, _, ps, _ = k_pages.shape
    NB = pt.shape[0] // B
    hb = Hkv                        # scale-block full-dim rule
    win, grid = _dynamic_grid(B, 1, pos, win, ps)
    kernel = functools.partial(_kernel4, hb=hb, scale=scale,
                               softcap=softcap)

    def live(b, j, pos, win):
        jj = j + win[1]     # grid j counts from the window base block
        lo = jnp.where(win[0] > 0,
                       jnp.maximum(pos[b] - win[0] + 1, 0) // ps, 0)
        return jnp.minimum(jnp.maximum(jj, lo), pos[b] // ps)

    def kv_map(b, g, j, pos, lyr, pt, win):
        return (lyr[0], pt[b * NB + live(b, j, pos, win)], g, 0, 0)

    def s_map(b, g, j, pos, lyr, pt, win):
        return (lyr[0], pt[b * NB + live(b, j, pos, win)], 0, g)

    qspec = pl.BlockSpec((1, hb, G, D),
                         lambda b, g, j, pos, lyr, pt, win: (b, g, 0, 0))
    in_specs = [
        qspec,
        pl.BlockSpec((1, 1, hb, ps, D2), kv_map),
        pl.BlockSpec((1, 1, hb, ps, D2), kv_map),
        pl.BlockSpec((1, 1, ps, hb), s_map),
        pl.BlockSpec((1, 1, ps, hb), s_map),
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=qspec,
            scratch_shapes=[
                pltpu.VMEM((hb * G, D), jnp.float32),
                pltpu.VMEM((hb * G, 1), jnp.float32),
                pltpu.VMEM((hb * G, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        # deliberate full-allocation UPPER BOUND: the dynamic grid streams
        # only ~max(pos) slots, but the live fraction is traced
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * NB * ps * D2 * 2,
            bytes_accessed=2 * B * Hkv * NB * ps * D2,
            transcendentals=B * Hkv * G * NB * ps),
        interpret=interpret,
    )(pos, layer, pt, win, qg, k_pages, v_pages, ks_pages, vs_pages)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "interpret"))
def _paged_attn(q, k_pages, v_pages, ks_pages, vs_pages, pt, pos, layer,
                win, *, scale, softcap, interpret):
    B, Hkv, G, D = q.shape
    L, P, _, ps, _ = k_pages.shape
    NB = pt.shape[0] // B
    quantized = ks_pages is not None
    if quantized:
        # the [ps, hb] scale block's minor dim must be 128-divisible or
        # the FULL array dim for Mosaic (same rule decode_attention.py
        # pins hb=Hkv for) — a partial hb compiles in interpret mode but
        # fails lowering on the chip
        hb = Hkv
    else:
        hb = max(1, min(Hkv,
                        (512 * 1024) // (ps * D * k_pages.dtype.itemsize)))
        while Hkv % hb:
            hb -= 1
    win, grid = _dynamic_grid(B, Hkv // hb, pos, win, ps)
    kernel = functools.partial(_kernel, hb=hb, scale=scale,
                               softcap=softcap, quantized=quantized)

    def live(b, j, pos, win):
        # clamp the page-block index into THIS sequence's live range
        # [window-start block, fill block]; the grid's dynamic last dim
        # (decode_attention._dynamic_grid) spans only the BATCH-wide live
        # range — dead blocks' DMAs aren't merely aliased, they never run
        jj = j + win[1]     # grid j counts from the window base block
        lo = jnp.where(win[0] > 0,
                       jnp.maximum(pos[b] - win[0] + 1, 0) // ps, 0)
        return jnp.minimum(jnp.maximum(jj, lo), pos[b] // ps)

    def kv_map(b, g, j, pos, lyr, pt, win):
        # the page-table indirection: block index = pool page id
        return (lyr[0], pt[b * NB + live(b, j, pos, win)], g, 0, 0)

    in_specs = [
        pl.BlockSpec((1, hb, G, D),
                     lambda b, g, j, pos, lyr, pt, win: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, hb, ps, D), kv_map),
        pl.BlockSpec((1, 1, hb, ps, D), kv_map),
    ]
    if quantized:
        # slot-major scale pools [L, P, ps, Hkv]: the [ps, hb] block is the
        # natural VMEM layout (rows on sublanes) — no reshape, no relayout
        def s_map(b, g, j, pos, lyr, pt, win):
            return (lyr[0], pt[b * NB + live(b, j, pos, win)], 0, g)

        in_specs += [
            pl.BlockSpec((1, 1, ps, hb), s_map),
            pl.BlockSpec((1, 1, ps, hb), s_map),
        ]
        operands = [q, k_pages, v_pages, ks_pages, vs_pages]
    else:
        dummy = jnp.zeros((1, 1, 1, 128), jnp.float32)
        in_specs += [
            pl.BlockSpec((1, 1, 1, 128),
                         lambda b, g, j, pos, lyr, pt, win: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 128),
                         lambda b, g, j, pos, lyr, pt, win: (0, 0, 0, 0)),
        ]
        operands = [q, k_pages, v_pages, dummy, dummy]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, G, D),
                                   lambda b, g, j, pos, lyr, pt, win:
                                   (b, g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hb * G, D), jnp.float32),
                pltpu.VMEM((hb * G, 1), jnp.float32),
                pltpu.VMEM((hb * G, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        # deliberate full-allocation UPPER BOUND (see the int4 variant)
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * NB * ps * D,
            bytes_accessed=2 * B * Hkv * NB * ps * D
            * k_pages.dtype.itemsize,
            transcendentals=B * Hkv * G * NB * ps),
        interpret=interpret,
    )(pos, layer, pt, win, *operands)


def paged_decode_attention(
    q: jnp.ndarray,            # [B, 1, Hq, D] — single new token per sequence
    k_pages: jnp.ndarray,      # [L, P, Hkv, ps, D] page pool (token written)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # [B, max_blocks] int32
    layer: jnp.ndarray,        # scalar int32
    positions: jnp.ndarray,    # [B] absolute position of the new token
    scale: float | None = None,
    logit_softcap: float = 0.0,
    k_scale: jnp.ndarray | None = None,   # [L, P, ps, Hkv] — int8 pools
    v_scale: jnp.ndarray | None = None,
    window: jnp.ndarray | int | None = None,  # sliding window; 0/None=global
) -> jnp.ndarray:
    """Fused decode attention over paged KV; returns [B, 1, Hq, D].

    `window` (may be a TRACED scalar — gemma2's per-layer alternating
    window riding the layer scan) restricts attention to tokens
    (pos-window, pos] and clamps the page streaming to the window's
    blocks."""
    B, T, Hq, D = q.shape
    assert T == 1, "decode kernel is single-step"
    Hkv, ps = k_pages.shape[2], k_pages.shape[3]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    pos = positions.reshape(B).astype(jnp.int32)
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    pt = page_table.reshape(-1).astype(jnp.int32)
    win = jnp.asarray(0 if window is None else window,
                      jnp.int32).reshape(1)
    if k_pages.shape[4] * 2 == D:
        # packed INT4 pages: q/out ride FULL-D; the kernel lane-concats
        # the unpacked halves (see decode_attention)
        qg = q.reshape(B, Hkv, G, D)
        out = _paged_attn4(qg, k_pages, v_pages, k_scale, v_scale, pt,
                           pos, lyr, win, scale=scale,
                           softcap=logit_softcap,
                           interpret=use_interpret())
        return out.reshape(B, 1, Hq, D).astype(q.dtype)
    qg = q.reshape(B, Hkv, G, D)
    out = _paged_attn(qg, k_pages, v_pages, k_scale, v_scale, pt, pos, lyr,
                      win, scale=scale, softcap=logit_softcap,
                      interpret=use_interpret())
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


def supports(q_shape, page_size: int) -> bool:
    B, T, Hq, D = q_shape
    return T == 1 and D in (64, 128, 256) and page_size % 8 == 0
