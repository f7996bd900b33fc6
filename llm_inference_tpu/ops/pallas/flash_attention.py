"""Blockwise (flash) prefill attention — Pallas TPU kernel.

Reference analogue: the prefill attention chain
QKᵀ GEMM → scale+mask+softmax → PV GEMM (reference:
src/layers/attention/context_attention.cpp:146-161 using
linear.cu:126-229 + attn_softmax_kernel.cu:79-390), which materializes the
full [B, H, T, S] score tensor — at T=S=2048 that is 0.5 GB per layer in
f32. This kernel runs the classic online-softmax recurrence over S blocks so
scores never leave VMEM, making long-context prefill memory-flat.

Design:
- Grid (B, Hq, T/bt, S/bs), S innermost ("arbitrary"); running max/sum and
  the [bt, D] f32 accumulator live in VMEM scratch across S steps; the
  output block is written once at the last step.
- Reads KV pages straight from the FULL stacked cache with the layer index
  via scalar prefetch — same zero-copy pattern as decode_attention (a scan-
  sliced operand into a Pallas call gets materialized by XLA).
- BLOCK SKIPPING: each (t, s) step's KV index map clamps the slot block
  into the t-block's LIVE range [window-start block, causal-frontier
  block], so Mosaic's pipeline elides the DMA for blocks that are wholly
  masked, and a pl.when skips their compute. This requires each query
  row's positions to be NON-DECREASING along t (true for every prefill
  path here: contiguous ranges) — the frontier is read off the block's
  last row, the window start off its first. Causal skipping alone halves
  average prefill attention work (the reference materializes and softmaxes
  the full rectangle).
- The sliding WINDOW is a traced scalar riding scalar prefetch — gemma2/3's
  per-layer alternating window flows through the layer scan into the same
  compiled kernel (the previous static-window variant forced those models'
  prefill onto the score-materializing XLA path).
- q·Kᵀ runs as an NT dot_general ([bt, D] × [bs, D] contracting D of both) —
  MXU-native from the natural [B, Hkv, S, D] cache layout, no transposes.
- GQA: grid runs over Q heads; the index maps divide by the group size to
  pick the KV page (no repeated-KV materialization — the reference needs a
  dedicated repeat_kv.cu gather for this).
- Masking uses absolute query positions (an input, so multi-round chat /
  continuous-batching prefills at history offsets just work): key slot s is
  visible iff s <= q_pos (and within the sliding window if configured) —
  the same rule as ops.attention.make_attention_mask.
- QUANTIZED caches: int8 codes dot in bf16 and the per-(slot, head) scales
  fold into the f32 score/probability ROWS as a [1, bs] lane row — built
  from the slot-major [bs, Hkv] scale block by one tiny MXU dot with the
  head's indicator row (a lane-column slice + relayout would be the VPU-
  hostile alternative). INT4 packed caches (quantize_kv4 offset-lo) use
  the same linear-fold unpack as decode_attention._kernel4: K via one
  arithmetic shift + losum(q) FMA, V's hi-nibble dot as a difference of
  dots. q and the output ride FULL-D: the dequantized K halves are
  lane-concatenated in-kernel into one [bs, D] operand, so the score dot
  is a single full-128-wide MXU contraction with zero host-side copies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret

NEG_INF = -1e30
# Round-3 retune: the grid-step count, not FLOPs, dominated long-prefill
# flash (T=4096 MHA: 2300+ steps/layer at 256x512 — per-step fixed cost
# and mask VPU put the kernel at ~20% of its MXU SoL). 512x1024 quarters
# the step count; the diagonal-only mask skip (_mask call sites) removes
# the iota/compare/where VPU from interior blocks.
_DEF_BT = 512
_DEF_BS = 1024


def _head_scale_row(s_block, head):
    """[bs, Hkv] slot-major scale block → this head's [1, bs] lane row via
    one MXU dot with the head's indicator row (no lane-column slicing)."""
    Hkv = s_block.shape[1]
    e = (jax.lax.broadcasted_iota(jnp.int32, (1, Hkv), 1) == head
         ).astype(jnp.float32)
    return jax.lax.dot_general(e, s_block, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _live(qpos, win, s, bs, bt):
    """Whether slot block s intersects this t-block's visible range."""
    hi = qpos[bt - 1]                      # causal frontier (monotonic rows)
    lo_pos = qpos[0]
    return (s * bs <= hi) & ((win <= 0) | ((s + 1) * bs > lo_pos - win + 1))


def _mask(scores, qpos, win, s, bs):
    bt = scores.shape[0]
    slot = s * bs + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 1)
    ok = slot <= qpos[:, None]
    ok &= (win <= 0) | (slot > (qpos[:, None] - win))
    return jnp.where(ok, scores, NEG_INF)


def _fully_visible(qpos, win, s, bs, bt):
    """Whether slot block s is visible to EVERY row of this q block (so
    the [bt, bs] iota/compare/where mask can be skipped — true for all
    interior blocks; only the causal diagonal and the window's left edge
    need the mask)."""
    lo_pos = qpos[0]                       # monotonic rows
    hi_pos = qpos[bt - 1]
    vis = (s + 1) * bs - 1 <= lo_pos       # causally visible to the MIN row
    vis &= (win <= 0) | (s * bs > hi_pos - win)   # inside the MAX row's win
    return vis


def _online_update(scores, m_ref, l_ref):
    m_prev = m_ref[:]                                       # [bt, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, -1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                             # [bt, bs] f32
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, -1, keepdims=True)
    m_ref[:] = m_new
    return p, alpha


def _flash_body(qpos_ref, win_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                o_ref, acc_ref, m_ref, l_ref, *, scale: float,
                softcap: float, bs: int, G: int, quantized: bool):
    """Shared kernel body (dense flash AND paged_flash — the paged twin
    differs only in its host-side index maps/prefetch arity; bs is the
    slot-block width there = page size). Grid layout in both:
    (B, Hq, T/bt, S-blocks) with the slot axis innermost."""
    h = pl.program_id(1)
    s = pl.program_id(3)
    ns = pl.num_programs(3)
    qpos = qpos_ref[0, 0]                                   # [bt] int32
    win = win_ref[0]
    bt = q_ref.shape[2]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(_live(qpos, win, s, bs, bt))
    def _():
        q = q_ref[0, 0].astype(jnp.bfloat16)                # [bt, D]
        k = k_ref[0, 0, 0].astype(jnp.bfloat16)             # [bs, D]
        v = v_ref[0, 0, 0].astype(jnp.bfloat16)             # [bs, D]
        # NT form: contract D of both operands → [bt, bs]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if quantized:
            scores = scores * _head_scale_row(ks_ref[0, 0], h // G)
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        scores = jax.lax.cond(
            _fully_visible(qpos, win, s, bs, bt),
            lambda sc: sc, lambda sc: _mask(sc, qpos, win, s, bs), scores)
        p, alpha = _online_update(scores, m_ref, l_ref)
        if quantized:
            p = p * _head_scale_row(vs_ref[0, 0], h // G)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)

    @pl.when(s == ns - 1)
    def _():
        # fully-masked rows (padding tails) produce l=0 → emit zeros
        l = l_ref[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)


def _flash_body4(qpos_ref, win_ref, q_ref, k_ref, v_ref, ks_ref,
                 vs_ref, o_ref, acc_ref, m_ref, l_ref,
                 *, scale: float, softcap: float, bs: int, G: int):
    """INT4-KV variant (quantize_kv4 offset-lo packing) — same linear-fold
    unpack as decode_attention._kernel4. Shared with paged_flash.

    q and the output ride FULL-D: the dequantized K is rebuilt by
    lane-concatenating the unpacked halves in-kernel ([bs, D/2] ∥
    [bs, D/2] → [bs, D], a relayout Mosaic lowers on v5e — probed by
    scripts/proto_lane_concat), so the score dot is ONE full-128-wide MXU
    contraction and there are no host-side q/out half copies. (Slicing a
    mid unit dim of a packed [.., 2, D/2] block is a Mosaic-rejected
    shape cast; half-D BlockSpecs over the 128-wide q violate the
    last-block-dim rule — both earlier designs this replaces.)"""
    h = pl.program_id(1)
    s = pl.program_id(3)
    ns = pl.num_programs(3)
    qpos = qpos_ref[0, 0]
    win = win_ref[0]
    bt = q_ref.shape[2]
    D = q_ref.shape[3]
    D2 = D // 2

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(_live(qpos, win, s, bs, bt))
    def _():
        q = q_ref[0, 0].astype(jnp.float32)                 # [bt, D]
        kp = k_ref[0, 0, 0].astype(jnp.int32)               # [bs, D2]
        k_hi = jnp.right_shift(kp, 4).astype(jnp.float32)   # exact: lo_u≥0
        k_lo = (kp & 0xF).astype(jnp.float32)
        kfull = jnp.concatenate([k_lo, k_hi], axis=1)       # [bs, D]
        # the −8 offset applies to the lo half's q dims only
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, D), 1)
        q_losum = jnp.sum(jnp.where(lane < D2, q, 0.0), axis=1,
                          keepdims=True)
        scores = (jax.lax.dot_general(
            q, kfull, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            - 8.0 * q_losum) * scale
        scores = scores * _head_scale_row(ks_ref[0, 0], h // G)
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        scores = jax.lax.cond(
            _fully_visible(qpos, win, s, bs, bt),
            lambda sc: sc, lambda sc: _mask(sc, qpos, win, s, bs), scores)
        p, alpha = _online_update(scores, m_ref, l_ref)
        p = p * _head_scale_row(vs_ref[0, 0], h // G)
        # i32 before the AND — Mosaic v5e has no i8 ALU
        vp = v_ref[0, 0, 0].astype(jnp.int32)
        d1 = jnp.dot(p, vp.astype(jnp.float32),
                     preferred_element_type=jnp.float32)    # p·bytes
        d2 = jnp.dot(p, (vp & 0xF).astype(jnp.float32),
                     preferred_element_type=jnp.float32)    # p·lo_u
        psum = jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.concatenate(
            [d2 - 8.0 * psum, (d1 - d2) * 0.0625], axis=1)

    @pl.when(s == ns - 1)
    def _():
        l = l_ref[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)


def _kernel(lyr_ref, qposf_ref, win_ref, qpos_ref, *rest, **kw):
    # dense-flash wrapper: drop the prefetch refs the body doesn't need
    # (win rides prefetch AND feeds the body)
    _flash_body(qpos_ref, win_ref, *rest, **kw)


def _kernel4(lyr_ref, qposf_ref, win_ref, qpos_ref, *rest, **kw):
    _flash_body4(qpos_ref, win_ref, *rest, **kw)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "bt", "bs",
                                             "kvbits", "interpret"))
def _flash(q, k_all, v_all, ks_all, vs_all, qpos, lyr, win, *, scale,
           softcap, bt, bs, kvbits, interpret):
    # q arrives [B, Hq, T, D] so the q/out block satisfies the Mosaic
    # constraint that the last two block dims tile (8, 128); the int4
    # path keeps q/out full-D and lane-concats the unpacked KV halves
    # in-kernel (see _flash_body4)
    B, Hq, T = q.shape[:3]
    L, _, Hkv, S, Dk = k_all.shape
    G = Hq // Hkv
    grid = (B, Hq, T // bt, S // bs)
    quantized = ks_all is not None

    Tp = q.shape[2]

    def live(b, h, t, s, qposf, win):
        # clamp the slot-block index into the t-block's live range so the
        # pipeline elides DMAs for wholly-masked blocks (rows monotonic:
        # frontier from the block's last row, window start from its first;
        # qposf is the FLAT prefetched copy — 1-D scalar prefetch, same
        # pattern as the paged kernel's page table)
        hi = jnp.maximum(qposf[b * Tp + (t + 1) * bt - 1], 0) // bs
        lo = jnp.where(win[0] > 0,
                       jnp.maximum(qposf[b * Tp + t * bt] - win[0] + 1,
                                   0) // bs,
                       0)
        return jnp.minimum(jnp.maximum(s, lo), hi)

    def kv_map(b, h, t, s, lyr, qpos, win):
        return (lyr[0], b, h // G, live(b, h, t, s, qpos, win), 0)

    if kvbits == 4:
        D2 = Dk                       # pools are packed [.., S, D/2]
        D = 2 * D2
        # q/out ride FULL-D; the kernel lane-concats the unpacked halves
        qspec = pl.BlockSpec((1, 1, bt, D),
                             lambda b, h, t, s, lyr, qpos, win:
                             (b, h, t, 0))
        qspecs = [qspec]
        out_specs = qspec
        out_shape = jax.ShapeDtypeStruct((B, Hq, Tp, D), jnp.bfloat16)
        q_ops = (q,)
        kernel = functools.partial(_kernel4, scale=scale, softcap=softcap,
                                   bs=bs, G=G)
        scratch = [pltpu.VMEM((bt, D), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32)]
    else:
        qspec = pl.BlockSpec((1, 1, bt, Dk),
                             lambda b, h, t, s, lyr, qpos, win:
                             (b, h, t, 0))
        qspecs = [qspec]
        out_specs = qspec
        out_shape = jax.ShapeDtypeStruct(q.shape, jnp.bfloat16)
        q_ops = (q,)
        kernel = functools.partial(_kernel, scale=scale, softcap=softcap,
                                   bs=bs, G=G, quantized=quantized)
        scratch = [pltpu.VMEM((bt, Dk), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32),
                   pltpu.VMEM((bt, 1), jnp.float32)]
    in_specs = [
        # [B, 1, Tp] with a (1, 1, bt) block: the trailing block dims
        # (1, bt) match the array's (1, Tp) under Mosaic's divisibility
        # rule for ANY B — a [B, Tp] (1, bt) block only lowers when B == 1
        pl.BlockSpec((1, 1, bt),
                     lambda b, h, t, s, lyr, qpos, win: (b, 0, t)),
        *qspecs,
        pl.BlockSpec((1, 1, 1, bs, Dk), kv_map),
        pl.BlockSpec((1, 1, 1, bs, Dk), kv_map),
    ]
    if quantized:
        # slot-major [L, B, S, Hkv] scale pools: the [bs, Hkv] block is the
        # natural layout; the kernel extracts its head's [1, bs] row on
        # the MXU (Hkv is the FULL minor dim — Mosaic block rule)
        def s_map(b, h, t, s, lyr, qpos, win):
            return (lyr[0], b, live(b, h, t, s, qpos, win), 0)

        in_specs += [pl.BlockSpec((1, 1, bs, Hkv), s_map),
                     pl.BlockSpec((1, 1, bs, Hkv), s_map)]
        operands = (qpos[:, None], *q_ops, k_all, v_all, ks_all, vs_all)
    else:
        dummy = jnp.zeros((1, 1, 1, 128), jnp.float32)
        zmap = lambda b, h, t, s, lyr, qpos, win: (0, 0, 0, 0)  # noqa: E731
        in_specs += [pl.BlockSpec((1, 1, 1, 128), zmap),
                     pl.BlockSpec((1, 1, 1, 128), zmap)]
        operands = (qpos[:, None], *q_ops, k_all, v_all, dummy, dummy)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
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
            flops=4 * B * Hq * T * S * (Dk * (2 if kvbits == 4 else 1)),
            bytes_accessed=(k_all.size + v_all.size) * k_all.dtype.itemsize
            // L * (T // bt),
            transcendentals=B * Hq * T * S),
        interpret=interpret,
    )(lyr, qpos.reshape(-1), win, *operands)
    # ^ qpos rides prefetch FLAT (for the index maps) and as the blocked
    #   [bt] operand (vector masking)
    return out


def flash_attention(
    q: jnp.ndarray,            # [B, T, Hq, D] — T prefill tokens
    k_all: jnp.ndarray,        # [L, B, Hkv, S, D] full cache (pages written)
    v_all: jnp.ndarray,        # [L, B, Hkv, S, D]
    layer: jnp.ndarray,        # scalar int32
    positions: jnp.ndarray,    # [B, T] absolute query positions
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sliding_window=0,          # int or traced scalar; 0 = global
    k_scale: jnp.ndarray | None = None,   # [L, B, S, Hkv] — int8/int4 cache
    v_scale: jnp.ndarray | None = None,
    block_t: int = _DEF_BT,
    block_s: int = _DEF_BS,
) -> jnp.ndarray:
    """Blockwise masked attention over the cache; returns [B, T, Hq, D].

    Each row of `positions` must be NON-DECREASING (contiguous prefill
    ranges — every caller here) — the causal/window DMA skipping reads the
    per-block frontier off the block edges. `sliding_window` may be a
    TRACED scalar (gemma2/3's per-layer alternating window riding the
    layer scan)."""
    B, T, Hq, D = q.shape
    S = k_all.shape[3]
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    bt = min(block_t, T)
    bs = min(block_s, S)
    # bs must DIVIDE S: the grid's slot dim is S // bs, so a non-dividing
    # block would silently drop the trailing S % bs cache slots from
    # attention (supports() guarantees S % 128 == 0, so 128 always works)
    while S % bs:
        bs -= 128
    pad_t = (-T) % bt
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        # EDGE-pad positions: keeps each row non-decreasing so the skip
        # clamps read a correct frontier (−1 padding would clamp a
        # partially-padded block's DMA to slot block 0 and mask real
        # rows). Padded rows compute garbage that out[:, :T] drops.
        positions = jnp.pad(positions, ((0, 0), (0, pad_t)), mode="edge")
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    win = jnp.asarray(sliding_window, jnp.int32).reshape(1)
    kvbits = 4 if k_all.shape[4] * 2 == D else (
        8 if k_scale is not None else 16)
    qt = q.transpose(0, 2, 1, 3)
    out = _flash(qt, k_all, v_all, k_scale, v_scale,
                 positions.astype(jnp.int32), lyr, win,
                 scale=scale, softcap=logit_softcap,
                 bt=bt, bs=bs, kvbits=kvbits, interpret=use_interpret())
    out = out.transpose(0, 2, 1, 3)
    if pad_t:
        out = out[:, :T]
    return out.astype(q.dtype)


def supports(q_shape, S: int, quantized: bool = False) -> bool:
    B, T, Hq, D = q_shape
    # below ~1M score elements per head the XLA path (which materializes
    # [B,H,T,S] scores) is faster — the flash grid's per-(head, t-block)
    # invocation overhead dominates short prefills (measured: T=128, S=512
    # prefill got 2x slower through this kernel). Flash exists for the long-
    # context regime where materialized scores blow up memory. Quantized
    # caches (int8 + packed int4) are supported since the scale-fold /
    # linear-unpack variants landed.
    return (T > 1 and D in (64, 128, 256)
            and S % 128 == 0 and T >= 8 and T * S >= (1 << 20))
