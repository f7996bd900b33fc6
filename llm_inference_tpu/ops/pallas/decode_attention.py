"""Fused single-step (decode) cached attention — Pallas TPU kernel.

Reference analogue: `launchDecoderMaskedMHA` (reference:
src/kernels/fused_decoder_self_attention.cu:80-390) — one fused kernel doing
q·K over the cache, online softmax, and P·V per (batch, head). The reference
assigns one CUDA block per (batch, q-head) and loops over cached tokens; on
TPU the design criteria are DMA size (HBM streaming of KV pages), skipping
the UNWRITTEN tail of the cache, and keeping the per-step compute in a
FIXED, small number of MXU ops:

- Grid (B, Hkv/hb, S/sb) with the online-softmax recurrence over the slot
  blocks (running max/sum and the [hb·G, D] accumulator live in VMEM
  scratch; output written once at the last block). hb and sb are chosen so
  one k block [hb, sb, D] is ~1 MB — big enough to stream at HBM bandwidth,
  while sb stays small so the skip granularity is fine.
- LENGTH-AWARE STREAMING via a DYNAMIC grid bound: the slot-block grid dim
  is a TRACED value covering the batch's live range [lowest window-start
  block, highest fill block] (_dynamic_grid), so the kernel streams
  ~max(pos) slots, not the allocated S — one compiled program for every
  fill. (A serving-bucket cache is typically 2-3x longer than the live
  sequence; the previous whole-S kernel paid that multiple in HBM reads
  every layer. Merely CLAMPING dead blocks' index maps does NOT recover
  it — Mosaic still paid full-S time, measured in
  scripts/proto_dynamic_grid.py.) Within the batch, per-sequence index
  maps still clamp to each row's own fill and a `pl.when` guard skips
  dead compute.
- ALL hb pages fold into ONE MXU dot per tensor by flattening pages into the
  contraction/row dims (a per-head Python loop would serialize 3·hb tiny
  MXU ops):
    scoresᵀ = K.reshape(hb·sb, D) ·ᵀ q.reshape(hb·G, D)   → [hb·sb, hb·G]
              (dot_general contracting D of both — NT form, MXU-native)
    out     = Pᵀ(hb·sb, hb·G) ·ᵀᴺ V.reshape(hb·sb, D)     → [hb·G, D]
              (dot_general contracting the hb·sb rows of both — TN form)
  Cross-head entries (row page ≠ column head) are masked to -inf before the
  softmax, so they contribute exp(-inf)=0 to the P·V sum — correctness
  without any block-diagonal data movement. The hb× extra MXU work rides
  idle MXU columns; decode attention is HBM-bound.
- Masking is computed in-kernel from the scalar-prefetched positions
  (`slot <= position` — the ops.attention.make_attention_mask rule); no
  [B, 1, T, S] mask tensor exists.
- GQA folds the q-head group G into the dot's N dimension — the kernel never
  materializes repeated KV heads (the reference needs a separate repeat_kv
  gather kernel for prefill; its decode kernel is MHA-only).
- INT8 KV cache: per-(slot, head) scales are stored SLOT-MAJOR
  ([L, B, S, Hkv] — slots on sublanes, heads on lanes, so decode-step
  writes are one contiguous lane row). The score/probability columns need
  scales HEAD-major — a lanes↔sublanes relayout the VPU can't do — so the
  kernel transposes the [sb, Hkv] scale block ON THE MXU (identity
  NT-dot, ~0.1 µs) and folds the scales exactly into the f32 score and
  probability columns, outside the bf16 dots. The previous head-major
  [L, B, Hkv, S] storage needed a lane-vector reshape OUTSIDE the kernel,
  which XLA materialized as a full relayout copy of the whole scale array
  EVERY LAYER EVERY STEP (measured 96 µs per layer at B=8·S=512 —
  3.1 ms/step, dwarfing the 47 µs attention kernel); an in-kernel per-head
  dequant loop instead cost ~2 VPU ops per streamed KV byte, 2.4x the DMA
  time. hb is pinned to Hkv in this mode (Mosaic full-dim block rule on
  the scale minor axis).
- The layer index rides scalar prefetch so pages are read straight out of
  the FULL stacked cache (a scan-sliced operand into an opaque Pallas call
  would be materialized by XLA — an HBM→HBM copy every layer every step).

The new token's k/v are written by ops.kvcache.update_cache_layer BEFORE the
call (in-place under jit donation), so slot[position] is already valid —
same ordering as the reference, which appends inside the kernel
(fused_decoder_self_attention.cu:237-249).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret

NEG_INF = -1e30

# Per-grid-step KV bytes: small enough that the grid gives the pipeline
# enough steps to hide DMA latency, big enough for efficient DMA.
# (LLMI_ATTN_KVB overrides for A/B — at serving buckets S≈512 the int8
# kernel otherwise runs ~1 grid step, i.e. zero DMA/compute overlap.)
import os as _os
_KV_BYTES_PER_STEP = int(_os.environ.get("LLMI_ATTN_KVB",
                                         str(1024 * 1024)))
# Above this cache length the XLA path is used (engine buckets keep S at or
# below this).
_MAX_S = 16384


def _kv4_floor_unpack():
    """INT4-KV nibble strategy (LLMI_KV4_UNPACK=shift reverts to the
    shift/AND path for A/B). floor (candidate default, VERDICT r3 #7 —
    the weight GEMV's floor-unpack win applied to the KV path):
      K: hi = floor(f/16), scores = q_lo·f + (q_hi − 16·q_lo)·hi − 8·Σq_lo
         — 3 VPU ops/byte (f32 convert, mul, floor) vs 5 for
         i32-convert/shift/AND, and the dequantized-K lane concat
         disappears (two half-D dots ride the idle MXU instead).
      V: d_hi = p·floor(f/16), d_lo = p·f − 16·d_hi − 8·Σp — 3 ops/byte
         vs 4 (drops the AND operand build).
    The int4-vs-int8 KV speed loss (123.6 vs 127.0 tok/s @ S=4096) was
    attributed to exactly this VPU unpack tax."""
    import os
    return os.environ.get("LLMI_KV4_UNPACK", "floor") == "floor"


def _strip_heads(hb: int, G: int) -> int:
    """Heads per score-tile strip (see the strip comment in _kernel).

    Default: hb (whole-block, single strip) — the round-5 chip A/B at
    bs=16/32 measured strips marginally SLOWER (7.56 vs 7.50 ms/step
    bs=16; 10.12 vs 10.04 bs=32, interleaved runs): the dead block-
    diagonal VPU work is NOT the binding constraint — the kernel is
    DMA-bound streaming sb-granular slot blocks (~60 % live at serving
    prompt lengths), and the strip restructure only added dot overhead.
    Kept as an opt-in (LLMI_ATTN_STRIPS=N, N | hb) with parity tests —
    the third clean null result of the round's kernel campaign (after
    the layer megakernel tie and the group-stacked GEMV tie), all three
    saying the same thing: v5e hides launch/issue costs, and only
    byte-count or VPU-op-count reductions move these kernels."""
    env = _os.environ.get("LLMI_ATTN_STRIPS")
    if env is not None:
        n = int(env)
        if n <= 0 or n >= hb or hb % n:
            return hb
        return n
    return hb


def _pick_blocks(Hkv: int, S: int, D: int, itemsize: int):
    """(hb, sb): one k block [hb, sb, D] ≈ _KV_BYTES_PER_STEP.

    hb trades DMA size against VPU time: the masked-softmax tile is
    [hb·G, hb·sb], so its element count — and the exp/mask VPU work — grow
    LINEARLY with hb at fixed block bytes. hb=8 keeps the per-step k-block
    ≥0.5 MB for int8/bf16 at D=128 (enough to stream near bandwidth) with
    4-8x less VPU work than hb=32; sb then fills the byte budget and sets
    the unwritten-tail skip granularity.

    Quantized caches force hb=Hkv: the [sb, hb] scale block's minor dim
    must be 128-divisible or the FULL array dim (Mosaic block rule), and
    Hkv < 128 in practice."""
    hb = Hkv if itemsize == 1 else max(1, min(Hkv, 8))
    while Hkv % hb:
        hb -= 1
    # ≥2 slot blocks (else the fill clamp can never skip anything), within
    # the byte budget
    sb = max(128, min(S, _KV_BYTES_PER_STEP // (hb * D * itemsize),
                      max(128, S // 2)))
    sb -= sb % 128
    while S % sb:
        sb -= 128
    return hb, sb


def _dynamic_grid(B, nh, pos, win, sb):
    """Grid with a DYNAMIC slot-block dim covering the batch's live range
    [base, hi] — base is the lowest window-start block (0 for global
    attention), hi the highest causal frontier block.

    The index-map clamp alone does NOT save the dead blocks' DMA time —
    Mosaic still pays full-S streaming (measured: proto_decode_blocks at
    B=16 S=512 fill=168 runs at the full-S cost, 2x the clamped
    speed-of-light; proto_dynamic_grid shows the traced bound recovers
    it). One compiled program serves every fill; ~one extra DMA-latency
    bubble per (b, h) rollover at full fill is the only cost.

    Returns (win2, grid) where win2 = [window, base] rides scalar prefetch
    (the kernel and index maps offset grid j by base).

    Rows with pos == 0 are treated as INACTIVE for the windowed base:
    scheduler-padded/empty slots sit at pos 0, and one such row would drag
    the base to block 0 so the whole batch streams the full history every
    windowed layer (the mixed-progress continuous-batching perf cliff). An
    ACTIVE decode row always has pos >= 1 — decode follows at least one
    prefilled token — so the exclusion never clips a live row's window."""
    hi = jnp.max(pos) // sb
    live_min = jnp.min(jnp.where(pos > 0, pos, jnp.iinfo(jnp.int32).max))
    lo = jnp.where(jnp.any(pos > 0), live_min, jnp.int32(0))
    base = jnp.where(win[0] > 0,
                     jnp.maximum(lo - win[0] + 1, 0) // sb,
                     jnp.int32(0))
    win2 = jnp.stack([win[0], base]).astype(jnp.int32)
    return win2, (B, nh, hi - base + 1)


def _kernel(pos_ref, layer_ref, win_ref, q_ref, k_ref, v_ref, ks_ref,
            vs_ref, o_ref, acc_ref, m_ref, l_ref, *, hb: int, sb: int,
            scale: float, softcap: float, quantized: bool):
    b = pl.program_id(0)
    # the slot-block grid dim is DYNAMIC (sized to the batch's live range,
    # see _decode_attn); j counts from the window base block
    j = win_ref[1] + pl.program_id(2)
    pos = pos_ref[b]
    win = win_ref[0]     # sliding window (slots), 0 = global attention
    _, _, G, D = q_ref.shape
    HG = hb * G
    HS = hb * sb

    @pl.when(pl.program_id(2) == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # blocks past THIS sequence's fill — and, for windowed layers, blocks
    # wholly below its window start — are clamped to its nearest live block
    # by the index maps; skip their compute. (The grid already stops at the
    # BATCH-wide frontier — dynamic ns — this guard handles per-sequence
    # variance within the batch.) Block j covers slots [j·sb, (j+1)·sb);
    # the window spans (pos-win, pos].
    @pl.when((j * sb <= pos) & ((win <= 0) | ((j + 1) * sb > pos - win + 1)))
    def _():
        q = q_ref[0].reshape(HG, D).astype(jnp.bfloat16)      # rows (h, g)
        kb = k_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)  # rows (h, s)
        vb = v_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)
        if quantized:
            # Per-(slot, head) scales arrive as the natural slot-major
            # [sb, hb] block. The score/probability columns need them
            # HEAD-major — a lanes↔sublanes relayout the VPU can't do, so
            # transpose on the MXU (one identity NT-dot each), then scale
            # per-head column STRIPS: each strip slice is lane-aligned
            # (sb % 128 == 0) so the re-concatenated tiles share layout
            # offset {0,0} (a flat [1, hb·sb] row concat trips Mosaic's
            # offset-mismatch rule on the sublane axis). Exact: int8 codes
            # are exact in bf16; scales hit the f32 score/p tiles.
            eye = (jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0) ==
                   jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 1)
                   ).astype(jnp.float32)
            ks_t = jax.lax.dot_general(                       # [hb, sb]
                eye, ks_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            vs_t = jax.lax.dot_general(
                eye, vs_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # STRIP processing (round 5): the full [hb·G, hb·sb] score tile
        # is block-DIAGONAL — only 1/hb of it is live, but the mask iota,
        # exp, max/sum and the two dots all paid for the dead (hb−1)/hb.
        # With the quantized hb=Hkv pin (Mosaic scale-block rule) that was
        # 31/32 dead work at MHA-32 and measured ~500 GB/s attention at
        # bs≥8. Processing hs heads per dot shrinks the tile to
        # [hs·G, hs·sb] (dead fraction (hs−1)/hs) at the cost of hb/hs
        # smaller MXU dots — which cost nothing extra (the group-stacked
        # GEMV A/B showed small-dot count is not a constraint).
        # LLMI_ATTN_STRIPS=0 reverts to whole-block; =N forces N.
        hs = _strip_heads(hb, G)
        for h0 in range(0, hb, hs):
            r0, r1 = h0 * G, (h0 + hs) * G
            s0, s1 = h0 * sb, (h0 + hs) * sb
            qs = q[r0:r1]                         # [hs·G, D]
            ks = kb[s0:s1]                        # [hs·sb, D]
            vs_b = vb[s0:s1]
            scores = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if quantized:
                scores = jnp.concatenate(
                    [scores[:, (h - h0) * sb:(h - h0 + 1) * sb]
                     * ks_t[h:h + 1, :] for h in range(h0, h0 + hs)],
                    axis=1)
            if softcap > 0.0:
                scores = jnp.tanh(scores / softcap) * softcap
            row = jax.lax.broadcasted_iota(jnp.int32,
                                           (hs * G, hs * sb), 0)
            col = jax.lax.broadcasted_iota(jnp.int32,
                                           (hs * G, hs * sb), 1)
            slot = j * sb + col % sb
            ok = ((col // sb) == (row // G)) & (slot <= pos)
            ok &= (win <= 0) | (slot > pos - win)
            scores = jnp.where(ok, scores, NEG_INF)

            m_prev = m_ref[r0:r1]                             # [hs·G, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)           # [hs·G, hs·sb] f32
            l_ref[r0:r1] = l_ref[r0:r1] * alpha + jnp.sum(
                p, axis=1, keepdims=True)
            m_ref[r0:r1] = m_new
            if quantized:
                p = jnp.concatenate(
                    [p[:, (h - h0) * sb:(h - h0 + 1) * sb]
                     * vs_t[h:h + 1, :] for h in range(h0, h0 + hs)],
                    axis=1)
            # cross-head entries of p are exp(-inf) = 0, so the strip
            # dot sums each output head only over its own pages
            acc_ref[r0:r1] = acc_ref[r0:r1] * alpha + jnp.dot(
                p.astype(jnp.bfloat16), vs_b,
                preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # slot `pos` is always written and unmasked → l > 0
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(hb, G, D
                                                   ).astype(o_ref.dtype)


def _kernel4(pos_ref, layer_ref, win_ref, q_ref, k_ref, v_ref,
             ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref, *, hb: int,
             sb: int, scale: float, softcap: float):
    """INT4 KV variant (quantization.quantize_kv4 offset-lo packing: signed
    byte = 16·hi + lo_u, lo stored +8). Every nibble extraction is a linear
    fold — no floor/mul on the VPU:
      scores = (q·[lo_u ∥ hi]ᵀ − 8·losum(q))·scale, hi = byte >> 4
      out    = [p·lo_u − 8·rowsum(p) ∥ (p·bytes − p·lo_u)/16]
    q and the output ride FULL-D: the dequantized K halves are rebuilt
    with one in-kernel lane concat ([bs, D/2] ∥ [bs, D/2] → [bs, D], a
    relayout Mosaic lowers on v5e — probed by scripts/proto_lane_concat),
    so the score dot is ONE full-128-wide MXU contraction rather than two
    half-width ones, with zero host-side q/out half copies. (Half-D q
    BlockSpecs over the 128-wide array violate Mosaic's last-block-dim
    rule; host-side q slices cost two HBM copies per call — both earlier
    designs this replaces.)"""
    b = pl.program_id(0)
    j = win_ref[1] + pl.program_id(2)   # dynamic grid: j from window base
    pos = pos_ref[b]
    win = win_ref[0]
    _, _, G, D = q_ref.shape
    D2 = D // 2
    HG = hb * G
    HS = hb * sb

    @pl.when(pl.program_id(2) == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((j * sb <= pos) & ((win <= 0) | ((j + 1) * sb > pos - win + 1)))
    def _():
        q = q_ref[0].reshape(HG, D).astype(jnp.float32)
        # the −8 offset applies to the lo half's q dims only
        lane = jax.lax.broadcasted_iota(jnp.int32, (HG, D), 1)
        q_losum = jnp.sum(jnp.where(lane < D2, q, 0.0), axis=1,
                          keepdims=True)
        if _kv4_floor_unpack():
            # byte = 16·hi + lo_u ⇒ q_lo·lo_u + q_hi·hi =
            # q_lo·byte + (q_hi − 16·q_lo)·hi — 3 VPU ops/byte, no
            # dequantized-K concat (two half-D dots on the idle MXU)
            f = k_ref[0, 0].reshape(HS, D2).astype(jnp.float32)
            k_hi = jnp.floor(f * 0.0625)
            q_lo, q_hi = q[:, :D2], q[:, D2:]
            scores = (jax.lax.dot_general(
                q_lo, f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    q_hi - 16.0 * q_lo, k_hi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                - 8.0 * q_losum) * scale
        else:
            kp = k_ref[0, 0].reshape(HS, D2).astype(jnp.int32)
            k_hi = jnp.right_shift(kp, 4).astype(jnp.float32)  # lo_u≥0
            k_lo = (kp & 0xF).astype(jnp.float32)
            kfull = jnp.concatenate([k_lo, k_hi], axis=1)      # [HS, D]
            # ONE NT dot contracting the full D; f32 nibbles on the MXU
            scores = (jax.lax.dot_general(
                q, kfull, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
                - 8.0 * q_losum) * scale
        # per-(slot, head) scale fold — identical to the int8 kernel
        eye = (jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 1)
               ).astype(jnp.float32)
        ks_t = jax.lax.dot_general(
            eye, ks_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        vs_t = jax.lax.dot_general(
            eye, vs_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        def scale_strips(x, s_t):
            return jnp.concatenate(
                [x[:, h * sb:(h + 1) * sb] * s_t[h:h + 1, :]
                 for h in range(hb)], axis=1)

        scores = scale_strips(scores, ks_t)
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        row = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 1)
        slot = j * sb + col % sb
        ok = ((col // sb) == (row // G)) & (slot <= pos)
        ok &= (win <= 0) | (slot > pos - win)
        scores = jnp.where(ok, scores, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                       # [HG, HS] f32
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        p = scale_strips(p, vs_t)                         # fold V scales
        psum = jnp.sum(p, axis=1, keepdims=True)          # scaled-p rowsum
        if _kv4_floor_unpack():
            # d_hi = p·floor(f/16); d_lo = p·f − 16·d_hi − 8·psum —
            # 3 VPU ops/byte, no AND operand build
            fv = v_ref[0, 0].reshape(HS, D2).astype(jnp.float32)
            d1 = jnp.dot(p, fv, preferred_element_type=jnp.float32)
            dh = jnp.dot(p, jnp.floor(fv * 0.0625),
                         preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + jnp.concatenate(
                [d1 - 16.0 * dh - 8.0 * psum, dh], axis=1)
        else:
            # i32 before the AND — Mosaic v5e has no i8 ALU (same reason
            # the K path converts before its shift)
            vp = v_ref[0, 0].reshape(HS, D2).astype(jnp.int32)
            d1 = jnp.dot(p, vp.astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # p·bytes
            d2 = jnp.dot(p, (vp & 0xF).astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # p·lo_u
            acc_ref[:] = acc_ref[:] * alpha + jnp.concatenate(
                [d2 - 8.0 * psum, (d1 - d2) * 0.0625], axis=1)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(
            hb, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "interpret"))
def _decode_attn4(qg, k_all, v_all, ks_all, vs_all, pos, layer, win, *,
                  scale: float, softcap: float, interpret: bool):
    """INT4-KV twin of _decode_attn: q and the output ride FULL-D (zero
    copies); the kernel rebuilds the dequantized K by lane-concatenating
    the unpacked halves (see _kernel4). Pools are packed
    [L, B, Hkv, S, D/2]."""
    B, Hkv, G, D = qg.shape
    D2 = D // 2
    S = k_all.shape[3]
    # itemsize 1 pins hb = Hkv (scale-block full-dim rule) and sizes sb
    # on the packed D/2 bytes — same policy as the int8 path
    hb, sb = _pick_blocks(Hkv, S, D2, 1)
    win, grid = _dynamic_grid(B, 1, pos, win, sb)
    kernel = functools.partial(_kernel4, hb=hb, sb=sb, scale=scale,
                               softcap=softcap)

    def live(b, j, pos, win):
        jj = j + win[1]     # grid j counts from the window base block
        lo = jnp.where(win[0] > 0,
                       jnp.maximum(pos[b] - win[0] + 1, 0) // sb, 0)
        return jnp.minimum(jnp.maximum(jj, lo), pos[b] // sb)

    def kv_map(b, g, j, pos, lyr, win):
        return (lyr[0], b, g, live(b, j, pos, win), 0)

    def s_map(b, g, j, pos, lyr, win):
        return (lyr[0], b, live(b, j, pos, win), g)

    qspec = pl.BlockSpec((1, hb, G, D),
                         lambda b, g, j, pos, lyr, win: (b, g, 0, 0))
    in_specs = [
        qspec,
        pl.BlockSpec((1, 1, hb, sb, D2), kv_map),
        pl.BlockSpec((1, 1, hb, sb, D2), kv_map),
        pl.BlockSpec((1, 1, sb, hb), s_map),
        pl.BlockSpec((1, 1, sb, hb), s_map),
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
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
        # deliberate full-S UPPER BOUND: the dynamic grid streams only
        # ~max(pos) slots, but the live fraction is traced (unknown at
        # lowering) — scheduling hints must not under-state the work
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D2 * 2,
            bytes_accessed=(k_all.size + v_all.size) // k_all.shape[0],
            transcendentals=B * Hkv * G * S),
        interpret=interpret,
    )(pos, layer, win, qg, k_all, v_all, ks_all, vs_all)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "interpret"))
def _decode_attn(q, k_all, v_all, ks_all, vs_all, pos, layer, win, *,
                 scale: float, softcap: float, interpret: bool):
    B, Hkv, G, D = q.shape
    S = k_all.shape[3]
    quantized = ks_all is not None
    hb, sb = _pick_blocks(Hkv, S, D, k_all.dtype.itemsize)
    win, grid = _dynamic_grid(B, Hkv // hb, pos, win, sb)
    kernel = functools.partial(_kernel, hb=hb, sb=sb, scale=scale,
                               softcap=softcap, quantized=quantized)

    def live(b, j, pos, win):
        # clamp the slot-block index into THIS sequence's live range
        # [window-start block, fill block]; the grid's dynamic last dim
        # (_dynamic_grid) already spans only the BATCH-wide live range.
        jj = j + win[1]     # grid j counts from the window base block
        lo = jnp.where(win[0] > 0,
                       jnp.maximum(pos[b] - win[0] + 1, 0) // sb, 0)
        return jnp.minimum(jnp.maximum(jj, lo), pos[b] // sb)

    def kv_map(b, g, j, pos, lyr, win):
        return (lyr[0], b, g, live(b, j, pos, win), 0)

    in_specs = [
        pl.BlockSpec((1, hb, G, D),
                     lambda b, g, j, pos, lyr, win: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, hb, sb, D), kv_map),
        pl.BlockSpec((1, 1, hb, sb, D), kv_map),
    ]
    operands = [q, k_all, v_all]
    if quantized:
        # scales are stored slot-major [L, B, S, Hkv] — each grid step takes
        # the natural [sb, hb] block (slots on sublanes, heads on lanes);
        # the kernel dequantizes K/V codes with it. No reshape, no relayout.
        def s_map(b, g, j, pos, lyr, win):
            return (lyr[0], b, live(b, j, pos, win), g)

        in_specs += [
            pl.BlockSpec((1, 1, sb, hb), s_map),
            pl.BlockSpec((1, 1, sb, hb), s_map),
        ]
        operands += [ks_all, vs_all]
    else:
        # dummy 1-element scale blocks so the kernel arity is fixed
        dummy = jnp.zeros((1, 1, 1, 128), jnp.float32)
        in_specs += [
            pl.BlockSpec((1, 1, 1, 128),
                         lambda b, g, j, pos, lyr, win: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 128),
                         lambda b, g, j, pos, lyr, win: (0, 0, 0, 0)),
        ]
        operands += [dummy, dummy]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, G, D),
                                   lambda b, g, j, pos, lyr, win:
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
        # deliberate full-S UPPER BOUND (see _decode_attn4's note): the
        # dynamic grid covers ~max(pos) slots but that fraction is traced
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=(k_all.size + v_all.size) * k_all.dtype.itemsize
            // k_all.shape[0],
            transcendentals=B * Hkv * G * S),
        interpret=interpret,
    )(pos, layer, win, *operands)


def decode_attention(
    q: jnp.ndarray,            # [B, 1, Hq, D] — single new token per sequence
    k_all: jnp.ndarray,        # [L, B, Hkv, S, D] full cache (token written)
    v_all: jnp.ndarray,        # [L, B, Hkv, S, D]
    layer: jnp.ndarray,        # scalar int32 — which layer's pages to read
    positions: jnp.ndarray,    # [B] or [B, 1] absolute position of the token
    scale: float | None = None,
    logit_softcap: float = 0.0,
    k_scale: jnp.ndarray | None = None,   # [L, B, S, Hkv] — int8 cache mode
    v_scale: jnp.ndarray | None = None,
    window: jnp.ndarray | int | None = None,  # sliding window; 0/None=global
) -> jnp.ndarray:
    """Fused decode attention; returns [B, 1, Hq, D] in q.dtype.

    `window` (may be a TRACED scalar — e.g. gemma2's per-layer alternating
    window riding the layer scan) restricts attention to slots
    (pos-window, pos] AND restricts the KV streaming to the window's slot
    blocks — a windowed layer reads ~window slots of cache, not S.

    Callers check `supports(...)` first and use ops.attention otherwise.
    """
    B, T, Hq, D = q.shape
    assert T == 1, "decode kernel is single-step"
    Hkv, S = k_all.shape[2], k_all.shape[3]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    # positions + layer + window ride scalar prefetch (SMEM); the kernel
    # indexes pos with program_id(0), and the index maps pick the cache
    # layer and clamp slot blocks to each sequence's live range.
    pos = positions.reshape(B).astype(jnp.int32)
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    win = jnp.asarray(0 if window is None else window,
                      jnp.int32).reshape(1)
    if k_all.shape[4] * 2 == D:
        # packed INT4 cache: q/out ride FULL-D; the kernel lane-concats the
        # unpacked K/V halves (zero host copies, one full-width MXU dot)
        qg = q.reshape(B, Hkv, G, D)
        out = _decode_attn4(qg, k_all, v_all, k_scale, v_scale, pos,
                            lyr, win, scale=scale, softcap=logit_softcap,
                            interpret=use_interpret())
        return out.reshape(B, 1, Hq, D).astype(q.dtype)
    qg = q.reshape(B, Hkv, G, D)
    out = _decode_attn(qg, k_all, v_all, k_scale, v_scale, pos, lyr, win,
                       scale=scale, softcap=logit_softcap,
                       interpret=use_interpret())
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


def supports(q_shape, S: int) -> bool:
    """Whether the fused kernel handles this case (else use ops.attention)."""
    B, T, Hq, D = q_shape
    return T == 1 and S <= _MAX_S and D in (64, 128, 256) and S % 128 == 0
