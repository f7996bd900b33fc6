"""Whole-decoder-layer decode megakernel — ONE Pallas call per layer.

Reference analogue: the complete per-layer decode chain of
`LlamaSelfDecoder::forward` (reference: src/layers/decoder/
self_decoder.cpp:53-83): qkv_linear → RoPE → concat-KV → fused masked
self-attention → o_linear → add-residual-norm → FFN — each a separate CUDA
launch there. Round-3 already fused the tail (wo → +h/norm → gate-up →
SwiGLU → down, ops/pallas/quant_matmul.layer_tail_fused); this kernel folds
the REST of the layer in front of it: the fused-norm qkv GEMV, in-kernel
RoPE, the KV write (cache aliased in place; int8 caches quantize
in-kernel), and the online-softmax attention over the streamed cache — so
a decode layer is ONE kernel invocation instead of four. The measured
motivation (round 3): ~5 µs fixed cost per kernel invocation × 4
invocations × 32 layers ≈ the whole remaining gap to the INT4 roofline
target; a single grid also lets Mosaic prefetch each phase's first weight
block behind the previous phase's tail compute instead of paying a cold
DMA ramp per kernel.

Single-sequence decode only (B = 1, T = 1) — the bs=1 latency path this
framework's headline bench measures. Batched decode keeps the split
kernels (their grids parallelize over B). Covers BOTH bench configs:
npair-INT4 weights + INT8 KV (the secondary line) and blocked INT8
weights + bf16 KV (the headline line); grouped or per-channel scales.

Phase layout on ONE 1-D grid whose attention extent is TRACED
(nS = ceil(pos / sb) slot blocks — the same dynamic-grid trick as
ops/pallas/decode_attention):

  j ∈ [0, NBq)            qkv GEMV blocks (j==0 runs the fused
                          residual+RMSNorm prologue; output accumulates
                          into a flat [1, Nqkv] f32 scratch)
  j == NBq                head assembly (static vreg moves from the flat
                          scratch), RoPE, (int8-quantize +) one-hot blend
                          into the aliased cache RMW blocks, online-
                          softmax INIT from the new token itself
  j ∈ (NBq, attn_end)     attention slot blocks over the CACHE (slots
                          strictly < pos — slot pos is stale in HBM during
                          this call; its contribution was seeded in-VMEM
                          at j==NBq, which also makes the write/read
                          ordering hazard moot)
  j ∈ [attn_end, +NBo)    wo GEMV (x = attention rows; groups are row
                          slices since the group size divides D — no
                          lanes↔sublanes reshape anywhere)
  j == attn_end+NBo       residual add + FFN RMSNorm (h2 output written)
  next NBg                gate-up GEMV
  one step                SwiGLU
  last NBd                down GEMV (down_out blocks written)

All weight operands are stacked blocked QTensors indexed by the scalar-
prefetched layer (the repo invariant: never scan-slice an operand into a
custom call). The cache is READ-ONLY here: the kernel outputs the new
token's roped k/v rows and the caller writes them with the existing
fused write kernel (ops/pallas/kv_write) — so a layer is TWO calls, not
four. (v1 of this kernel wrote the cache itself via input_output_aliases
with the array ALSO passed as a streaming operand; XLA copy-protected
the dual use with FOUR full-cache copies per layer per step — 650 ms of
a 1050 ms 32-step trace, 188.7 → 30.5 tok/s. Never alias an output to
an operand whose buffer the same call also reads through another
operand.) The current token's attention contribution is seeded in-VMEM
at phase B, so nothing here depends on the write landing first; the
write kernel's output cache is what the NEXT decode step streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret
from llm_inference_tpu.ops.pallas.quant_matmul import (_group_dots_npair,
                                                       _npair_unpack_floor)
from llm_inference_tpu.ops.quantization import QTensor

NEG_INF = -1e30


def _gdots(x_f32, w, s_blk, gsize, bits, floor_unpack):
    """One weight block's GEMV: x [M, K] f32 (lane-contiguous) × blocked
    codes → [M, out] f32. bits=4 → npair difference-of-dots; bits=8 →
    bf16 dots with output-side scales (gsize=0 = per-channel)."""
    if bits == 4:
        return _group_dots_npair(x_f32, w, s_blk, gsize, floor_unpack)
    Kp, bn = w.shape
    if gsize == 0:                      # per-channel
        acc = jnp.dot(x_f32.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return acc * s_blk[0:1]
    acc = jnp.zeros((x_f32.shape[0], bn), jnp.float32)
    for g in range(Kp // gsize):
        r0 = g * gsize
        xg = x_f32[:, r0:r0 + gsize].astype(jnp.bfloat16)
        acc += jnp.dot(xg, w[r0:r0 + gsize].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32
                       ) * s_blk[g][None, :]
    return acc


def _gdots_rows(x_ref, w, s_blk, gsize, bits, floor_unpack, D):
    """Same GEMV with x stored as HEAD ROWS [Hq, D] (the attention
    accumulator): contraction index c ↔ x[c // D, c % D] — static
    sublane/lane slices, so the wo GEMV consumes the attention output
    without any lanes↔sublanes relayout. Requires D % gsize == 0 (or
    per-channel, which chunks by D)."""
    Kp, bn = w.shape
    step = gsize if gsize else D
    acc_lo = jnp.zeros((1, bn), jnp.float32)
    acc_hi = jnp.zeros((1, bn), jnp.float32) if bits == 4 else None
    for c0 in range(0, Kp, step):
        h, off = c0 // D, c0 % D
        xg = x_ref[h:h + 1, off:off + step]
        wb = w[c0:c0 + step]
        if bits == 4:
            xsum = jnp.sum(xg, -1, keepdims=True)
            if floor_unpack:
                f = wb.astype(jnp.float32)
                hi_s = jnp.floor(f * 0.0625)
                d1 = jnp.dot(xg, f, preferred_element_type=jnp.float32)
                d_hi = jnp.dot(xg, hi_s,
                               preferred_element_type=jnp.float32)
                d_lo = d1 - 16.0 * d_hi - 8.0 * xsum
            else:
                d1 = jnp.dot(xg, wb.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
                d2 = jnp.dot(xg, (wb & 0xF).astype(jnp.float32),
                             preferred_element_type=jnp.float32)
                d_lo = d2 - 8.0 * xsum
                d_hi = (d1 - d2) * 0.0625
            s = s_blk[c0 // gsize:c0 // gsize + 1]
            acc_lo += d_lo * s[:, :bn]
            acc_hi += d_hi * s[:, bn:]
        else:
            d = jnp.dot(xg.astype(jnp.bfloat16),
                        wb.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc_lo += d * (s_blk[c0 // gsize][None, :] if gsize
                           else 1.0)
    if bits == 4:
        return jnp.concatenate([acc_lo, acc_hi], axis=1)
    if gsize == 0:
        acc_lo = acc_lo * s_blk[0:1]
    return acc_lo


def _kernel(meta_ref, h_ref, res_ref, ga_ref, gf_ref, cos_ref, sin_ref,
            wq_ref, sq_ref, k_ref, v_ref, *rest,
            NBq: int, NBo: int, NBg: int, NBd: int,
            gsq: int, gso: int, gsg: int, gsd: int,
            Hq: int, Hkv: int, G: int, D: int, sb: int,
            eps: float, scale: float, I_half: int,
            outq: int, outo: int, outg: int, wbits: int,
            quant_kv: bool, floor_unpack: bool):
    rest = list(rest)
    if quant_kv:
        ks_ref, vs_ref = rest.pop(0), rest.pop(0)
    else:
        ks_ref = vs_ref = None
    wo_ref, so_ref = rest.pop(0), rest.pop(0)
    wg_ref, sg_ref = rest.pop(0), rest.pop(0)
    wd_ref, sd_ref = rest.pop(0), rest.pop(0)
    dn_ref, h2_ref = rest.pop(0), rest.pop(0)
    ko_ref, vo_ref = rest.pop(0), rest.pop(0)
    (qkv_ref, hsum_ref, xn_ref, q_sref, m_ref, l_ref, acc_ref,
     wout_ref, gu_ref, act_ref) = rest

    j = pl.program_id(0)
    pos = meta_ref[1]
    attn_end = meta_ref[2]

    # ---- phase A: fused-norm qkv GEMV into the flat scratch ----
    @pl.when(j == 0)
    def _():
        x32 = h_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
        hsum_ref[:] = x32
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        xn_ref[:] = (x32 * jax.lax.rsqrt(var + eps)
                     * ga_ref[0].astype(jnp.float32))

    @pl.when(j < NBq)
    def _():
        acc = _gdots(xn_ref[:], wq_ref[0, 0], sq_ref[0, 0], gsq, wbits,
                     floor_unpack)
        qkv_ref[:, pl.dslice(j * outq, outq)] = acc

    # ---- phase B: heads, RoPE, (quantize+)write, self-term seed ----
    @pl.when(j == NBq)
    def _():
        qf = qkv_ref[:]
        # [1, Nqkv] → head rows: each [1, 128] slice is one whole vreg at
        # lane offset 0, so the sublane concat is plain vreg moves — never
        # the (unsupported) flat lanes→sublanes reshape
        q = jnp.concatenate([qf[:, i * D:(i + 1) * D]
                             for i in range(Hq)], axis=0)
        k = jnp.concatenate([qf[:, (Hq + i) * D:(Hq + i + 1) * D]
                             for i in range(Hkv)], axis=0)
        v = jnp.concatenate([qf[:, (Hq + Hkv + i) * D:(Hq + Hkv + i + 1) * D]
                             for i in range(Hkv)], axis=0)
        cos = cos_ref[:].astype(jnp.float32)           # [1, D]
        sin = sin_ref[:].astype(jnp.float32)

        def rope(x):
            x1, x2 = x[:, :D // 2], x[:, D // 2:]
            rot = jnp.concatenate([-x2, x1], axis=1)   # lane concat (64∥64)
            return x * cos + rot * sin

        q = rope(q)
        k = rope(k)
        q_sref[:] = q * scale          # attention scale folded in once

        # new rows OUT (bf16, post-rope) — the caller's kv_write kernel
        # lands them in the cache; round to bf16 FIRST so the self-term
        # below sees exactly what that kernel will quantize/store
        k16 = k.astype(jnp.bfloat16)
        v16 = v.astype(jnp.bfloat16)
        ko_ref[:] = k16
        vo_ref[:] = v16

        if quant_kv:
            # the seed attends the DEQUANTIZED int8 codes — same math as
            # the split path (kv_write._qkernel quantize, then attend)
            def quant_dq(rows16):                      # [Hkv, D] bf16
                r = rows16.astype(jnp.float32)
                absmax = jnp.max(jnp.abs(r), axis=-1, keepdims=True)
                s = jnp.maximum(absmax / 127.0, 1e-8)  # [Hkv, 1]
                codes = jnp.clip(jnp.round(r / s), -128, 127)
                return (codes * s).astype(jnp.bfloat16)

            kdq = quant_dq(k16)
            vdq = quant_dq(v16)
        else:
            kdq = k16
            vdq = v16

        # online-softmax seed from the NEW token (its cache slot is stale
        # in HBM until the caller's write kernel runs; phase C masks it
        # out)
        selhk = (jax.lax.broadcasted_iota(jnp.int32, (Hq, Hkv), 1) ==
                 jax.lax.broadcasted_iota(jnp.int32, (Hq, Hkv), 0) // G
                 ).astype(jnp.float32)
        qk = jax.lax.dot_general(
            q_sref[:].astype(jnp.bfloat16), kdq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Hq, Hkv]
        m_ref[:] = jnp.sum(jnp.where(selhk > 0, qk, 0.0), axis=-1,
                           keepdims=True)              # s_self
        l_ref[:] = jnp.ones_like(l_ref)
        acc_ref[:] = jnp.dot(selhk.astype(jnp.bfloat16), vdq,
                             preferred_element_type=jnp.float32)

    # ---- phase C: attention over the cached history (slots < pos) ----
    @pl.when((j > NBq) & (j < attn_end))
    def _():
        c = j - NBq - 1
        HS = Hkv * sb
        q = q_sref[:].astype(jnp.bfloat16)             # [Hq, D], scaled
        kb = k_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)
        vb = v_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)
        if quant_kv:
            eye = (jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 0) ==
                   jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 1)
                   ).astype(jnp.float32)
            ks_t = jax.lax.dot_general(                # [Hkv, sb]
                eye, ks_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            vs_t = jax.lax.dot_general(
                eye, vs_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        def scale_strips(x, s_t):
            return jnp.concatenate(
                [x[:, h * sb:(h + 1) * sb] * s_t[h:h + 1, :]
                 for h in range(Hkv)], axis=1)

        scores = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # scale already in q
        if quant_kv:
            scores = scale_strips(scores, ks_t)
        row = jax.lax.broadcasted_iota(jnp.int32, (Hq, HS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Hq, HS), 1)
        slot = c * sb + col % sb
        ok = ((col // sb) == (row // G)) & (slot < pos)   # STRICT: slot
        scores = jnp.where(ok, scores, NEG_INF)          # pos seeds at B

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        if quant_kv:
            p = scale_strips(p, vs_t)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(jnp.bfloat16), vb, preferred_element_type=jnp.float32)

    # ---- phase D: finalize attention, wo GEMV over attention rows ----
    @pl.when(j == attn_end)
    def _():
        acc_ref[:] = acc_ref[:] / l_ref[:]

    @pl.when((j >= attn_end) & (j < attn_end + NBo))
    def _():
        jo = j - attn_end
        acc = _gdots_rows(acc_ref, wo_ref[0, 0], so_ref[0, 0], gso, wbits,
                          floor_unpack, D)
        wout_ref[:, pl.dslice(jo * outo, outo)] = acc

    # ---- phase E: residual + FFN norm (h2 written once) ----
    @pl.when(j == attn_end + NBo)
    def _():
        x32 = hsum_ref[:] + wout_ref[:]
        h2_ref[:] = x32.astype(h2_ref.dtype)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        xn_ref[:] = (x32 * jax.lax.rsqrt(var + eps)
                     * gf_ref[0].astype(jnp.float32))

    @pl.when((j > attn_end + NBo) & (j <= attn_end + NBo + NBg))
    def _():
        jg = j - attn_end - NBo - 1
        acc = _gdots(xn_ref[:], wg_ref[0, 0], sg_ref[0, 0], gsg, wbits,
                     floor_unpack)
        gu_ref[:, pl.dslice(jg * outg, outg)] = acc

    @pl.when(j == attn_end + NBo + NBg + 1)
    def _():
        gate = gu_ref[:, :I_half]
        up = gu_ref[:, I_half:]
        act_ref[:] = gate * jax.lax.logistic(gate) * up

    @pl.when(j > attn_end + NBo + NBg + 1)
    def _():
        acc = _gdots(act_ref[:], wd_ref[0, 0], sd_ref[0, 0], gsd, wbits,
                     floor_unpack)
        dn_ref[:] = acc.astype(dn_ref.dtype)


def _wt_ok(qt, rows, bits):
    if not (isinstance(qt, QTensor) and qt.block_n != 0
            and qt.zbias is None and qt.q.ndim == 4
            and qt.q.shape[-2] == rows and qt.bits == bits):
        return False
    if bits == 4:
        return qt.pack_axis == "n" and qt.scale.shape[-2] > 1
    return qt.pack_axis == "k"


@functools.partial(jax.jit, static_argnames=(
    "NBq", "NBo", "NBg", "NBd", "gsq", "gso", "gsg", "gsd",
    "Hq", "Hkv", "G", "D", "sb", "eps", "scale", "I_half", "wbits",
    "interpret"))
def _call(h2d, res2d, ga, gf, cos_row, sin_row,
          wq, sq, wo, so, wg, sg, wd, sd,
          k_all, v_all, ks_all, vs_all, lyr, pos, *,
          NBq, NBo, NBg, NBd, gsq, gso, gsg, gsd,
          Hq, Hkv, G, D, sb, eps, scale, I_half, wbits, interpret):
    L = wq.shape[0]
    mult = 2 if wbits == 4 else 1
    bnq, bno, bng, bnd = (wq.shape[3], wo.shape[3], wg.shape[3],
                          wd.shape[3])
    outq, outo, outg, outd = (mult * bnq, mult * bno, mult * bng,
                              mult * bnd)
    H = NBo * outo
    quant_kv = ks_all is not None
    nS = (pos + sb - 1) // sb            # history blocks (slots < pos)
    attn_end = NBq + 1 + nS
    total = attn_end + NBo + 1 + NBg + 1 + NBd
    meta = jnp.stack([jnp.asarray(lyr, jnp.int32).reshape(()),
                      jnp.asarray(pos, jnp.int32).reshape(()),
                      attn_end.astype(jnp.int32)])

    kernel = functools.partial(
        _kernel, NBq=NBq, NBo=NBo, NBg=NBg, NBd=NBd,
        gsq=gsq, gso=gso, gsg=gsg, gsd=gsd, Hq=Hq, Hkv=Hkv, G=G, D=D,
        sb=sb, eps=eps, scale=scale, I_half=I_half,
        outq=outq, outo=outo, outg=outg, wbits=wbits, quant_kv=quant_kv,
        floor_unpack=_npair_unpack_floor())

    def const2(j, meta):
        return (0, 0)

    def wmap(nb):
        return lambda j, meta: (meta[0], jnp.clip(j, 0, nb - 1), 0, 0)

    def kvs_map(j, meta):
        hi = jnp.maximum(meta[2] - NBq - 2, 0)   # nS - 1, floored at 0
        return (meta[0], 0, 0, jnp.clip(j - NBq - 1, 0, hi), 0)

    def ss_map(j, meta):
        hi = jnp.maximum(meta[2] - NBq - 2, 0)
        return (meta[0], 0, jnp.clip(j - NBq - 1, 0, hi), 0)

    def womap(j, meta):
        return (meta[0], jnp.clip(j - meta[2], 0, NBo - 1), 0, 0)

    def wgmap(j, meta):
        return (meta[0], jnp.clip(j - meta[2] - NBo - 1, 0, NBg - 1), 0, 0)

    def wdmap(j, meta):
        return (meta[0], jnp.clip(j - meta[2] - NBo - NBg - 2, 0, NBd - 1),
                0, 0)

    Gq, Go, Gg, Gd = (sq.shape[2], so.shape[2], sg.shape[2], sd.shape[2])
    Nqkv = NBq * outq
    I2 = NBg * outg
    # gammas arrive STACKED [L, 1, H] (indexed by the prefetched layer —
    # no per-layer XLA slice op in the scan body) or [1, 1, H]
    g_stacked = ga.shape[0] > 1

    def gmap(j, meta):
        return (meta[0] if g_stacked else 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, H), const2),                         # h
        pl.BlockSpec((1, H), const2),                         # res
        pl.BlockSpec((1, 1, H), gmap),                        # ga
        pl.BlockSpec((1, 1, H), gmap),                        # gf
        pl.BlockSpec((1, D), const2),                         # cos
        pl.BlockSpec((1, D), const2),                         # sin
        pl.BlockSpec((1, 1, H, bnq), wmap(NBq)),              # wq
        pl.BlockSpec((1, 1, Gq, outq), wmap(NBq)),            # sq
        pl.BlockSpec((1, 1, Hkv, sb, D), kvs_map),            # k stream
        pl.BlockSpec((1, 1, Hkv, sb, D), kvs_map),            # v stream
    ]
    operands = [meta, h2d, res2d, ga, gf, cos_row, sin_row,
                wq, sq, k_all, v_all]
    if quant_kv:
        in_specs += [
            pl.BlockSpec((1, 1, sb, Hkv), ss_map),            # ks stream
            pl.BlockSpec((1, 1, sb, Hkv), ss_map),            # vs stream
        ]
        operands += [ks_all, vs_all]
    in_specs += [
        pl.BlockSpec((1, 1, Hq * D, bno), womap),             # wo
        pl.BlockSpec((1, 1, Go, outo), womap),                # so
        pl.BlockSpec((1, 1, H, bng), wgmap),                  # wg
        pl.BlockSpec((1, 1, Gg, outg), wgmap),                # sg
        pl.BlockSpec((1, 1, I_half, bnd), wdmap),             # wd
        pl.BlockSpec((1, 1, Gd, outd), wdmap),                # sd
    ]
    operands += [wo, so, wg, sg, wd, sd]

    def constkv(j, meta):
        return (0, 0)

    out_specs = [
        pl.BlockSpec((1, outd),
                     lambda j, meta: (0, jnp.clip(
                         j - meta[2] - NBo - NBg - 2, 0, NBd - 1))),
        pl.BlockSpec((1, H), const2),                         # h2
        pl.BlockSpec((Hkv, D), constkv),                      # k_new
        pl.BlockSpec((Hkv, D), constkv),                      # v_new
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, NBd * outd), h2d.dtype),
        jax.ShapeDtypeStruct((1, H), h2d.dtype),
        jax.ShapeDtypeStruct((Hkv, D), jnp.bfloat16),
        jax.ShapeDtypeStruct((Hkv, D), jnp.bfloat16),
    ]

    wbytes = (wq.size + wo.size + wg.size + wd.size) // L
    sbytes = (sq.size + so.size + sg.size + sd.size) * 4 // L
    kv_item = k_all.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((1, Nqkv), jnp.float32),     # qkv flat
                pltpu.VMEM((1, H), jnp.float32),        # hsum (h + res)
                pltpu.VMEM((1, H), jnp.float32),        # xn (normed x)
                pltpu.VMEM((Hq, D), jnp.float32),       # q (roped, scaled)
                pltpu.VMEM((Hq, 1), jnp.float32),       # m
                pltpu.VMEM((Hq, 1), jnp.float32),       # l
                pltpu.VMEM((Hq, D), jnp.float32),       # attention acc
                pltpu.VMEM((1, H), jnp.float32),        # wo out
                pltpu.VMEM((1, I2), jnp.float32),       # gate∥up
                pltpu.VMEM((1, I_half), jnp.float32),   # swiglu act
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (H * Nqkv + Hq * D * H + H * I2 + I_half * H)
            + 4 * Hkv * G * k_all.shape[3] * D,
            bytes_accessed=wbytes + sbytes
            + 2 * Hkv * k_all.shape[3] * D * kv_item + Nqkv * 4 + H * 8,
            transcendentals=Hq * k_all.shape[3] + I_half),
        interpret=interpret,
    )(*operands)


def layer_decode_fused(cfg, h, residual_in, lp, qw, cache, layer_idx,
                       positions, cos_tab, sin_tab, stacked_norms=None):
    """Try the whole-layer decode megakernel. Returns
    (h2, down_out, new_cache) or None when this configuration is
    unsupported (caller falls back to the split-kernel path).

    Supported: B = T = 1, dense KVCache in bf16 or INT8 (S % 8 == 0),
    stacked blocked wqkv/wo/w_gateup/w_down all npair-INT4 (grouped
    scales) or all INT8 (grouped or per-channel), symmetric, D = 128 with
    the wo group size dividing D, no sliding window, no logit softcap, no
    qk-norm, no qkv bias, no LoRA (caller gates)."""
    B, T, H = h.shape
    if B != 1 or T != 1:
        return None
    if cfg.sliding_window or cfg.attn_logit_softcap or cfg.qk_norm:
        return None
    if "bqkv" in lp:
        return None
    D = cfg.head_dim
    if D != 128:
        return None
    from llm_inference_tpu.ops import kvcache as kvc
    if not isinstance(cache, kvc.KVCache) or cache.bits not in (8, 16):
        return None
    if cache.max_seq_len % 8 or cache.batch_size != 1:
        return None
    wq, wo = qw.get("wqkv"), qw.get("wo")
    wg, wd = qw.get("w_gateup"), qw.get("w_down")
    Hq, Hkv = cfg.num_heads, cfg.num_kv_heads
    wbits = wq.bits if isinstance(wq, QTensor) else 0
    if wbits not in (4, 8):
        return None
    if not (_wt_ok(wq, H, wbits) and _wt_ok(wo, Hq * D, wbits)
            and _wt_ok(wg, H, wbits)):
        return None
    L, NBq, _, bnq = wq.q.shape
    _, NBo, _, bno = wo.q.shape
    _, NBg, _, bng = wg.q.shape
    mult = 2 if wbits == 4 else 1
    if NBq * mult * bnq != (Hq + 2 * Hkv) * D or NBo * mult * bno != H:
        return None
    I_half = NBg * mult * bng // 2
    if not _wt_ok(wd, I_half, wbits):
        return None
    _, NBd, Kd, bnd = wd.q.shape
    if Kd != I_half or NBd * mult * bnd != H:
        return None

    def gsize(qt, K):
        g = qt.scale.shape[-2]
        return 0 if g == 1 else K // g

    gsq = gsize(wq, H)
    gso = gsize(wo, Hq * D)
    gsg = gsize(wg, H)
    gsd = gsize(wd, I_half)
    for gs, K in ((gsq, H), (gso, Hq * D), (gsg, H), (gsd, I_half)):
        if gs and (gs < 8 or K % gs):
            return None
    if wbits == 4 and 0 in (gsq, gso, gsg, gsd):
        return None                      # npair kernel path is grouped
    if gso and D % gso:
        return None
    S = cache.max_seq_len
    if S % 128:
        return None
    # attention slot-block size: ≥2 blocks, ~1 MB K block, divides S
    kv_item = cache.k.dtype.itemsize
    sb = max(128, min(S // 2, (1 << 20) // (Hkv * D * kv_item)))
    sb -= sb % 128
    while S % sb:
        sb -= 128
    if sb <= 0:
        return None

    pos = positions.reshape(-1)[-1].astype(jnp.int32)
    cos_row = jax.lax.dynamic_index_in_dim(cos_tab, pos, 0)   # [1, D]
    sin_row = jax.lax.dynamic_index_in_dim(sin_tab, pos, 0)

    def gamma(name):
        # stacked [L, H] (scan-invariant, layer-indexed in the kernel —
        # the [L,1,H] reshape hoists out of the scan) beats the per-layer
        # scan-slice fusions it replaces (~1.5 µs/layer of XLA glue)
        sn = (stacked_norms or {}).get(name)
        if sn is not None and sn.ndim == 2 and sn.shape[0] == L and L > 1:
            return sn[:, None, :]
        return lp[name].reshape(1, 1, H)

    ga = gamma("attn_norm")
    gf = gamma("ffn_norm")
    h2d = h.reshape(1, H).astype(jnp.bfloat16)
    res2d = residual_in.reshape(1, H).astype(jnp.bfloat16)

    dn, h2, k_new, v_new = _call(
        h2d, res2d, ga, gf, cos_row, sin_row,
        wq.q, wq.scale, wo.q, wo.scale, wg.q, wg.scale, wd.q, wd.scale,
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        layer_idx, pos,
        NBq=NBq, NBo=NBo, NBg=NBg, NBd=NBd,
        gsq=gsq, gso=gso, gsg=gsg, gsd=gsd,
        Hq=Hq, Hkv=Hkv, G=Hq // Hkv, D=D, sb=sb,
        eps=float(cfg.rms_norm_eps), scale=float(D) ** -0.5,
        I_half=I_half, wbits=wbits, interpret=use_interpret())
    # land the new rows with the rows-layout fused write kernels — the
    # read-only megakernel already attended this token from VMEM, so
    # ordering is free (the write feeds the NEXT step's streams), and the
    # [Hkv, D] layout flows between the two kernels with zero relayout
    # copies (update_cache_layer's [B,T,H,D] convention cost ~0.8 µs/layer
    # of XLA copies)
    from llm_inference_tpu.ops.pallas import kv_write as _kw
    if cache.quantized:
        k_all, v_all, ks_all, vs_all = _kw.quantize_write_rows(
            cache.k, cache.v, cache.k_scale, cache.v_scale, layer_idx,
            k_new, v_new, pos)
        new_cache = cache.replace(k=k_all, v=v_all, k_scale=ks_all,
                                  v_scale=vs_all)
    else:
        k_all, v_all = _kw.write_rows(cache.k, cache.v, layer_idx,
                                      k_new, v_new, pos)
        new_cache = cache.replace(k=k_all, v=v_all)
    return (h2.reshape(B, T, H).astype(h.dtype),
            dn.reshape(B, T, H).astype(h.dtype), new_cache)
