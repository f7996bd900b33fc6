"""Compiled-mode kernel smoke: every Pallas kernel vs its jnp golden ON THE
CHIP at production-like shapes.

CPU CI runs the kernels in interpret mode, which does NOT catch Mosaic
lowering failures (unsupported shape casts, block-tiling constraints, vmem
budget) — each of those bit this project at least once. Run this after any
kernel change:

    env PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_smoke.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check(name, got, want, tol=3e-2):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    status = "OK " if rel < tol else "FAIL"
    log(f"[{status}] {name}: rel={rel:.2e}")
    return rel < tol


def main():
    assert jax.default_backend() == "tpu", "run on the chip"
    from llm_inference_tpu.ops import attention, quantization as Q
    from llm_inference_tpu.ops.pallas import (decode_attention as DA,
                                              flash_attention as FA,
                                              paged_attention as PA,
                                              quant_matmul as QM)
    ok = True
    key = jax.random.PRNGKey(0)

    # ---- quant matmul, every mode, decode + prefill M, sym AND asym ----
    for bits, gs in [(8, 0), (8, 128), (4, 0), (4, 128)]:
        for asym in (False, True):
            w = jax.random.normal(key, (4096, 12288), jnp.float32) * 0.02
            if asym:
                w = w + 0.01                    # skew so zbias matters
            qt = Q.to_blocked(Q.quantize(w, bits, gs, asymmetric=asym),
                              768)
            for M in (1, 8, 128):
                x = jax.random.normal(key, (M, 4096), jnp.bfloat16)
                got = QM.quant_matmul(x, qt)
                want = Q.qmatmul_ref(x, qt)
                ok &= check(f"quant_matmul bits={bits} gs={gs} M={M} "
                            f"asym={asym}", got, want)

    # ---- dense bf16 streaming (bits=16 blocked QTensor) ----
    wd16 = jax.random.normal(key, (4096, 12288), jnp.bfloat16) * 0.02
    qt16 = Q.to_blocked_dense(wd16, 384)
    for M in (1, 8):
        x = jax.random.normal(key, (M, 4096), jnp.bfloat16)
        got = QM.quant_matmul(x, qt16)
        want = jnp.dot(x, wd16, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
        ok &= check(f"dense-stream bf16 M={M}", got, want)

    # ---- int4 N-pair (difference-of-dots) layout, compiled parity ----
    for gs, asym in [(0, False), (128, False), (128, True)]:
        w = jax.random.normal(key, (4096, 12288), jnp.float32) * 0.02
        if asym:
            w = w + 0.01
        qt = Q.to_blocked_npair(
            Q.quantize(w, 4, gs, asymmetric=asym), 768)
        for M in (1, 8, 128):
            x = jax.random.normal(key, (M, 4096), jnp.bfloat16)
            got = QM.quant_matmul(x, qt)
            want = Q.qmatmul_ref(x, qt)
            ok &= check(f"quant_matmul npair gs={gs} M={M} asym={asym}",
                        got, want)

    # ---- round-3 npair layouts: wide blocks (wo's bn=1024 default) and
    #      the padded-vocab lm_head (block_params pads N to a 512 multiple
    #      so a wide block engages; padded cols must be exact zeros) ----
    w = jax.random.normal(key, (4096, 4096), jnp.float32) * 0.02
    qt = Q.to_blocked_npair(Q.quantize(w, 4, 128), 1024)
    for M in (1, 8):
        x = jax.random.normal(key, (M, 4096), jnp.bfloat16)
        ok &= check(f"quant_matmul npair bn=1024 M={M}",
                    QM.quant_matmul(x, qt), Q.qmatmul_ref(x, qt))
    from llm_inference_tpu.models.llama import _pad_qtensor_cols
    w = jax.random.normal(key, (4096, 4000), jnp.float32) * 0.02
    lm = _pad_qtensor_cols(Q.quantize(w, 4, 128), 4096)
    lm = Q.to_blocked_npair(lm, 1024)
    x = jax.random.normal(key, (1, 4096), jnp.bfloat16)
    got = QM.quant_matmul(x, lm)
    ok &= check("npair padded lm_head cols are zero",
                got[:, 4000:], jnp.zeros((1, 96)), tol=1e-6)
    ok &= check("npair padded lm_head live cols",
                got[:, :4000],
                Q.qmatmul_ref(x, lm)[:, :4000])

    # ---- m-tiled prefill kernel (LLMI_QMM_PREFILL=1; round 3) ----
    import os as _os
    _os.environ["LLMI_QMM_PREFILL"] = "1"
    w = jax.random.normal(key, (4096, 12288), jnp.float32) * 0.02
    try:
        for name, qt in [
            ("int8 gs=0", Q.to_blocked(Q.quantize(w, 8, 0), 768)),
            ("int4 gs=128", Q.to_blocked(Q.quantize(w, 4, 128), 768)),
            ("npair gs=128", Q.to_blocked_npair(Q.quantize(w, 4, 128),
                                                512)),
        ]:
            x = jax.random.normal(key, (512, 4096), jnp.bfloat16)
            ok &= check(f"quant_matmul TILED M=512 {name}",
                        QM.quant_matmul(x, qt), Q.qmatmul_ref(x, qt))
    finally:
        del _os.environ["LLMI_QMM_PREFILL"]

    # ---- fused int8 quantize+write (round 3) vs two-step ----
    from llm_inference_tpu.ops.pallas import kv_write as KW
    ks3 = jax.random.split(key, 2)
    kc = jnp.zeros((4, 2, 8, 512, 128), jnp.int8)
    sc = jnp.zeros((4, 2, 512, 8), jnp.float32)
    knew = jax.random.normal(ks3[0], (2, 8, 1, 128), jnp.bfloat16) * 3
    vnew = jax.random.normal(ks3[1], (2, 8, 1, 128), jnp.bfloat16)
    offs = jnp.array([37, 501], jnp.int32)
    fused = KW.quantize_write_token(kc, kc, sc, sc, 2, knew, vnew, offs)
    kq, ksc = Q.quantize_kv(knew)
    vq, vsc = Q.quantize_kv(vnew)
    wk, wv = KW.write_token(kc, kc, 2, kq, vq, offs)
    wks, wvs = KW.write_token_scales(sc, sc, 2,
                                     ksc[:, :, 0].transpose(0, 2, 1),
                                     vsc[:, :, 0].transpose(0, 2, 1), offs)
    ok &= check("fused quantize_write_token codes", fused[0], wk, tol=1e-6)
    ok &= check("fused quantize_write_token scales", fused[2], wks,
                tol=1e-5)

    # ---- decode attention: MHA / GQA / int8 KV ----
    for Hq, Hkv, S in [(32, 32, 512), (32, 8, 1024)]:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (2, 1, Hq, 128), jnp.bfloat16)
        k = jax.random.normal(ks[1], (4, 2, Hkv, S, 128), jnp.bfloat16)
        v = jax.random.normal(ks[2], (4, 2, Hkv, S, 128), jnp.bfloat16)
        pos = jnp.array([S // 2, S - 2], jnp.int32)
        got = DA.decode_attention(q, k, v, 2, pos)
        want = attention.decode_attend(q, k[2], v[2], pos[:, None])
        ok &= check(f"decode_attn Hq={Hq} Hkv={Hkv} S={S}", got, want)

    kq = (jax.random.normal(key, (2, 1, 8, S, 128)) * 20).astype(jnp.int8)
    kscale = jnp.full((2, 1, S, 8), 0.05, jnp.float32)     # slot-major
    q1 = jax.random.normal(key, (1, 1, 32, 128), jnp.bfloat16)
    got = DA.decode_attention(q1, kq, kq, 1, jnp.array([300], jnp.int32),
                              k_scale=kscale, v_scale=kscale)
    want = attention.attend(
        q1, kq[1], kq[1],
        attention.make_attention_mask(jnp.array([[300]], jnp.int32), S),
        k_scale=kscale[1], v_scale=kscale[1])
    ok &= check("decode_attn int8 KV", got, want)

    # ---- flash prefill (long-context gate shapes) ----
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (1, 1024, 32, 128), jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, 1, 8, 2048, 128), jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, 1, 8, 2048, 128), jnp.bfloat16)
    pos = (512 + jnp.arange(1024, dtype=jnp.int32))[None]
    got = FA.flash_attention(q, k, v, 1, pos)
    want = attention.attend(q, k[1], v[1],
                            attention.make_attention_mask(pos, 2048))
    ok &= check("flash_attention T=1024 S=2048 GQA", got, want)

    # B>1 dense flash: the qpos operand rides [B, 1, Tp] — a [B, Tp]
    # (1, bt) block violates Mosaic's trailing-dims rule for B > 1
    q2 = jax.random.normal(ks[0], (2, 256, 32, 128), jnp.bfloat16)
    k2 = jax.random.normal(ks[1], (2, 2, 8, 512, 128), jnp.bfloat16)
    v2 = jax.random.normal(ks[2], (2, 2, 8, 512, 128), jnp.bfloat16)
    pos2 = jnp.stack([jnp.arange(256, dtype=jnp.int32),
                      128 + jnp.arange(256, dtype=jnp.int32)])
    got = FA.flash_attention(q2, k2, v2, 1, pos2)
    want = attention.attend(q2, k2[1], v2[1],
                            attention.make_attention_mask(pos2, 512))
    ok &= check("flash_attention B=2", got, want)

    # flash with history offset + traced window (skip clamps + prefetched
    # window under Mosaic) and quantized caches (scale-row MXU extraction)
    posw = (512 + jnp.arange(1024, dtype=jnp.int32))[None]
    maskw = attention.make_attention_mask(posw, 2048, sliding_window=300)
    want = attention.attend(q, k[1], v[1], maskw)
    got = jax.jit(lambda w: FA.flash_attention(
        q, k, v, 1, posw, sliding_window=w))(jnp.int32(300))
    ok &= check("flash_attention traced window=300", got, want)
    from llm_inference_tpu.ops import kvcache as _kvc
    for kvd in ("int8", "int4"):
        cfq = _kvc.init_cache(2, 1, 8, 2048, 128, kvd)
        cfq = _kvc.update_cache_layer(
            cfq, jnp.int32(1), k[1].transpose(0, 2, 1, 3).astype(jnp.float32),
            v[1].transpose(0, 2, 1, 3).astype(jnp.float32),
            jnp.zeros((1,), jnp.int32))
        want = attention.attend(
            q, cfq.k[1], cfq.v[1],
            attention.make_attention_mask(pos, 2048),
            k_scale=cfq.k_scale[1], v_scale=cfq.v_scale[1])
        got = FA.flash_attention(q, cfq.k, cfq.v, 1, pos,
                                 k_scale=cfq.k_scale, v_scale=cfq.v_scale)
        ok &= check(f"flash_attention {kvd} KV", got, want, tol=6e-2)

    # ---- paged decode attention ----
    from llm_inference_tpu.ops import paged_kvcache as pk
    B, H, ps, NB = 2, 32, 128, 4
    cache = pk.init_paged_cache(2, B * NB + 1, H, ps, 128, B, NB,
                                jnp.bfloat16)
    pt = (jnp.arange(B * NB, dtype=jnp.int32).reshape(B, NB) + 1)
    cache = cache.replace(page_table=pt)
    Sp = NB * ps
    kseq = jax.random.normal(ks[1], (B, Sp, H, 128), jnp.bfloat16)
    vseq = jax.random.normal(ks[2], (B, Sp, H, 128), jnp.bfloat16)
    for b in range(B):
        cache = pk.write_prompt(cache, jnp.int32(1), b, kseq[b], vseq[b])
    qp = jax.random.normal(ks[0], (B, 1, H, 128), jnp.bfloat16)
    pos = jnp.array([Sp // 2, Sp - 2], jnp.int32)
    got = PA.paged_decode_attention(qp, cache.k_pages, cache.v_pages,
                                    cache.page_table, 1, pos)
    want = attention.decode_attend(qp, kseq.transpose(0, 2, 1, 3),
                                   vseq.transpose(0, 2, 1, 3), pos[:, None])
    ok &= check("paged_decode_attention", got, want)

    # windowed variants (mistral static window / gemma2 traced window):
    # exercises the @pl.when block skip + clamped index maps under Mosaic
    W = 200
    got = PA.paged_decode_attention(qp, cache.k_pages, cache.v_pages,
                                    cache.page_table, 1, pos, window=W)
    maskw = attention.make_attention_mask(pos[:, None], Sp,
                                          sliding_window=W)
    want = attention.attend(qp, kseq.transpose(0, 2, 1, 3),
                            vseq.transpose(0, 2, 1, 3), maskw)
    ok &= check("paged_decode_attention window=200", got, want)
    got = jax.jit(lambda w: PA.paged_decode_attention(
        qp, cache.k_pages, cache.v_pages, cache.page_table, 1, pos,
        window=w))(jnp.int32(W))
    ok &= check("paged_decode_attention traced window", got, want)

    # int8 page pool at Hkv=40 (13B MHA shape): exercises the hb=Hkv pin —
    # a partial head-block's [ps, hb] scale BlockSpec violates Mosaic's
    # minor-dim rule and only fails at COMPILE on a real chip
    H8, NB8 = 40, 2
    c8 = pk.init_paged_cache(1, NB8 + 1, H8, ps, 128, 1, NB8, "int8")
    c8 = c8.replace(page_table=jnp.arange(1, NB8 + 1, dtype=jnp.int32)[None])
    S8 = NB8 * ps
    k8 = jax.random.normal(ks[1], (1, S8, H8, 128), jnp.bfloat16)
    v8 = jax.random.normal(ks[2], (1, S8, H8, 128), jnp.bfloat16)
    c8 = pk.write_prompt(c8, jnp.int32(0), 0, k8[0], v8[0])
    q8 = jax.random.normal(ks[0], (1, 1, H8, 128), jnp.bfloat16)
    p8 = jnp.array([S8 - 2], jnp.int32)
    got = PA.paged_decode_attention(q8, c8.k_pages, c8.v_pages,
                                    c8.page_table, 0, p8,
                                    k_scale=c8.k_scale, v_scale=c8.v_scale)
    # golden: host-dequantized pages through the dense attend
    # (pages [L, P, H, ps, D]; scales slot-major [L, P, ps, H])
    import numpy as _np
    kk = _np.asarray(c8.k_pages)[0, 1:].transpose(0, 2, 1, 3) \
        .reshape(NB8 * ps, H8, 128)
    ss = _np.asarray(c8.k_scale)[0, 1:].reshape(NB8 * ps, H8)
    kdq = (kk.astype(_np.float32)
           * ss[..., None]).transpose(1, 0, 2)[None]           # [1,H,S,D]
    vv = _np.asarray(c8.v_pages)[0, 1:].transpose(0, 2, 1, 3) \
        .reshape(NB8 * ps, H8, 128)
    sv = _np.asarray(c8.v_scale)[0, 1:].reshape(NB8 * ps, H8)
    vdq = (vv.astype(_np.float32) * sv[..., None]).transpose(1, 0, 2)[None]
    want = attention.decode_attend(q8, jnp.asarray(kdq, jnp.bfloat16),
                                   jnp.asarray(vdq, jnp.bfloat16),
                                   p8[:, None])
    ok &= check("paged_decode_attention int8 Hkv=40 (hb pin)", got, want,
                tol=6e-2)

    # ---- INT4 KV cache (offset-lo packing, diffdot V): dense + paged ----
    # exercises i32 shift/AND unpack, the pre-split [.., G, 2, D/2] q/out
    # blocks, and the rowsum offset folds under Mosaic
    from llm_inference_tpu.ops import kvcache as kvc
    from llm_inference_tpu.ops import quantization as Qz
    B4, H4, S4 = 2, 8, 512
    k_tok = jax.random.normal(ks[1], (B4, S4 - 1, H4, 128), jnp.float32)
    v_tok = jax.random.normal(ks[2], (B4, S4 - 1, H4, 128), jnp.float32)
    c4 = kvc.init_cache(2, B4, H4, S4, 128, "int4")
    c4 = kvc.update_cache_layer(c4, jnp.int32(1), k_tok, v_tok,
                                jnp.zeros((B4,), jnp.int32))
    q4d = jax.random.normal(ks[0], (B4, 1, 32, 128), jnp.bfloat16)
    pos4 = jnp.array([S4 // 2, S4 - 2], jnp.int32)
    got = DA.decode_attention(q4d, c4.k, c4.v, 1, pos4,
                              k_scale=c4.k_scale, v_scale=c4.v_scale)
    kdq4 = Qz.dequantize_kv4(
        c4.k[1], jnp.swapaxes(c4.k_scale[1], 1, 2)[..., None])
    vdq4 = Qz.dequantize_kv4(
        c4.v[1], jnp.swapaxes(c4.v_scale[1], 1, 2)[..., None])
    want = attention.decode_attend(q4d, kdq4, vdq4, pos4[:, None])
    ok &= check("decode_attention int4 KV", got, want, tol=6e-2)

    cp4 = pk.init_paged_cache(1, B4 * 4 + 1, H4, ps, 128, B4, 4, "int4")
    cp4 = cp4.replace(page_table=(jnp.arange(B4 * 4, dtype=jnp.int32)
                                  .reshape(B4, 4) + 1))
    Sp4 = 4 * ps
    kp4 = jax.random.normal(ks[1], (B4, Sp4, H4, 128), jnp.float32)
    vp4 = jax.random.normal(ks[2], (B4, Sp4, H4, 128), jnp.float32)
    cp4 = pk.write_prompt_batch(cp4, jnp.int32(0), kp4, vp4, 4)
    posp4 = jnp.array([Sp4 - 2, ps + 3], jnp.int32)
    got = PA.paged_decode_attention(q4d, cp4.k_pages, cp4.v_pages,
                                    cp4.page_table, 0, posp4,
                                    k_scale=cp4.k_scale,
                                    v_scale=cp4.v_scale)
    kg = cp4.k_pages[0][cp4.page_table].transpose(0, 2, 1, 3, 4) \
        .reshape(B4, H4, Sp4, 64)
    vg = cp4.v_pages[0][cp4.page_table].transpose(0, 2, 1, 3, 4) \
        .reshape(B4, H4, Sp4, 64)
    ksg = cp4.k_scale[0][cp4.page_table].reshape(B4, Sp4, H4)
    vsg = cp4.v_scale[0][cp4.page_table].reshape(B4, Sp4, H4)
    kdq4 = Qz.dequantize_kv4(kg, jnp.swapaxes(ksg, 1, 2)[..., None])
    vdq4 = Qz.dequantize_kv4(vg, jnp.swapaxes(vsg, 1, 2)[..., None])
    want = attention.decode_attend(q4d, kdq4, vdq4, posp4[:, None])
    ok &= check("paged_decode_attention int4 KV", got, want, tol=6e-2)

    # ---- paged flash prefill (suffix over history pages) ----
    from llm_inference_tpu.ops.pallas import paged_flash as PFL
    from llm_inference_tpu.models.llama import _gather_paged
    for kvd in (jnp.bfloat16, "int8", "int4"):
        cpf = pk.init_paged_cache(2, 2 * 4 + 1, 8, 128, 128, 2, 4, kvd)
        cpf = cpf.replace(page_table=(jnp.arange(8, dtype=jnp.int32)
                                      .reshape(2, 4) + 1))
        kf = jax.random.normal(ks[1], (2, 512, 8, 128), jnp.float32)
        vf = jax.random.normal(ks[2], (2, 512, 8, 128), jnp.float32)
        cpf = pk.write_prompt_batch(cpf, jnp.int32(1), kf, vf, 4)
        qf = jax.random.normal(ks[0], (2, 64, 16, 128), jnp.bfloat16)
        posf = jnp.tile(256 + jnp.arange(64, dtype=jnp.int32), (2, 1))
        got = PFL.paged_flash_attention(
            qf, cpf.k_pages, cpf.v_pages, cpf.page_table, 1, posf,
            k_scale=cpf.k_scale, v_scale=cpf.v_scale)
        kd_, vd_, ksd_, vsd_ = _gather_paged(cpf, 1, 2)
        maskf = attention.make_attention_mask(posf, 512)
        want = attention.attend(qf, kd_, vd_, maskf,
                                k_scale=ksd_, v_scale=vsd_)
        ok &= check(f"paged_flash {kvd} suffix prefill", got, want,
                    tol=6e-2)

    # dense decode kernel with a static window (mistral decode path)
    kd = jax.random.normal(ks[1], (2, 2, 8, 512, 128), jnp.bfloat16)
    vd = jax.random.normal(ks[2], (2, 2, 8, 512, 128), jnp.bfloat16)
    qd = jax.random.normal(ks[0], (2, 1, 32, 128), jnp.bfloat16)
    posd = jnp.array([300, 500], jnp.int32)
    got = DA.decode_attention(qd, kd, vd, 1, posd, window=128)
    maskd = attention.make_attention_mask(posd[:, None], 512,
                                          sliding_window=128)
    want = attention.attend(qd, kd[1], vd[1], maskd)
    ok &= check("decode_attention window=128", got, want)

    # --- compiled quantized-MoE forward: the quant-matmul kernel serving
    #     an [L*E]-stacked expert weight (index layer*E + e) ---
    from llm_inference_tpu.config import ModelConfig, QuantConfig
    from llm_inference_tpu.models import mixtral, llama as _llama
    from llm_inference_tpu.ops import kvcache as _kv
    mcfg = ModelConfig(name="mixtral-smoke", vocab_size=512,
                       hidden_size=512, intermediate_size=1024,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       head_dim=128, num_experts=4, experts_per_token=2,
                       dtype="bfloat16")
    mp = mixtral.init_params(mcfg, jax.random.PRNGKey(7))
    mq = mixtral.quantize_params(mp, QuantConfig(weights="int8"))
    mq = _llama.prepare_params(mq, fuse=False, donate=False)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]

    def mrun(p):
        c = _kv.init_cache(mcfg.num_layers, 1, mcfg.num_kv_heads, 64,
                           mcfg.head_dim, jnp.bfloat16)
        out, _ = jax.jit(lambda pp, cc: mixtral.forward(mcfg, pp, ids, pos,
                                                        cc))(p, c)
        return out.astype(jnp.float32)
    ok &= check("mixtral int8 experts (L*E stack)", mrun(mq), mrun(mp),
                tol=6e-2)

    # ---- batched KV write scatter (kv_write) vs the DUS chain ----
    from llm_inference_tpu.ops.pallas import kv_write
    L, B, H, S, D = 3, 16, 32, 512, 128
    wk = jax.random.normal(key, (L, B, H, S, D), jnp.bfloat16)
    wn = jax.random.normal(key, (B, H, 1, D), jnp.bfloat16)
    woff = (jnp.arange(B, dtype=jnp.int32) * 29) % S
    gk, gv = kv_write.write_token(wk, wk * 0, jnp.int32(1), wn, wn, woff)
    want_k = wk
    for b in range(B):
        want_k = jax.lax.dynamic_update_slice(
            want_k, wn[b][None, None], (jnp.int32(1), jnp.int32(b),
                                        jnp.int32(0), woff[b], jnp.int32(0)))
    ok &= check("kv_write bf16 B=16", gk, want_k)
    ws = jax.random.normal(key, (L, B, S, H), jnp.float32)
    wsn = jax.random.normal(key, (B, 1, H), jnp.float32)
    gs, _ = kv_write.write_token_scales(ws, ws * 0, jnp.int32(2), wsn,
                                        wsn, woff)
    want_s = ws
    for b in range(B):
        want_s = jax.lax.dynamic_update_slice(
            want_s, wsn[b][None, None], (jnp.int32(2), jnp.int32(b),
                                         woff[b], jnp.int32(0)))
    ok &= check("kv_write scales", gs, want_s)

    # ---- whole-layer decode megakernel vs the split-kernel path ----
    # (ops/pallas/layer_fused.py; compiled A/B of a small llama decode)
    import os
    from llm_inference_tpu.config import tiny_llama
    lcfg = tiny_llama(hidden_size=1024, intermediate_size=2816,
                      num_layers=2, num_heads=8, num_kv_heads=8,
                      head_dim=128, vocab_size=512, dtype="bfloat16")
    lp0 = _llama.init_params(lcfg, jax.random.PRNGKey(9),
                             dtype=jnp.float32)
    lq = _llama.quantize_params(lp0, QuantConfig(weights="int4",
                                                 group_size=128))
    lq = _llama.fuse_params(lq)
    from llm_inference_tpu.ops.quantization import to_blocked_npair as tbn
    lay = dict(lq["layers"])
    for nm, bn in (("wqkv", 768), ("wo", 512), ("w_gateup", 512),
                   ("w_down", 512)):
        lay[nm] = tbn(lay[nm], bn)
    lq["layers"] = lay
    lids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lpos = jnp.arange(4, dtype=jnp.int32)[None]

    def lrun(mega):
        # FIXED decode token sequence (not greedy feedback): with dummy
        # weights the logits have near-ties, and the mega/split paths'
        # legitimate last-bit rounding differences fork the streams —
        # the same flake tests/test_layer_fused.py de-flaked in round 4
        # (this section forked at step 1 with a 0.0195 logit diff and
        # read as rel=0.82 until round 5 caught it)
        fixed = (9, 17, 23)
        os.environ["LLMI_LAYER_MEGA"] = "1" if mega else "0"
        try:
            c = _kv.init_cache(lcfg.num_layers, 1, lcfg.num_kv_heads, 256,
                               lcfg.head_dim, "int8")
            lg, c = jax.jit(lambda pp, cc: _llama.forward(
                lcfg, pp, lids, lpos, cc))(lq, c)
            outs = [lg.astype(jnp.float32)]
            dec = jax.jit(lambda pp, tt, qq, cc: _llama.forward(
                lcfg, pp, tt, qq, cc))
            for t in range(3):
                tok = jnp.full((1, 1), fixed[t], jnp.int32)
                lg, c = dec(lq, tok, jnp.full((1, 1), 4 + t, jnp.int32), c)
                outs.append(lg.astype(jnp.float32))
            return jnp.concatenate(outs), c
        finally:
            os.environ.pop("LLMI_LAYER_MEGA", None)
    want_l, cref = lrun(False)
    got_l, cgot = lrun(True)
    ok &= check("layer megakernel decode logits", got_l, want_l, tol=6e-2)
    ok &= check("layer megakernel cache codes",
                cgot.k.astype(jnp.float32), cref.k.astype(jnp.float32),
                tol=6e-2)

    log("ALL OK" if ok else "FAILURES — see above")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
