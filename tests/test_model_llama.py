"""Model-level tests on a tiny LLaMA config.

The key test is prefill/decode consistency: running the whole sequence in one
prefill must produce the same last-token logits as prefilling a prefix and
decoding the rest token by token through the KV cache. The reference has no
automated equivalent (it diffs tensor dumps against HF by hand —
reference: src/utils/debug_utils.h:9-11); this closes that gap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import tiny_llama, QuantConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache


@pytest.fixture(scope="module")
def cfg():
    return tiny_llama()


@pytest.fixture(scope="module")
def params(cfg):
    return llama.init_params(cfg, jax.random.PRNGKey(0))


def make_cache(cfg, batch, max_seq=64):
    return kvcache.init_cache(cfg.num_layers, batch, cfg.num_kv_heads,
                              max_seq, cfg.head_dim, jnp.float32)


class TestForward:
    def test_prefill_shapes(self, cfg, params):
        B, T = 2, 5
        ids = jnp.ones((B, T), jnp.int32)
        pos = jnp.tile(jnp.arange(T), (B, 1))
        cache = make_cache(cfg, B)
        logits, cache2 = llama.forward(cfg, params, ids, pos, cache)
        assert logits.shape == (B, cfg.vocab_size)
        assert cache2.k.shape == cache.k.shape

    def test_logits_all_mode(self, cfg, params):
        B, T = 1, 4
        ids = jnp.ones((B, T), jnp.int32)
        pos = jnp.tile(jnp.arange(T), (B, 1))
        logits, _ = llama.forward(cfg, params, ids, pos, make_cache(cfg, B),
                                  logits_mode="all")
        assert logits.shape == (B, T, cfg.vocab_size)

    def test_prefill_decode_consistency(self, cfg, params):
        """Full prefill of N tokens == prefill of N-2 + 2 decode steps."""
        rng = np.random.default_rng(0)
        N = 8
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, N)), jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)[None, :]

        # one-shot
        logits_full, _ = llama.forward(cfg, params, ids, pos,
                                       make_cache(cfg, 1))

        # prefix + incremental
        cache = make_cache(cfg, 1)
        _, cache = llama.forward(cfg, params, ids[:, :N - 2], pos[:, :N - 2],
                                 cache, logits_mode="none")
        for t in range(N - 2, N):
            logits_inc, cache = llama.forward(
                cfg, params, ids[:, t:t + 1], pos[:, t:t + 1], cache)
        np.testing.assert_allclose(np.asarray(logits_inc),
                                   np.asarray(logits_full),
                                   atol=2e-4, rtol=2e-4)

    def test_batch_position_independence(self, cfg, params):
        """A sequence's logits must not depend on other batch rows."""
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
        pos = jnp.tile(jnp.arange(6), (2, 1))
        logits_b, _ = llama.forward(cfg, params, ids, pos, make_cache(cfg, 2))
        logits_0, _ = llama.forward(cfg, params, ids[:1], pos[:1],
                                    make_cache(cfg, 1))
        np.testing.assert_allclose(np.asarray(logits_b[0]),
                                   np.asarray(logits_0[0]), atol=1e-4,
                                   rtol=1e-4)

    def test_last_idx_gather(self, cfg, params):
        """Right-padded batch: logits come from each row's true last token."""
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
        pos = jnp.tile(jnp.arange(6), (2, 1))
        # row 1 has true length 4
        logits, _ = llama.forward(cfg, params, ids, pos, make_cache(cfg, 2),
                                  last_idx=jnp.array([5, 3], jnp.int32))
        short, _ = llama.forward(cfg, params, ids[1:, :4], pos[1:, :4],
                                 make_cache(cfg, 1))
        np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(short[0]),
                                   atol=1e-4, rtol=1e-4)


class TestQuantizedForward:
    @pytest.mark.parametrize("weights,gs,min_corr",
                             [("int8", 0, 0.999), ("int4", 32, 0.97)])
    def test_quantized_close_to_dense(self, cfg, params, weights, gs, min_corr):
        qparams = llama.quantize_params(
            params, QuantConfig(weights=weights, group_size=gs))
        ids = jnp.ones((1, 4), jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None, :]
        dense, _ = llama.forward(cfg, params, ids, pos, make_cache(cfg, 1))
        quant, _ = llama.forward(cfg, qparams, ids, pos, make_cache(cfg, 1))
        # logits stay correlated; loose tolerance (tiny random models have no
        # outlier structure, the worst case for low-bit quant)
        d, q = np.asarray(dense[0]), np.asarray(quant[0])
        corr = np.corrcoef(d, q)[0, 1]
        assert corr > min_corr

    def test_param_bytes_shrink(self, cfg, params):
        q8 = llama.quantize_params(params, QuantConfig(weights="int8"))
        q4 = llama.quantize_params(params, QuantConfig(weights="int4",
                                                       group_size=32))
        b, b8, b4 = (llama.param_bytes(p) for p in (params, q8, q4))
        assert b8 < 0.6 * b and b4 < 0.45 * b


class TestPreparedParams:
    """fuse_params + block_params (the serving weight layout) must be a pure
    re-layout: same logits as the unfused row-major parameters."""

    @pytest.mark.parametrize("weights", ["none", "int8", "int4"])
    def test_prepared_matches_plain(self, cfg, params, weights):
        p0 = params
        if weights != "none":
            p0 = llama.quantize_params(p0, QuantConfig(weights=weights,
                                                       group_size=32))
        prep = llama.prepare_params(p0, donate=False)  # p0 reused below
        assert "wqkv" in prep["layers"] and "wq" not in prep["layers"]
        assert "w_gateup" in prep["layers"]
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5), (2, 1))
        a, ca = llama.forward(cfg, p0, ids, pos, make_cache(cfg, 2))
        b, cb = llama.forward(cfg, prep, ids, pos, make_cache(cfg, 2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)
        # decode step parity too (separate cache lineages)
        tok = jnp.argmax(a, -1).astype(jnp.int32)[:, None]
        dpos = jnp.full((2, 1), 5, jnp.int32)
        da, _ = llama.forward(cfg, p0, tok, dpos, ca)
        db, _ = llama.forward(cfg, prep, tok, dpos, cb)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   atol=5e-3, rtol=1e-3)

    def test_prepared_npair_matches_plain(self, cfg, params):
        """int4_npair re-layout (N-pair difference-of-dots kernel path) is
        a pure re-layout too. On the tiny config wqkv/w_gateup get the
        npair layout while wo/w_down (N=128, no 256-divisor) keep the
        split-half layout — the mixed case must serve."""
        p0 = llama.quantize_params(params, QuantConfig(weights="int4",
                                                       group_size=32))
        prep = llama.prepare_params(p0, donate=False, int4_npair=True)
        assert prep["layers"]["wqkv"].pack_axis == "n"
        assert prep["layers"]["w_gateup"].pack_axis == "n"
        assert prep["layers"]["wo"].pack_axis == "k"
        rng = np.random.default_rng(7)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5), (2, 1))
        a, ca = llama.forward(cfg, p0, ids, pos, make_cache(cfg, 2))
        b, cb = llama.forward(cfg, prep, ids, pos, make_cache(cfg, 2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)
        tok = jnp.argmax(a, -1).astype(jnp.int32)[:, None]
        dpos = jnp.full((2, 1), 5, jnp.int32)
        da, _ = llama.forward(cfg, p0, tok, dpos, ca)
        db, _ = llama.forward(cfg, prep, tok, dpos, cb)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   atol=5e-3, rtol=1e-3)

    def test_tp_interleaved_fusion_slices(self, cfg, params):
        """A column shard of the fused weight must equal the fusion of the
        per-tensor shards (what shard_map hands each TP rank)."""
        tp = 2
        fused = llama.fuse_params(params, tp_size=tp)["layers"]["wqkv"]
        wq, wk, wv = (params["layers"][k] for k in ("wq", "wk", "wv"))
        n = fused.shape[-1] // tp
        for s in range(tp):
            shard = np.asarray(fused[..., s * n:(s + 1) * n])
            expect = np.concatenate(
                [np.asarray(w[..., s * (w.shape[-1] // tp):
                              (s + 1) * (w.shape[-1] // tp)])
                 for w in (wq, wk, wv)], axis=-1)
            np.testing.assert_array_equal(shard, expect)


class TestSlidingWindowDecodeKernel:
    """The decode kernels must honor cfg.sliding_window (the mistral
    config): kernel path vs jnp path, past the window boundary."""

    @pytest.mark.parametrize("paged", [False, True])
    def test_windowed_decode_kernel_matches_jnp(self, monkeypatch, paged):
        from llm_inference_tpu.config import tiny_llama
        from llm_inference_tpu.models import llama
        from llm_inference_tpu.ops import kvcache, paged_kvcache
        from llm_inference_tpu.ops.pallas import (
            decode_attention as pallas_decode,
            paged_attention as pallas_paged)

        cfg = tiny_llama(head_dim=64, sliding_window=8)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(7)
        B, T = 2, 16                   # prefill well past the window
        S, ps, NB = 128, 8, 16
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        nxt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)), jnp.int32)
        dpos = jnp.full((B, 1), T, jnp.int32)

        def run():
            if paged:
                cache = paged_kvcache.init_paged_cache(
                    cfg.num_layers, B * NB + 1, cfg.num_kv_heads, ps, 64,
                    B, NB, jnp.float32)
                alloc = paged_kvcache.PageAllocator(B * NB + 1)
                pt = jnp.asarray([alloc.allocate(NB) for _ in range(B)],
                                 jnp.int32)
                cache = cache.replace(page_table=pt)
            else:
                cache = kvcache.init_cache(cfg.num_layers, B,
                                           cfg.num_kv_heads, S, 64,
                                           jnp.float32)
            _, cache = llama.forward(cfg, params, ids, pos, cache,
                                     logits_mode="none")
            logits, _ = llama.forward(cfg, params, nxt, dpos, cache)
            return np.asarray(logits)

        got = run()
        monkeypatch.setattr(pallas_decode, "supports", lambda *a: False)
        monkeypatch.setattr(pallas_paged, "supports", lambda *a: False)
        want = run()
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


class TestAsymmetricForward:
    def test_asym_at_least_as_close_as_sym(self, cfg, params):
        """Asymmetric int4 logits track the dense model at least as well
        as symmetric (strictly better on real skewed weights; random test
        weights are symmetric so parity is the floor), and the PREPARED
        (fused + blocked, kernel-path) params agree with the raw ones."""
        ids = jnp.ones((1, 4), jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None, :]
        dense, _ = llama.forward(cfg, params, ids, pos, make_cache(cfg, 1))
        d = np.asarray(dense[0])
        corrs = {}
        for asym in (False, True):
            qp = llama.quantize_params(
                params, QuantConfig(weights="int4", group_size=32,
                                    asymmetric=asym))
            quant, _ = llama.forward(cfg, qp, ids, pos, make_cache(cfg, 1))
            corrs[asym] = np.corrcoef(d, np.asarray(quant[0]))[0, 1]
            prep = llama.prepare_params(qp, donate=False)
            prepped, _ = llama.forward(cfg, prep, ids, pos,
                                       make_cache(cfg, 1))
            np.testing.assert_allclose(np.asarray(quant[0]),
                                       np.asarray(prepped[0]),
                                       atol=2e-2, rtol=2e-2)
        assert corrs[True] > corrs[False] - 0.005, corrs

    def test_quant_checkpoint_roundtrip_asym(self, cfg, params, tmp_path):
        from llm_inference_tpu.utils import quant_checkpoint as qc
        qp = llama.quantize_params(
            params, QuantConfig(weights="int4", group_size=32,
                                asymmetric=True))
        qc.save_prepared(str(tmp_path), cfg, qp)
        cfg2, back = qc.load_prepared(str(tmp_path))
        w0 = qp["layers"]["wq"]
        w1 = back["layers"]["wq"]
        assert w1.zbias is not None
        np.testing.assert_array_equal(np.asarray(w0.zbias),
                                      np.asarray(w1.zbias))


class TestLmHeadVocabPad:
    def test_npair_lm_head_pads_vocab_for_wide_blocks(self):
        """block_params pads the quantized lm_head's vocab columns to the
        next 512 multiple when that admits a wider npair streaming block;
        padded columns are exact zeros and forward slices logits back."""
        cfg = tiny_llama(num_kv_heads=2, vocab_size=320)   # 320 % 256 != 0
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        qp = llama.quantize_params(
            params, QuantConfig(weights="int4", group_size=32,
                                quantize_embedding=True))
        plain = llama.prepare_params(qp, donate=False, int4_npair=False)
        npair = llama.prepare_params(qp, donate=False)
        assert npair["lm_head"].pack_axis == "n"
        assert npair["lm_head"].out_features == 512        # padded
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 320, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))

        def run(p):
            c = kvcache.init_cache(cfg.num_layers, 2, cfg.num_kv_heads, 32,
                                   cfg.head_dim, jnp.float32)
            logits, _ = llama.forward(cfg, p, ids, pos, c)
            return np.asarray(logits)

        a, b = run(plain), run(npair)
        assert a.shape == b.shape == (2, 320)
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-3)
