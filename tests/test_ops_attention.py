"""Golden tests for masked attention + KV cache.

Oracle is a per-example numpy loop — the analogue of the reference's CPU
golden models for its mask/softmax/decode-MHA kernels (reference:
tests/unittests/test_mask_softmax.cu, test_fused_decoder_attention.cu).
"""

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.ops import attention, kvcache


def np_attend(q, k, v, q_pos):
    """q: [T, Hq, D]; k/v: [Hkv, S, D]; q_pos: [T]. Returns [T, Hq, D]."""
    T, Hq, D = q.shape
    Hkv, S, _ = k.shape
    G = Hq // Hkv
    out = np.zeros_like(q)
    scale = 1.0 / np.sqrt(D)
    for t in range(T):
        for h in range(Hq):
            kh = k[h // G]
            vh = v[h // G]
            scores = kh @ q[t, h] * scale              # [S]
            scores = np.where(np.arange(S) <= q_pos[t], scores, -np.inf)
            scores = scores - scores.max()
            p = np.exp(scores)
            p /= p.sum()
            out[t, h] = p @ vh
    return out


class TestMask:
    def test_causal_from_zero(self):
        pos = jnp.array([[0, 1, 2]], dtype=jnp.int32)
        m = attention.make_attention_mask(pos, 4)
        expect = np.array([[1, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 0]], bool)
        np.testing.assert_array_equal(np.asarray(m[0, 0]), expect)

    def test_causal_with_history(self):
        # query at absolute positions 2,3 sees history slots 0,1 as well —
        # same semantics as the reference's history-aware mask
        # (reference: src/kernels/build_causal_mask.cu:5-59)
        pos = jnp.array([[2, 3]], dtype=jnp.int32)
        m = attention.make_attention_mask(pos, 5)
        expect = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], bool)
        np.testing.assert_array_equal(np.asarray(m[0, 0]), expect)

    def test_sliding_window(self):
        pos = jnp.array([[3]], dtype=jnp.int32)
        m = attention.make_attention_mask(pos, 6, sliding_window=2)
        expect = np.array([[0, 0, 1, 1, 0, 0]], bool)
        np.testing.assert_array_equal(np.asarray(m[0, 0]), expect)


class TestAttend:
    def _run(self, B, T, Hq, Hkv, S, D, offsets):
        rng = np.random.default_rng(42)
        q = rng.standard_normal((B, T, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        q_pos = np.stack([off + np.arange(T) for off in offsets]).astype(np.int32)

        mask = attention.make_attention_mask(jnp.asarray(q_pos), S)
        out = attention.attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               mask)
        for b in range(B):
            golden = np_attend(q[b], k[b], v[b], q_pos[b])
            np.testing.assert_allclose(np.asarray(out[b]), golden,
                                       atol=2e-5, rtol=2e-5)

    def test_mha_prefill(self):
        self._run(B=2, T=4, Hq=4, Hkv=4, S=8, D=16, offsets=[0, 0])

    def test_gqa_prefill_with_history(self):
        self._run(B=2, T=3, Hq=8, Hkv=2, S=8, D=8, offsets=[2, 4])

    def test_decode_single_token(self):
        self._run(B=3, T=1, Hq=4, Hkv=2, S=16, D=8, offsets=[5, 0, 15])

    def test_nan_beyond_mask_does_not_leak(self):
        """Masked slots may hold NaN/inf K/V (a retired serving slot keeps
        decoding its own garbage between requests and can diverge; its
        clamped edge writes leave NaN in the row). The softmax's exact-0
        probabilities on masked lanes must NOT turn into NaN through the
        0 x NaN products on the K-score or V sides."""
        rng = np.random.default_rng(0)
        B, T, Hq, Hkv, S, D = 1, 1, 4, 2, 8, 16
        q = rng.standard_normal((B, T, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        pos = np.array([[3]], dtype=np.int32)
        clean = attention.attend(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            attention.make_attention_mask(jnp.asarray(pos), S))
        k[:, :, 5:] = np.nan
        v[:, :, 7:] = np.inf
        out = attention.attend(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            attention.make_attention_mask(jnp.asarray(pos), S))
        np.testing.assert_allclose(np.asarray(out), np.asarray(clean),
                                   atol=1e-6)
        # int8-scale variant: inf scale on a masked slot
        ks = np.ones((B, S, Hkv), np.float32)
        vs = np.ones((B, S, Hkv), np.float32)
        vs[:, 6:] = np.inf
        kq = np.nan_to_num(k)
        out2 = attention.attend(
            jnp.asarray(q), jnp.asarray(kq), jnp.asarray(np.nan_to_num(v)),
            attention.make_attention_mask(jnp.asarray(pos), S),
            k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
        assert np.isfinite(np.asarray(out2)).all()

    def test_decode_attend_wrapper(self):
        rng = np.random.default_rng(7)
        B, Hq, Hkv, S, D = 2, 4, 2, 8, 16
        q = rng.standard_normal((B, 1, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        pos = np.array([[3], [6]], dtype=np.int32)
        out = attention.decode_attend(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), jnp.asarray(pos))
        for b in range(B):
            golden = np_attend(q[b], k[b], v[b], pos[b])
            np.testing.assert_allclose(np.asarray(out[b]), golden,
                                       atol=2e-5, rtol=2e-5)


class TestKVCache:
    def test_update_at_offsets(self):
        B, Hkv, S, D, T = 2, 3, 10, 4, 2
        kc = jnp.zeros((B, Hkv, S, D), jnp.float32)
        vc = jnp.zeros((B, Hkv, S, D), jnp.float32)
        rng = np.random.default_rng(0)
        k_new = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
        v_new = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
        offsets = jnp.array([0, 5], jnp.int32)
        kc2, vc2 = kvcache.update_kv_cache(kc, vc, jnp.asarray(k_new),
                                           jnp.asarray(v_new), offsets)
        kc2 = np.asarray(kc2)
        vc2 = np.asarray(vc2)
        # seq 0 written at [0, 2); seq 1 at [5, 7); everything else untouched
        np.testing.assert_allclose(kc2[0, :, 0:2], k_new[0].transpose(1, 0, 2))
        np.testing.assert_allclose(kc2[1, :, 5:7], k_new[1].transpose(1, 0, 2))
        assert np.all(kc2[0, :, 2:] == 0) and np.all(kc2[1, :, :5] == 0)
        assert np.all(kc2[1, :, 7:] == 0)
        np.testing.assert_allclose(vc2[0, :, 0:2], v_new[0].transpose(1, 0, 2))
        np.testing.assert_allclose(vc2[1, :, 5:7], v_new[1].transpose(1, 0, 2))

    def test_init_cache_shape(self):
        c = kvcache.init_cache(num_layers=2, batch=3, num_kv_heads=4,
                               max_seq=8, head_dim=16, dtype=jnp.float32)
        assert c.k.shape == (2, 3, 4, 8, 16)
        assert c.v.shape == (2, 3, 4, 8, 16)
        assert c.max_seq_len == 8 and c.batch_size == 3
