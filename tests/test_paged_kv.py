"""Paged KV cache + paged decode attention vs the dense golden path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import attention, paged_kvcache as pk
from llm_inference_tpu.ops.pallas import paged_attention as PA


class TestAllocator:
    def test_allocate_release(self):
        a = pk.PageAllocator(8)            # default reserve=1: page 0 held
        p1 = a.allocate(3)
        assert len(set(p1)) == 3 and 0 not in p1
        assert a.free_pages == 4
        a.release(p1[:2])
        assert a.free_pages == 6
        with pytest.raises(MemoryError):
            a.allocate(7)
        assert pk.PageAllocator(8, reserve=0).free_pages == 8


class TestPagedWrites:
    def test_prompt_then_tokens_roundtrip(self):
        L, P, H, ps, D, B, NB = 2, 16, 4, 8, 32, 2, 4
        cache = pk.init_paged_cache(L, P, H, ps, D, B, NB, jnp.float32)
        alloc = pk.PageAllocator(P)
        pt = np.zeros((B, NB), np.int32)
        pt[0, :2] = alloc.allocate(2)       # seq 0: 2 pages for 10 tokens
        pt[1, :1] = alloc.allocate(1)
        cache = cache.replace(page_table=jnp.asarray(pt))

        rng = np.random.default_rng(0)
        k_seq = rng.standard_normal((2 * ps, H, D)).astype(np.float32)
        v_seq = rng.standard_normal((2 * ps, H, D)).astype(np.float32)
        for layer in range(L):
            cache = pk.write_prompt(cache, jnp.int32(layer), 0,
                                    jnp.asarray(k_seq) + layer,
                                    jnp.asarray(v_seq) + layer)
        k_d, v_d = pk.gather_dense(cache, 1, 0, 2 * ps)
        np.testing.assert_allclose(np.asarray(k_d),
                                   (k_seq + 1).transpose(1, 0, 2))

        # decode-step write at position 10 of seq 1 (block 1 → need a page)
        pt[1, 1] = alloc.allocate(1)[0]
        cache = cache.replace(page_table=jnp.asarray(pt))
        k_new = rng.standard_normal((B, 1, H, D)).astype(np.float32)
        v_new = rng.standard_normal((B, 1, H, D)).astype(np.float32)
        pos = jnp.array([2 * ps, 10], jnp.int32)
        cache = pk.write_token(cache, jnp.int32(0), jnp.asarray(k_new),
                               jnp.asarray(v_new), pos)
        k_d, _ = pk.gather_dense(cache, 0, 1, 16)
        np.testing.assert_allclose(np.asarray(k_d)[:, 10], k_new[1, 0])


class TestPagedAttention:
    @pytest.mark.parametrize("B,Hq,Hkv,ps,NB,D", [
        (1, 8, 8, 128, 4, 128),
        (2, 8, 2, 128, 2, 128),
        (2, 4, 4, 64, 3, 64),
    ])
    def test_matches_dense_golden(self, B, Hq, Hkv, ps, NB, D):
        L, P = 2, B * NB + 2
        rng = np.random.default_rng(1)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        # build a scrambled page table so page ids ≠ block order
        alloc = pk.PageAllocator(P)
        pt = np.zeros((B, NB), np.int32)
        for bb in range(B):
            pt[bb] = alloc.allocate(NB)
        rng.shuffle(pt.reshape(-1))
        cache = pk.init_paged_cache(L, P, Hkv, ps, D, B, NB, jnp.float32)
        cache = cache.replace(page_table=jnp.asarray(pt))
        S = NB * ps
        k_seq = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
        v_seq = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
        layer = 1
        for bb in range(B):
            cache = pk.write_prompt(cache, jnp.int32(layer), bb,
                                    k_seq[bb], v_seq[bb])
        pos = jnp.asarray(rng.integers(ps, S - 1, (B,)), jnp.int32)

        out = PA.paged_decode_attention(q, cache.k_pages, cache.v_pages,
                                        cache.page_table, layer, pos)
        # dense golden from the same data
        k_dense = k_seq.transpose(0, 2, 1, 3)     # [B, Hkv, S, D]
        v_dense = v_seq.transpose(0, 2, 1, 3)
        ref = attention.decode_attend(q, k_dense, v_dense, pos[:, None])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)

    def test_garbage_beyond_position_ignored(self):
        B, H, ps, NB, D = 1, 4, 64, 2, 64
        cache = pk.init_paged_cache(1, NB + 1, H, ps, D, B, NB, jnp.float32)
        pt = jnp.asarray([[1, 2]], jnp.int32)
        cache = cache.replace(page_table=pt)
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
        k_seq = jax.random.normal(ks[1], (B, 2 * ps, H, D), jnp.float32)
        v_seq = jax.random.normal(ks[2], (B, 2 * ps, H, D), jnp.float32)
        cache = pk.write_prompt(cache, jnp.int32(0), 0, k_seq[0], v_seq[0])
        pos = jnp.array([40], jnp.int32)
        out1 = PA.paged_decode_attention(q, cache.k_pages, cache.v_pages,
                                         pt, 0, pos)
        # poison everything beyond pos (rest of page 1 + all of page 2)
        kp = cache.k_pages.at[:, 2].set(1e4).at[:, 1, :, 41:].set(1e4)
        vp = cache.v_pages.at[:, 2].set(-1e4).at[:, 1, :, 41:].set(-1e4)
        out2 = PA.paged_decode_attention(q, kp, vp, pt, 0, pos)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)


class TestPagedInt8:
    def test_int8_pool_write_and_attention(self):
        """INT8 page pool: quantized writes + exact scale folding in the
        kernel must track the fp paged path to int8 rounding error."""
        B, H, ps, NB, D = 2, 4, 64, 3, 64
        L, P = 2, B * NB + 1
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
        k_seq = jax.random.normal(ks[1], (B, NB * ps, H, D), jnp.float32)
        v_seq = jax.random.normal(ks[2], (B, NB * ps, H, D), jnp.float32)
        alloc = pk.PageAllocator(P)
        pt = np.stack([alloc.allocate(NB) for _ in range(B)]).astype(np.int32)

        def build(dtype):
            c = pk.init_paged_cache(L, P, H, ps, D, B, NB, dtype)
            c = c.replace(page_table=jnp.asarray(pt))
            for b in range(B):
                c = pk.write_prompt(c, jnp.int32(1), b, k_seq[b], v_seq[b])
            return c
        cf = build(jnp.float32)
        cq = build("int8")
        assert cq.quantized and cq.k_pages.dtype == jnp.int8
        pos = jnp.array([NB * ps - 2, ps + 5], jnp.int32)
        ref = PA.paged_decode_attention(q, cf.k_pages, cf.v_pages,
                                        cf.page_table, 1, pos)
        out = PA.paged_decode_attention(q, cq.k_pages, cq.v_pages,
                                        cq.page_table, 1, pos,
                                        k_scale=cq.k_scale,
                                        v_scale=cq.v_scale)
        assert np.abs(np.asarray(ref) - np.asarray(out)).max() < 0.05

    def test_int8_token_write_roundtrip(self):
        B, H, ps, NB, D = 1, 2, 8, 2, 16
        c = pk.init_paged_cache(1, 4, H, ps, D, B, NB, "int8")
        c = c.replace(page_table=jnp.asarray([[1, 2]], jnp.int32))
        k_new = jnp.full((B, 1, H, D), 3.0, jnp.float32)
        c = pk.write_token(c, jnp.int32(0), k_new, -k_new,
                           jnp.array([ps + 3], jnp.int32))
        # page 2, row 3 holds the token (scales are slot-major [.., ps, H])
        codes = np.asarray(c.k_pages)[0, 2, :, 3]
        scale = np.asarray(c.k_scale)[0, 2, 3, :]
        np.testing.assert_allclose(codes * scale[:, None], 3.0, rtol=1e-2)


class TestPagedWindowed:
    """Sliding-window mode of the paged decode kernel (mistral's static
    window; gemma2's traced per-layer window)."""

    @pytest.mark.parametrize("W", [100, 300, 100000])
    def test_matches_windowed_golden(self, W):
        B, Hq, Hkv, ps, NB, D = 2, 8, 2, 128, 4, 128
        L, P = 2, B * NB + 2
        rng = np.random.default_rng(2)
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        alloc = pk.PageAllocator(P)
        pt = np.zeros((B, NB), np.int32)
        for bb in range(B):
            pt[bb] = alloc.allocate(NB)
        rng.shuffle(pt.reshape(-1))
        cache = pk.init_paged_cache(L, P, Hkv, ps, D, B, NB, jnp.float32)
        cache = cache.replace(page_table=jnp.asarray(pt))
        S = NB * ps
        k_seq = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
        v_seq = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
        layer = 1
        for bb in range(B):
            cache = pk.write_prompt(cache, jnp.int32(layer), bb,
                                    k_seq[bb], v_seq[bb])
        pos = jnp.asarray(rng.integers(S // 2, S - 1, (B,)), jnp.int32)

        out = PA.paged_decode_attention(q, cache.k_pages, cache.v_pages,
                                        cache.page_table, layer, pos,
                                        window=W)
        mask = attention.make_attention_mask(pos[:, None], S,
                                             sliding_window=W)
        ref = attention.attend(q, k_seq.transpose(0, 2, 1, 3),
                               v_seq.transpose(0, 2, 1, 3), mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)

    def test_window_excludes_old_tokens(self):
        """Pages wholly below the window start must not contribute, even
        when poisoned."""
        B, Hq, ps, NB, D, W = 1, 4, 64, 4, 64, 48
        L, P = 1, NB + 1
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        cache = pk.init_paged_cache(L, P, Hq, ps, D, B, NB, jnp.float32)
        alloc = pk.PageAllocator(P)
        cache = cache.replace(
            page_table=jnp.asarray([alloc.allocate(NB)], jnp.int32))
        S = NB * ps
        k_seq = jax.random.normal(ks[1], (B, S, Hq, D), jnp.float32)
        v_seq = jax.random.normal(ks[2], (B, S, Hq, D), jnp.float32)
        cache = pk.write_prompt(cache, jnp.int32(0), 0, k_seq[0], v_seq[0])
        pos = jnp.array([200], jnp.int32)    # window start 153, block 2
        out1 = PA.paged_decode_attention(q, cache.k_pages, cache.v_pages,
                                         cache.page_table, 0, pos, window=W)
        k2 = k_seq.at[:, :153].set(1e4)
        v2 = v_seq.at[:, :153].set(-1e4)
        cache2 = pk.init_paged_cache(L, P, Hq, ps, D, B, NB, jnp.float32)
        cache2 = cache2.replace(page_table=cache.page_table)
        cache2 = pk.write_prompt(cache2, jnp.int32(0), 0, k2[0], v2[0])
        out2 = PA.paged_decode_attention(q, cache2.k_pages, cache2.v_pages,
                                         cache2.page_table, 0, pos,
                                         window=W)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_traced_window_int8_pool(self):
        """Traced window scalar over an int8 page pool (gemma2 paged
        serving with a quantized cache)."""
        B, Hq, Hkv, ps, NB, D, W = 1, 8, 8, 64, 4, 128, 90
        L, P = 1, NB + 1
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        cache = pk.init_paged_cache(L, P, Hkv, ps, D, B, NB, "int8")
        alloc = pk.PageAllocator(P)
        cache = cache.replace(
            page_table=jnp.asarray([alloc.allocate(NB)], jnp.int32))
        S = NB * ps
        k_seq = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
        v_seq = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
        cache = pk.write_prompt(cache, jnp.int32(0), 0, k_seq[0], v_seq[0])
        pos = jnp.array([S - 2], jnp.int32)

        def run(win):
            return PA.paged_decode_attention(
                q, cache.k_pages, cache.v_pages, cache.page_table, 0, pos,
                window=win, k_scale=cache.k_scale, v_scale=cache.v_scale)
        out = jax.jit(run)(jnp.int32(W))
        mask = attention.make_attention_mask(pos[:, None], S,
                                             sliding_window=W)
        ref = attention.attend(q, k_seq.transpose(0, 2, 1, 3),
                               v_seq.transpose(0, 2, 1, 3), mask)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 0.05, err       # int8 rounding


class TestNullPageSanitize:
    def test_inf_write_does_not_poison_quantized_scales(self):
        """A retired slot writing Inf activations into the (shared) null
        page must not store a non-finite SCALE: masked readers multiply
        exactly-zero probs by the scale, and 0 x Inf = NaN would poison
        every live sequence (the int8-code nan_to_num alone is a no-op
        for this — the scale is where the Inf lands)."""
        cache = pk.init_paged_cache(1, 4, 2, 8, 16, batch=1,
                                    max_blocks=4, dtype="int8")
        bad = jnp.full((1, 1, 2, 16), jnp.inf, jnp.float32)
        cache = pk.write_token(cache, jnp.int32(0), bad, bad,
                               jnp.asarray([3], jnp.int32))
        assert np.isfinite(np.asarray(cache.k_scale)).all()
        assert np.isfinite(np.asarray(cache.v_scale)).all()
