"""INT4 KV cache: offset-lo nibble packing, linear-fold unpack parity in
the jnp path and both Pallas kernels, and end-to-end decode quality.

Beyond the north star's int8 KV (BASELINE.md): halves KV streaming again in
the long-context decode regime, which int8 already left KV-bound at ~89% of
the HBM roofline. The kernels never materialize dequantized pages: K unpacks
with one arithmetic shift + a rowsum(q) offset FMA, V's hi-nibble dot is a
difference of dots (see ops/pallas/decode_attention._kernel4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import tiny_llama
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import attention, kvcache, paged_kvcache
from llm_inference_tpu.ops import quantization as Q
from llm_inference_tpu.ops.pallas import decode_attention as DA
from llm_inference_tpu.ops.pallas import paged_attention as PA


class TestPacking:
    def test_roundtrip_exact(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 5, 2, 16)).astype(np.float32)
        packed, scale = Q.quantize_kv4(jnp.asarray(x))
        assert packed.shape == (3, 5, 2, 8) and packed.dtype == jnp.int8
        codes = np.asarray(Q.unpack_kv4(packed))
        assert codes.min() >= -8 and codes.max() <= 7
        # re-quantizing the dequantized values is a fixed point
        deq = np.asarray(Q.dequantize_kv4(packed, scale, jnp.float32))
        p2, s2 = Q.quantize_kv4(jnp.asarray(deq))
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(packed))

    def test_quant_error_bound(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 8, 64)).astype(np.float32)
        packed, scale = Q.quantize_kv4(jnp.asarray(x))
        deq = np.asarray(Q.dequantize_kv4(packed, scale, jnp.float32))
        # |err| <= scale/2 per element (round-to-nearest on in-range values)
        assert np.all(np.abs(deq - x) <= np.asarray(scale) / 2 + 1e-7)


class TestCacheWrites:
    def test_init_and_update(self):
        c = kvcache.init_cache(2, 1, 2, 16, 8, dtype="int4")
        assert c.quantized and c.bits == 4 and c.head_dim == 8
        assert c.k.shape == (2, 1, 2, 16, 4)
        k_new = jnp.ones((1, 3, 2, 8), jnp.float32) * 2.5
        c = kvcache.update_cache_layer(c, jnp.int32(1), k_new, k_new * -0.5,
                                       jnp.array([4], jnp.int32))
        assert c.bits == 4
        ks = np.asarray(c.k_scale)
        np.testing.assert_allclose(ks[1, 0, 4:7, :], 2.5 / 7.0, rtol=1e-6)
        deq = np.asarray(Q.dequantize_kv4(
            c.k[1, 0, :, 4:7], c.k_scale[1, 0, 4:7].T[:, :, None],
            jnp.float32))
        np.testing.assert_allclose(deq, 2.5, rtol=1e-6)
        assert np.all(np.asarray(c.k)[0] == 0)


class TestAttendParity:
    """The fold math must EXACTLY reproduce attention over the dequantized
    cache — quantization error is the only divergence from fp."""

    def _caches(self, B, Hkv, S, D, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        k_tok = jax.random.normal(ks[0], (B, S - 1, Hkv, D), jnp.float32)
        v_tok = jax.random.normal(ks[1], (B, S - 1, Hkv, D), jnp.float32)
        off = jnp.zeros((B,), jnp.int32)
        cq = kvcache.init_cache(1, B, Hkv, S, D, "int4")
        cq = kvcache.update_cache_layer(cq, jnp.int32(0), k_tok, v_tok, off)
        q = jax.random.normal(ks[2], (B, 1, Hkv * 2, D), jnp.float32)
        return q, cq

    def _dequant_views(self, cq):
        kd = Q.unpack_kv4(cq.k[0]).astype(jnp.float32)    # [B, Hkv, S, D]
        sc = jnp.swapaxes(cq.k_scale[0], 1, 2)[:, :, :, None]
        vd = Q.unpack_kv4(cq.v[0]).astype(jnp.float32)
        vs = jnp.swapaxes(cq.v_scale[0], 1, 2)[:, :, :, None]
        return kd * sc, vd * vs

    def test_jnp_attend_matches_dequant(self):
        B, Hkv, S, D = 2, 2, 32, 16
        q, cq = self._caches(B, Hkv, S, D)
        pos = jnp.full((B,), S - 2, jnp.int32)
        mask = attention.make_attention_mask(pos[:, None], S)
        kd, vd = self._dequant_views(cq)
        want = attention.attend(q, kd, vd, mask)
        got = attention.attend(q, cq.k[0], cq.v[0], mask,
                               k_scale=cq.k_scale[0], v_scale=cq.v_scale[0])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-3, rtol=3e-3)

    def test_decode_kernel_matches_jnp(self):
        B, Hkv, S, D = 2, 4, 256, 128
        q, cq = self._caches(B, Hkv, S, D, key=2)
        pos = jnp.full((B,), S - 2, jnp.int32)
        out = DA.decode_attention(q, cq.k, cq.v, 0, pos,
                                  k_scale=cq.k_scale, v_scale=cq.v_scale)
        mask = attention.make_attention_mask(pos[:, None], S)
        want = attention.attend(q, cq.k[0], cq.v[0], mask,
                                k_scale=cq.k_scale[0],
                                v_scale=cq.v_scale[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)

    def test_decode_kernel_window(self):
        B, Hkv, S, D = 1, 4, 256, 128
        q, cq = self._caches(B, Hkv, S, D, key=3)
        pos = jnp.full((B,), S - 2, jnp.int32)
        out = DA.decode_attention(q, cq.k, cq.v, 0, pos,
                                  k_scale=cq.k_scale, v_scale=cq.v_scale,
                                  window=64)
        mask = attention.make_attention_mask(pos[:, None], S, 64)
        want = attention.attend(q, cq.k[0], cq.v[0], mask,
                                k_scale=cq.k_scale[0],
                                v_scale=cq.v_scale[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)


class TestPagedInt4:
    def test_paged_kernel_matches_jnp(self):
        B, Hkv, ps, NB, D = 2, 4, 16, 4, 128
        L, S = 2, ps * NB
        cache = paged_kvcache.init_paged_cache(L, B * NB + 1, Hkv, ps, D,
                                               B, NB, "int4")
        assert cache.bits == 4 and cache.head_dim == D
        alloc = paged_kvcache.PageAllocator(B * NB + 1)
        pt = jnp.asarray([alloc.allocate(NB) for _ in range(B)], jnp.int32)
        cache = cache.replace(page_table=pt)
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        k_tok = jax.random.normal(ks[0], (B, S, Hkv, D), jnp.float32)
        v_tok = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
        cache = paged_kvcache.write_prompt_batch(cache, jnp.int32(1),
                                                 k_tok, v_tok, NB)
        q = jax.random.normal(ks[2], (B, 1, Hkv * 2, D), jnp.float32)
        pos = jnp.array([S - 2, ps + 1], jnp.int32)
        out = PA.paged_decode_attention(
            q, cache.k_pages, cache.v_pages, cache.page_table, 1, pos,
            k_scale=cache.k_scale, v_scale=cache.v_scale)
        # golden: gather the pages densely, jnp path unpacks + folds
        kd = cache.k_pages[1, pt].transpose(0, 2, 1, 3, 4).reshape(
            B, Hkv, S, D // 2)
        vd = cache.v_pages[1, pt].transpose(0, 2, 1, 3, 4).reshape(
            B, Hkv, S, D // 2)
        ksd = cache.k_scale[1, pt].reshape(B, S, Hkv)
        vsd = cache.v_scale[1, pt].reshape(B, S, Hkv)
        mask = attention.make_attention_mask(pos[:, None], S)
        want = attention.attend(q, kd, vd, mask, k_scale=ksd, v_scale=vsd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)

    def test_write_token_int4(self):
        B, Hkv, ps, NB, D = 1, 2, 8, 2, 16
        cache = paged_kvcache.init_paged_cache(2, B * NB + 1, Hkv, ps, D,
                                               B, NB, "int4")
        cache = cache.replace(page_table=jnp.array([[1, 2]], jnp.int32))
        k1 = jnp.ones((B, 1, Hkv, D), jnp.float32) * 3.5
        cache = paged_kvcache.write_token(cache, jnp.int32(0), k1, -k1,
                                          jnp.array([ps + 2], jnp.int32))
        assert cache.bits == 4
        deq = np.asarray(Q.dequantize_kv4(
            cache.k_pages[0, 2, :, 2],
            cache.k_scale[0, 2, 2][:, None], jnp.float32))
        np.testing.assert_allclose(deq, 3.5, rtol=1e-6)


class TestEndToEnd:
    def test_forward_decode_int4_cache_close_to_f32(self):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.array([[3, 5, 7, 11]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]

        def run(dtype):
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       64, cfg.head_dim, dtype)
            lg, c = llama.forward(cfg, params, ids, pos, cache)
            lg2, _ = llama.forward(cfg, params, jnp.array([[9]], jnp.int32),
                                   jnp.array([[4]], jnp.int32), c)
            return np.asarray(lg), np.asarray(lg2)

        f1, f2 = run(jnp.float32)
        q1, q2 = run("int4")
        assert np.corrcoef(f1.ravel(), q1.ravel())[0, 1] > 0.99
        assert np.corrcoef(f2.ravel(), q2.ravel())[0, 1] > 0.98
