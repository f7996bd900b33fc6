"""Flash (blockwise) prefill attention kernel vs the jnp golden model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import attention
from llm_inference_tpu.ops.pallas import flash_attention as FA


def make(B, T, Hq, Hkv, S, D, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, T, Hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
    return q, k, v


CASES = [
    # B, T, Hq, Hkv, S, D, start
    (1, 128, 4, 4, 256, 128, 0),        # MHA from scratch
    (2, 64, 8, 2, 128, 64, 0),          # GQA, multi-batch
    (1, 32, 4, 4, 256, 128, 100),       # history offset (chat round 2)
    (1, 40, 2, 2, 128, 128, 0),         # T not a block multiple (padding)
]


class TestFlashAttention:
    @pytest.mark.parametrize("B,T,Hq,Hkv,S,D,start", CASES)
    def test_matches_golden(self, B, T, Hq, Hkv, S, D, start):
        q, k, v = make(B, T, Hq, Hkv, S, D)
        pos = jnp.tile(start + jnp.arange(T, dtype=jnp.int32), (B, 1))
        mask = attention.make_attention_mask(pos, S)
        ref = attention.attend(q, k, v, mask)
        out = FA.flash_attention(q, k[None], v[None], 0, pos,
                                 block_t=32, block_s=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=8e-3, rtol=2e-2)

    def test_sliding_window(self):
        B, T, Hq, S, D = 1, 64, 2, 128, 64
        q, k, v = make(B, T, Hq, Hq, S, D, seed=3)
        pos = jnp.tile(40 + jnp.arange(T, dtype=jnp.int32), (B, 1))
        mask = attention.make_attention_mask(pos, S, sliding_window=24)
        ref = attention.attend(q, k, v, mask)
        out = FA.flash_attention(q, k[None], v[None], 0, pos,
                                 sliding_window=24, block_t=32, block_s=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=8e-3, rtol=2e-2)

    def test_layer_indexing(self):
        L, B, T, Hq, S, D = 3, 1, 32, 2, 128, 64
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (B, T, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (L, B, Hq, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (L, B, Hq, S, D), jnp.float32)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        mask = attention.make_attention_mask(pos, S)
        for l in range(L):
            ref = attention.attend(q, k[l], v[l], mask)
            out = FA.flash_attention(q, k, v, l, pos,
                                     block_t=32, block_s=64)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=8e-3, rtol=2e-2)

    def test_supports_gating(self):
        assert FA.supports((1, 1024, 4, 128), 2048, quantized=False)
        assert not FA.supports((1, 1, 4, 128), 2048, quantized=False)
        # quantized caches supported since the scale-fold variants landed
        assert FA.supports((1, 1024, 4, 128), 2048, quantized=True)
        assert not FA.supports((1, 1024, 4, 32), 2048, quantized=False)
        # short prefills stay on the XLA path (flash grid overhead dominates)
        assert not FA.supports((1, 128, 4, 128), 512, quantized=False)


class TestBlockDividesS:
    def test_non_dividing_block_s_still_attends_tail(self):
        """S=1280 with the default block_s=512: the grid must shrink the
        slot block until it divides S, or the last 256 slots silently
        vanish from attention (queries at the tail attend nothing)."""
        B, T, Hq, Hkv, S, D = 1, 64, 2, 2, 1280, 64
        q, k, v = make(B, T, Hq, Hkv, S, D, seed=5)
        start = S - T                         # tail of the cache
        pos = jnp.tile(start + jnp.arange(T, dtype=jnp.int32), (B, 1))
        mask = attention.make_attention_mask(pos, S)
        ref = attention.attend(q, k, v, mask)
        out = FA.flash_attention(q, k[None], v[None], 0, pos,
                                 block_t=32, block_s=512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=8e-3, rtol=2e-2)


class TestFlashQuantizedKV:
    """Scale-folded flash over int8 / packed int4 caches vs the jnp path
    (which unpacks + folds the same math)."""

    def _cache(self, B, Hkv, S, D, dtype, seed=11):
        from llm_inference_tpu.ops import kvcache
        ks = jax.random.split(jax.random.PRNGKey(seed), 2)
        k_tok = jax.random.normal(ks[0], (B, S, Hkv, D), jnp.float32)
        v_tok = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
        c = kvcache.init_cache(1, B, Hkv, S, D, dtype)
        return kvcache.update_cache_layer(c, jnp.int32(0), k_tok, v_tok,
                                          jnp.zeros((B,), jnp.int32))

    @pytest.mark.parametrize("kvdtype", ["int8", "int4"])
    def test_matches_jnp_fold(self, kvdtype):
        B, T, Hq, Hkv, S, D = 1, 64, 4, 2, 256, 128
        q = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hq, D),
                              jnp.float32)
        c = self._cache(B, Hkv, S, D, kvdtype)
        pos = jnp.tile(100 + jnp.arange(T, dtype=jnp.int32), (B, 1))
        mask = attention.make_attention_mask(pos, S)
        ref = attention.attend(q, c.k[0], c.v[0], mask,
                               k_scale=c.k_scale[0], v_scale=c.v_scale[0])
        out = FA.flash_attention(q, c.k, c.v, 0, pos,
                                 k_scale=c.k_scale, v_scale=c.v_scale,
                                 block_t=32, block_s=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    @pytest.mark.parametrize("kvdtype", ["int8", "int4"])
    def test_traced_window(self, kvdtype):
        B, T, Hq, Hkv, S, D = 1, 32, 2, 2, 256, 128
        q = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hq, D),
                              jnp.float32)
        c = self._cache(B, Hkv, S, D, kvdtype, seed=12)
        pos = jnp.tile(80 + jnp.arange(T, dtype=jnp.int32), (B, 1))
        mask = attention.make_attention_mask(pos, S, sliding_window=40)
        ref = attention.attend(q, c.k[0], c.v[0], mask,
                               k_scale=c.k_scale[0], v_scale=c.v_scale[0])
        out = jax.jit(lambda w: FA.flash_attention(
            q, c.k, c.v, 0, pos, sliding_window=w,
            k_scale=c.k_scale, v_scale=c.v_scale,
            block_t=32, block_s=128))(jnp.int32(40))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)


class TestBlockSkipping:
    def test_skip_clamps_do_not_change_results(self):
        """Offset prefill (history) + window: the DMA-clamped index maps
        and pl.when skips must be invisible in the output — compare
        against the jnp golden across offsets straddling block edges."""
        B, T, Hq, S, D = 1, 32, 2, 512, 64
        q, k, v = make(B, T, Hq, Hq, S, D, seed=9)
        for start in (0, 63, 64, 300, 479):
            pos = jnp.tile(start + jnp.arange(T, dtype=jnp.int32), (B, 1))
            mask = attention.make_attention_mask(pos, S, sliding_window=50)
            ref = attention.attend(q, k, v, mask)
            out = FA.flash_attention(q, k[None], v[None], 0, pos,
                                     sliding_window=50,
                                     block_t=32, block_s=64)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=8e-3, rtol=2e-2, err_msg=start)
