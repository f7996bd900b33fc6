"""Paged flash prefill kernel (ops/pallas/paged_flash.py) vs the
gather-then-attend golden path — the prefix-cache suffix-prefill and
chunked-paged-admission attention without per-layer page gathers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import attention, paged_kvcache
from llm_inference_tpu.ops.pallas import paged_flash as PF


def build_pool(B, Hkv, ps, NB, D, dtype, fill_tokens, seed=0):
    """Pool with `fill_tokens` tokens written per sequence from pos 0."""
    L = 2
    cache = paged_kvcache.init_paged_cache(L, B * NB + 1, Hkv, ps, D,
                                           B, NB, dtype)
    alloc = paged_kvcache.PageAllocator(B * NB + 1)
    pt = jnp.asarray([alloc.allocate(NB) for _ in range(B)], jnp.int32)
    cache = cache.replace(page_table=pt)
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    k_tok = jax.random.normal(ks[0], (B, fill_tokens, Hkv, D), jnp.float32)
    v_tok = jax.random.normal(ks[1], (B, fill_tokens, Hkv, D), jnp.float32)
    cache = paged_kvcache.write_prompt_batch(cache, jnp.int32(1), k_tok,
                                             v_tok, fill_tokens // ps)
    return cache


def gather_golden(cache, layer, B):
    from llm_inference_tpu.models.llama import _gather_paged
    return _gather_paged(cache, layer, B)


class TestPagedFlash:
    @pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4"])
    def test_suffix_prefill_matches_gather(self, dtype):
        B, Hkv, ps, NB, D = 2, 2, 128, 4, 128
        S = ps * NB
        cache = build_pool(B, Hkv, ps, NB, D, dtype, fill_tokens=S)
        T = 64                                 # suffix at offset 256
        q = jax.random.normal(jax.random.PRNGKey(3), (B, T, Hkv * 2, D),
                              jnp.float32)
        pos = jnp.tile(256 + jnp.arange(T, dtype=jnp.int32), (B, 1))
        assert PF.supports(q.shape, ps)
        out = PF.paged_flash_attention(
            q, cache.k_pages, cache.v_pages, cache.page_table, 1, pos,
            k_scale=cache.k_scale, v_scale=cache.v_scale, block_t=32)
        kd, vd, ksd, vsd = gather_golden(cache, 1, B)
        mask = attention.make_attention_mask(pos, S)
        want = attention.attend(q, kd, vd, mask, k_scale=ksd, v_scale=vsd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)

    def test_sliding_window_traced(self):
        B, Hkv, ps, NB, D = 1, 2, 128, 4, 64
        S = ps * NB
        cache = build_pool(B, Hkv, ps, NB, D, "bfloat16", fill_tokens=S,
                           seed=5)
        T = 32
        q = jax.random.normal(jax.random.PRNGKey(6), (B, T, Hkv, D),
                              jnp.float32)
        pos = jnp.tile(300 + jnp.arange(T, dtype=jnp.int32), (B, 1))
        kd, vd, _, _ = gather_golden(cache, 1, B)
        mask = attention.make_attention_mask(pos, S, sliding_window=150)
        want = attention.attend(q, kd, vd, mask)
        out = jax.jit(lambda w: PF.paged_flash_attention(
            q, cache.k_pages, cache.v_pages, cache.page_table, 1, pos,
            sliding_window=w, block_t=32))(jnp.int32(150))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=8e-3, rtol=2e-2)

    def test_t_padding(self):
        B, Hkv, ps, NB, D = 1, 2, 128, 2, 128
        cache = build_pool(B, Hkv, ps, NB, D, "bfloat16",
                           fill_tokens=ps * NB, seed=7)
        T = 40                                 # not a block multiple
        q = jax.random.normal(jax.random.PRNGKey(8), (B, T, Hkv, D),
                              jnp.float32)
        pos = jnp.tile(100 + jnp.arange(T, dtype=jnp.int32), (B, 1))
        kd, vd, _, _ = gather_golden(cache, 1, B)
        mask = attention.make_attention_mask(pos, ps * NB)
        want = attention.attend(q, kd, vd, mask)
        out = PF.paged_flash_attention(
            q, cache.k_pages, cache.v_pages, cache.page_table, 1, pos,
            block_t=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=8e-3, rtol=2e-2)


class TestEndToEndDispatch:
    def test_forward_paged_history_kernel_matches_gather(self, monkeypatch):
        """llama.forward(paged_history=True) through the kernel vs the
        gather fallback — identical logits."""
        from llm_inference_tpu.config import tiny_llama
        from llm_inference_tpu.models import llama
        from llm_inference_tpu.ops.pallas import paged_flash as pf
        cfg = tiny_llama(num_kv_heads=2, head_dim=64, num_heads=4,
                         hidden_size=256)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        B, ps, NB = 1, 128, 2
        cache = paged_kvcache.init_paged_cache(
            cfg.num_layers, B * NB + 1, cfg.num_kv_heads, ps, cfg.head_dim,
            B, NB, "bfloat16")
        cache = cache.replace(page_table=jnp.array([[1, 2]], jnp.int32))
        rng = np.random.default_rng(4)
        # prefill the first page (prefix), then a suffix at offset ps
        ids0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, ps)),
                           jnp.int32)
        pos0 = jnp.tile(jnp.arange(ps, dtype=jnp.int32), (B, 1))
        _, cache = llama.forward(cfg, params, ids0, pos0, cache,
                                 logits_mode="none")
        ids1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, ps)),
                           jnp.int32)
        pos1 = jnp.tile(ps + jnp.arange(ps, dtype=jnp.int32), (B, 1))

        def run(c):
            lg, _ = llama.forward(cfg, params, ids1, pos1, c,
                                  logits_mode="all", paged_history=True)
            return np.asarray(lg)

        got = run(cache)                       # kernel path (ps=128)
        monkeypatch.setattr(pf, "supports", lambda *a: False)
        want = run(cache)                      # gather fallback
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
