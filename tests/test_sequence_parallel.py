"""Sequence-parallel prefill (parallel/sequence.py) vs the single-device
forward: identical last-token logits AND an identical (replicated) KV cache,
so decode can continue on any replica. The reference has no long-context or
distributed machinery at all (SURVEY §5 'Long-context', §2.12)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import tiny_llama, QuantConfig, ShardingConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.parallel import make_mesh, shard_params
from llm_inference_tpu.parallel.sequence import sequence_parallel_prefill


@pytest.fixture(scope="module")
def cfg():
    return tiny_llama(num_kv_heads=4)


@pytest.fixture(scope="module")
def params(cfg):
    return llama.init_params(cfg, jax.random.PRNGKey(0))


def golden(cfg, params, ids, pos, max_seq):
    B = ids.shape[0]
    cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, max_seq,
                               cfg.head_dim, jnp.float32)
    logits, cache = llama.forward(cfg, params, ids, pos, cache)
    return np.asarray(logits), cache


def run_sp(cfg, params, ids, pos, sp, tp, max_seq, quant=None,
           last_idx=None):
    mesh = make_mesh(ShardingConfig(data=sp, tensor=tp))
    if quant:
        params = llama.quantize_params(params, quant, row_shards=tp)
    sparams = shard_params(params, mesh)
    B = ids.shape[0]
    cache = jax.device_put(
        kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, max_seq,
                           cfg.head_dim, jnp.float32))
    fwd = sequence_parallel_prefill(cfg, mesh, sparams)
    logits, cache = fwd(sparams, ids, pos, cache, last_idx)
    return np.asarray(logits), cache


@pytest.mark.parametrize("sp,tp", [(2, 1), (4, 1), (8, 1), (2, 2), (4, 2)])
class TestSequenceParallelParity:
    def test_logits_and_cache_match_single_device(self, cfg, params, sp, tp):
        rng = np.random.default_rng(0)
        B, T = 1, 16               # one long prompt, T divisible by sp
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g, gcache = golden(cfg, params, ids, pos, max_seq=32)
        s, scache = run_sp(cfg, params, ids, pos, sp, tp, max_seq=32)
        np.testing.assert_allclose(s, g, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(scache.k), np.asarray(gcache.k),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(scache.v), np.asarray(gcache.v),
                                   atol=2e-4, rtol=2e-4)

    def test_decode_continues_from_sp_cache(self, cfg, params, sp, tp):
        """The cache a sequence-parallel prefill produces must be usable by
        the ordinary single-device decode step (greedy tokens identical)."""
        rng = np.random.default_rng(1)
        B, T = 1, 8
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g, gcache = golden(cfg, params, ids, pos, max_seq=32)
        s, scache = run_sp(cfg, params, ids, pos, sp, tp, max_seq=32)
        nxt = jnp.argmax(jnp.asarray(s), -1).astype(jnp.int32)[:, None]
        pos1 = jnp.full((B, 1), T, jnp.int32)
        scache = jax.device_put(
            jax.tree.map(np.asarray, scache), jax.devices()[0])
        d_sp, _ = llama.forward(cfg, params, nxt, pos1, scache)
        gn = jnp.argmax(jnp.asarray(g), -1).astype(jnp.int32)[:, None]
        d_g, _ = llama.forward(cfg, params, gn, pos1, gcache)
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(gn))
        np.testing.assert_allclose(np.asarray(d_sp), np.asarray(d_g),
                                   atol=2e-4, rtol=2e-4)


class TestSequenceParallelQuantized:
    def test_int8_weights(self, cfg, params):
        qcfg = QuantConfig(weights="int8")
        rng = np.random.default_rng(2)
        B, T = 1, 8
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        qparams = llama.quantize_params(params, qcfg)
        g, _ = golden(cfg, qparams, ids, pos, max_seq=16)
        s, _ = run_sp(cfg, params, ids, pos, 4, 1, max_seq=16, quant=qcfg)
        np.testing.assert_allclose(s, g, atol=5e-3, rtol=5e-3)

    def test_batch_gt_one(self, cfg, params):
        """SP with B>1 (e.g. two long prompts prefilled together)."""
        rng = np.random.default_rng(3)
        B, T = 2, 8
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g, _ = golden(cfg, params, ids, pos, max_seq=16)
        s, _ = run_sp(cfg, params, ids, pos, 2, 2, max_seq=16)
        np.testing.assert_allclose(s, g, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("sp,tp", [(2, 1), (4, 1), (4, 2)])
class TestRingAttention:
    def test_ring_matches_single_device(self, cfg, params, sp, tp):
        """ring=True: blockwise ring schedule — same logits AND the same
        replicated cache as the all-gather schedule / single device."""
        rng = np.random.default_rng(10)
        B, T = 1, 16
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g, gcache = golden(cfg, params, ids, pos, max_seq=32)

        mesh = make_mesh(ShardingConfig(data=sp, tensor=tp))
        sparams = shard_params(params, mesh)
        cache = jax.device_put(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32))
        fwd = sequence_parallel_prefill(cfg, mesh, sparams, ring=True)
        s, scache = fwd(sparams, ids, pos, cache, None)
        np.testing.assert_allclose(np.asarray(s), g, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(scache.k),
                                   np.asarray(gcache.k),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(scache.v),
                                   np.asarray(gcache.v),
                                   atol=2e-4, rtol=2e-4)


class TestQKNorm:
    def test_qk_norm_matches_single_device(self):
        """qwen3-style per-head QK-norm must flow through _sp_layer (it
        once silently skipped it — SP output diverged from dense)."""
        cfg = tiny_llama(num_kv_heads=4, qk_norm=True)
        params = llama.init_params(cfg, jax.random.PRNGKey(1))
        # break the unit-gain symmetry so a skipped norm can't hide
        params["layers"]["q_norm"] = params["layers"]["q_norm"] * 1.5
        params["layers"]["k_norm"] = params["layers"]["k_norm"] * 0.7
        rng = np.random.default_rng(5)
        B, T = 1, 16
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g, _ = golden(cfg, params, ids, pos, max_seq=32)
        s, _ = run_sp(cfg, params, ids, pos, sp=4, tp=1, max_seq=32)
        np.testing.assert_allclose(s, g, atol=2e-4, rtol=2e-4)
