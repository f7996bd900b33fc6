"""Pipeline-parallel forward (parallel/pipeline.py) vs the single-device
forward on the 8-virtual-CPU-device mesh. The reference has no distributed
code (SURVEY §2.12); the golden is our own llama.forward, itself validated
against HF (tests/test_hf_parity.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import tiny_llama, QuantConfig, ShardingConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.parallel import (
    make_mesh, pipelined_forward, shard_cache, shard_params)


@pytest.fixture(scope="module")
def cfg():
    # 4 layers so pipe ∈ {2, 4} divides; kv_heads=2 so tp=2 divides
    return tiny_llama(num_layers=4)


@pytest.fixture(scope="module")
def params(cfg):
    return llama.init_params(cfg, jax.random.PRNGKey(0))


def golden_two_step(cfg, params, ids, pos, max_seq=32):
    """Single-device prefill + one greedy decode step."""
    B, T = ids.shape
    cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, max_seq,
                               cfg.head_dim, jnp.float32)
    g0, cache = llama.forward(cfg, params, ids, pos, cache)
    nxt = jnp.argmax(g0, -1).astype(jnp.int32)[:, None]
    pos1 = jnp.full((B, 1), T, jnp.int32)
    g1, _ = llama.forward(cfg, params, nxt, pos1, cache)
    return np.asarray(g0), np.asarray(nxt), np.asarray(g1)


def run_pipelined(cfg, params, ids, pos, dp, pp, tp, M, max_seq=32,
                  quant=None):
    mesh = make_mesh(ShardingConfig(data=dp, pipe=pp, tensor=tp))
    if quant:
        params = llama.quantize_params(params, quant, row_shards=tp)
    sparams = shard_params(params, mesh, pipe_axis="pipe")
    B, T = ids.shape
    cache = shard_cache(
        kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, max_seq,
                           cfg.head_dim, jnp.float32), mesh,
        pipe_axis="pipe")
    fwd = pipelined_forward(cfg, mesh, sparams, microbatches=M)
    last = jnp.full((B,), T - 1, jnp.int32)
    logits, cache = fwd(sparams, ids, pos, cache, last)
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    pos1 = jnp.full((B, 1), T, jnp.int32)
    logits1, cache = fwd(sparams, nxt, pos1, cache,
                         jnp.zeros((B,), jnp.int32))
    return np.asarray(logits), np.asarray(nxt), np.asarray(logits1)


@pytest.mark.parametrize("dp,pp,tp,M", [
    (1, 2, 1, 2),    # pure PP
    (1, 4, 1, 2),    # deeper pipe, bubble-heavy
    (1, 2, 2, 2),    # PP × TP
    (2, 2, 2, 1),    # DP × PP × TP, single microbatch per shard
    (1, 2, 1, 4),    # more microbatches than needed
])
class TestPipelinedParity:
    def test_prefill_and_decode_match_single_device(self, cfg, params,
                                                    dp, pp, tp, M):
        rng = np.random.default_rng(0)
        B, T = 4 * dp, 5
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g0, gn, g1 = golden_two_step(cfg, params, ids, pos)
        p0, pn, p1 = run_pipelined(cfg, params, ids, pos, dp, pp, tp, M)
        np.testing.assert_allclose(p0, g0, atol=2e-4, rtol=2e-4)
        np.testing.assert_array_equal(pn, gn)     # same greedy tokens
        np.testing.assert_allclose(p1, g1, atol=2e-4, rtol=2e-4)


class TestPipelinedQuantized:
    def test_int8_pipelined_matches_unsharded_quantized(self, cfg, params):
        """Stacked QTensor weights shard their layer axis over pipe and
        keep the layer-indexed matmul path working stage-locally."""
        qcfg = QuantConfig(weights="int8")
        qparams = llama.quantize_params(params, qcfg)
        rng = np.random.default_rng(1)
        B, T = 4, 5
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g0, gn, g1 = golden_two_step(cfg, qparams, ids, pos)
        p0, pn, p1 = run_pipelined(cfg, params, ids, pos, 1, 2, 1, 2,
                                   quant=qcfg)
        np.testing.assert_allclose(p0, g0, atol=5e-3, rtol=5e-3)
        np.testing.assert_array_equal(pn, gn)
        np.testing.assert_allclose(p1, g1, atol=5e-3, rtol=5e-3)


class TestPipelineValidation:
    def test_layers_not_divisible_raises(self, cfg, params):
        mesh = make_mesh(ShardingConfig(pipe=2))
        bad = tiny_llama(num_layers=3)
        bparams = llama.init_params(bad, jax.random.PRNGKey(0))
        # L=3 can't shard 2 ways: rejected at placement time
        with pytest.raises(ValueError, match="divisible"):
            shard_params(bparams, mesh, pipe_axis="pipe")

    def test_microbatch_divisibility_raises(self, cfg, params):
        mesh = make_mesh(ShardingConfig(pipe=2))
        sparams = shard_params(params, mesh, pipe_axis="pipe")
        cache = shard_cache(
            kvcache.init_cache(cfg.num_layers, 2, cfg.num_kv_heads, 16,
                               cfg.head_dim, jnp.float32), mesh,
            pipe_axis="pipe")
        fwd = pipelined_forward(cfg, mesh, sparams, microbatches=3)
        ids = jnp.ones((2, 3), jnp.int32)   # B=2 not divisible by M=3
        pos = jnp.tile(jnp.arange(3, dtype=jnp.int32), (2, 1))
        with pytest.raises(ValueError, match="not divisible"):
            fwd(sparams, ids, pos, cache, None)


@pytest.mark.parametrize("pp,tp,M", [(2, 1, 2), (2, 1, 4), (4, 2, 2)])
class TestSequenceChunkedPipelinePrefill:
    def test_long_prompt_streams_through_stages(self, cfg, params, pp, tp,
                                                M):
        """Time-chunked PP prefill: same last-token logits and a cache the
        ordinary decode can continue from (greedy token identical)."""
        from llm_inference_tpu.parallel.pipeline import pipelined_prefill_seq
        rng = np.random.default_rng(20)
        B, T = 2, 16
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        g0, gn, g1 = golden_two_step(cfg, params, ids, pos)

        mesh = make_mesh(ShardingConfig(pipe=pp, tensor=tp))
        sparams = shard_params(params, mesh, pipe_axis="pipe")
        cache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32), mesh,
            pipe_axis="pipe")
        fwd = pipelined_prefill_seq(cfg, mesh, sparams, chunks=M)
        logits, cache = fwd(sparams, ids, pos, cache,
                            jnp.full((B,), T - 1, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits), g0, atol=2e-4,
                                   rtol=2e-4)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        np.testing.assert_array_equal(np.asarray(nxt), gn)
        # decode continues on the PP cache via the decode-mode pipeline
        from llm_inference_tpu.parallel import pipelined_forward
        dfwd = pipelined_forward(cfg, mesh, sparams, microbatches=1)
        pos1 = jnp.full((B, 1), T, jnp.int32)
        logits1, _ = dfwd(sparams, nxt, pos1, cache,
                          jnp.zeros((B,), jnp.int32))
        np.testing.assert_allclose(np.asarray(logits1), g1, atol=2e-4,
                                   rtol=2e-4)
