"""Paged continuous batching over a tensor-parallel mesh (the production
13B+ serving shape: TP-sharded weights + page-pool KV): outputs must match
the single-device paged scheduler exactly. No reference analogue (SURVEY
§2.12)."""

import numpy as np
import jax
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      ShardingConfig, tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.scheduler import PagedScheduler
from llm_inference_tpu.models import llama
from llm_inference_tpu.parallel import make_mesh

ECFG = EngineConfig(max_seq_len=64, decode_chunk=4, max_batch_size=2,
                    prefill_buckets=(8, 16), page_size=8)
GEN = GenerationConfig(greedy=True, max_new_tokens=8, eos_token_ids=(1,))


def _engines(tp, cache_dtype="bfloat16"):
    cfg = tiny_llama(num_kv_heads=2, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    single = InferenceEngine(cfg, params, engine_cfg=ECFG,
                             cache_dtype=cache_dtype)
    mesh = make_mesh(ShardingConfig(data=1, tensor=tp))
    sharded = InferenceEngine(cfg, params, engine_cfg=ECFG, mesh=mesh,
                              cache_dtype=cache_dtype)
    return single, sharded


class TestPagedOverMesh:
    def test_outputs_match_single_device(self):
        single, sharded = _engines(tp=2)
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(2, 200, rng.integers(3, 14)))
                   for _ in range(4)]
        want = [r.output_ids for r in
                PagedScheduler(single, GEN, slots=2).run(
                    [list(p) for p in prompts])]
        got = [r.output_ids for r in
               PagedScheduler(sharded, GEN, slots=2).run(
                   [list(p) for p in prompts])]
        assert got == want

    def test_prefix_cache_over_mesh(self):
        single, sharded = _engines(tp=2)
        rng = np.random.default_rng(1)
        prompt = list(rng.integers(2, 200, 19))
        want = [r.output_ids for r in
                PagedScheduler(single, GEN, slots=2).run(
                    [list(prompt)] * 3)]
        sched = PagedScheduler(sharded, GEN, slots=2, prefix_cache=True)
        got = [r.output_ids for r in sched.run([list(prompt)] * 3)]
        assert got == want
        assert sched.store.hit_tokens > 0

    def test_data_axis_rejected(self):
        cfg = tiny_llama(num_kv_heads=2, dtype="float32")
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(ShardingConfig(data=2, tensor=2))
        eng = InferenceEngine(cfg, params, engine_cfg=ECFG, mesh=mesh)
        with pytest.raises(ValueError, match="data axis"):
            PagedScheduler(eng, GEN, slots=2).run([[5, 6, 7]],
                                                  max_new_tokens=2)
