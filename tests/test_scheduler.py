"""Continuous batching scheduler: correctness vs one-at-a-time generation.

The key property: interleaving many requests through shared decode slots
must produce EXACTLY the tokens each request would get alone (greedy), with
admissions happening as slots free up. (Reference analogue: none — the
reference is strictly batch=1 serial, llama.h:36.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.scheduler import (ContinuousBatchingScheduler,
                                                PagedScheduler)
from llm_inference_tpu.models import llama


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(
        cfg, params,
        engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                max_batch_size=2, prefill_buckets=(8, 16)))


GEN = GenerationConfig(greedy=True, max_new_tokens=10, eos_token_ids=(1,))


def solo_generate(engine, prompt_ids, n):
    res = engine.generate([prompt_ids],
                          GenerationConfig(greedy=True, max_new_tokens=n,
                                           eos_token_ids=(1,)))
    return res[0].token_ids


class TestScheduler:
    def test_matches_solo_generation(self, engine):
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(2, 200, rng.integers(3, 12)))
                   for _ in range(5)]
        sched = ContinuousBatchingScheduler(engine, GEN, slots=2)
        reqs = sched.run(prompts)
        assert len(reqs) == 5
        for req, prompt in zip(reqs, prompts):
            want = solo_generate(engine, prompt, GEN.max_new_tokens)
            got = req.output_ids
            if req.finished:                    # drop tokens after EOS
                got = got[:got.index(1)] if 1 in got else got
            assert got[:len(want)] == want[:len(got)], (
                f"req {req.req_id}: {got} != {want}")
            assert len(got) <= GEN.max_new_tokens

    def test_more_requests_than_slots_all_complete(self, engine):
        sched = ContinuousBatchingScheduler(engine, GEN, slots=2)
        reqs = sched.run([[5, 6, 7]] * 7, max_new_tokens=5)
        assert all(r.done_t > 0 for r in reqs)
        assert all(1 <= len(r.output_ids) <= 5 for r in reqs)

    def test_streaming_and_ttft(self, engine):
        got = []
        sched = ContinuousBatchingScheduler(engine, GEN, slots=2)
        req = sched.submit([5, 9, 13], max_new_tokens=4,
                           stream=lambda rid, tok: got.append((rid, tok)))
        while sched.step():
            pass
        assert req.done_t > 0 and req.ttft_s > 0
        streamed = [t for rid, t in got if rid == req.req_id]
        # streamed tokens = outputs minus any EOS
        want = [t for t in req.output_ids if t != 1]
        assert streamed == want

    def test_rejects_oversized_request(self, engine):
        sched = ContinuousBatchingScheduler(engine, GEN, slots=2)
        with pytest.raises(ValueError):
            sched.submit(list(range(2, 62)), max_new_tokens=10)


class TestRecovery:
    def test_drain_inflight_replays_requests(self, engine):
        sched = ContinuousBatchingScheduler(engine, GEN, slots=2)
        golden = [r.output_ids for r in
                  ContinuousBatchingScheduler(engine, GEN, slots=2).run(
                      [[5, 6, 7], [9, 10, 11]], max_new_tokens=6)]
        # start, decode one chunk, then simulate a failure mid-flight
        for p in ([5, 6, 7], [9, 10, 11]):
            sched.submit(list(p), max_new_tokens=6)
        sched.step()
        drained = sched.drain_inflight()
        assert len(drained) == 2 and all(r.output_ids == [] for r in drained)
        # fresh cache (restart), same scheduler object replays from prompts
        sched.cache = sched._make_cache()
        while sched.step():
            pass
        got = [r.output_ids for r in drained]
        assert got == golden


class TestShardedScheduler:
    def test_scheduler_over_mesh(self):
        """Continuous batching over a (dp=2, tp=2) mesh must produce the
        same greedy tokens as the single-device scheduler."""
        from llm_inference_tpu.config import ShardingConfig, tiny_llama
        from llm_inference_tpu.parallel import make_mesh

        cfg = tiny_llama(num_kv_heads=4)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_seq_len=64, decode_chunk=4, max_batch_size=2,
                            prefill_buckets=(8, 16))
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=(1,))
        prompts = [[5, 6, 7], [9, 10, 11], [2, 3]]

        solo = InferenceEngine(cfg, params, engine_cfg=ecfg)
        want = [r.output_ids for r in
                ContinuousBatchingScheduler(solo, gen, slots=2).run(
                    [list(p) for p in prompts])]

        mesh = make_mesh(ShardingConfig(data=2, tensor=2))
        eng = InferenceEngine(cfg, params, engine_cfg=ecfg, mesh=mesh)
        got = [r.output_ids for r in
               ContinuousBatchingScheduler(eng, gen, slots=2).run(
                   [list(p) for p in prompts])]
        assert got == want


class TestPerRequestSampling:
    """Per-request sampling knobs ride as per-slot runtime arrays through
    ONE compiled decode program (ops/sampling.sample_per_row)."""

    def _engine(self):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        return InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16), page_size=8))

    def test_greedy_and_sampled_mix(self):
        """A greedy request batched WITH a high-temperature request must
        still produce the exact greedy stream for the greedy row."""
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=8,
                               eos_token_ids=(1,))
        sched = ContinuousBatchingScheduler(eng, gen, slots=2)
        want = [r.output_ids
                for r in sched.run([[5, 6, 7], [9, 10, 11]])]
        sched2 = ContinuousBatchingScheduler(eng, gen, slots=2)
        g = sched2.submit([5, 6, 7])                       # default greedy
        s = sched2.submit([9, 10, 11], temperature=5.0)    # hot sampling
        while sched2.step():
            pass
        assert g.output_ids == want[0]           # greedy row unperturbed
        assert len(s.output_ids) == 8

    def test_seeded_sampling_differs_by_temperature(self):
        """Same prompt, same key stream: temperature=tiny ≈ greedy;
        temperature huge ⇒ (almost surely) different continuation."""
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=12,
                               eos_token_ids=())
        cold = ContinuousBatchingScheduler(eng, gen, slots=2)
        r_cold = cold.submit([3, 4, 5], temperature=1e-4)
        while cold.step():
            pass
        greedy_ref = ContinuousBatchingScheduler(eng, gen, slots=2)
        r_ref = greedy_ref.submit([3, 4, 5])
        while greedy_ref.step():
            pass
        assert r_cold.output_ids == r_ref.output_ids

    def test_top_k_bound_validated(self):
        eng = self._engine()
        sched = ContinuousBatchingScheduler(
            eng, GenerationConfig(greedy=True, max_new_tokens=4), slots=2)
        with pytest.raises(ValueError, match="max_top_k"):
            sched.submit([5, 6, 7], top_k=1000)

    def test_paged_per_request_sampling(self):
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=(1,))
        golden = PagedScheduler(eng, gen, slots=2)
        want = [r.output_ids for r in golden.run([[5, 6, 7, 8]])]
        sched = PagedScheduler(eng, gen, slots=2)
        g = sched.submit([5, 6, 7, 8])
        s = sched.submit([9, 10], temperature=3.0, top_p=0.9)
        while sched.step():
            pass
        assert g.output_ids == want[0]
        assert len(s.output_ids) == 6
