"""Serving-loop async machinery: wave admissions, deferred first-token
sync, one-chunk-deep harvest pipelining (EngineConfig.pipeline_harvest).

These exist because the round-4 chip profile of scripts/bench_serving.py
showed the host loop at 0.14x of the raw-scan ceiling: per-request
synchronous admissions (2 device round trips each) and a blocking
token fetch per decode chunk. The fixes must not change any stream's
CONTENT — greedy trivially, sampled because draws are keyed on
(request seed, position), not on batch composition or chunk timing.

Reference analogue: the single-request Response loop
(reference: src/models/llama/llama.cpp:363-449) has no admission or
pipelining concept at all; this is pure superset behavior.
"""
import numpy as np
import pytest


def _engine(pipeline_harvest=True, slots=4, chunk=4):
    import jax
    from llm_inference_tpu.config import EngineConfig, tiny_llama
    from llm_inference_tpu.engine.engine import InferenceEngine
    from llm_inference_tpu.models import llama
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(
        cfg, params,
        engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=chunk,
                                max_batch_size=slots,
                                prefill_buckets=(8, 16),
                                pipeline_harvest=pipeline_harvest))


def _gen(**kw):
    from llm_inference_tpu.config import GenerationConfig
    kw.setdefault("greedy", True)
    kw.setdefault("max_new_tokens", 10)
    kw.setdefault("eos_token_ids", ())
    return GenerationConfig(**kw)


PROMPTS = [[5, 6, 7], [11, 12, 13, 14], [3, 9], [21, 22, 23, 24, 25]]


def _run(sched, prompts, **submit_kw):
    reqs = [sched.submit(list(p), **submit_kw) for p in prompts]
    while sched.step():
        pass
    return [r.output_ids for r in reqs]


class TestWaveAdmission:
    def test_wave_matches_staggered(self):
        """4 requests submitted at once (ONE padded wave prefill) produce
        byte-identical streams to one-at-a-time admission."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        sched = ContinuousBatchingScheduler(_engine(), _gen(), slots=4)
        wave = _run(sched, PROMPTS)

        sched2 = ContinuousBatchingScheduler(_engine(), _gen(), slots=4)
        stag = []
        for p in PROMPTS:                   # one admission per step
            r = sched2.submit(list(p))
            sched2.step()
            stag.append(r)
        while sched2.step():
            pass
        assert wave == [r.output_ids for r in stag]

    def test_wave_with_sampling(self):
        """Seeded sampled requests draw on (seed, position): a wave
        admission must not change their streams."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        kw = dict(temperature=1.3, seed=7)
        sched = ContinuousBatchingScheduler(_engine(), _gen(), slots=4)
        wave = _run(sched, PROMPTS, **kw)
        sched2 = ContinuousBatchingScheduler(
            _engine(pipeline_harvest=False), _gen(), slots=4)
        stag = []
        for p in PROMPTS:
            r = sched2.submit(list(p), **kw)
            sched2.step()
            stag.append(r)
        while sched2.step():
            pass
        assert wave == [r.output_ids for r in stag]
        assert all(len(o) == 10 for o in wave)

    def test_wave_instant_retire(self):
        """A max_new_tokens=1 request admitted in a wave retires at the
        deferred sync; its slot frees and the queue drains into it."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        sched = ContinuousBatchingScheduler(_engine(slots=2), _gen(),
                                            slots=2)
        a = sched.submit([5, 6, 7], max_new_tokens=1)
        b = sched.submit([11, 12], max_new_tokens=5)
        c = sched.submit([3, 9, 4], max_new_tokens=5)   # queued behind a/b
        while sched.step():
            pass
        assert len(a.output_ids) == 1
        assert len(b.output_ids) == 5
        assert len(c.output_ids) == 5


class TestPipelinedHarvest:
    @pytest.mark.parametrize("kw", [dict(), dict(temperature=0.9, seed=3)])
    def test_pipeline_matches_sync(self, kw):
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        on = _run(ContinuousBatchingScheduler(
            _engine(pipeline_harvest=True), _gen(), slots=4), PROMPTS, **kw)
        off = _run(ContinuousBatchingScheduler(
            _engine(pipeline_harvest=False), _gen(), slots=4), PROMPTS,
            **kw)
        assert on == off

    def test_pipeline_uneven_max_new(self):
        """Retirement one chunk late (overshoot rows dropped): lengths
        still exact per request."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        sched = ContinuousBatchingScheduler(_engine(), _gen(), slots=4)
        lens = [1, 3, 9, 14]
        reqs = [sched.submit(list(p), max_new_tokens=n)
                for p, n in zip(PROMPTS, lens)]
        while sched.step():
            pass
        assert [len(r.output_ids) for r in reqs] == lens

    def test_drain_inflight_drops_pending(self):
        """Elastic drain with a chunk in flight: pending tokens are
        discarded and the replay regenerates them byte-identically."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        sched = ContinuousBatchingScheduler(_engine(), _gen(), slots=2)
        a = sched.submit([5, 6, 7], seed=5, temperature=1.1)
        sched.step()
        sched.step()                 # a chunk is now in flight (pipelined)
        drained = sched.drain_inflight()     # also re-queues locally
        assert [r.req_id for r in drained] == [a.req_id]
        assert a.output_ids == []            # pending chunk discarded too
        while sched.step():
            pass
        ref = _run(ContinuousBatchingScheduler(
            _engine(pipeline_harvest=False), _gen(), slots=2),
            [[5, 6, 7]], seed=5, temperature=1.1)
        assert a.output_ids == ref[0]
