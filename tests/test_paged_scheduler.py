"""Paged continuous batching: greedy outputs must match the dense scheduler,
including under page-pool oversubscription (deferred admissions)."""

import numpy as np
import jax
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
                                max_batch_size=2, prefill_buckets=(8, 16),
                                page_size=8))


GEN = GenerationConfig(greedy=True, max_new_tokens=10, eos_token_ids=(1,))


class TestPagedScheduler:
    def test_matches_single_slot_paged(self, engine):
        """Interleaving requests through shared slots must not change any
        request's tokens (vs running them one-at-a-time through the same
        paged pipeline — identical numerics, unlike the dense scheduler
        whose tiny-config fallback computes attention in f32 while the
        paged kernel computes in bf16)."""
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(2, 200, rng.integers(3, 12)))
                   for _ in range(5)]
        solo = PagedScheduler(engine, GEN, slots=1)
        want = [r.output_ids for r in solo.run([list(p) for p in prompts])]
        paged = PagedScheduler(engine, GEN, slots=2)
        got = [r.output_ids for r in paged.run([list(p) for p in prompts])]
        for i, (w, g) in enumerate(zip(want, got)):
            assert g == w, (i, g, w)

    def test_first_token_matches_dense(self, engine):
        """Prefill runs the same math in both backends — the first sampled
        token must agree exactly."""
        prompts = [[5, 6, 7, 8, 9], [20, 21], [100] * 7]
        dense = ContinuousBatchingScheduler(engine, GEN, slots=2)
        want = [r.output_ids[0] for r in dense.run([list(p) for p in prompts],
                                                   max_new_tokens=1)]
        paged = PagedScheduler(engine, GEN, slots=2)
        got = [r.output_ids[0] for r in paged.run([list(p) for p in prompts],
                                                  max_new_tokens=1)]
        assert got == want

    def test_oversubscribed_pool_defers_and_completes(self, engine):
        # pool of 6 usable pages; each request needs up to 3 (16-token
        # bucket at ps=8 + decode growth) — forces admission deferral
        paged = PagedScheduler(engine, GEN, slots=2, num_pages=7)
        reqs = paged.run([[5, 6, 7, 8, 9]] * 6, max_new_tokens=6)
        assert all(r.done_t > 0 for r in reqs)
        assert all(len(r.output_ids) == 6 for r in reqs)
        # all pages returned at the end
        assert paged.alloc.free_pages == 6

    def test_wave_admission_matches_serial(self, engine):
        """A burst of concurrent arrivals admits via ONE batched suffix
        prefill per chunk (PagedScheduler._admit_batch); the streams must
        equal serial per-request admission — including prompts long enough
        to chunk (> largest bucket) and prefix-cache sharing (serial gets
        intra-burst prefix hits, the wave prefills the same bits
        privately)."""
        rng = np.random.default_rng(7)
        shared = list(rng.integers(2, 200, 17))
        prompts = [shared + list(rng.integers(2, 200, 9)),
                   shared + list(rng.integers(2, 200, 4)),
                   list(rng.integers(2, 200, 21)),   # chunked, no hits
                   list(rng.integers(2, 200, 5))]

        def run(wave):
            s = PagedScheduler(engine, GEN, slots=4, prefix_cache=True)
            s.wave_admission = wave
            return [r.output_ids for r in
                    s.run([list(p) for p in prompts], max_new_tokens=6)]

        assert run(True) == run(False)

    def test_wave_admission_oversubscribed_pool(self, engine):
        """Mid-wave pool exhaustion: rows that can't get pages are undone
        and requeued (per-row failure), the rest of the wave admits, and
        every request still completes."""
        paged = PagedScheduler(engine, GEN, slots=4, num_pages=6)
        prompts = [list(range(2, 11))] * 4        # 9 tokens -> 2 pages each
        reqs = paged.run([list(p) for p in prompts], max_new_tokens=4)
        assert all(r.done_t > 0 for r in reqs)
        assert all(len(r.output_ids) == 4 for r in reqs)
        assert paged.alloc.free_pages == 5

    def test_pages_released_on_retire(self, engine):
        paged = PagedScheduler(engine, GEN, slots=2)
        free0 = paged.alloc.free_pages
        paged.run([[3, 4, 5]], max_new_tokens=4)
        assert paged.alloc.free_pages == free0

    @pytest.mark.parametrize("kvdtype", ["int8", "int4"])
    def test_paged_with_quantized_kv(self, kvdtype):
        """PagedScheduler over an INT8/INT4 page pool completes and
        produces sane (near-bf16) outputs."""
        cfg = tiny_llama(num_kv_heads=2, head_dim=64, num_heads=4,
                         hidden_size=256, dtype="bfloat16")
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params, cache_dtype=kvdtype,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2, prefill_buckets=(8, 16),
                                    page_size=8))
        sched = PagedScheduler(eng, GEN, slots=2)
        assert sched.cache.quantized
        reqs = sched.run([[5, 6, 7], [9, 10]], max_new_tokens=5)
        assert all(len(r.output_ids) == 5 for r in reqs)

    def test_pool_pressure_preempts_not_livelocks(self, engine):
        """When long-running requests exhaust the pool mid-decode, the
        scheduler must preempt (re-queue) rather than spin forever."""
        # 5 usable pages; two requests needing 2 prompt pages each (16-token
        # bucket at ps=8) + growth — cannot both run 20+ tokens
        paged = PagedScheduler(engine, GEN, slots=2, num_pages=6)
        reqs = paged.run([[5, 6, 7, 8, 9, 10, 11, 12, 13]] * 2,
                         max_new_tokens=9)
        assert all(len(r.output_ids) == 9 for r in reqs)
        assert paged.alloc.free_pages == 5

    def test_preempted_stream_no_duplicates(self, engine):
        """A preempted streaming request must not re-stream the tokens the
        client already received (greedy replay is identical, so the client
        stream equals the final output exactly once)."""
        got = {}

        def stream_for(rid):
            def cb(r, t):
                got.setdefault(rid, []).append(t)
            return cb

        paged = PagedScheduler(engine, GEN, slots=2, num_pages=6)
        reqs = []
        for i, p in enumerate([[5, 6, 7, 8, 9, 10, 11, 12, 13]] * 2):
            r = paged.submit(list(p), max_new_tokens=9,
                             stream=stream_for(i))
            reqs.append(r)
        while paged.step():
            pass
        for i, r in enumerate(reqs):
            expect = [t for t in r.output_ids if t != 1]   # eos unstreamed
            assert got[i] == expect, (i, got[i], r.output_ids)

    def test_long_prompt_chunked_admission(self, engine):
        """Prompts beyond the largest prefill bucket (16 here) stream
        through the cache in history-attending chunks; the first token must
        match the dense scheduler's (same math, chunked equally there)."""
        rng = np.random.default_rng(7)
        prompt = list(rng.integers(2, 200, 37))     # >> largest bucket 16
        dense = ContinuousBatchingScheduler(engine, GEN, slots=1)
        want = dense.run([list(prompt)], max_new_tokens=4)[0].output_ids
        paged = PagedScheduler(engine, GEN, slots=2)
        got = paged.run([list(prompt)], max_new_tokens=4)[0].output_ids
        assert got[0] == want[0]
        assert len(got) == 4
        assert paged.alloc.free_pages == paged.alloc.num_pages - 1

    def test_long_prompt_with_prefix_cache(self, engine):
        """Chunked admission composes with prefix caching: the second
        identical long prompt reuses pages and still matches."""
        rng = np.random.default_rng(8)
        prompt = list(rng.integers(2, 200, 37))
        golden = PagedScheduler(engine, GEN, slots=2)
        want = [r.output_ids for r in golden.run([list(prompt)] * 2,
                                                 max_new_tokens=5)]
        sched = PagedScheduler(engine, GEN, slots=2, prefix_cache=True)
        got = [r.output_ids for r in sched.run([list(prompt)] * 2,
                                               max_new_tokens=5)]
        assert got == want
        assert sched.store.hit_tokens >= 32      # 4 full pages reused

    def test_drain_inflight_paged_releases_pages(self, engine):
        """Elastic-recovery drain on the PAGED backend: pages return to the
        pool (prefix refs released) and replay completes identically."""
        paged = PagedScheduler(engine, GEN, slots=2, prefix_cache=True)
        free0 = paged.alloc.free_pages
        r1 = paged.submit([5, 6, 7, 8, 9, 10, 11, 12, 13], max_new_tokens=8)
        paged.step()     # admit + first decode chunk (budget not exhausted)
        assert any(r is r1 for r in paged.slot_req)
        drained = paged.drain_inflight()
        assert drained and drained[0] is r1
        # pages back (cached prefix pages stay in the store, rc=0)
        cached = len(paged.store)
        assert paged.alloc.free_pages == free0 - cached
        while paged.step():
            pass
        assert len(r1.output_ids) == 8


class TestInterleavedPrefill:
    """Chunked-prefill interleaving: active requests keep decoding between
    a long admission's prefill chunks. Content must be IDENTICAL to the
    non-interleaved schedule (sampling is (seed, position)-keyed), and the
    admitting slot's garbage decode row is parked on the null page."""

    def _engine(self):
        from llm_inference_tpu.config import EngineConfig, tiny_llama
        from llm_inference_tpu.engine.engine import InferenceEngine
        from llm_inference_tpu.models import llama
        import jax
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        return InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=2,
                                    max_batch_size=2,
                                    prefill_buckets=(8,), page_size=8))

    @pytest.mark.parametrize("prefix_cache", [False, True])
    def test_interleaved_matches_serial(self, prefix_cache):
        from llm_inference_tpu.config import GenerationConfig
        from llm_inference_tpu.engine.scheduler import PagedScheduler
        import numpy as np
        rng = np.random.default_rng(3)
        long_prompt = list(rng.integers(2, 200, 24))   # 3 prefill chunks
        short = [5, 6, 7]
        gen = GenerationConfig(greedy=True, max_new_tokens=8,
                               eos_token_ids=())

        def run(interleave):
            eng = self._engine()
            sched = PagedScheduler(eng, gen, slots=2,
                                   prefix_cache=prefix_cache,
                                   interleave_prefill=interleave)
            a = sched.submit(short, temperature=2.0, seed=11)
            sched.step()             # a admitted + one decode chunk
            b = sched.submit(list(long_prompt))
            while sched.step():
                pass
            return a.output_ids, b.output_ids

        a_ser, b_ser = run(False)
        a_int, b_int = run(True)
        assert a_int == a_ser       # seeded stream unchanged by schedule
        assert b_int == b_ser       # admitted prompt's KV uncorrupted
        assert len(b_int) == 8


class TestPoolCapacityGuard:
    def test_impossible_request_rejected_at_submit(self):
        """A request whose KV need exceeds the whole page pool must be
        rejected up front — otherwise the scheduler hot-spins forever
        between preemption and re-admission (no client error, repeated
        device prefills)."""
        from llm_inference_tpu.config import (EngineConfig,
                                              GenerationConfig, tiny_llama)
        from llm_inference_tpu.engine.engine import InferenceEngine
        from llm_inference_tpu.engine.scheduler import PagedScheduler
        import jax as _jax
        from llm_inference_tpu.models import llama as _llama
        cfg = tiny_llama(num_kv_heads=2)
        eng = InferenceEngine(
            cfg, _llama.init_params(cfg, _jax.random.PRNGKey(0)),
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16), page_size=8))
        gen = GenerationConfig(greedy=True, max_new_tokens=40,
                               eos_token_ids=())
        sched = PagedScheduler(eng, gen, slots=2, num_pages=4)  # 3 usable
        with pytest.raises(ValueError, match="KV pages"):
            sched.submit([3, 4, 5])          # needs ceil(43/8)=6 pages
        # a servable request still goes through
        r = sched.submit([3, 4], max_new_tokens=8)
        while sched.step():
            pass
        assert len(r.output_ids) == 8


class TestDeepseekPaged:
    """DeepSeek MLA through the paged scheduler (models/deepseek.
    new_paged_cache): k/v pages of different widths (latent_dim vs
    kv_lora_rank), one kv head."""

    @pytest.fixture(scope="class")
    def ds_engine(self):
        import jax.numpy as jnp
        from llm_inference_tpu.config import tiny_deepseek
        from llm_inference_tpu.models import deepseek
        cfg = tiny_deepseek()
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        return InferenceEngine(
            cfg, params, cache_dtype=jnp.float32,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2, prefill_buckets=(8, 16),
                                    page_size=8))

    def test_matches_dense_scheduler(self, ds_engine):
        rng = np.random.default_rng(3)
        prompts = [list(rng.integers(2, 200, rng.integers(3, 12)))
                   for _ in range(4)]
        dense = ContinuousBatchingScheduler(ds_engine, GEN, slots=2)
        want = [r.output_ids for r in dense.run([list(p) for p in prompts])]
        paged = PagedScheduler(ds_engine, GEN, slots=2)
        got = [r.output_ids for r in paged.run([list(p) for p in prompts])]
        for i, (w, g) in enumerate(zip(want, got)):
            assert g == w, (i, g, w)
        assert paged.alloc.free_pages == paged.alloc.num_pages - 1

    def test_prefix_cache_reuse(self, ds_engine):
        """Same prompt twice through a prefix-caching paged scheduler: the
        second request prefills only the suffix over shared latent pages
        and must produce identical tokens."""
        prompt = list(range(2, 2 + 19))
        solo = PagedScheduler(ds_engine, GEN, slots=1)
        want = solo.run([list(prompt)])[0].output_ids
        sched = PagedScheduler(ds_engine, GEN, slots=1, prefix_cache=True)
        first = sched.run([list(prompt)])[0].output_ids
        second = sched.run([list(prompt)])[0].output_ids
        assert first == want
        assert second == want

    def test_paged_int8_latents(self):
        """INT8 latent page pool completes with near-f32 outputs."""
        from llm_inference_tpu.config import tiny_deepseek
        from llm_inference_tpu.models import deepseek
        # f32 activations: the CPU test backend cannot dispatch bf16 dots
        # (the quantized POOL is what this test exercises)
        cfg = tiny_deepseek(dtype="float32")
        params = deepseek.init_params(cfg, jax.random.PRNGKey(1))
        eng = InferenceEngine(
            cfg, params, cache_dtype="int8",
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2, prefill_buckets=(8,),
                                    page_size=8))
        sched = PagedScheduler(eng, GEN, slots=2)
        reqs = sched.run([[5, 6, 7], [9, 10, 11, 12]], max_new_tokens=5)
        assert all(len(r.output_ids) == 5 for r in reqs)

    def test_paged_int4_latents_match_dense_int4(self):
        """INT4 packed latent page pool (deepseek.new_paged_cache):
        byte-identical tokens vs the dense int4 latent cache — the pool
        write/gather path is code-width-agnostic."""
        from llm_inference_tpu.config import tiny_deepseek
        from llm_inference_tpu.models import deepseek
        cfg = tiny_deepseek(dtype="float32")
        params = deepseek.init_params(cfg, jax.random.PRNGKey(2))
        eng = InferenceEngine(
            cfg, params, cache_dtype="int4",
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2, prefill_buckets=(8,),
                                    page_size=8))
        prompts = [[5, 6, 7], [9, 10, 11, 12]]
        dense = ContinuousBatchingScheduler(eng, GEN, slots=2)
        want = [r.output_ids for r in dense.run([list(p) for p in prompts])]
        paged = PagedScheduler(eng, GEN, slots=2)
        got = [r.output_ids for r in paged.run([list(p) for p in prompts])]
        assert got == want
