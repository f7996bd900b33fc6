"""Automatic prefix caching (engine/prefix_cache.py + PagedScheduler
prefix_cache=True): shared prompt pages must be reused without changing any
output token, and reclaimed cleanly under pool pressure. The reference
re-prefills the full history every round (src/models/llama/llama.cpp:363-449)
— no analogue; the golden is the non-caching paged scheduler."""

import numpy as np
import jax
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.prefix_cache import PrefixStore, chunk_hashes
from llm_inference_tpu.engine.scheduler import PagedScheduler
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


GEN = GenerationConfig(greedy=True, max_new_tokens=8, eos_token_ids=(1,))


class TestChunkHashes:
    def test_excludes_last_token_page(self):
        # 16 tokens, ps=8: token 15's page must be recomputed → 1 hash only
        assert len(chunk_hashes(list(range(16)), 8)) == 1
        assert len(chunk_hashes(list(range(17)), 8)) == 2
        assert len(chunk_hashes(list(range(7)), 8)) == 0

    def test_chain_property(self):
        a = chunk_hashes(list(range(24)), 8)
        b = chunk_hashes([99] + list(range(1, 24)), 8)
        # different first chunk → EVERY downstream hash differs
        assert a[0] != b[0] and a[1] != b[1]
        # same prefix → same hashes
        c = chunk_hashes(list(range(24)) + [7, 7, 7], 8)
        assert c[:2] == a[:2]


class TestPrefixStore:
    def test_lookup_insert_release_evict(self):
        st = PrefixStore()
        hs = chunk_hashes(list(range(30)), 8)      # 3 hashes
        assert st.lookup(hs, 8) == []
        st.insert(hs[0], 11)
        st.insert(hs[1], 12)
        got = st.lookup(hs, 8)
        assert got == [11, 12]                     # longest run, in order
        # refcounts: 1 (insert) + 1 (lookup) each → nothing evictable
        assert st.evict(10) == []
        for p in got:
            st.release(p)
        for p in (11, 12):
            st.release(p)                          # the inserting request
        assert sorted(st.evict(10)) == [11, 12]
        assert st.lookup(hs, 8) == []

    def test_duplicate_insert_keeps_first(self):
        st = PrefixStore()
        hs = chunk_hashes(list(range(16)), 8)
        assert st.insert(hs[0], 5) is True
        assert st.insert(hs[0], 9) is False        # page 9 stays private
        assert not st.owns(9)
        assert st.lookup(hs, 8) == [5]


class TestPrefixCachedScheduler:
    def _outputs(self, engine, prompts, **kw):
        sched = PagedScheduler(engine, GEN, slots=2, prefix_cache=True, **kw)
        reqs = sched.run([list(p) for p in prompts])
        return sched, [r.output_ids for r in reqs]

    def test_identical_prompts_match_uncached(self, engine):
        rng = np.random.default_rng(0)
        prompt = list(rng.integers(2, 200, 21))
        golden = PagedScheduler(engine, GEN, slots=2)
        want = [r.output_ids for r in golden.run([list(prompt)] * 4)]
        sched, got = self._outputs(engine, [prompt] * 4)
        assert got == want
        # later admissions hit the cached prefix pages
        assert sched.store.hit_tokens > 0

    def test_shared_prefix_divergent_suffix(self, engine):
        rng = np.random.default_rng(1)
        prefix = list(rng.integers(2, 200, 16))    # two full pages at ps=8
        pa = prefix + list(rng.integers(2, 200, 5))
        pb = prefix + list(rng.integers(2, 200, 7))
        golden = PagedScheduler(engine, GEN, slots=2)
        want = [r.output_ids for r in golden.run([list(pa), list(pb),
                                                  list(pa)])]
        sched, got = self._outputs(engine, [pa, pb, pa])
        assert got == want
        assert sched.store.hit_tokens >= 16        # pb reused ≥ 2 pages

    def test_no_page_leaks_and_cache_retained(self, engine):
        rng = np.random.default_rng(2)
        prompt = list(rng.integers(2, 200, 17))
        sched, _ = self._outputs(engine, [prompt] * 3)
        # retired requests keep their prefix pages in the store (rc=0),
        # everything else returns to the allocator
        cached = len(sched.store)
        assert cached >= 2                         # 17 tokens → 2 full pages
        total_usable = sched.alloc.num_pages - 1   # minus null page
        assert sched.alloc.free_pages == total_usable - cached
        # and those cached pages are all unreferenced now
        assert sorted(sched.store.evict(100)) != []

    def test_pool_pressure_evicts_cached_pages(self, engine):
        """A tiny pool: cached prefixes must be reclaimed instead of
        starving new admissions."""
        rng = np.random.default_rng(3)
        prompts = [list(rng.integers(2, 200, 17)) for _ in range(4)]
        sched = PagedScheduler(engine, GEN, slots=2, num_pages=8,
                               prefix_cache=True)
        reqs = sched.run([list(p) for p in prompts], max_new_tokens=5)
        assert all(len(r.output_ids) == 5 for r in reqs)

    def test_multi_turn_chat_pattern(self, engine):
        """Growing-history prompts (turn N's prompt extends turn N-1's):
        the dominant serving pattern prefix caching exists for."""
        rng = np.random.default_rng(4)
        turn1 = list(rng.integers(2, 200, 12))
        turn2 = turn1 + list(rng.integers(2, 200, 12))
        turn3 = turn2 + list(rng.integers(2, 200, 12))
        golden = PagedScheduler(engine, GEN, slots=2)
        want = [r.output_ids
                for r in golden.run([list(turn1), list(turn2), list(turn3)])]
        sched, got = self._outputs(engine, [turn1, turn2, turn3])
        assert got == want
        assert sched.store.hit_tokens > 0

    def test_int8_pool_prefix_cache(self):
        """Prefix sharing over the INT8 page pool (pages + scales shared)."""
        cfg = tiny_llama(num_kv_heads=2, head_dim=64, num_heads=4,
                         hidden_size=256, dtype="bfloat16")
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params, cache_dtype="int8",
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2, prefill_buckets=(8, 16),
                                    page_size=8))
        rng = np.random.default_rng(5)
        prompt = list(rng.integers(2, 200, 19))
        golden = PagedScheduler(eng, GEN, slots=2)
        want = [r.output_ids for r in golden.run([list(prompt)] * 3)]
        sched = PagedScheduler(eng, GEN, slots=2, prefix_cache=True)
        got = [r.output_ids for r in sched.run([list(prompt)] * 3)]
        assert got == want
        assert sched.store.hit_tokens > 0
