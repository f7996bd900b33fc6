"""Speculative decoding: bit-identical to plain greedy decode, with n-gram
proposal mining and exact greedy acceptance."""

import numpy as np
import jax
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.speculative import (SpeculativeDecoder,
                                                  propose_ngram)
from llm_inference_tpu.models import llama


class TestProposer:
    def test_ngram_lookup(self):
        #           0  1  2  3  4  5  6  7  8
        ids = [7, 8, 9, 4, 5, 6, 1, 7, 8]
        # suffix (7, 8) matched at position 0 → propose what followed: 9,4,5
        assert propose_ngram(ids, gamma=3, ngram=2) == [9, 4, 5]
        assert propose_ngram(ids, gamma=1, ngram=2) == [9]
        # no match at n=2..1 → empty
        assert propose_ngram([1, 2, 3, 4], gamma=3, ngram=2) == []
        # most RECENT earlier occurrence wins
        ids2 = [5, 1, 5, 2, 5]
        assert propose_ngram(ids2, gamma=1, ngram=1) == [2]


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(
        cfg, params,
        engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=4,
                                prefill_buckets=(8, 16, 32)))


class TestSpeculativeDecoding:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_plain_greedy(self, engine, seed):
        rng = np.random.default_rng(seed)
        prompt = list(rng.integers(2, 200, int(rng.integers(4, 16))))
        gen = GenerationConfig(greedy=True, max_new_tokens=24,
                               eos_token_ids=(1,))
        want = engine.generate([list(prompt)], gen)[0].token_ids
        got, stats = SpeculativeDecoder(engine, gamma=4).generate(
            list(prompt), gen)
        # plain greedy truncates AT eos; speculative includes it — align
        if 1 in got:
            got = got[:got.index(1)]
        assert got == want, (got, want, stats)

    def test_repetitive_prompt_accepts(self, engine):
        """Tiny random models loop on greedy decode; a cyclic prompt makes
        the n-gram proposer productive — require at least one accepted
        speculative token AND exact greedy equivalence."""
        prompt = [3, 4, 5, 6] * 5
        gen = GenerationConfig(greedy=True, max_new_tokens=32,
                               eos_token_ids=(1,))
        want = engine.generate([list(prompt)], gen)[0].token_ids
        spec = SpeculativeDecoder(engine, gamma=4)
        got, stats = spec.generate(list(prompt), gen)
        if 1 in got:
            got = got[:got.index(1)]
        assert got == want
        # fewer verify forwards than tokens ⇒ speculation paid off
        assert stats["steps"] < len(want), stats
        assert stats["accepted"] > 0, stats


class TestDraftModelSpeculative:
    def _make(self, cfg_kw, seed):
        from llm_inference_tpu.config import tiny_llama as tl
        cfg = tl(**cfg_kw)
        params = llama.init_params(cfg, jax.random.PRNGKey(seed))
        return InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=4,
                                    prefill_buckets=(8, 16, 32)))

    def test_self_draft_accepts_everything(self, engine):
        """Using the target AS its own draft: proposals come from the same
        argmax stream, so acceptance must be (near-)total and the output
        identical to plain greedy."""
        from llm_inference_tpu.engine.speculative import (
            DraftModelSpeculativeDecoder)
        prompt = [3, 4, 5, 6, 7]
        gen = GenerationConfig(greedy=True, max_new_tokens=24,
                               eos_token_ids=(1,))
        want = engine.generate([list(prompt)], gen)[0].token_ids
        spec = DraftModelSpeculativeDecoder(engine, engine, gamma=4)
        got, stats = spec.generate(list(prompt), gen)
        if 1 in got:
            got = got[:got.index(1)]
        assert got == want, (got, want, stats)
        # γ=4 with a perfect draft → ~5 tokens per verify step
        assert stats["steps"] <= len(want) // 3 + 2, stats
        assert stats["accepted"] > 0, stats

    @pytest.mark.parametrize("seed", [0, 3])
    def test_independent_draft_matches_plain_greedy(self, engine, seed):
        """A DIFFERENT (random) draft model: acceptance may be poor, but
        the output must still be exactly the target's greedy stream."""
        from llm_inference_tpu.engine.speculative import (
            DraftModelSpeculativeDecoder)
        draft = self._make(dict(num_kv_heads=2, num_layers=1,
                                hidden_size=64, intermediate_size=128,
                                num_heads=2, head_dim=32), seed=seed + 7)
        rng = np.random.default_rng(seed)
        prompt = list(rng.integers(2, 200, 9))
        gen = GenerationConfig(greedy=True, max_new_tokens=16,
                               eos_token_ids=(1,))
        want = engine.generate([list(prompt)], gen)[0].token_ids
        spec = DraftModelSpeculativeDecoder(engine, draft, gamma=3)
        got, stats = spec.generate(list(prompt), gen)
        if 1 in got:
            got = got[:got.index(1)]
        assert got == want, (got, want, stats)

    def test_vocab_mismatch_rejected(self, engine):
        from llm_inference_tpu.engine.speculative import (
            DraftModelSpeculativeDecoder)
        draft = self._make(dict(num_kv_heads=2, vocab_size=128), seed=1)
        with pytest.raises(ValueError, match="vocab"):
            DraftModelSpeculativeDecoder(engine, draft)


class TestSpeculativeBatchingScheduler:
    def _engine(self):
        from llm_inference_tpu.config import EngineConfig
        from llm_inference_tpu.engine.engine import InferenceEngine
        cfg = tiny_llama()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        return InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=4,
                                    max_batch_size=3,
                                    prefill_buckets=(8, 16, 32)))

    def test_matches_plain_scheduler(self):
        """Two requests decoding in one speculative batch must reproduce
        the plain scheduler's greedy streams exactly."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        from llm_inference_tpu.engine.speculative import (
            SpeculativeBatchingScheduler)
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=20,
                               eos_token_ids=(1,))
        prompts = [[3, 4, 5, 6] * 4, [9, 10, 11, 9, 10, 11, 9, 10, 11]]
        plain = ContinuousBatchingScheduler(eng, gen, slots=3)
        wants = [plain.submit(list(p)) for p in prompts]
        while plain.step():
            pass
        spec = SpeculativeBatchingScheduler(eng, gen, slots=3, gamma=4)
        gots = [spec.submit(list(p)) for p in prompts]
        while spec.step():
            pass
        for w, g in zip(wants, gots):
            assert g.output_ids == w.output_ids, (
                g.output_ids, w.output_ids, spec.spec_stats)
        # cyclic prompts must actually speculate
        assert spec.spec_stats["accepted"] > 0, spec.spec_stats
        assert (spec.spec_stats["produced"]
                > spec.spec_stats["steps"]), spec.spec_stats

    def test_logprobs_match_plain(self):
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        from llm_inference_tpu.engine.speculative import (
            SpeculativeBatchingScheduler)
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=10,
                               eos_token_ids=(1,))
        prompt = [5, 6, 7, 5, 6, 7, 5, 6]
        plain = ContinuousBatchingScheduler(eng, gen, slots=3)
        w = plain.submit(list(prompt))
        while plain.step():
            pass
        spec = SpeculativeBatchingScheduler(eng, gen, slots=3)
        g = spec.submit(list(prompt))
        while spec.step():
            pass
        assert g.output_ids == w.output_ids
        np.testing.assert_allclose(g.output_logprobs, w.output_logprobs,
                                   rtol=2e-3, atol=2e-3)

    def test_non_greedy_rejected(self):
        from llm_inference_tpu.engine.speculative import (
            SpeculativeBatchingScheduler)
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=4,
                               eos_token_ids=(1,))
        spec = SpeculativeBatchingScheduler(eng, gen, slots=3)
        with pytest.raises(ValueError, match="greedy"):
            spec.submit([3, 4], temperature=1.5)
        with pytest.raises(ValueError, match="logit_bias|guided"):
            spec.submit([3, 4], logit_bias={5: 1.0})

    def test_budget_cut_mid_window(self):
        """max_new_tokens smaller than one accepted window truncates."""
        from llm_inference_tpu.engine.speculative import (
            SpeculativeBatchingScheduler)
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=3,
                               eos_token_ids=())
        spec = SpeculativeBatchingScheduler(eng, gen, slots=3, gamma=4)
        r = spec.submit([3, 4, 5, 6] * 4)
        while spec.step():
            pass
        assert len(r.output_ids) == 3

    def test_fallback_near_cache_end(self):
        """A request whose window would cross max_seq_len falls back to
        plain chunks and still completes correctly."""
        from llm_inference_tpu.config import EngineConfig
        from llm_inference_tpu.engine.engine import InferenceEngine
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        from llm_inference_tpu.engine.speculative import (
            SpeculativeBatchingScheduler)
        cfg = tiny_llama()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=32, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16)))
        gen = GenerationConfig(greedy=True, max_new_tokens=12,
                               eos_token_ids=(1,))
        prompt = [3, 4, 5, 6] * 5                 # 20 + 12 = 32 exactly
        plain = ContinuousBatchingScheduler(eng, gen, slots=2)
        w = plain.submit(list(prompt))
        while plain.step():
            pass
        spec = SpeculativeBatchingScheduler(eng, gen, slots=2, gamma=4)
        g = spec.submit(list(prompt))
        while spec.step():
            pass
        assert g.output_ids == w.output_ids


class TestDraftSpeculativeBatchingScheduler:
    def _engines(self):
        from llm_inference_tpu.config import EngineConfig
        from llm_inference_tpu.engine.engine import InferenceEngine
        cfg = tiny_llama()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_seq_len=128, decode_chunk=4,
                            max_batch_size=2, prefill_buckets=(8, 16, 32))
        target = InferenceEngine(cfg, params, engine_cfg=ecfg)
        # a DIFFERENT (weaker) draft: same arch, different weights
        dparams = llama.init_params(cfg, jax.random.PRNGKey(7))
        draft = InferenceEngine(cfg, dparams, engine_cfg=ecfg)
        # and a self-draft (same weights → near-total acceptance)
        selfd = InferenceEngine(cfg, params, engine_cfg=ecfg)
        return target, draft, selfd

    def test_matches_plain_scheduler_any_draft(self):
        """Output streams equal the plain scheduler's regardless of how
        good the draft is (greedy acceptance is exact)."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        from llm_inference_tpu.engine.speculative import (
            DraftSpeculativeBatchingScheduler)
        target, draft, selfd = self._engines()
        gen = GenerationConfig(greedy=True, max_new_tokens=16,
                               eos_token_ids=(1,))
        prompts = [[3, 4, 5, 6, 7], [9, 10, 11, 12]]
        plain = ContinuousBatchingScheduler(target, gen, slots=2)
        wants = [plain.submit(list(p)) for p in prompts]
        while plain.step():
            pass
        for d in (draft, selfd):
            sched = DraftSpeculativeBatchingScheduler(target, d, gen,
                                                      slots=2, gamma=3)
            gots = [sched.submit(list(p)) for p in prompts]
            while sched.step():
                pass
            for w, g in zip(wants, gots):
                assert g.output_ids == w.output_ids, (
                    g.output_ids, w.output_ids, sched.spec_stats)

    def test_self_draft_accepts(self):
        """Target drafting for itself must accept nearly everything."""
        from llm_inference_tpu.engine.speculative import (
            DraftSpeculativeBatchingScheduler)
        target, _, selfd = self._engines()
        gen = GenerationConfig(greedy=True, max_new_tokens=20,
                               eos_token_ids=(1,))
        sched = DraftSpeculativeBatchingScheduler(target, selfd, gen,
                                                  slots=2, gamma=4)
        r = sched.submit([3, 4, 5, 6, 7])
        while sched.step():
            pass
        st = sched.spec_stats
        assert st["produced"] / st["steps"] > 2.0, st

    def test_staggered_admission_catchup(self):
        """A request admitted mid-flight (draft cache lags the target's
        committed history) must still match plain greedy."""
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        from llm_inference_tpu.engine.speculative import (
            DraftSpeculativeBatchingScheduler)
        target, draft, _ = self._engines()
        gen = GenerationConfig(greedy=True, max_new_tokens=14,
                               eos_token_ids=(1,))
        plain = ContinuousBatchingScheduler(target, gen, slots=2)
        w1 = plain.submit([3, 4, 5, 6])
        w2 = plain.submit([9, 10, 11])
        while plain.step():
            pass
        sched = DraftSpeculativeBatchingScheduler(target, draft, gen,
                                                  slots=2, gamma=3)
        g1 = sched.submit([3, 4, 5, 6])
        sched.step()                      # g1 alone for a few windows
        g2 = sched.submit([9, 10, 11])    # staggered admission
        while sched.step():
            pass
        assert g1.output_ids == w1.output_ids
        assert g2.output_ids == w2.output_ids

    def test_vocab_mismatch_rejected(self):
        from llm_inference_tpu.config import EngineConfig
        from llm_inference_tpu.engine.engine import InferenceEngine
        from llm_inference_tpu.engine.speculative import (
            DraftSpeculativeBatchingScheduler)
        target, _, _ = self._engines()
        cfg2 = tiny_llama(vocab_size=128)
        bad = InferenceEngine(
            cfg2, llama.init_params(cfg2, jax.random.PRNGKey(1)),
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    prefill_buckets=(8,)))
        with pytest.raises(ValueError, match="vocab"):
            DraftSpeculativeBatchingScheduler(target, bad)
