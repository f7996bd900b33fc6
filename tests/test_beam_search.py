"""Beam search (engine/beam_search.py). The reference's
launchTopKforBeamSearch (src/kernels/topK.cu:25-191) never runs with
beamwidth>1 (llama.h:37); here the real algorithm is validated against
greedy decoding and against teacher-forced log-prob rescoring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine.beam_search import BeamSearchDecoder, beam_search
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(
        cfg, params,
        engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                max_batch_size=4, prefill_buckets=(8, 16)))


def seq_log_prob(engine, prompt, gen_tokens):
    """Teacher-forced cumulative log-prob of gen_tokens given prompt."""
    cfg = engine.cfg
    full = list(prompt) + list(gen_tokens)
    cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                               cfg.head_dim, engine.cache_dtype)
    ids = jnp.asarray([full], jnp.int32)
    pos = jnp.arange(len(full), dtype=jnp.int32)[None]
    logits, _ = llama.forward(cfg, engine.params, ids, pos, cache,
                              logits_mode="all")
    logp = jax.nn.log_softmax(jnp.asarray(logits[0], jnp.float32), -1)
    total = 0.0
    for i, tok in enumerate(gen_tokens):
        total += float(logp[len(prompt) - 1 + i, tok])
    return total


class TestBeamSearch:
    def test_width_one_equals_greedy(self, engine):
        prompt = [5, 6, 7, 8]
        gen = GenerationConfig(greedy=True, max_new_tokens=8,
                               eos_token_ids=(1,))
        want = engine.generate([list(prompt)], gen)[0].token_ids
        hyps = beam_search(engine, prompt, beam_width=1, max_new_tokens=8,
                           eos_token_ids=(1,))
        assert hyps[0].token_ids == want

    def test_returns_sorted_distinct_hypotheses(self, engine):
        hyps = beam_search(engine, [5, 6, 7], beam_width=4,
                           max_new_tokens=6, eos_token_ids=(1,))
        assert len(hyps) == 4
        scores = [h.score for h in hyps]
        assert scores == sorted(scores, reverse=True)
        assert len({tuple(h.token_ids) for h in hyps}) == 4

    def test_scores_match_teacher_forced_rescoring(self, engine):
        """The device-side cumulative score must equal an independent
        teacher-forced forward's sum of token log-probs."""
        prompt = [9, 10, 11]
        hyps = beam_search(engine, prompt, beam_width=3, max_new_tokens=5,
                           eos_token_ids=(1,))
        for h in hyps:
            if h.finished:
                continue          # trimmed EOS token breaks naive rescoring
            want = seq_log_prob(engine, prompt, h.token_ids)
            np.testing.assert_allclose(h.log_prob, want, atol=1e-3,
                                       rtol=1e-4)

    def test_beats_or_matches_greedy_log_prob(self, engine):
        """Greedy is one valid beam path, so the best beam's cumulative
        log-prob can only be >= greedy's (same length, no EOS cut)."""
        prompt = [3, 4, 5, 6]
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=())
        greedy = engine.generate([list(prompt)], gen)[0].token_ids
        g_lp = seq_log_prob(engine, prompt, greedy)
        hyps = beam_search(engine, prompt, beam_width=4, max_new_tokens=6,
                           eos_token_ids=())
        assert hyps[0].log_prob >= g_lp - 1e-3

    def test_eos_finishes_beam(self, engine):
        """Force EOS = the greedy first token: the top beam must finish
        immediately with an empty continuation."""
        prompt = [5, 6, 7, 8]
        gen = GenerationConfig(greedy=True, max_new_tokens=1,
                               eos_token_ids=())
        first = engine.generate([list(prompt)], gen)[0].token_ids[0]
        hyps = beam_search(engine, prompt, beam_width=2, max_new_tokens=5,
                           eos_token_ids=(first,))
        fin = [h for h in hyps if h.finished]
        assert fin and fin[0].token_ids == []

    def test_length_penalty_ranking(self, engine):
        hyps = beam_search(engine, [7, 8, 9], beam_width=3,
                           max_new_tokens=5, eos_token_ids=(1,),
                           length_penalty=1.0)
        scores = [h.score for h in hyps]
        assert scores == sorted(scores, reverse=True)
