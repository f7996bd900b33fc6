"""Perplexity harness: correctness of the sliding-window NLL accounting and
the Δppl quantization gate it exists to measure (BASELINE.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import QuantConfig, tiny_llama
from llm_inference_tpu.eval import perplexity, score_token_logprobs
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache


def setup_module(m):
    global cfg, params, ids
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(
        0, cfg.vocab_size, 96).astype(np.int32)


def manual_full_context_logprobs():
    """Golden: one forward over the whole stream, manual log-softmax."""
    cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                               ids.shape[0], cfg.head_dim, jnp.float32)
    logits, _ = llama.forward(cfg, params, jnp.asarray(ids)[None],
                              jnp.arange(ids.shape[0])[None], cache,
                              logits_mode="all")
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
    return np.asarray(jnp.take_along_axis(
        logp[:-1], jnp.asarray(ids[1:])[:, None], -1))[:, 0]


class TestScoring:
    def test_single_window_matches_manual(self):
        got = score_token_logprobs(cfg, params, ids, window=len(ids),
                                   stride=len(ids))
        np.testing.assert_allclose(got, manual_full_context_logprobs(),
                                   atol=1e-4, rtol=1e-4)

    def test_windowed_close_to_full_context(self):
        """With stride < window, scored tokens keep ≥ window-stride context —
        ppl must stay close to the full-context value on a tiny model."""
        full = perplexity(cfg, params, ids, window=len(ids), stride=len(ids))
        windowed = perplexity(cfg, params, ids, window=48, stride=16)
        # random model ≈ uniform distribution: values near vocab_size, and
        # the windowed estimate must agree to a few percent
        assert abs(windowed - full) / full < 0.05

    def test_every_position_scored_once(self):
        lp = score_token_logprobs(cfg, params, ids, window=32, stride=8)
        assert lp.shape == (ids.shape[0] - 1,)
        assert np.isfinite(lp).all()


class TestQuantGate:
    def test_int8_delta_ppl_small(self):
        """The BASELINE gate mechanism: Δppl(int8) computed by this harness.
        A tiny random model is the WORST case for quant (no outlier
        structure), so the tolerance here is loose; the gate's real
        calibration happens with real checkpoints."""
        base = perplexity(cfg, params, ids, window=64, stride=32)
        q = llama.prepare_params(
            llama.quantize_params(params, QuantConfig(weights="int8")),
            donate=False)
        qppl = perplexity(cfg, q, ids, window=64, stride=32)
        assert abs(qppl - base) / base < 0.02

    def test_int4_delta_ppl_bounded(self):
        """INT4 gate (BASELINE: Δppl ≤ 0.5 on real checkpoints); the tiny
        random model has no outlier structure, so the bound here is a loose
        relative one — the point is the measurement plumbing."""
        base = perplexity(cfg, params, ids, window=64, stride=32)
        q = llama.prepare_params(
            llama.quantize_params(params, QuantConfig(weights="int4",
                                                      group_size=32)),
            donate=False)
        qppl = perplexity(cfg, q, ids, window=64, stride=32)
        assert abs(qppl - base) / base < 0.10
