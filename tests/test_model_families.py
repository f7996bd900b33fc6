"""Model-family coverage: mistral (sliding window) and qwen2 (qkv bias)
run through the same decoder with config-driven behavior differences."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import PRESETS, tiny_llama
from llm_inference_tpu.models import llama, registry
from llm_inference_tpu.ops import kvcache


def run_model(cfg, params, T=6):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32)
    logits, cache = llama.forward(cfg, params, ids, pos, cache)
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    logits1, _ = llama.forward(cfg, params, nxt,
                               jnp.full((1, 1), T, jnp.int32), cache)
    return np.asarray(logits), np.asarray(logits1)


class TestFamilies:
    def test_presets_exist(self):
        for name in ("mistral-7b", "qwen2-7b", "llama3-8b", "llama2-70b"):
            cfg = PRESETS[name]()
            assert registry.get_model(cfg.name) is not None

    def test_mistral_style_sliding_window(self):
        """Sliding-window attention must change logits once the window is
        shorter than the context (and only then)."""
        base = tiny_llama(num_kv_heads=2)
        win = tiny_llama(num_kv_heads=2, sliding_window=3)
        params = llama.init_params(base, jax.random.PRNGKey(0))
        a0, a1 = run_model(base, params, T=8)
        b0, b1 = run_model(win, params, T=8)
        assert not np.allclose(a1, b1, atol=1e-5)   # window active at T=8
        # within the window (T=2 < 3) results are identical
        s0, _ = run_model(base, params, T=2)
        w0, _ = run_model(win, params, T=2)
        np.testing.assert_allclose(s0, w0, atol=1e-6)

    def test_qwen2_style_qkv_bias(self):
        cfg = tiny_llama(num_kv_heads=2, qkv_bias=True)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        assert "bq" in params["layers"]
        # nonzero bias must shift logits
        l0, _ = run_model(cfg, params)
        params["layers"]["bq"] = jnp.ones_like(params["layers"]["bq"]) * 0.3
        l1, _ = run_model(cfg, params)
        assert not np.allclose(l0, l1, atol=1e-5)
        # fused path carries the fused bias too
        prep = llama.prepare_params(params, donate=False)
        assert "bqkv" in prep["layers"]
        l2, _ = run_model(cfg, prep)
        np.testing.assert_allclose(l1, l2, atol=5e-3, rtol=1e-3)
