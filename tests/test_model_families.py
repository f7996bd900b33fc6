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


class TestQwen3:
    def test_qk_norm_changes_logits_and_survives_prepare(self):
        cfg = tiny_llama(num_kv_heads=2, qk_norm=True)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        assert "q_norm" in params["layers"]
        l0, _ = run_model(cfg, params)
        params["layers"]["q_norm"] = (
            jnp.ones_like(params["layers"]["q_norm"]) * 1.7)
        l1, _ = run_model(cfg, params)
        assert not np.allclose(l0, l1, atol=1e-5)
        # fused + blocked serving layout keeps the norms as plain lp keys
        prep = llama.prepare_params(params, donate=False)
        l2, _ = run_model(cfg, prep)
        np.testing.assert_allclose(l1, l2, atol=5e-3, rtol=1e-3)

    def test_hf_parity_qwen3(self):
        """Logits parity vs transformers Qwen3ForCausalLM (the per-head
        QK-norm + no-bias family)."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from llm_inference_tpu.utils import checkpoint
        from llm_inference_tpu.models import registry as _registry
        hf_cfg = transformers.Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rms_norm_eps=1e-6,
            rope_theta=10000.0, tie_word_embeddings=False,
            attention_bias=False, torch_dtype="float32")
        torch.manual_seed(0)
        hf = transformers.Qwen3ForCausalLM(hf_cfg).eval()
        cfg = checkpoint.model_config_from_hf(hf.config)
        assert cfg.qk_norm and not cfg.qkv_bias
        cfg = cfg.__class__(**{**cfg.to_dict(), "dtype": "float32"})
        params = checkpoint.convert_hf_state_dict(cfg, hf.state_dict(),
                                                  dtype="float32")
        rng = np.random.default_rng(0)
        ids = rng.integers(2, 120, (2, 7)).astype(np.int64)
        with torch.no_grad():
            want = hf(torch.from_numpy(ids)).logits.numpy()
        import jax.numpy as _jnp
        from llm_inference_tpu.ops import kvcache
        cache = kvcache.init_cache(cfg.num_layers, 2, cfg.num_kv_heads,
                                   16, cfg.head_dim, _jnp.float32)
        pos = _jnp.tile(_jnp.arange(7, dtype=_jnp.int32), (2, 1))
        got, _ = llama.forward(cfg, params, _jnp.asarray(ids, _jnp.int32),
                               pos, cache, logits_mode="all")
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   rtol=2e-3)


class TestPhi3:
    def test_hf_parity_phi3(self):
        """Logits parity vs transformers Phi3ForCausalLM — the fused
        qkv_proj / gate_up_proj checkpoint layout splits into the
        canonical keys at load."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from llm_inference_tpu.utils import checkpoint
        hf_cfg = transformers.Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            tie_word_embeddings=False, pad_token_id=0,
            torch_dtype="float32")
        torch.manual_seed(0)
        hf = transformers.Phi3ForCausalLM(hf_cfg).eval()
        cfg = checkpoint.model_config_from_hf(hf.config)
        assert cfg.name.startswith("phi3")
        cfg = cfg.__class__(**{**cfg.to_dict(), "dtype": "float32"})
        params = checkpoint.convert_hf_state_dict(cfg, hf.state_dict(),
                                                  dtype="float32")
        rng = np.random.default_rng(1)
        ids = rng.integers(2, 120, (2, 6)).astype(np.int64)
        with torch.no_grad():
            want = hf(torch.from_numpy(ids)).logits.numpy()
        import jax.numpy as _jnp
        from llm_inference_tpu.ops import kvcache
        cache = kvcache.init_cache(cfg.num_layers, 2, cfg.num_kv_heads,
                                   16, cfg.head_dim, _jnp.float32)
        pos = _jnp.tile(_jnp.arange(6, dtype=_jnp.int32), (2, 1))
        got, _ = llama.forward(cfg, params, _jnp.asarray(ids, _jnp.int32),
                               pos, cache, logits_mode="all")
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   rtol=2e-3)

    def test_longrope_table(self):
        """LongRoPE: per-dim factors rescale inv_freq and the magnitude
        factor multiplies cos/sin when extended past the original
        context."""
        from llm_inference_tpu.ops import rope
        import math
        D = 8
        short = [1.0] * (D // 2)
        long = [4.0] * (D // 2)
        scaling = {"type": "longrope", "short_factor": short,
                   "long_factor": long,
                   "original_max_position_embeddings": 16,
                   "max_position_embeddings": 64}
        cb, sb = rope.make_rope_table(8, D)          # unscaled baseline
        cs, ss = rope.make_rope_table(8, D, scaling=scaling)
        # within the original context: short factors (1.0) but the
        # magnitude factor still applies (config extends to 64 > 16)
        m = math.sqrt(1.0 + math.log(64 / 16) / math.log(16))
        np.testing.assert_allclose(np.asarray(cs), np.asarray(cb) * m,
                                   rtol=1e-6)
        cl, _ = rope.make_rope_table(64, D, scaling=scaling)
        # beyond the original context: long factors slow the frequencies —
        # position p with factor 4 matches unscaled position p/4
        cb64, _ = rope.make_rope_table(64, D)
        np.testing.assert_allclose(np.asarray(cl[32]) / m,
                                   np.asarray(cb64[8]), atol=1e-5)
