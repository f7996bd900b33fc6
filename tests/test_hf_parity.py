"""End-to-end numerical parity vs HuggingFace transformers (torch CPU).

This is the automated version of the reference's manual SAVE_DATA workflow —
it dumps per-layer tensors and diffs them against modeling_llama.py offline
(reference: src/utils/debug_utils.h:9-11, CMakeLists.txt:151-155). Here the
whole-model logits are compared directly, plus greedy continuations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache, sampling
from llm_inference_tpu.utils import checkpoint


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, torch_dtype="float32")
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def ours(hf_model):
    cfg = checkpoint.model_config_from_hf(hf_model.config)
    cfg = cfg.__class__(**{**cfg.to_dict(), "dtype": "float32"})
    params = checkpoint.convert_hf_state_dict(cfg, hf_model.state_dict(),
                                              dtype="float32")
    return cfg, params


def hf_logits(hf_model, ids_np):
    with torch.no_grad():
        out = hf_model(torch.from_numpy(ids_np)).logits
    return out.numpy()


def make_cache(cfg, batch, max_seq=64):
    return kvcache.init_cache(cfg.num_layers, batch, cfg.num_kv_heads,
                              max_seq, cfg.head_dim, jnp.float32)


class TestLogitsParity:
    def test_prefill_logits_match_hf(self, hf_model, ours):
        cfg, params = ours
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
        pos = np.tile(np.arange(12, dtype=np.int32), (2, 1))
        logits, _ = llama.forward(cfg, params, jnp.asarray(ids),
                                  jnp.asarray(pos), make_cache(cfg, 2),
                                  logits_mode="all")
        golden = hf_logits(hf_model, ids)
        np.testing.assert_allclose(np.asarray(logits), golden,
                                   atol=2e-4, rtol=2e-3)

    def test_decode_logits_match_hf(self, hf_model, ours):
        """Incremental decode through our KV cache vs HF full forward."""
        cfg, params = ours
        rng = np.random.default_rng(1)
        N = 10
        ids = rng.integers(0, cfg.vocab_size, (1, N)).astype(np.int32)
        golden = hf_logits(hf_model, ids)

        cache = make_cache(cfg, 1)
        pos = np.arange(N, dtype=np.int32)[None]
        _, cache = llama.forward(cfg, params, jnp.asarray(ids[:, :4]),
                                 jnp.asarray(pos[:, :4]), cache,
                                 logits_mode="none")
        for t in range(4, N):
            logits, cache = llama.forward(cfg, params,
                                          jnp.asarray(ids[:, t:t + 1]),
                                          jnp.asarray(pos[:, t:t + 1]), cache)
            np.testing.assert_allclose(np.asarray(logits[0]), golden[0, t],
                                       atol=2e-4, rtol=2e-3)

    def test_greedy_continuation_matches_hf(self, hf_model, ours):
        """The reference's only end-to-end check, automated: greedy decode
        must produce the same token ids as HF generate."""
        cfg, params = ours
        rng = np.random.default_rng(2)
        prompt = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
        steps = 12

        with torch.no_grad():
            hf_out = hf_model.generate(
                torch.from_numpy(prompt.astype(np.int64)),
                max_new_tokens=steps, do_sample=False,
                pad_token_id=0)
        golden = hf_out.numpy()[0, 8:]

        cache = make_cache(cfg, 1)
        pos = np.arange(8, dtype=np.int32)[None]
        logits, cache = llama.forward(cfg, params, jnp.asarray(prompt),
                                      jnp.asarray(pos), cache)
        toks = []
        cur = int(jnp.argmax(logits[0]))
        for i in range(steps - 1):
            toks.append(cur)
            p = jnp.array([[8 + i]], jnp.int32)
            logits, cache = llama.forward(cfg, params,
                                          jnp.array([[cur]], jnp.int32), p,
                                          cache)
            cur = int(jnp.argmax(logits[0]))
        toks.append(cur)
        np.testing.assert_array_equal(np.array(toks), golden)


class TestCheckpointIO:
    def test_reference_bin_roundtrip(self, ours, tmp_path):
        cfg, params = ours
        checkpoint.save_reference_bin_dir(cfg, params, str(tmp_path))
        loaded = checkpoint.load_reference_bin_dir(cfg, str(tmp_path),
                                                   dtype="float32")
        flat1 = jax.tree_util.tree_leaves_with_path(params)
        loaded_map = dict(jax.tree_util.tree_leaves_with_path(loaded))
        for path, leaf in flat1:
            np.testing.assert_allclose(np.asarray(leaf),
                                       np.asarray(loaded_map[tuple(path)]),
                                       atol=1e-6,
                                       err_msg=str(path))


class TestLlama31RopeScaling:
    def test_inv_freq_matches_transformers(self):
        """The llama3 piecewise RoPE scaling must reproduce HF's
        _compute_llama3_parameters exactly (the 3.1 checkpoints depend on
        it for >8k positions)."""
        import numpy as np
        import torch
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
        from llm_inference_tpu.ops import rope

        head_dim, theta = 128, 500000.0
        scaling = {"type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
                   "high_freq_factor": 4.0,
                   "original_max_position_embeddings": 8192}

        class _Cfg:
            rope_theta = theta
            partial_rotary_factor = 1.0
            head_dim = 128
            hidden_size = 128 * 32
            num_attention_heads = 32
            rope_scaling = {"rope_type": "llama3", **{
                k: v for k, v in scaling.items() if k != "type"}}
            max_position_embeddings = 131072

        hf_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](_Cfg(), torch.device("cpu"))
        cos, sin = rope.make_rope_table(64, head_dim, theta, scaling)
        # recover our inv_freq from the table row at position 1
        import jax.numpy as jnp
        ours = np.angle(np.exp(1j * np.asarray(
            jnp.arctan2(sin[1, :head_dim // 2], cos[1, :head_dim // 2]))))
        np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-5,
                                   atol=1e-7)


class TestHFConfigQuirks:
    def test_qwen2_biases_default_on(self):
        """HF Qwen2 hardcodes q/k/v biases with NO attention_bias config
        key — the converter must not silently drop them."""
        from llm_inference_tpu.utils import checkpoint
        cfg = checkpoint.model_config_from_hf(
            {"model_type": "qwen2", "vocab_size": 64, "hidden_size": 32,
             "intermediate_size": 64, "num_hidden_layers": 2,
             "num_attention_heads": 4, "num_key_value_heads": 2})
        assert cfg.qkv_bias is True
        cfg2 = checkpoint.model_config_from_hf(
            {"model_type": "llama", "vocab_size": 64, "hidden_size": 32,
             "intermediate_size": 64, "num_hidden_layers": 2,
             "num_attention_heads": 4, "num_key_value_heads": 2})
        assert cfg2.qkv_bias is False

    def test_use_sliding_window_false_disables_window(self):
        from llm_inference_tpu.utils import checkpoint
        base = {"model_type": "qwen2", "vocab_size": 64, "hidden_size": 32,
                "intermediate_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "sliding_window": 512}
        on = checkpoint.model_config_from_hf(
            dict(base, use_sliding_window=True))
        off = checkpoint.model_config_from_hf(
            dict(base, use_sliding_window=False))
        assert on.sliding_window == 512 and off.sliding_window == 0
