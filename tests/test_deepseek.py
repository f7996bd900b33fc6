"""DeepSeek V3 family (models/deepseek.py): MLA latent attention + V3 MoE,
HF logits parity, engine integration, and the latent int8 cache.

No reference analogue (the reference is a dense-MHA LLaMA-2 engine); parity
is against transformers.DeepseekV3ForCausalLM.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_deepseek)
from llm_inference_tpu.models import deepseek, registry
from llm_inference_tpu.ops import kvcache


@pytest.fixture(scope="module")
def cfg():
    return tiny_deepseek()


@pytest.fixture(scope="module")
def params(cfg):
    return deepseek.init_params(cfg, jax.random.PRNGKey(0))


def _hf(seed=0, q_lora=32, rope_scaling=None, L=3):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from llm_inference_tpu.utils import checkpoint
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=4,
        n_shared_experts=1, n_routed_experts=8, routed_scaling_factor=2.5,
        kv_lora_rank=32, q_lora_rank=q_lora, qk_rope_head_dim=16,
        v_head_dim=32, qk_nope_head_dim=32, n_group=2, topk_group=1,
        num_experts_per_tok=2, first_k_dense_replace=1,
        norm_topk_prob=True, max_position_embeddings=128,
        rope_theta=10000.0, rope_scaling=rope_scaling,
        tie_word_embeddings=False, pad_token_id=0, torch_dtype="float32")
    torch.manual_seed(seed)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    with torch.no_grad():
        for lyr in hf.model.layers[hf_cfg.first_k_dense_replace:]:
            lyr.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    cfg = checkpoint.model_config_from_hf(hf.config)
    assert cfg.kv_lora_rank == 32 and cfg.rope_interleave
    cfg = cfg.__class__(**{**cfg.to_dict(), "dtype": "float32"})
    params = checkpoint.convert_hf_state_dict(cfg, hf.state_dict(),
                                              dtype="float32")
    return hf, cfg, params


class TestHFParity:
    @pytest.mark.parametrize("q_lora", [32, None])
    def test_logits_parity(self, q_lora):
        """Absorbed-MLA + V3 routing must match HF's expanded eager graph
        exactly (associativity-level float noise only). q_lora=None is the
        V2-lite-style full q projection."""
        torch = pytest.importorskip("torch")
        hf, cfg, params = _hf(q_lora=q_lora)
        assert cfg.q_lora_rank == (q_lora or 0)
        rng = np.random.default_rng(1)
        ids = rng.integers(2, 120, (2, 9)).astype(np.int64)
        with torch.no_grad():
            want = hf(torch.from_numpy(ids)).logits.numpy()
        cache = deepseek.new_cache(cfg, 2, 16, jnp.float32)
        pos = jnp.tile(jnp.arange(9, dtype=jnp.int32), (2, 1))
        got, _ = deepseek.forward(cfg, params, jnp.asarray(ids, jnp.int32),
                                  pos, cache, logits_mode="all")
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-4,
                                   rtol=3e-4)

    def test_yarn_parity(self):
        """YaRN rope scaling (the V3 long-context config) incl. the
        mscale^2 score-scale fold."""
        torch = pytest.importorskip("torch")
        hf, cfg, params = _hf(seed=2, rope_scaling={
            "rope_type": "yarn", "factor": 8.0,
            "original_max_position_embeddings": 16,
            "beta_fast": 32, "beta_slow": 1,
            "mscale": 1.0, "mscale_all_dim": 1.0})
        assert cfg.rope_scaling and cfg.rope_scaling["rope_type"] == "yarn"
        rng = np.random.default_rng(3)
        ids = rng.integers(2, 120, (1, 24)).astype(np.int64)
        with torch.no_grad():
            want = hf(torch.from_numpy(ids)).logits.numpy()
        cache = deepseek.new_cache(cfg, 1, 32, jnp.float32)
        pos = jnp.arange(24, dtype=jnp.int32)[None]
        got, _ = deepseek.forward(cfg, params, jnp.asarray(ids, jnp.int32),
                                  pos, cache, logits_mode="all")
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4,
                                   rtol=5e-4)

    def test_greedy_decode_matches_hf(self):
        torch = pytest.importorskip("torch")
        from llm_inference_tpu.engine import InferenceEngine
        hf, cfg, params = _hf(seed=4)
        prompt = [3, 17, 42, 9]
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                                 do_sample=False)
        want = hf_out[0, len(prompt):].tolist()
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    prefill_buckets=(8, 16)))
        got = eng.generate([prompt],
                           GenerationConfig(greedy=True, max_new_tokens=8,
                                            eos_token_ids=()))[0].token_ids
        assert got == want, (got, want)


class TestForward:
    def test_prefill_decode_consistency(self, cfg, params):
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)),
                          jnp.int32)
        pos = jnp.tile(jnp.arange(6, dtype=jnp.int32), (2, 1))
        c = deepseek.new_cache(cfg, 2, 32, jnp.float32)
        full, _ = deepseek.forward(cfg, params, ids, pos, c,
                                   logits_mode="all")
        c2 = deepseek.new_cache(cfg, 2, 32, jnp.float32)
        _, c2 = deepseek.forward(cfg, params, ids[:, :5], pos[:, :5], c2,
                                 logits_mode="none")
        step, _ = deepseek.forward(cfg, params, ids[:, 5:6], pos[:, 5:6],
                                   c2)
        np.testing.assert_allclose(np.asarray(step),
                                   np.asarray(full[:, -1]), atol=2e-5,
                                   rtol=2e-5)

    def test_latent_cache_is_small(self, cfg, params):
        c = deepseek.new_cache(cfg, 1, 32, jnp.float32)
        # ONE kv head; k carries latent+rope, v the bare latent
        assert c.k.shape == (cfg.num_layers, 1, 1, 32,
                             cfg.kv_lora_rank + cfg.qk_rope_head_dim)
        assert c.v.shape[-1] == cfg.kv_lora_rank

    def test_int8_latent_cache_close_to_f32(self, cfg, params):
        ids = jnp.array([[3, 5, 7, 11]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]

        def run(dtype):
            c = deepseek.new_cache(cfg, 1, 32, dtype)
            lg, c = deepseek.forward(cfg, params, ids, pos, c)
            lg2, _ = deepseek.forward(cfg, params,
                                      jnp.array([[9]], jnp.int32),
                                      jnp.array([[4]], jnp.int32), c)
            return np.asarray(lg), np.asarray(lg2)

        f1, f2 = run(jnp.float32)
        q1, q2 = run("int8")
        assert np.corrcoef(f1.ravel(), q1.ravel())[0, 1] > 0.999
        assert np.corrcoef(f2.ravel(), q2.ravel())[0, 1] > 0.995

    def test_int4_latent_cache_close_to_f32(self, cfg, params):
        """INT4 packed latents (VERDICT r3 #6): the one int4-KV config
        with no speed-downside argument — 4x fewer resident latent bytes,
        attend's unpack is one XLA fusion."""
        ids = jnp.array([[3, 5, 7, 11]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]

        def run(dtype):
            c = deepseek.new_cache(cfg, 1, 32, dtype)
            lg, c = deepseek.forward(cfg, params, ids, pos, c)
            lg2, _ = deepseek.forward(cfg, params,
                                      jnp.array([[9]], jnp.int32),
                                      jnp.array([[4]], jnp.int32), c)
            return np.asarray(lg), np.asarray(lg2)

        c4 = deepseek.new_cache(cfg, 1, 32, "int4")
        assert c4.bits == 4
        assert c4.k.shape[-1] == (cfg.kv_lora_rank
                                  + cfg.qk_rope_head_dim) // 2
        assert c4.v.shape[-1] == cfg.kv_lora_rank // 2
        f1, f2 = run(jnp.float32)
        q1, q2 = run("int4")
        assert np.corrcoef(f1.ravel(), q1.ravel())[0, 1] > 0.99
        assert np.corrcoef(f2.ravel(), q2.ravel())[0, 1] > 0.98

    def test_registry_dispatch(self, cfg):
        assert registry.get_model("tiny-deepseek") is deepseek
        assert registry.get_model("deepseek-v3") is deepseek


class TestEngine:
    def test_generate_and_scheduler(self, cfg, params):
        from llm_inference_tpu.engine import (ContinuousBatchingScheduler,
                                              InferenceEngine)
        eng = InferenceEngine(
            cfg, params, cache_dtype="int8",
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16)))
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=())
        solo = eng.generate([[5, 6, 7]], gen)[0].token_ids
        assert len(solo) == 6
        sched = ContinuousBatchingScheduler(eng, gen)
        reqs = sched.run([[5, 6, 7], [9, 10]], max_new_tokens=6)
        assert reqs[0].output_ids == solo


class TestPerplexity:
    def test_score_token_logprobs_uses_latent_cache(self, cfg, params):
        """eval/perplexity must build the MLA cache via the model hook
        (a llama-geometry cache mis-shapes the latent writes)."""
        from llm_inference_tpu.eval.perplexity import score_token_logprobs
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, 24).astype(np.int32)
        lp = score_token_logprobs(cfg, params, ids, window=16, stride=8)
        assert lp.shape == (23,) and np.isfinite(lp).all()


class TestQuantizedWeights:
    @pytest.mark.parametrize("weights", ["int8", "int4"])
    def test_quantized_close_to_dense(self, cfg, params, weights):
        from llm_inference_tpu.config import QuantConfig
        qp = deepseek.quantize_params(
            params, QuantConfig(weights=weights, group_size=16))
        qp = deepseek.prepare_params(qp, donate=False)
        from llm_inference_tpu.ops.quantization import QTensor
        assert isinstance(qp["moe_layers"]["wkv_a"], QTensor)
        assert qp["moe_layers"]["e_gate"].q.shape[0] == (
            (cfg.num_layers - cfg.first_k_dense) * cfg.num_experts
            or qp["moe_layers"]["e_gate"].q.shape[0])
        rng = np.random.default_rng(5)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)),
                          jnp.int32)
        pos = jnp.arange(6, dtype=jnp.int32)[None]
        c1 = deepseek.new_cache(cfg, 1, 32, jnp.float32)
        dense, _ = deepseek.forward(cfg, params, ids, pos, c1)
        c2 = deepseek.new_cache(cfg, 1, 32, jnp.float32)
        quant, _ = deepseek.forward(cfg, qp, ids, pos, c2)
        corr = np.corrcoef(np.asarray(dense).ravel(),
                           np.asarray(quant).ravel())[0, 1]
        assert corr > (0.999 if weights == "int8" else 0.99), corr

    def test_engine_generate_quantized(self, cfg, params):
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.engine import InferenceEngine
        qp = deepseek.quantize_params(
            params, QuantConfig(weights="int8", group_size=16))
        qp = deepseek.prepare_params(qp, donate=False)
        eng = InferenceEngine(
            cfg, qp, cache_dtype="int8",
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    prefill_buckets=(8, 16)))
        out = eng.generate([[5, 6, 7]],
                           GenerationConfig(greedy=True, max_new_tokens=5,
                                            eos_token_ids=()))[0]
        assert len(out.token_ids) == 5


class TestExpertParallel:
    """EP over the deepseek two-stack layout: expert stacks shard their
    expert axis, one psum per MoE layer completes the routed mixture, the
    shared expert stays replicated outside the psum."""

    @pytest.mark.parametrize("ep", [2, 4])
    def test_ep_matches_single_device(self, cfg, params, ep):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh
        from llm_inference_tpu.parallel.sharding import (shard_cache,
                                                         shard_params_for,
                                                         sharded_forward)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)),
                          jnp.int32)
        pos = jnp.tile(jnp.arange(6, dtype=jnp.int32), (2, 1))
        c0 = deepseek.new_cache(cfg, 2, 32, jnp.float32)
        g, _ = deepseek.forward(cfg, params, ids, pos, c0)
        mesh = make_mesh(ShardingConfig(data=1, tensor=ep))
        sp = shard_params_for(cfg, params, mesh)
        cache = shard_cache(deepseek.new_cache(cfg, 2, 32, jnp.float32),
                            mesh, tensor_axis=None)
        fwd = sharded_forward(cfg, mesh, sp)
        lg, _ = fwd(sp, ids, pos, cache, jnp.full((2,), 5, jnp.int32))
        np.testing.assert_allclose(np.asarray(lg), np.asarray(g),
                                   atol=2e-4, rtol=2e-4)

    def test_ep_quantized_stacks(self, cfg, params):
        """ep_shards expert-block-major int8 stacks under ep=4 equal the
        single-device ep=1 quantized forward exactly."""
        from llm_inference_tpu.config import QuantConfig, ShardingConfig
        from llm_inference_tpu.parallel import make_mesh
        from llm_inference_tpu.parallel.sharding import (shard_cache,
                                                         shard_params_for,
                                                         sharded_forward)
        q = QuantConfig(weights="int8", group_size=16)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)),
                          jnp.int32)
        pos = jnp.tile(jnp.arange(6, dtype=jnp.int32), (2, 1))
        qp1 = deepseek.prepare_params(
            deepseek.quantize_params(params, q), donate=False)
        c1 = deepseek.new_cache(cfg, 2, 32, jnp.float32)
        g, _ = deepseek.forward(cfg, qp1, ids, pos, c1)
        qp4 = deepseek.prepare_params(
            deepseek.quantize_params(params, q, ep_shards=4), donate=False)
        mesh = make_mesh(ShardingConfig(data=1, tensor=4))
        sq = shard_params_for(cfg, qp4, mesh)
        cache = shard_cache(deepseek.new_cache(cfg, 2, 32, jnp.float32),
                            mesh, tensor_axis=None)
        fwd = sharded_forward(cfg, mesh, sq)
        lg, _ = fwd(sq, ids, pos, cache, jnp.full((2,), 5, jnp.int32))
        np.testing.assert_allclose(np.asarray(lg), np.asarray(g),
                                   atol=2e-4, rtol=2e-4)


class TestAttentionTP:
    """MLA attention head-sharding over the expert axis (round 3):
    the EP parity tests above already RUN with sharded attention (tiny
    config heads divide ep); these pin the spec rules so a regression
    cannot silently fall back to replication."""

    def test_specs_shard_dense_attention(self, cfg, params):
        from llm_inference_tpu.parallel.sharding import deepseek_param_pspecs
        sp = deepseek_param_pspecs(params, "expert", attn_shards=2,
                                   num_heads=cfg.num_heads)
        assert sp["moe_layers"]["w_uk"][1] == "expert"
        assert sp["moe_layers"]["wq_b"][2] == "expert"
        assert sp["moe_layers"]["wo"][1] == "expert"

    def test_specs_replicate_quantized_attention(self, cfg, params):
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.parallel.sharding import deepseek_param_pspecs
        qp = deepseek.quantize_params(
            params, QuantConfig(weights="int8", group_size=16))
        sp = deepseek_param_pspecs(qp, "expert", attn_shards=2,
                                   num_heads=cfg.num_heads)
        # quantized wq_b/wo → whole attention replicates (blocked-layout
        # head slicing not wired); w_uk stays dense but must match
        assert all(s is None for s in sp["moe_layers"]["w_uk"])

    def test_specs_replicate_on_indivisible_heads(self, cfg, params):
        from llm_inference_tpu.parallel.sharding import deepseek_param_pspecs
        sp = deepseek_param_pspecs(params, "expert", attn_shards=3,
                                   num_heads=cfg.num_heads)  # 4 % 3 != 0
        assert all(s is None for s in sp["moe_layers"]["w_uk"])
