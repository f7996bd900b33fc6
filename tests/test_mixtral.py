"""Mixtral MoE family (models/mixtral.py): logits parity against
transformers' MixtralForCausalLM, expert-parallel parity on the virtual
mesh, engine serving smoke. Completes the parallelism inventory (EP joins
dp/tp/pp/sp). The reference is LLaMA-only (src/models/llama/*)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_inference_tpu.config import EngineConfig, GenerationConfig, ModelConfig
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.models import mixtral
from llm_inference_tpu.ops import kvcache


def tiny_mixtral(**kw) -> ModelConfig:
    defaults = dict(name="mixtral-tiny", vocab_size=128, hidden_size=64,
                    intermediate_size=96, num_layers=2, num_heads=4,
                    num_kv_heads=2, head_dim=16, rms_norm_eps=1e-5,
                    rope_theta=10000.0, max_position_embeddings=256,
                    num_experts=4, experts_per_token=2, dtype="float32")
    defaults.update(kw)
    return ModelConfig(**defaults)


def hf_model_and_params(cfg: ModelConfig, seed: int = 0):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        num_local_experts=cfg.num_experts,
        num_experts_per_tok=cfg.experts_per_token,
        sliding_window=None, attn_implementation="eager",
    )
    model = MixtralForCausalLM(hf_cfg).eval()

    def t(w):
        return jnp.asarray(w.detach().numpy().T)

    def a(w):
        return jnp.asarray(w.detach().numpy())

    lyr = model.model.layers
    layers = {
        "attn_norm": jnp.stack([a(l.input_layernorm.weight) for l in lyr]),
        "ffn_norm": jnp.stack(
            [a(l.post_attention_layernorm.weight) for l in lyr]),
        "wq": jnp.stack([t(l.self_attn.q_proj.weight) for l in lyr]),
        "wk": jnp.stack([t(l.self_attn.k_proj.weight) for l in lyr]),
        "wv": jnp.stack([t(l.self_attn.v_proj.weight) for l in lyr]),
        "wo": jnp.stack([t(l.self_attn.o_proj.weight) for l in lyr]),
        "router": jnp.stack(
            [t(l.block_sparse_moe.gate.weight) for l in lyr]),
        "e_gate": jnp.stack(
            [jnp.stack([t(e.w1.weight) for e in l.block_sparse_moe.experts])
             for l in lyr]),
        "e_up": jnp.stack(
            [jnp.stack([t(e.w3.weight) for e in l.block_sparse_moe.experts])
             for l in lyr]),
        "e_down": jnp.stack(
            [jnp.stack([t(e.w2.weight) for e in l.block_sparse_moe.experts])
             for l in lyr]),
    }
    params = {
        "embed": a(model.model.embed_tokens.weight),
        "layers": layers,
        "final_norm": a(model.model.norm.weight),
        "lm_head": t(model.lm_head.weight),
    }
    return model, params


class TestMixtralHFParity:
    def test_prefill_logits_match_hf(self):
        import torch
        cfg = tiny_mixtral()
        model, params = hf_model_and_params(cfg)
        rng = np.random.default_rng(0)
        B, T = 2, 10
        ids = rng.integers(0, cfg.vocab_size, (B, T))
        with torch.no_grad():
            hf = model(torch.tensor(ids)).logits.numpy()
        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                   cfg.head_dim, jnp.float32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        ours, _ = mixtral.forward(cfg, params, jnp.asarray(ids, jnp.int32),
                                  pos, cache, logits_mode="all")
        np.testing.assert_allclose(np.asarray(ours), hf, atol=2e-3,
                                   rtol=2e-3)

    def test_greedy_decode_matches_hf(self):
        import torch
        cfg = tiny_mixtral()
        model, params = hf_model_and_params(cfg, seed=1)
        rng = np.random.default_rng(1)
        prompt = list(rng.integers(0, cfg.vocab_size, 8))
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=5, do_sample=False,
                use_cache=True)[0][len(prompt):].tolist()
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=3,
                                    prefill_buckets=(8, 16)))
        gen = GenerationConfig(greedy=True, max_new_tokens=5,
                               eos_token_ids=())
        ours = eng.generate([list(prompt)], gen)[0].token_ids
        assert ours == hf_out, (ours, hf_out)


class TestExpertParallel:
    @pytest.mark.parametrize("ep", [2, 4])
    def test_ep_matches_single_device(self, ep):
        """Expert weights sharded over a mesh axis; masked local compute +
        psum must reproduce the single-device mixture exactly."""
        cfg = tiny_mixtral()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        B, T = 2, 6
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        def new_cache():
            return kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads,
                                      16, cfg.head_dim, jnp.float32)
        golden, _ = mixtral.forward(cfg, params, ids, pos, new_cache())

        mesh = Mesh(np.asarray(jax.devices()[:ep]).reshape(ep), ("expert",))
        from llm_inference_tpu.parallel.sharding import moe_param_pspecs
        espec = moe_param_pspecs(params, "expert")
        sharded = jax.device_put(
            params, jax.tree.map(lambda s: NamedSharding(mesh, s), espec,
                                 is_leaf=lambda x: isinstance(x, P)))

        fwd = jax.shard_map(
            lambda p, i, q, c: mixtral.forward(cfg, p, i, q, c,
                                               tp_axis="expert"),
            mesh=mesh,
            in_specs=(espec, P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False)
        out, _ = fwd(sharded, ids, pos, new_cache())
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   atol=2e-4, rtol=2e-4)


class TestMixtralServing:
    def test_scheduler_and_prefix_cache(self):
        from llm_inference_tpu.engine.scheduler import PagedScheduler
        cfg = tiny_mixtral()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16), page_size=8))
        gen = GenerationConfig(greedy=True, max_new_tokens=5,
                               eos_token_ids=(1,))
        rng = np.random.default_rng(5)
        prompt = list(rng.integers(2, 120, 17))
        golden = PagedScheduler(eng, gen, slots=2)
        want = [r.output_ids for r in golden.run([list(prompt)] * 2)]
        sched = PagedScheduler(eng, gen, slots=2, prefix_cache=True)
        got = [r.output_ids for r in sched.run([list(prompt)] * 2)]
        assert got == want
        assert sched.store.hit_tokens > 0


class TestMixtralCheckpoint:
    def test_save_pretrained_roundtrip(self, tmp_path):
        import torch
        from llm_inference_tpu.utils import checkpoint
        cfg = tiny_mixtral()
        model, _ = hf_model_and_params(cfg, seed=3)
        d = str(tmp_path / "ck")
        model.save_pretrained(d, safe_serialization=True)
        lcfg, params = checkpoint.load_hf_checkpoint(d, dtype="float32")
        assert lcfg.num_experts == cfg.num_experts
        assert lcfg.experts_per_token == cfg.experts_per_token
        rng = np.random.default_rng(3)
        B, T = 1, 7
        ids = rng.integers(0, cfg.vocab_size, (B, T))
        with torch.no_grad():
            hf = model(torch.tensor(ids)).logits.numpy()
        cache = kvcache.init_cache(lcfg.num_layers, B, lcfg.num_kv_heads,
                                   16, lcfg.head_dim, jnp.float32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        ours, _ = mixtral.forward(lcfg, params,
                                  jnp.asarray(ids, jnp.int32), pos, cache,
                                  logits_mode="all")
        np.testing.assert_allclose(np.asarray(ours), hf, atol=2e-3,
                                   rtol=2e-3)


class TestMixtralQuantized:
    def test_int8_experts_same_argmax(self):
        """Attention AND expert weights quantized (experts as [L*E, K, N]
        stacks, kernel-indexed at layer*E + e): argmax-consistent."""
        from llm_inference_tpu.config import QuantConfig
        cfg = tiny_mixtral(hidden_size=128, intermediate_size=128,
                           head_dim=32)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        q = mixtral.quantize_params(params, QuantConfig(weights="int8"))
        assert q["layers"]["e_gate"].q.shape[0] == (cfg.num_layers
                                                    * cfg.num_experts)
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]

        def run(p):
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       16, cfg.head_dim, jnp.float32)
            out, _ = mixtral.forward(cfg, p, ids, pos, cache)
            return out
        g, gq = run(params), run(q)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(g), atol=0.2,
                                   rtol=0.2)
        assert (jnp.argmax(g, -1) == jnp.argmax(gq, -1)).all()

    def test_init_params_quantized_matches_layout(self):
        """Direct-QTensor dummy builder (the 8x7B perf path — a dense init
        would need ~93 GB) produces the same pytree layout quantize_params
        does, and the forward runs."""
        from llm_inference_tpu.config import QuantConfig
        cfg = tiny_mixtral(hidden_size=128, intermediate_size=128,
                           head_dim=32)
        q = mixtral.init_params_quantized(cfg, jax.random.PRNGKey(0),
                                          QuantConfig(weights="int8"))
        ref = mixtral.quantize_params(
            mixtral.init_params(cfg, jax.random.PRNGKey(0)),
            QuantConfig(weights="int8"))
        assert (jax.tree_util.tree_structure(q)
                == jax.tree_util.tree_structure(ref))
        for a, b in zip(jax.tree.leaves(q), jax.tree.leaves(ref)):
            assert a.shape == b.shape, (a.shape, b.shape)
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                                   cfg.head_dim, jnp.float32)
        ids = jnp.asarray([[5, 6, 7]], jnp.int32)
        pos = jnp.arange(3, dtype=jnp.int32)[None]
        out, _ = mixtral.forward(cfg, q, ids, pos, cache)
        assert out.shape == (1, cfg.vocab_size)


class TestQuantizedExpertParallel:
    """Quantized expert stacks sharded over the expert axis: each shard
    holds its experts' [L·El] stack (quantize_params' ep_shards expert-
    block-major order — a plain axis-0 PartitionSpec is the shard map) and
    kernel-indexes at layer·El + e; the psum completes the mixture."""

    @pytest.mark.parametrize("ep,weights,gs", [(2, "int8", 0),
                                               (4, "int8", 32),
                                               (2, "int4", 32)])
    def test_matches_single_device_quantized(self, ep, weights, gs):
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.parallel.sharding import moe_param_pspecs
        cfg = tiny_mixtral(hidden_size=128, intermediate_size=128,
                           head_dim=32)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        qcfg = QuantConfig(weights=weights, group_size=gs)
        rng = np.random.default_rng(3)
        B, T = 2, 5
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        def new_cache():
            return kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads,
                                      16, cfg.head_dim, jnp.float32)

        # golden: layer-major quantized stack, single device (identical
        # per-expert quantized values — only the stack ORDER differs)
        golden, _ = mixtral.forward(cfg, mixtral.quantize_params(
            params, qcfg), ids, pos, new_cache())

        ep_params = mixtral.quantize_params(params, qcfg, ep_shards=ep)
        mesh = Mesh(np.asarray(jax.devices()[:ep]).reshape(ep), ("expert",))
        espec = moe_param_pspecs(ep_params, "expert")
        sharded = jax.device_put(
            ep_params, jax.tree.map(lambda s: NamedSharding(mesh, s), espec,
                                    is_leaf=lambda x: isinstance(x, P)))
        fwd = jax.shard_map(
            lambda p, i, q, c: mixtral.forward(cfg, p, i, q, c,
                                               tp_axis="expert"),
            mesh=mesh,
            in_specs=(espec, P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False)
        out, _ = fwd(sharded, ids, pos, new_cache())
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   atol=2e-4, rtol=2e-4)


class TestMixtralEngineSharded:
    """Engine-level expert-parallel serving: the engine's tensor mesh axis
    doubles as the expert axis for MoE (sharding.is_moe dispatch)."""

    def test_engine_generate_over_mesh(self):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh

        cfg = tiny_mixtral()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_seq_len=32, decode_chunk=4, max_batch_size=4,
                            prefill_buckets=(8,))
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=())
        single = InferenceEngine(cfg, params, engine_cfg=ecfg)
        want = [r.token_ids for r in single.generate([[5, 6, 7], [9, 10, 11]],
                                                     gen)]
        mesh = make_mesh(ShardingConfig(data=1, tensor=4))
        sharded = InferenceEngine(cfg, params, engine_cfg=ecfg, mesh=mesh)
        got = [r.token_ids for r in sharded.generate([[5, 6, 7], [9, 10, 11]],
                                                     gen)]
        assert got == want

    def test_engine_quantized_ep_over_mesh(self):
        """int8 expert stacks (ep_shards layout) through the engine mesh
        path: matches the single-device quantized engine."""
        from llm_inference_tpu.config import QuantConfig, ShardingConfig
        from llm_inference_tpu.parallel import make_mesh

        ep = 2
        cfg = tiny_mixtral(hidden_size=128, intermediate_size=128,
                           head_dim=32)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        qcfg = QuantConfig(weights="int8")
        ecfg = EngineConfig(max_seq_len=32, decode_chunk=4, max_batch_size=4,
                            prefill_buckets=(8,))
        gen = GenerationConfig(greedy=True, max_new_tokens=5,
                               eos_token_ids=())
        single = InferenceEngine(cfg, mixtral.quantize_params(params, qcfg),
                                 engine_cfg=ecfg)
        want = [r.token_ids for r in single.generate([[5, 6, 7]], gen)]
        mesh = make_mesh(ShardingConfig(data=1, tensor=ep))
        sharded = InferenceEngine(
            cfg, mixtral.quantize_params(params, qcfg, ep_shards=ep),
            engine_cfg=ecfg, mesh=mesh)
        got = [r.token_ids for r in sharded.generate([[5, 6, 7]], gen)]
        assert got == want

    def test_data_parallel_composes_with_ep(self):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh

        cfg = tiny_mixtral()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_seq_len=32, decode_chunk=4, max_batch_size=4,
                            prefill_buckets=(8,))
        gen = GenerationConfig(greedy=True, max_new_tokens=4,
                               eos_token_ids=())
        prompts = [[5, 6, 7], [9, 10, 11], [3, 4, 5], [7, 8, 9]]
        single = InferenceEngine(cfg, params, engine_cfg=ecfg)
        want = [r.token_ids for r in single.generate(
            [list(p) for p in prompts], gen)]
        mesh = make_mesh(ShardingConfig(data=2, tensor=2))
        sharded = InferenceEngine(cfg, params, engine_cfg=ecfg, mesh=mesh)
        got = [r.token_ids for r in sharded.generate(
            [list(p) for p in prompts], gen)]
        assert got == want


class TestAttentionTP:
    """Dense mixtral attention head-shards over the expert axis (round 3):
    wq/wk/wv columns + wo rows + the per-head KV cache shard; the per-layer
    psum completes attention. Quantized attention keeps replicating."""

    def test_attn_sharded_matches_single_device(self):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh
        from llm_inference_tpu.parallel.sharding import (moe_attn_shards,
                                                         shard_cache,
                                                         shard_params_for,
                                                         sharded_forward)
        cfg = tiny_mixtral()          # 4 q heads, 2 kv heads → ep=2 divides
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        assert moe_attn_shards(cfg, params, 2)
        rng = np.random.default_rng(7)
        B, T = 2, 6
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        def new_cache():
            return kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads,
                                      16, cfg.head_dim, jnp.float32)
        golden, _ = mixtral.forward(cfg, params, ids, pos, new_cache())

        mesh = make_mesh(ShardingConfig(data=1, tensor=2))
        sp = shard_params_for(cfg, params, mesh)
        cache = shard_cache(new_cache(), mesh)    # kv heads over tensor
        fwd = sharded_forward(cfg, mesh, sp)
        out, _ = fwd(sp, ids, pos, cache, jnp.full((B,), T - 1, jnp.int32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   atol=2e-4, rtol=2e-4)

    def test_quantized_attention_replicates(self):
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.parallel.sharding import moe_attn_shards
        cfg = tiny_mixtral()
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        qp = mixtral.quantize_params(params,
                                     QuantConfig(weights="int8"))
        assert not moe_attn_shards(cfg, qp, 2)

    def test_indivisible_heads_replicate(self):
        from llm_inference_tpu.parallel.sharding import moe_attn_shards
        cfg = tiny_mixtral()          # 2 kv heads: ep=4 does not divide
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        assert not moe_attn_shards(cfg, params, 4)
