"""Gemma-2 family (models/gemma2.py): logits parity against transformers'
Gemma2ForCausalLM (sandwich norms, GeGLU, softcaps, alternating sliding
window, scaled tied embeddings), plus engine serving smoke. The second
model FAMILY beyond the reference's LLaMA-only scope."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import EngineConfig, GenerationConfig, ModelConfig
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.models import gemma2
from llm_inference_tpu.ops import kvcache


def tiny_gemma2(**kw) -> ModelConfig:
    defaults = dict(name="gemma2-tiny", vocab_size=128, hidden_size=64,
                    intermediate_size=128, num_layers=4, num_heads=4,
                    num_kv_heads=2, head_dim=16, rms_norm_eps=1e-6,
                    rope_theta=10000.0, max_position_embeddings=256,
                    tie_word_embeddings=True, attn_logit_softcap=50.0,
                    final_logit_softcap=30.0, sliding_window=8,
                    sliding_pattern="alternating",
                    query_pre_attn_scalar=32.0, scale_embeddings=True,
                    dtype="float32")
    defaults.update(kw)
    return ModelConfig(**defaults)


def hf_model_and_params(cfg: ModelConfig, seed: int = 0):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Gemma2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        attn_logit_softcapping=cfg.attn_logit_softcap,
        final_logit_softcapping=cfg.final_logit_softcap,
        sliding_window=cfg.sliding_window,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True, attn_implementation="eager",
    )
    model = Gemma2ForCausalLM(hf_cfg).eval()

    def t(w):  # [out, in] -> [in, out]
        return jnp.asarray(w.detach().numpy().T)

    def a(w):
        return jnp.asarray(w.detach().numpy())

    L = cfg.num_layers
    lyr = model.model.layers
    layers = {
        "attn_norm": jnp.stack([a(l.input_layernorm.weight) for l in lyr]),
        "post_attn_norm": jnp.stack(
            [a(l.post_attention_layernorm.weight) for l in lyr]),
        "ffn_norm": jnp.stack(
            [a(l.pre_feedforward_layernorm.weight) for l in lyr]),
        "post_ffn_norm": jnp.stack(
            [a(l.post_feedforward_layernorm.weight) for l in lyr]),
        "wq": jnp.stack([t(l.self_attn.q_proj.weight) for l in lyr]),
        "wk": jnp.stack([t(l.self_attn.k_proj.weight) for l in lyr]),
        "wv": jnp.stack([t(l.self_attn.v_proj.weight) for l in lyr]),
        "wo": jnp.stack([t(l.self_attn.o_proj.weight) for l in lyr]),
        "w_gate": jnp.stack([t(l.mlp.gate_proj.weight) for l in lyr]),
        "w_up": jnp.stack([t(l.mlp.up_proj.weight) for l in lyr]),
        "w_down": jnp.stack([t(l.mlp.down_proj.weight) for l in lyr]),
    }
    params = {
        "embed": a(model.model.embed_tokens.weight),
        "layers": layers,
        "final_norm": a(model.model.norm.weight),
    }
    return model, params


class TestGemma2HFParity:
    def test_prefill_logits_match_hf(self):
        import torch
        cfg = tiny_gemma2()
        model, params = hf_model_and_params(cfg)
        rng = np.random.default_rng(0)
        B, T = 2, 12                      # T > window=8 exercises both
        ids = rng.integers(0, cfg.vocab_size, (B, T))
        with torch.no_grad():
            hf = model(torch.tensor(ids)).logits.numpy()
        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                   cfg.head_dim, jnp.float32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        ours, _ = gemma2.forward(cfg, params, jnp.asarray(ids, jnp.int32),
                                 pos, cache, logits_mode="all")
        np.testing.assert_allclose(np.asarray(ours), hf, atol=2e-3,
                                   rtol=2e-3)

    def test_incremental_decode_matches_hf_greedy(self):
        import torch
        cfg = tiny_gemma2()
        model, params = hf_model_and_params(cfg, seed=1)
        rng = np.random.default_rng(1)
        prompt = list(rng.integers(0, cfg.vocab_size, 10))
        # HF greedy continuation
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
                use_cache=True)[0][len(prompt):].tolist()
        # our engine (registry dispatch)
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=3,
                                    prefill_buckets=(16, 32)))
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=())
        ours = eng.generate([list(prompt)], gen)[0].token_ids
        assert ours == hf_out, (ours, hf_out)


class TestGemma2Engine:
    def test_scheduler_serves_gemma(self):
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16)))
        gen = GenerationConfig(greedy=True, max_new_tokens=5,
                               eos_token_ids=(1,))
        reqs = ContinuousBatchingScheduler(eng, gen, slots=2).run(
            [[5, 6, 7], [9, 10]])
        assert all(len(r.output_ids) == 5 or r.finished for r in reqs)

    def test_alternating_windows(self):
        cfg = tiny_gemma2()
        w = np.asarray(gemma2._layer_windows(cfg))
        assert list(w) == [8, 0, 8, 0]


class TestGemma2Quantized:
    def test_int8_weights_same_argmax(self):
        """llama.quantize_params works on gemma params (same matmul layer
        keys); int8 logits stay argmax-consistent on a tiny model."""
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.models import llama
        cfg = tiny_gemma2(hidden_size=128, intermediate_size=256,
                          head_dim=32)
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        q = llama.quantize_params(params, QuantConfig(weights="int8"))
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]

        def run(p):
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       32, cfg.head_dim, jnp.float32)
            out, _ = gemma2.forward(cfg, p, ids, pos, cache)
            return out
        g, gq = run(params), run(q)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(g), atol=0.2,
                                   rtol=0.2)
        assert (jnp.argmax(g, -1) == jnp.argmax(gq, -1)).all()


class TestGemma2Checkpoint:
    def test_save_pretrained_roundtrip(self, tmp_path):
        """A real HF gemma2 checkpoint directory (save_pretrained) loads
        through load_hf_checkpoint and reproduces HF logits."""
        import torch
        from llm_inference_tpu.utils import checkpoint
        cfg = tiny_gemma2()
        model, _ = hf_model_and_params(cfg, seed=3)
        d = str(tmp_path / "ck")
        model.save_pretrained(d, safe_serialization=True)
        lcfg, params = checkpoint.load_hf_checkpoint(d, dtype="float32")
        assert lcfg.name.startswith("gemma")
        assert lcfg.attn_logit_softcap == cfg.attn_logit_softcap
        assert lcfg.scale_embeddings and lcfg.tie_word_embeddings
        assert lcfg.sliding_pattern == "alternating"
        rng = np.random.default_rng(3)
        B, T = 1, 9
        ids = rng.integers(0, cfg.vocab_size, (B, T))
        with torch.no_grad():
            hf = model(torch.tensor(ids)).logits.numpy()
        cache = kvcache.init_cache(lcfg.num_layers, B, lcfg.num_kv_heads,
                                   16, lcfg.head_dim, jnp.float32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        ours, _ = gemma2.forward(lcfg, params,
                                 jnp.asarray(ids, jnp.int32), pos, cache,
                                 logits_mode="all")
        np.testing.assert_allclose(np.asarray(ours), hf, atol=2e-3,
                                   rtol=2e-3)

    def test_blocked_streaming_layout(self):
        """prepare_params(fuse=False) gives gemma the column-blocked QTensor
        layout the Pallas quant matmul needs (CLI quantized path)."""
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.models import llama
        cfg = tiny_gemma2(hidden_size=128, intermediate_size=256,
                          head_dim=32)
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        q = llama.quantize_params(params, QuantConfig(weights="int8"))
        qb = llama.prepare_params(q, fuse=False, donate=False)
        assert qb["layers"]["wq"].block_n > 0
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]

        def run(p):
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       32, cfg.head_dim, jnp.float32)
            out, _ = gemma2.forward(cfg, p, ids, pos, cache)
            return out
        # blocked ref path accumulates per column-block → small numeric
        # reordering vs the flat path; layout plumbing is what's under test
        np.testing.assert_allclose(np.asarray(run(qb)), np.asarray(run(q)),
                                   atol=3e-2, rtol=3e-2)


class TestGemma2Paged:
    def _engine(self):
        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        return InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16), page_size=8))

    def test_paged_first_token_matches_dense(self):
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler, PagedScheduler)
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=4,
                               eos_token_ids=(1,))
        prompts = [[5, 6, 7, 8, 9], [20, 21]]
        dense = ContinuousBatchingScheduler(eng, gen, slots=2)
        want = [r.output_ids[0] for r in dense.run(
            [list(p) for p in prompts], max_new_tokens=1)]
        paged = PagedScheduler(eng, gen, slots=2)
        got = [r.output_ids[0] for r in paged.run(
            [list(p) for p in prompts], max_new_tokens=1)]
        assert got == want

    def test_paged_prefix_cache_gemma(self):
        from llm_inference_tpu.engine.scheduler import PagedScheduler
        eng = self._engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=5,
                               eos_token_ids=(1,))
        rng = np.random.default_rng(4)
        prompt = list(rng.integers(2, 120, 19))
        golden = PagedScheduler(eng, gen, slots=2)
        want = [r.output_ids for r in golden.run([list(prompt)] * 2)]
        sched = PagedScheduler(eng, gen, slots=2, prefix_cache=True)
        got = [r.output_ids for r in sched.run([list(prompt)] * 2)]
        assert got == want
        assert sched.store.hit_tokens > 0


class TestGemma2Decoders:
    def test_beam_and_speculative_work(self):
        """Beam search and n-gram speculative decoding run gemma through
        the registry-dispatched forwards (greedy-exact where applicable)."""
        from llm_inference_tpu.engine.beam_search import beam_search
        from llm_inference_tpu.engine.speculative import SpeculativeDecoder
        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=4,
                                    prefill_buckets=(8, 16)))
        gen = GenerationConfig(greedy=True, max_new_tokens=8,
                               eos_token_ids=(1,))
        want = eng.generate([[5, 6, 7, 8]], gen)[0].token_ids
        # beam W=1 == greedy
        hyps = beam_search(eng, [5, 6, 7, 8], beam_width=1,
                           max_new_tokens=8, eos_token_ids=(1,))
        assert hyps[0].token_ids == want
        # speculative == greedy
        got, _ = SpeculativeDecoder(eng, gamma=3).generate([5, 6, 7, 8], gen)
        if 1 in got:
            got = got[:got.index(1)]
        assert got == want


class TestGemma2Sharded:
    """Gemma2 under the family-agnostic sharded_forward: dp/tp logits must
    match single-device exactly (sandwich post-norms sit AFTER the TP psums
    — the parity here is what validates that ordering)."""

    @pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (2, 1), (4, 2)])
    def test_matches_single_device(self, dp, tp):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import (
            make_mesh, shard_cache, shard_params, sharded_forward)

        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        B, T = dp * 2, 6
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                   cfg.head_dim, jnp.float32)
        golden, _ = gemma2.forward(cfg, params, ids, pos, cache)

        mesh = make_mesh(ShardingConfig(data=dp, tensor=tp))
        sparams = shard_params(params, mesh)
        scache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32), mesh)
        fwd = sharded_forward(cfg, mesh, sparams)
        last = jnp.full((B,), T - 1, jnp.int32)
        out, _ = fwd(sparams, ids, pos, scache, last)
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   atol=2e-4, rtol=2e-4)

    def test_prefill_then_decode_sharded(self):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import (
            make_mesh, shard_cache, shard_params, sharded_forward)

        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        B, T = 2, 5
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        # single-device golden: prefill then one decode step
        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                   cfg.head_dim, jnp.float32)
        logits, cache = gemma2.forward(cfg, params, ids, pos, cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        dpos = jnp.full((B, 1), T, jnp.int32)
        golden, _ = gemma2.forward(cfg, params, nxt, dpos, cache)

        mesh = make_mesh(ShardingConfig(data=2, tensor=2))
        sparams = shard_params(params, mesh)
        scache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32), mesh)
        fwd = sharded_forward(cfg, mesh, sparams)
        last = jnp.full((B,), T - 1, jnp.int32)
        slog, scache = fwd(sparams, ids, pos, scache, last)
        snxt = jnp.argmax(slog, axis=-1).astype(jnp.int32)[:, None]
        sout, _ = fwd(sparams, snxt, dpos, scache, jnp.zeros((B,), jnp.int32))
        np.testing.assert_allclose(np.asarray(sout), np.asarray(golden),
                                   atol=2e-4, rtol=2e-4)

    def test_engine_generate_over_mesh(self):
        """Engine-level TP serving (the gate used to llama-only this)."""
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh

        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_seq_len=32, decode_chunk=4, max_batch_size=4,
                            prefill_buckets=(8,))
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=())
        single = InferenceEngine(cfg, params, engine_cfg=ecfg)
        want = [r.token_ids for r in single.generate([[5, 6, 7], [9, 10, 11]],
                                                     gen)]
        mesh = make_mesh(ShardingConfig(data=2, tensor=2))
        sharded = InferenceEngine(cfg, params, engine_cfg=ecfg, mesh=mesh)
        got = [r.token_ids for r in sharded.generate([[5, 6, 7], [9, 10, 11]],
                                                     gen)]
        assert got == want

    @pytest.mark.parametrize("weights,gs", [("int8", 0), ("int4", 32)])
    def test_quantized_tp_matches_unsharded_quantized(self, weights, gs):
        """Quantized gemma2 weights (llama.quantize_params — shared layer
        keys) shard and serve under TP; logits match the single-device
        quantized model."""
        from llm_inference_tpu.config import QuantConfig, ShardingConfig
        from llm_inference_tpu.models import llama
        from llm_inference_tpu.parallel import (
            make_mesh, shard_cache, shard_params, sharded_forward)

        tp = 2
        cfg = tiny_gemma2(hidden_size=128, intermediate_size=256,
                          vocab_size=256)
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        qcfg = QuantConfig(weights=weights, group_size=gs)
        qparams = llama.quantize_params(params, qcfg, row_shards=tp)
        rng = np.random.default_rng(4)
        B, T = 2, 5
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                   cfg.head_dim, jnp.float32)
        golden, _ = gemma2.forward(cfg, qparams, ids, pos, cache)

        mesh = make_mesh(ShardingConfig(data=1, tensor=tp))
        sparams = shard_params(qparams, mesh)
        scache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32), mesh)
        fwd = sharded_forward(cfg, mesh, sparams)
        last = jnp.full((B,), T - 1, jnp.int32)
        out, _ = fwd(sparams, ids, pos, scache, last)
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   atol=5e-3, rtol=5e-3)


class TestGemma2DecodeKernel:
    """Gemma2 decode through the fused Pallas kernel (window riding the
    scan as a traced scalar) must match the jnp attention path."""

    @pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
    def test_kernel_decode_matches_jnp(self, monkeypatch, cache_dtype):
        from llm_inference_tpu.ops.pallas import (decode_attention
                                                  as pallas_decode)
        cfg = tiny_gemma2(hidden_size=128, intermediate_size=256,
                          num_heads=4, num_kv_heads=2, head_dim=64,
                          sliding_window=8)
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(6)
        B, T, S = 2, 6, 128
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        nxt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)), jnp.int32)
        dpos = jnp.full((B, 1), T, jnp.int32)

        def run():
            cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads,
                                       S, cfg.head_dim, cache_dtype)
            _, cache = gemma2.forward(cfg, params, ids, pos, cache,
                                      logits_mode="none")
            logits, _ = gemma2.forward(cfg, params, nxt, dpos, cache)
            return np.asarray(logits)

        assert pallas_decode.supports((B, 1, cfg.num_heads, cfg.head_dim), S)
        got = run()
        monkeypatch.setattr(pallas_decode, "supports", lambda *a: False)
        want = run()
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()

    @pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
    def test_paged_kernel_decode_matches_jnp(self, monkeypatch, cache_dtype):
        """Paged decode through the window-aware paged kernel (continuous-
        batching serving path) vs the gather+jnp path."""
        from llm_inference_tpu.ops import paged_kvcache
        from llm_inference_tpu.ops.pallas import (paged_attention
                                                  as pallas_paged)
        cfg = tiny_gemma2(hidden_size=128, intermediate_size=256,
                          num_heads=4, num_kv_heads=2, head_dim=64,
                          sliding_window=8)
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(12)
        B, T, ps, NB = 2, 16, 8, 8
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        nxt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)), jnp.int32)
        dpos = jnp.full((B, 1), T, jnp.int32)

        def run():
            cache = paged_kvcache.init_paged_cache(
                cfg.num_layers, B * NB + 1, cfg.num_kv_heads, ps,
                cfg.head_dim, B, NB, cache_dtype)
            alloc = paged_kvcache.PageAllocator(B * NB + 1)
            pt = jnp.asarray([alloc.allocate(NB) for _ in range(B)],
                             jnp.int32)
            cache = cache.replace(page_table=pt)
            _, cache = gemma2.forward(cfg, params, ids, pos, cache,
                                      logits_mode="none")
            logits, _ = gemma2.forward(cfg, params, nxt, dpos, cache)
            return np.asarray(logits)

        assert pallas_paged.supports((B, 1, cfg.num_heads, cfg.head_dim), ps)
        got = run()
        monkeypatch.setattr(pallas_paged, "supports", lambda *a: False)
        want = run()
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


class TestGemma3:
    """Gemma-3 (text): gemma2 sandwich norms + per-head QK-norm, NO
    softcaps, explicit per-layer sliding/full pattern with DUAL RoPE
    (local theta on sliding layers)."""

    def _hf(self, layer_types, seed=0):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from llm_inference_tpu.utils import checkpoint
        hf_cfg = transformers.Gemma3TextConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=len(layer_types), num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, rms_norm_eps=1e-6,
            rope_theta=100000.0, rope_local_base_freq=10000.0,
            max_position_embeddings=64, sliding_window=8,
            layer_types=list(layer_types), query_pre_attn_scalar=32,
            tie_word_embeddings=True, pad_token_id=0,
            attention_bias=False, torch_dtype="float32")
        torch.manual_seed(seed)
        hf = transformers.Gemma3ForCausalLM(hf_cfg).eval()
        cfg = checkpoint.model_config_from_hf(hf.config)
        assert cfg.qk_norm and cfg.rope_local_theta == 10000.0
        assert cfg.layer_types == tuple(layer_types)
        cfg = cfg.__class__(**{**cfg.to_dict(), "dtype": "float32"})
        params = checkpoint.convert_hf_state_dict(cfg, hf.state_dict(),
                                                  dtype="float32")
        return hf, cfg, params

    def test_hf_logits_parity_mixed_layers(self):
        torch = pytest.importorskip("torch")
        lt = ["sliding_attention", "sliding_attention", "full_attention",
              "sliding_attention"]
        hf, cfg, params = self._hf(lt)
        rng = np.random.default_rng(2)
        T = 12                                  # beyond the window of 8
        ids = rng.integers(2, 120, (2, T)).astype(np.int64)
        with torch.no_grad():
            want = hf(torch.from_numpy(ids)).logits.numpy()
        cache = kvcache.init_cache(cfg.num_layers, 2, cfg.num_kv_heads,
                                   16, cfg.head_dim, jnp.float32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (2, 1))
        got, _ = gemma2.forward(cfg, params,
                                jnp.asarray(ids, jnp.int32), pos, cache,
                                logits_mode="all")
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-3,
                                   rtol=3e-3)

    def test_greedy_decode_matches_hf(self):
        torch = pytest.importorskip("torch")
        lt = ["sliding_attention", "full_attention"]
        hf, cfg, params = self._hf(lt, seed=3)
        prompt = [3, 17, 42, 9]
        ids = torch.tensor([prompt])
        with torch.no_grad():
            hf_out = hf.generate(ids, max_new_tokens=8, do_sample=False)
        want = hf_out[0, len(prompt):].tolist()
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    prefill_buckets=(8, 16)))
        got = eng.generate([prompt],
                           GenerationConfig(greedy=True, max_new_tokens=8,
                                            eos_token_ids=()))[0].token_ids
        assert got == want, (got, want)


class TestGemma3ConfigFallback:
    def test_layer_types_from_sliding_window_pattern(self):
        """Older gemma3 HF configs carry only sliding_window_pattern: N —
        derive the 5:1 layout instead of silently treating every layer as
        sliding/local-RoPE."""
        from llm_inference_tpu.utils import checkpoint
        cfg = checkpoint.model_config_from_hf({
            "model_type": "gemma3_text", "vocab_size": 128,
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 12, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 16,
            "rope_theta": 1e6, "rope_local_base_freq": 1e4,
            "sliding_window": 512, "sliding_window_pattern": 6})
        assert cfg.layer_types == tuple(
            "full_attention" if (i + 1) % 6 == 0 else "sliding_attention"
            for i in range(12))

    def test_neither_key_raises(self):
        from llm_inference_tpu.utils import checkpoint
        with pytest.raises(ValueError, match="sliding_window_pattern"):
            checkpoint.model_config_from_hf({
                "model_type": "gemma3_text", "vocab_size": 128,
                "hidden_size": 64, "intermediate_size": 128,
                "num_hidden_layers": 12, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": 16,
                "sliding_window": 512})


class TestGemma2FlashPrefill:
    """The traced-window flash kernel must reproduce the jnp prefill path
    (alternating windows + int8 cache) — forced past the size gate."""

    @pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
    def test_flash_prefill_matches_jnp(self, monkeypatch, cache_dtype):
        from llm_inference_tpu.ops.pallas import (flash_attention
                                                  as pallas_flash)
        cfg = tiny_gemma2(hidden_size=128, intermediate_size=256,
                          num_heads=4, num_kv_heads=2, head_dim=64,
                          sliding_window=16)
        params = gemma2.init_params(cfg, jax.random.PRNGKey(3))
        rng = np.random.default_rng(8)
        B, T, S = 2, 64, 128
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        def run():
            cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads,
                                       S, cfg.head_dim, cache_dtype)
            logits, _ = gemma2.forward(cfg, params, ids, pos, cache,
                                       logits_mode="all")
            return np.asarray(logits)

        want = run()                                   # jnp path (gated off)
        monkeypatch.setattr(pallas_flash, "supports", lambda *a: True)
        got = run()
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
        assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() > 0.99


class TestTiedQuantizedHead:
    def test_tied_embed_quantized_lm_head_close(self):
        """quantize_embedding on a TIED model derives a quantized lm_head
        from the table; logits must stay near the bf16 tied path."""
        import numpy as np
        from llm_inference_tpu.config import QuantConfig
        from llm_inference_tpu.models import llama as _llama
        cfg = tiny_gemma2()
        params = gemma2.init_params(cfg, jax.random.PRNGKey(0))
        golden_c = kvcache.init_cache(cfg.num_layers, 2,
                              cfg.num_kv_heads, 32,
                              cfg.head_dim, jnp.float32)
        rng = np.random.default_rng(5)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))
        golden, _ = gemma2.forward(cfg, params, ids, pos, golden_c)

        qp = _llama.quantize_params(
            params, QuantConfig(weights="int8", quantize_embedding=True))
        assert "lm_head" in qp            # derived from the tied table
        qp = _llama.prepare_params(qp, fuse=False, donate=False)
        c2 = kvcache.init_cache(cfg.num_layers, 2, cfg.num_kv_heads,
                        32, cfg.head_dim, jnp.float32)
        got, _ = gemma2.forward(cfg, qp, ids, pos, c2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   atol=0.15, rtol=0.15)
        # argmax-stable on the tiny model
        assert (jnp.argmax(got, -1) == jnp.argmax(golden, -1)).all()
