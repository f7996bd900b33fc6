"""Multi-LoRA serving (models/lora.py): batched per-row adapters.

No reference analogue — the reference serves one set of dense weights.
The oracle everywhere: runtime batched-LoRA output must equal a forward
through DENSE params with that adapter's A·B merged into the weights."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      QuantConfig, tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.scheduler import (ContinuousBatchingScheduler,
                                                PagedScheduler)
from llm_inference_tpu.models import llama, lora
from llm_inference_tpu.ops import kvcache


CFG = tiny_llama(num_kv_heads=2)
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(0))
STACKS = lora.init_lora_stacks(CFG, rank=4, n_adapters=2,
                               key=jax.random.PRNGKey(9),
                               targets=("wq", "wv", "w_down"))
GEN = GenerationConfig(greedy=True, max_new_tokens=8, eos_token_ids=())


def _engine(params, **kw):
    return InferenceEngine(
        CFG, params,
        engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                max_batch_size=2, prefill_buckets=(8, 16),
                                page_size=8), **kw)


class TestLoraModel:
    def test_mixed_batch_matches_merged_goldens(self):
        """One forward, three rows on three different adapters (0 = base):
        each row equals the merged-weight forward."""
        rng = np.random.default_rng(0)
        B, T, S = 3, 6, 32
        ids = jnp.asarray(rng.integers(2, 200, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        cache = kvcache.init_cache(CFG.num_layers, B, CFG.num_kv_heads, S,
                                   CFG.head_dim, jnp.float32)
        got, _ = llama.forward(CFG, lp, ids, pos, cache,
                               adapter_idx=jnp.asarray([0, 1, 2],
                                                       jnp.int32))
        for row, ad in enumerate([0, 1, 2]):
            mp = lora.merge_into_params(CFG, PARAMS, STACKS, ad)
            c1 = kvcache.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, S,
                                    CFG.head_dim, jnp.float32)
            want, _ = llama.forward(CFG, mp, ids[row:row + 1],
                                    pos[row:row + 1], c1)
            np.testing.assert_allclose(np.asarray(got[row]),
                                       np.asarray(want[0]), atol=2e-3,
                                       rtol=2e-3)

    def test_no_adapter_idx_defaults_to_base(self):
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(2, 200, (1, 5)), jnp.int32)
        pos = jnp.arange(5, dtype=jnp.int32)[None]
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        c = kvcache.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                               CFG.head_dim, jnp.float32)
        got, _ = llama.forward(CFG, lp, ids, pos, c)
        c = kvcache.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                               CFG.head_dim, jnp.float32)
        want, _ = llama.forward(CFG, PARAMS, ids, pos, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestEngineGenerateAdapter:
    def test_generate_with_adapter_matches_merged(self):
        """engine.generate(adapter=...) — the offline/CLI path — equals the
        merged-weight golden, including a mixed per-row [name, None] batch."""
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        eng = _engine(lp, adapter_names=["alpha", "beta"])
        got = eng.generate([[5, 6, 7], [9, 10, 11]], GEN,
                           adapter=["alpha", None])
        want_a = _engine(lora.merge_into_params(
            CFG, PARAMS, STACKS, 1)).generate([[5, 6, 7]], GEN)[0]
        want_b = _engine(PARAMS).generate([[9, 10, 11]], GEN)[0]
        assert got[0].token_ids == want_a.token_ids
        assert got[1].token_ids == want_b.token_ids

    def test_generate_whole_batch_one_adapter(self):
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        eng = _engine(lp, adapter_names=["alpha", "beta"])
        got = eng.generate([[5, 6, 7]], GEN, adapter="beta")[0]
        want = _engine(lora.merge_into_params(
            CFG, PARAMS, STACKS, 2)).generate([[5, 6, 7]], GEN)[0]
        assert got.token_ids == want.token_ids

    def test_generate_adapter_rejected_without_lora(self):
        eng = _engine(PARAMS)
        with pytest.raises(ValueError, match="no LoRA"):
            eng.generate([[5, 6]], GEN, adapter=1)


class TestLoraScheduler:
    def _goldens(self, prompt, adapter):
        mp = lora.merge_into_params(CFG, PARAMS, STACKS, adapter)
        eng = _engine(mp)
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r = sched.submit(list(prompt))
        while sched.step():
            pass
        return r.output_ids

    @pytest.mark.parametrize("paged", [False, True])
    def test_mixed_adapters_one_batch(self, paged):
        """Two requests on different adapters decode in ONE batch and each
        matches its merged-weight solo run."""
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        eng = _engine(lp, adapter_names=["alpha", "beta"])
        cls = PagedScheduler if paged else ContinuousBatchingScheduler
        sched = cls(eng, GEN, slots=2)
        a = sched.submit([5, 6, 7], adapter="alpha")
        b = sched.submit([9, 10, 11], adapter=2)
        while sched.step():
            pass
        assert a.output_ids == self._goldens([5, 6, 7], 1)
        assert b.output_ids == self._goldens([9, 10, 11], 2)

    def test_base_rows_unperturbed(self):
        """A no-adapter request batched with an adapter request produces
        the exact base-model stream."""
        base_eng = _engine(PARAMS)
        s0 = ContinuousBatchingScheduler(base_eng, GEN, slots=2)
        want = s0.submit([3, 4, 5])
        while s0.step():
            pass
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        eng = _engine(lp)
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r = sched.submit([3, 4, 5])                # base
        r2 = sched.submit([9, 10, 11], adapter=1)  # adapter alongside
        while sched.step():
            pass
        assert r.output_ids == want.output_ids

    def test_unknown_adapter_rejected(self):
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        eng = _engine(lp, adapter_names=["alpha"])
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        with pytest.raises(ValueError, match="unknown adapter"):
            sched.submit([5, 6], adapter="nope")
        with pytest.raises(ValueError, match="out of range"):
            sched.submit([5, 6], adapter=7)

    def test_prefix_cache_not_shared_across_adapters(self):
        """Same prompt under two adapters with prefix caching on: the
        second request must NOT reuse the first one's pages (LoRA changes
        the K/V) — its output must still match its own merged golden."""
        prompt = list(range(2, 2 + 24))     # 3 full pages of prefix
        lp = dict(PARAMS)
        lp["lora"] = STACKS
        eng = _engine(lp)
        sched = PagedScheduler(eng, GEN, slots=2, prefix_cache=True)
        a = sched.submit(list(prompt), adapter=1)
        while sched.step():
            pass
        b = sched.submit(list(prompt), adapter=2)
        while sched.step():
            pass
        assert a.output_ids == self._goldens(prompt, 1)
        assert b.output_ids == self._goldens(prompt, 2)
        # and WITHIN an adapter the prefix IS reused (hit → fast path)
        c = sched.submit(list(prompt), adapter=2)
        while sched.step():
            pass
        assert c.output_ids == b.output_ids


class TestLoraQuantizedBase:
    def test_adapters_over_int8_base(self):
        """LoRA deltas apply on top of QUANTIZED base weights (stacked
        QTensor matmuls) — adapters must still steer the output."""
        qp = llama.quantize_params(PARAMS, QuantConfig(weights="int8"))
        qp = llama.prepare_params(qp, fuse=False, donate=False)
        lp = dict(qp)
        lp["lora"] = STACKS
        eng = _engine(lp)
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r1 = sched.submit([5, 6, 7], adapter=1)
        r2 = sched.submit([5, 6, 7], adapter=2)
        while sched.step():
            pass
        assert r1.output_ids != r2.output_ids   # adapters actually bite


class TestPeftLoader:
    def test_peft_round_trip(self, tmp_path):
        """Write a synthetic HF peft checkpoint, load + stack it, and
        check the runtime path against the merged golden."""
        from safetensors.numpy import save_file
        rng = np.random.default_rng(5)
        r, alpha = 4, 8.0
        tensors = {}
        for li in range(CFG.num_layers):
            for proj, ours in [("q_proj", "wq"), ("v_proj", "wv")]:
                d_in, d_out = lora._DIMS[ours](CFG)
                a = rng.normal(size=(r, d_in)).astype(np.float32) * 0.05
                b = rng.normal(size=(d_out, r)).astype(np.float32) * 0.05
                base = (f"base_model.model.model.layers.{li}."
                        f"self_attn.{proj}")
                tensors[f"{base}.lora_A.weight"] = a
                tensors[f"{base}.lora_B.weight"] = b
        save_file(tensors, str(tmp_path / "adapter_model.safetensors"))
        (tmp_path / "adapter_config.json").write_text(
            json.dumps({"r": r, "lora_alpha": alpha}))

        ad, scaling = lora.load_peft_adapter(CFG, str(tmp_path))
        assert scaling == alpha / r
        stacks = lora.stack_adapters(CFG, [ad], scaling=[scaling])
        assert stacks["wq"]["a"].shape == (CFG.num_layers, 2,
                                           CFG.hidden_size, r)
        # runtime vs merged golden
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]
        lp = dict(PARAMS)
        lp["lora"] = stacks
        c = kvcache.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                               CFG.head_dim, jnp.float32)
        got, _ = llama.forward(CFG, lp, ids, pos, c,
                               adapter_idx=jnp.asarray([1], jnp.int32))
        mp = lora.merge_into_params(CFG, PARAMS, stacks, 1)
        c = kvcache.init_cache(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                               CFG.head_dim, jnp.float32)
        want, _ = llama.forward(CFG, mp, ids, pos, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)


class TestPeftLoaderRobustness:
    def _write(self, tmp_path, tensors, r=4, alpha=8):
        import json as _json
        import os
        from safetensors.numpy import save_file
        d = str(tmp_path / "peft")
        os.makedirs(d, exist_ok=True)
        save_file(tensors, os.path.join(d, "adapter_model.safetensors"))
        _json.dump({"lora_alpha": alpha, "r": r},
                   open(os.path.join(d, "adapter_config.json"), "w"))
        return d

    def test_non_layer_keys_skipped(self, tmp_path):
        """modules_to_save entries (lm_head etc.) must be skipped, not
        crash the 'layers' index lookup."""
        r, H = 4, CFG.hidden_size
        qd = CFG.num_heads * CFG.head_dim
        t = {"base_model.model.lm_head.weight":
             np.zeros((8, H), np.float32)}
        for i in range(CFG.num_layers):
            t[f"base_model.model.model.layers.{i}.self_attn.q_proj."
              f"lora_A.weight"] = np.ones((r, H), np.float32)
            t[f"base_model.model.model.layers.{i}.self_attn.q_proj."
              f"lora_B.weight"] = np.ones((qd, r), np.float32)
        d = self._write(tmp_path, t, r)
        ad, sc = lora.load_peft_adapter(CFG, d)
        assert "wq" in ad and ad["wq"][0].shape[0] == CFG.num_layers

    def test_partial_layer_adapter_zero_fills(self, tmp_path):
        """layers_to_transform-style adapters (only some layers trained)
        zero-fill the untouched layers (identity contribution)."""
        r, H = 4, CFG.hidden_size
        qd = CFG.num_heads * CFG.head_dim
        t = {"base_model.model.model.layers.0.self_attn.q_proj."
             "lora_A.weight": np.ones((r, H), np.float32),
             "base_model.model.model.layers.0.self_attn.q_proj."
             "lora_B.weight": np.ones((qd, r), np.float32)}
        d = self._write(tmp_path, t, r)
        ad, sc = lora.load_peft_adapter(CFG, d)
        a, b = ad["wq"]
        assert a.shape == (CFG.num_layers, H, r)
        assert np.abs(a[0]).sum() > 0
        assert np.abs(a[1:]).sum() == 0 and np.abs(b[1:]).sum() == 0


class TestLoraTP:
    """LoRA under tensor parallelism (parallel/sharding lora spec rules):
    col-target b shards d_out, row-target a shards d_in; deltas complete
    inside the layer psum. Oracle: the single-device merged-weight
    forward."""

    def test_tp_mixed_batch_matches_merged(self):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import (make_mesh, shard_cache,
                                                shard_params,
                                                sharded_forward)
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(3))
        stacks = lora.init_lora_stacks(cfg, rank=4, n_adapters=2,
                                       key=jax.random.PRNGKey(11),
                                       targets=("wq", "wv", "w_down", "wo"))
        rng = np.random.default_rng(5)
        B, T, S = 2, 6, 32
        ids = jnp.asarray(rng.integers(2, 200, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        aidx = jnp.asarray([1, 2], jnp.int32)

        # golden rows: merged dense params per adapter, single device
        want = []
        for row, ad in enumerate([1, 2]):
            mp = lora.merge_into_params(cfg, params, stacks, ad)
            cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads,
                                       S, cfg.head_dim, jnp.float32)
            logits, _ = llama.forward(cfg, mp, ids, pos, cache)
            want.append(np.asarray(logits[row]))

        mesh = make_mesh(ShardingConfig(data=1, tensor=2))
        lp = dict(params)
        lp["lora"] = stacks
        sparams = shard_params(lp, mesh)
        cache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, S,
                               cfg.head_dim, jnp.float32), mesh)
        fwd = sharded_forward(cfg, mesh, sparams)
        last = jnp.full((B,), T - 1, jnp.int32)
        got, _ = fwd(sparams, ids, pos, cache, last, aidx)
        for row in range(B):
            np.testing.assert_allclose(np.asarray(got[row]), want[row],
                                       atol=2e-3, rtol=2e-3)

    def test_tp_engine_generate_with_adapter(self):
        """End-to-end TP engine: per-request adapters through generate()."""
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(3))
        stacks = lora.init_lora_stacks(cfg, rank=4, n_adapters=1,
                                       key=jax.random.PRNGKey(12),
                                       targets=("wq", "w_down"))
        lp = dict(params)
        lp["lora"] = stacks
        mesh = make_mesh(ShardingConfig(data=1, tensor=2))
        eng = InferenceEngine(
            cfg, lp, mesh=mesh, adapter_names=["ad1"],
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16)))
        want_eng = _engine(lora.merge_into_params(cfg, params, stacks, 1))
        want = want_eng.generate([[5, 6, 7]], GEN)[0].token_ids
        got = eng.generate([[5, 6, 7]], GEN, adapter="ad1")[0].token_ids
        assert got == want
        # base rows still work (slot 0)
        base_want = _engine(params).generate([[5, 6, 7]], GEN)[0].token_ids
        base_got = eng.generate([[5, 6, 7]], GEN)[0].token_ids
        assert base_got == base_want


class TestEmbedTP:
    def test_embed_tp_matches_single_device(self):
        from llm_inference_tpu.config import ShardingConfig
        from llm_inference_tpu.parallel import make_mesh
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(4))
        ecfg = EngineConfig(max_seq_len=64, decode_chunk=4,
                            max_batch_size=4, prefill_buckets=(8, 16))
        single = InferenceEngine(cfg, params, engine_cfg=ecfg)
        mesh = make_mesh(ShardingConfig(data=2, tensor=2))
        shard = InferenceEngine(cfg, params, mesh=mesh, engine_cfg=ecfg)
        prompts = [[5, 6, 7], [9, 10, 11, 12, 13], [2, 3]]  # 3 rows: dp pad
        for pooling in ("last", "mean"):
            want = single.embed(prompts, pooling=pooling)
            got = shard.embed(prompts, pooling=pooling)
            assert len(got) == len(prompts)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-4)
