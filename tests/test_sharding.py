"""Multi-device tests on the 8-virtual-CPU-device mesh: tensor + data
parallel forward must reproduce the single-device logits exactly (same math,
different placement). This is the test the reference never needed — it has
no distributed code at all (SURVEY §2.12)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from llm_inference_tpu.config import tiny_llama, QuantConfig, ShardingConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.parallel import (
    make_mesh, param_pspecs, shard_cache, shard_params, sharded_forward)


@pytest.fixture(scope="module")
def cfg():
    # kv_heads=4 so tp=4 divides it
    return tiny_llama(num_kv_heads=4)


@pytest.fixture(scope="module")
def params(cfg):
    return llama.init_params(cfg, jax.random.PRNGKey(0))


def run_single(cfg, params, ids, pos, max_seq=32):
    cache = kvcache.init_cache(cfg.num_layers, ids.shape[0],
                               cfg.num_kv_heads, max_seq, cfg.head_dim,
                               jnp.float32)
    logits, _ = llama.forward(cfg, params, ids, pos, cache)
    return np.asarray(logits)


def run_sharded(cfg, params, ids, pos, dp, tp, max_seq=32):
    mesh = make_mesh(ShardingConfig(data=dp, tensor=tp))
    sparams = shard_params(params, mesh)
    cache = shard_cache(
        kvcache.init_cache(cfg.num_layers, ids.shape[0], cfg.num_kv_heads,
                           max_seq, cfg.head_dim, jnp.float32), mesh)
    fwd = sharded_forward(cfg, mesh, sparams)
    last = jnp.full((ids.shape[0],), ids.shape[1] - 1, jnp.int32)
    logits, cache2 = fwd(sparams, ids, pos, cache, last)
    return np.asarray(logits), cache2


@pytest.mark.parametrize("dp,tp", [(1, 2), (1, 4), (2, 2), (2, 1), (4, 2)])
class TestShardedForwardParity:
    def test_matches_single_device(self, cfg, params, dp, tp):
        rng = np.random.default_rng(0)
        B, T = max(dp, 2) if dp > 1 else 2, 6
        B = dp * 2  # divisible by dp
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        golden = run_single(cfg, params, ids, pos)
        out, _ = run_sharded(cfg, params, ids, pos, dp, tp)
        np.testing.assert_allclose(out, golden, atol=2e-4, rtol=2e-4)


class TestQuantizedSharded:
    @pytest.mark.parametrize("weights,gs", [("int8", 0), ("int8", 32),
                                            ("int4", 32)])
    def test_quantized_tp_matches_unsharded_quantized(self, cfg, params,
                                                      weights, gs):
        tp = 2
        qcfg = QuantConfig(weights=weights, group_size=gs)
        qparams = llama.quantize_params(params, qcfg, row_shards=tp)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))
        golden = run_single(cfg, qparams, ids, pos)
        out, _ = run_sharded(cfg, qparams, ids, pos, 1, tp)
        np.testing.assert_allclose(out, golden, atol=5e-3, rtol=5e-3)


class TestNpairSharded:
    def test_tp_int4_npair_parity(self):
        """INT4 N-pair blocked layout under TP: the paired columns
        (j, j + bn/2) are block-local and bn divides the shard-local output
        dim, so NB-axis column shards and unpacked-K row shards are both
        self-contained. Parity vs the single-device npair forward on the
        SAME quantized values."""
        cfg = tiny_llama(num_kv_heads=4, num_heads=8, head_dim=64,
                         hidden_size=512, intermediate_size=512,
                         vocab_size=512)
        tp = 2
        params = llama.init_params(cfg, jax.random.PRNGKey(7))
        qcfg = QuantConfig(weights="int4", group_size=32)
        qparams = llama.quantize_params(params, qcfg, row_shards=tp)

        golden_p = llama.prepare_params(qparams, donate=False)
        # the single-device layout must itself be npair for this to compare
        # like against like
        assert golden_p["layers"]["wqkv"].pack_axis == "n"

        prep = llama.prepare_params(qparams, tp_size=tp, donate=False)
        # TP layout keeps the npair packing (the ungated path under test)
        assert prep["layers"]["wqkv"].pack_axis == "n"
        assert prep["layers"]["w_gateup"].pack_axis == "n"
        assert prep["layers"]["w_down"].pack_axis == "n"

        rng = np.random.default_rng(8)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))
        golden = run_single(cfg, golden_p, ids, pos)
        out, _ = run_sharded(cfg, prep, ids, pos, 1, tp)
        # tolerance: bf16 matmul-output rounding + psum reduction-order
        # noise at hidden=512 measures ~7e-3 max for the PLAIN blocked
        # layout too — this is not npair-specific
        np.testing.assert_allclose(out, golden, atol=2e-2, rtol=2e-2)

    def test_tp_dense_stream_parity(self):
        """Dense-bf16 streaming (bits=16 blocked QTensors, round 4) under
        TP: the structural pspec rules shard q on NB (col) / K rows (row)
        and replicate the ones-scales; forward must match the plain dense
        sharded path."""
        cfg = tiny_llama(num_kv_heads=4, num_heads=8, head_dim=64,
                         hidden_size=512, intermediate_size=512,
                         vocab_size=512, dtype="bfloat16")
        tp = 2
        params = llama.init_params(cfg, jax.random.PRNGKey(11))
        plain = llama.fuse_params(
            jax.tree.map(lambda a: a, params), tp_size=tp)
        stream = llama.prepare_params(
            jax.tree.map(lambda a: a, params), tp_size=tp, donate=False,
            dense_stream=True)
        assert getattr(stream["layers"]["wqkv"], "bits", 0) == 16

        rng = np.random.default_rng(12)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)),
                          jnp.int32)
        pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))
        want, _ = run_sharded(cfg, plain, ids, pos, 1, tp)
        got, _ = run_sharded(cfg, stream, ids, pos, 1, tp)
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


class TestDecodeSharded:
    def test_prefill_then_decode_sharded(self, cfg, params):
        """Sharded prefill + sharded decode step match the single-device
        incremental path."""
        mesh = make_mesh(ShardingConfig(data=2, tensor=4))
        sparams = shard_params(params, mesh)
        rng = np.random.default_rng(2)
        B, T = 2, 4
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

        cache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, jnp.float32), mesh)
        fwd = sharded_forward(cfg, mesh, sparams)
        last = jnp.full((B,), T - 1, jnp.int32)
        logits, cache = fwd(sparams, ids, pos, cache, last)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        pos1 = jnp.full((B, 1), T, jnp.int32)
        logits1, cache = fwd(sparams, nxt, pos1, cache,
                             jnp.zeros((B,), jnp.int32))

        # single-device golden
        c0 = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                cfg.head_dim, jnp.float32)
        g0, c0 = llama.forward(cfg, params, ids, pos, c0)
        gn = jnp.argmax(g0, -1).astype(jnp.int32)[:, None]
        g1, _ = llama.forward(cfg, params, gn, pos1, c0)
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(gn))
        np.testing.assert_allclose(np.asarray(logits1), np.asarray(g1),
                                   atol=2e-4, rtol=2e-4)


class TestTPPaddingAndPreparedTP:
    def test_padded_prepared_tp_matches_unsharded(self):
        """The full TP serving pipeline — pad → quantize → fuse → block →
        shard — must reproduce the plain unpadded quantized forward. Uses
        dims that do NOT split into 128-lane shards (like 7B's I=11008) so
        the padding actually engages."""
        cfg = tiny_llama(num_kv_heads=4, intermediate_size=320,
                         vocab_size=272)
        tp = 2
        params = llama.init_params(cfg, jax.random.PRNGKey(3))
        qcfg = QuantConfig(weights="int8")

        golden_p = llama.prepare_params(
            llama.quantize_params(params, qcfg), donate=False)
        rng = np.random.default_rng(4)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
        pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))
        golden = run_single(cfg, golden_p, ids, pos)
        assert golden.shape[-1] == cfg.vocab_size

        padded = llama.pad_params_for_tp(params, cfg, tp)
        assert padded["layers"]["w_gate"].shape[-1] == 512   # 320 → 2·256
        assert padded["embed"].shape[0] == 512               # 272 → 2·256
        prep = llama.prepare_params(
            llama.quantize_params(padded, qcfg, row_shards=tp),
            tp_size=tp, donate=False)
        out, _ = run_sharded(cfg, prep, ids, pos, 1, tp)
        assert out.shape[-1] == cfg.vocab_size
        np.testing.assert_allclose(out, golden, atol=5e-3, rtol=5e-3)

    def test_padding_noop_when_aligned(self, cfg, params):
        assert llama.pad_params_for_tp(params, cfg, 1) is params


class TestSpecs:
    def test_pspec_assignment(self, cfg, params):
        mesh = make_mesh(ShardingConfig(data=1, tensor=2))
        specs = param_pspecs(params, mesh)
        assert specs["embed"] == P("tensor", None)
        assert specs["lm_head"] == P(None, "tensor")
        lay = specs["layers"]
        assert lay["wq"] == P(None, None, "tensor")
        assert lay["wo"] == P(None, "tensor", None)
        assert lay["w_down"] == P(None, "tensor", None)
        assert lay["attn_norm"] == P(None, None)

    def test_quantized_pspecs(self, cfg, params):
        mesh = make_mesh(ShardingConfig(data=1, tensor=2))
        qparams = llama.quantize_params(
            params, QuantConfig(weights="int8", group_size=32), row_shards=2)
        specs = param_pspecs(qparams, mesh)
        wo = specs["layers"]["wo"]
        assert wo.q == P(None, "tensor", None)
        assert wo.scale == P(None, "tensor", None)  # groupwise, divisible
        wq = specs["layers"]["wq"]
        assert wq.q == P(None, None, "tensor")
        assert wq.scale == P(None, None, "tensor")


class TestShardedScore:
    """engine.score over a mesh must match the single-device scores."""

    @pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2)])
    def test_score_parity(self, cfg, params, dp, tp):
        from llm_inference_tpu.config import EngineConfig
        from llm_inference_tpu.engine.engine import InferenceEngine
        ecfg = EngineConfig(max_seq_len=32, decode_chunk=2,
                            prefill_buckets=(8, 16))
        single = InferenceEngine(cfg, params, engine_cfg=ecfg)
        prompts = [[3, 7, 11, 5], [9, 2, 4]]
        want = single.score(prompts)

        mesh = make_mesh(ShardingConfig(data=dp, tensor=tp))
        sparams = shard_params(llama.pad_params_for_tp(params, cfg, tp),
                               mesh) if tp > 1 else shard_params(params,
                                                                 mesh)
        eng = InferenceEngine(cfg, sparams, engine_cfg=ecfg, mesh=mesh)
        got = eng.score(prompts)          # 2 rows over dp=2 → exact fit
        for w, g in zip(want, got):
            assert g[0] is None and len(g) == len(w)
            np.testing.assert_allclose(g[1:], w[1:], rtol=2e-3, atol=2e-3)

    def test_score_pads_to_data_axis(self, cfg, params):
        """A single prompt on a dp=2 mesh pads the batch internally."""
        from llm_inference_tpu.config import EngineConfig
        from llm_inference_tpu.engine.engine import InferenceEngine
        ecfg = EngineConfig(max_seq_len=32, decode_chunk=2,
                            prefill_buckets=(8, 16))
        single = InferenceEngine(cfg, params, engine_cfg=ecfg)
        want = single.score([[3, 7, 11, 5]])[0]
        mesh = make_mesh(ShardingConfig(data=2, tensor=1))
        eng = InferenceEngine(cfg, shard_params(params, mesh),
                              engine_cfg=ecfg, mesh=mesh)
        got = eng.score([[3, 7, 11, 5]])
        assert len(got) == 1
        np.testing.assert_allclose(got[0][1:], want[1:], rtol=2e-3,
                                   atol=2e-3)


class TestGroupScaleShardGuard:
    def test_non_divisible_group_count_raises(self, cfg, params):
        """Row-sharded grouped quant scales whose group count does not
        divide tp must RAISE — replicating them makes the shard-local
        matmul derive wrong group boundaries (silent corruption)."""
        from llm_inference_tpu.config import QuantConfig
        # cfg hidden=128: w_down is [I=352->?]: use llama tiny defaults —
        # craft a weight with 3 groups and tp=2
        qp = llama.quantize_params(
            params, QuantConfig(weights="int8", group_size=0))
        mesh = make_mesh(ShardingConfig(data=1, tensor=2))
        param_pspecs(qp, mesh)        # per-channel (1 group): fine
        import jax.numpy as jnp
        from llm_inference_tpu.ops.quantization import QTensor
        bad = dict(qp)
        layers = dict(bad["layers"])
        wd = layers["w_down"]
        # forge a 3-group scale (3 % tp=2 != 0)
        layers["w_down"] = QTensor(
            q=wd.q, scale=jnp.ones((wd.scale.shape[0], 3,
                                    wd.scale.shape[-1]), jnp.float32),
            bits=wd.bits, group_size=0, orig_dtype=wd.orig_dtype,
            block_rows=wd.block_rows)
        bad["layers"] = layers
        with pytest.raises(ValueError, match="quant groups"):
            param_pspecs(bad, mesh)


class TestQuantizedCacheSharded:
    """shard_cache / sharded_forward over QUANTIZED caches: the spec
    pytrees must carry the cache's static `bits` field (a default-bits
    spec tree is structurally incompatible and device_put rejects it —
    regression: the int8+TP path broke when bits was introduced)."""

    @pytest.mark.parametrize("kvdtype", ["int8", "int4"])
    def test_prefill_decode_quantized_cache(self, cfg, params, kvdtype):
        from llm_inference_tpu.parallel.sharding import sharded_forward \
            as _sf
        mesh = make_mesh(ShardingConfig(data=2, tensor=4))
        sparams = shard_params(params, mesh)
        rng = np.random.default_rng(7)
        B, T = 2, 4
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        bits = {"int8": 8, "int4": 4}[kvdtype]
        cache = shard_cache(
            kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                               cfg.head_dim, kvdtype), mesh)
        fwd = _sf(cfg, mesh, sparams, cache_bits=bits)
        last = jnp.full((B,), T - 1, jnp.int32)
        logits, cache = fwd(sparams, ids, pos, cache, last)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        logits1, cache = fwd(sparams, nxt, jnp.full((B, 1), T, jnp.int32),
                             cache, jnp.zeros((B,), jnp.int32))

        # golden (single device; forward returns last-token logits [B, V])
        c0 = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, 32,
                                cfg.head_dim, kvdtype)
        g0, c0 = llama.forward(cfg, params, ids, pos, c0)
        gn = jnp.argmax(g0, -1).astype(jnp.int32)[:, None]
        g1, _ = llama.forward(cfg, params, gn,
                              jnp.full((B, 1), T, jnp.int32), c0)
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(gn))
        np.testing.assert_allclose(np.asarray(logits1), np.asarray(g1),
                                   atol=5e-3, rtol=5e-3)
