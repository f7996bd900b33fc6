"""Whole-layer decode megakernel (ops/pallas/layer_fused.py) parity.

The megakernel must reproduce the split-kernel decode path (fused-norm qkv
GEMV → XLA rope → fused KV write → decode-attention kernel → layer-tail
megakernel) bit-for-nearly-bit: same quantized weights, same int8 KV cache
semantics, same pair-carry outputs. Runs in interpret mode on CPU like
every Pallas kernel test (reference test strategy: SURVEY.md §4).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import QuantConfig, tiny_llama
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.ops.quantization import to_blocked_npair


def _mega_cfg(**kw):
    # D must be 128 for the megakernel; G = Hq/Hkv varies per test
    defaults = dict(hidden_size=256, intermediate_size=512, num_layers=2,
                    num_heads=4, num_kv_heads=2, head_dim=128,
                    vocab_size=128, max_position_embeddings=512,
                    dtype="bfloat16")
    defaults.update(kw)
    return tiny_llama(**defaults)


def _npair_params(cfg, seed=0, gs=64, bits="int4"):
    from llm_inference_tpu.ops.quantization import to_blocked
    params = llama.init_params(cfg, jax.random.PRNGKey(seed),
                               dtype=jnp.float32)
    q = llama.quantize_params(params, QuantConfig(weights=bits,
                                                  group_size=gs))
    q = llama.fuse_params(q)
    layers = dict(q["layers"])
    for name in ("wqkv", "wo", "w_gateup", "w_down"):
        if bits == "int4":
            layers[name] = to_blocked_npair(layers[name], 256)
        else:
            layers[name] = to_blocked(layers[name], 256)
    q["layers"] = layers
    return q


def _run_decode(cfg, params, cache, steps=2, mega=True):
    # decode a FIXED token sequence (not greedy feedback): with random
    # dummy weights the top-2 logits routinely tie at bf16 precision, and
    # a tie broken differently between the two numerically-inequal paths
    # would fork the cache history and fail the comparison spuriously
    os.environ["LLMI_LAYER_MEGA"] = "1" if mega else "0"
    try:
        ids = jnp.array([[3, 5, 7, 11]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]
        logits, cache = llama.forward(cfg, params, ids, pos, cache)
        outs = [np.asarray(logits)]
        for t in range(steps):
            tok = jnp.full((1, 1), 17 + 3 * t, jnp.int32)
            p = jnp.full((1, 1), 4 + t, jnp.int32)
            logits, cache = llama.forward(cfg, params, tok, p, cache)
            outs.append(np.asarray(logits))
        return outs, cache
    finally:
        os.environ.pop("LLMI_LAYER_MEGA", None)


@pytest.mark.parametrize("kv_heads,bits,kv,gs", [
    (2, "int4", "int8", 64),     # GQA, the secondary-bench config
    (4, "int4", "int8", 64),     # MHA (the 7B shape)
    (4, "int8", "bf16", 0),      # the headline config: int8 pc + bf16 KV
    (4, "int8", "int8", 64),     # int8 grouped + int8 KV
])
def test_megakernel_matches_split_path(kv_heads, bits, kv, gs):
    cfg = _mega_cfg(num_kv_heads=kv_heads)
    params = _npair_params(cfg, bits=bits, gs=gs)

    def fresh():
        # S=128 (one sb block) keeps interpret-mode wall time down —
        # multi-block streaming is covered by
        # test_megakernel_multi_position_history
        return kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                  128, cfg.head_dim,
                                  "int8" if kv == "int8" else jnp.bfloat16)

    ref, cache_ref = _run_decode(cfg, params, fresh(), mega=False)
    out, cache_out = _run_decode(cfg, params, fresh(), mega=True)
    for i, (a, b) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(a, b, atol=0.15, rtol=0.05,
                                   err_msg=f"step {i}")
    # cache contents must agree where written (codes within ±2 from
    # bf16-dot rounding differences in the qkv GEMV)
    kref = np.asarray(cache_ref.k, np.float32)
    kout = np.asarray(cache_out.k, np.float32)
    if kv == "int8":
        assert np.abs(kref - kout).max() <= 2
        np.testing.assert_allclose(np.asarray(cache_ref.k_scale),
                                   np.asarray(cache_out.k_scale),
                                   atol=1e-3, rtol=0.05)
    else:
        np.testing.assert_allclose(kout, kref, atol=3e-2, rtol=3e-2)


def test_megakernel_multi_position_history():
    """Longer history: several decode steps deep so the attention phase
    streams multiple slot blocks (S=256 → sb=128, nS crosses 1→2)."""
    cfg = _mega_cfg(num_kv_heads=2, num_layers=1)
    params = _npair_params(cfg, seed=1)

    def fresh():
        return kvcache.init_cache(1, 1, 2, 256, 128, "int8")

    # long prefill pushes pos past one sb block
    ids = jnp.arange(20, dtype=jnp.int32)[None] % cfg.vocab_size
    pos = jnp.arange(20, dtype=jnp.int32)[None]

    def run(mega):
        os.environ["LLMI_LAYER_MEGA"] = "1" if mega else "0"
        try:
            cache = fresh()
            logits, cache = llama.forward(cfg, params, ids, pos, cache)
            outs = []
            for t in range(130, 132):          # fake deep positions
                tok = jnp.full((1, 1), t % 19 + 2, jnp.int32)  # fixed seq
                p = jnp.full((1, 1), t, jnp.int32)
                logits, cache = llama.forward(cfg, params, tok, p, cache)
                outs.append(np.asarray(logits))
            return outs
        finally:
            os.environ.pop("LLMI_LAYER_MEGA", None)

    ref, out = run(False), run(True)
    for i, (a, b) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(a, b, atol=0.15, rtol=0.05,
                                   err_msg=f"step {i}")


def test_megakernel_fallbacks():
    """Unsupported configs must return None (split path used) and still
    produce correct results: batch > 1, bf16 cache, D != 128."""
    from llm_inference_tpu.ops.pallas import layer_fused
    cfg = _mega_cfg()
    params = _npair_params(cfg)
    qw = {k: v for k, v in params["layers"].items()
          if hasattr(v, "q")}
    lp = {k: v for k, v in params["layers"].items()
          if not hasattr(v, "q")}
    lp1 = jax.tree.map(lambda a: a[0], lp)
    cos, sin = (jnp.ones((64, 128), jnp.float32),) * 2
    h = jnp.zeros((1, 1, 256), jnp.bfloat16)
    posn = jnp.array([[5]], jnp.int32)

    int4kv = kvcache.init_cache(2, 1, 2, 256, 128, "int4")  # packed KV
    assert layer_fused.layer_decode_fused(
        cfg, h, h, lp1, qw, int4kv, 0, posn, cos, sin) is None

    int8 = kvcache.init_cache(2, 2, 2, 256, 128, "int8")  # batch 2
    h2 = jnp.zeros((2, 1, 256), jnp.bfloat16)
    assert layer_fused.layer_decode_fused(
        cfg, h2, h2, lp1, qw, int8, 0, posn, cos, sin) is None
