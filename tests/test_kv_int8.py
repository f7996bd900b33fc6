"""INT8 KV cache: write-time quantization, exact scale folding in attention,
and end-to-end decode quality vs the bf16 cache.

New capability vs the reference (whose cache is FP32/FP16 only —
src/models/llama/llama.cpp:77-78); the BASELINE.md north star requires it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import QuantConfig, tiny_llama
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import attention, kvcache
from llm_inference_tpu.ops.pallas import decode_attention as DA


def test_init_quantized_cache():
    c = kvcache.init_cache(2, 3, 4, 16, 8, dtype="int8")
    assert c.quantized
    assert c.k.dtype == jnp.int8 and c.v.dtype == jnp.int8
    assert c.k_scale.shape == (2, 3, 16, 4)       # slot-major [L, B, S, Hkv]


def test_update_writes_codes_and_scales():
    c = kvcache.init_cache(2, 1, 2, 16, 8, dtype="int8")
    k_new = jnp.ones((1, 3, 2, 8), jnp.float32) * 2.5
    v_new = jnp.ones((1, 3, 2, 8), jnp.float32) * -1.25
    c = kvcache.update_cache_layer(c, jnp.int32(1), k_new, v_new,
                                   jnp.array([4], jnp.int32))
    k = np.asarray(c.k); ks = np.asarray(c.k_scale)
    assert np.all(k[1, 0, :, 4:7] == 127)              # 2.5 / (2.5/127)
    np.testing.assert_allclose(ks[1, 0, 4:7, :], 2.5 / 127.0, rtol=1e-6)
    assert np.all(k[0] == 0) and np.all(ks[0] == 0)    # other layer untouched
    v = np.asarray(c.v); vs = np.asarray(c.v_scale)
    np.testing.assert_allclose(
        v[1, 0, :, 4:7].astype(np.float32)
        * vs[1, 0, 4:7, :].T[:, :, None], -1.25, rtol=1e-2)


@pytest.mark.parametrize("use_kernel", [False, True])
def test_attention_with_int8_cache_close_to_fp(use_kernel):
    """Scale folding must reproduce fp attention to int8 rounding error."""
    B, Hq, Hkv, S, D = 2, 8, 4, 128, 128 if use_kernel else 32
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
    k_tok = jax.random.normal(ks[1], (B, S - 1, Hkv, D), jnp.float32)
    v_tok = jax.random.normal(ks[2], (B, S - 1, Hkv, D), jnp.float32)
    off = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), S - 2, jnp.int32)

    cf = kvcache.init_cache(1, B, Hkv, S, D, jnp.float32)
    cf = kvcache.update_cache_layer(cf, jnp.int32(0), k_tok, v_tok, off)
    cq = kvcache.init_cache(1, B, Hkv, S, D, "int8")
    cq = kvcache.update_cache_layer(cq, jnp.int32(0), k_tok, v_tok, off)

    if use_kernel:
        ref = DA.decode_attention(q, cf.k, cf.v, 0, pos)
        out = DA.decode_attention(q, cq.k, cq.v, 0, pos,
                                  k_scale=cq.k_scale, v_scale=cq.v_scale)
    else:
        mask = attention.make_attention_mask(pos[:, None], S)
        ref = attention.attend(q, cf.k[0], cf.v[0], mask)
        out = attention.attend(q, cq.k[0], cq.v[0], mask,
                               k_scale=cq.k_scale[0], v_scale=cq.v_scale[0])
    err = np.abs(np.asarray(ref) - np.asarray(out)).max()
    assert err < 0.05, err            # int8 rounding, not a logic error


def test_forward_decode_int8_cache_close_to_bf16():
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[3, 5, 7, 11]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]

    def run(dtype):
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                                   cfg.head_dim, dtype)
        lg, c = llama.forward(cfg, params, ids, pos, cache)
        lg2, _ = llama.forward(cfg, params, jnp.array([[9]], jnp.int32),
                               jnp.array([[4]], jnp.int32), c)
        return np.asarray(lg), np.asarray(lg2)

    f1, f2 = run(jnp.float32)
    q1, q2 = run("int8")
    # logits stay strongly correlated through quantized cache reads
    assert np.corrcoef(f1.ravel(), q1.ravel())[0, 1] > 0.999
    assert np.corrcoef(f2.ravel(), q2.ravel())[0, 1] > 0.995
