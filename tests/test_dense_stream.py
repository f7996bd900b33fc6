"""Dense-bf16 streaming (bits=16 QTensor) parity.

The column-blocked dense path (quantization.to_blocked_dense →
ops/pallas/quant_matmul bits=16 branch) must reproduce the plain XLA
dense matmul — it is a pure layout change, no quantization anywhere
(VERDICT r3 #4: the dense decode attack).
"""

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import tiny_llama
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.ops.pallas import quant_matmul as QM
from llm_inference_tpu.ops.quantization import (dense_blocked_qtensor,
                                                qmatmul_ref,
                                                to_blocked_dense)


def test_blocked_dense_matmul_matches_dot():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 512), jnp.float32) * 0.02
    qt = to_blocked_dense(w, 128)
    assert qt.bits == 16 and qt.q.shape == (4, 256, 128)
    for M in (1, 4, 200):               # GEMV, small batch, prefill-M
        x = jax.random.normal(key, (M, 256), jnp.bfloat16)
        got = QM.quant_matmul(x, qt)
        want = jnp.dot(x, w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)
        ref = qmatmul_ref(x, qt)
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_blocked_dense_stacked_and_fused_norm():
    """Stacked [L, NB, K, bn] layer indexing + the fused RMSNorm prologue
    (the decode-path form)."""
    key = jax.random.PRNGKey(1)
    L, K, N = 3, 256, 512
    w = jax.random.normal(key, (L, K, N), jnp.float32) * 0.02
    qt = to_blocked_dense(w, 128)
    x = jax.random.normal(key, (1, K), jnp.bfloat16)
    gamma = jnp.ones((K,), jnp.bfloat16) * 1.5
    from llm_inference_tpu.ops import norms
    for lyr in (0, 2):
        got = QM.quant_matmul(x, qt, layer=jnp.int32(lyr),
                              norm_gamma=gamma, norm_eps=1e-5)
        want = jnp.dot(norms.rms_norm(x, gamma, 1e-5),
                       w[lyr].astype(jnp.bfloat16))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_forward_dense_stream_matches_plain():
    """tiny-llama end to end: prepare_params(dense_stream=True) must not
    change decode outputs vs plain dense arrays."""
    cfg = tiny_llama(dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    prepped = llama.prepare_params(
        jax.tree.map(lambda a: a, params), fuse=True, donate=False,
        dense_stream=True)
    qw = [k for k, v in prepped["layers"].items() if hasattr(v, "bits")]
    assert "wqkv" in qw and "w_gateup" in qw     # streaming engaged

    def run(p):
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                   64, cfg.head_dim, jnp.bfloat16)
        ids = jnp.array([[3, 5, 7, 11]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]
        lg, cache = llama.forward(cfg, p, ids, pos, cache)
        outs = [np.asarray(lg)]
        tok = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
        for t in range(3):
            lg, cache = llama.forward(cfg, p, tok,
                                      jnp.full((1, 1), 4 + t, jnp.int32),
                                      cache)
            outs.append(np.asarray(lg))
            tok = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
        return outs

    ref, got = run(params), run(prepped)
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(a, b, atol=0.1, rtol=0.05,
                                   err_msg=f"step {i}")


def test_dense_blocked_qtensor_wrapper():
    q = jnp.zeros((2, 4, 64, 128), jnp.bfloat16)
    qt = dense_blocked_qtensor(q)
    assert qt.bits == 16 and qt.block_n == 128
    assert qt.scale.shape == (2, 4, 1, 128)
