"""Prepared-parameter checkpoint round-trip: bit-identical arrays, identical
QTensor metadata, identical logits after reload."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import QuantConfig, tiny_llama
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.ops.quantization import QTensor
from llm_inference_tpu.utils import quant_checkpoint as qc


def test_roundtrip_identical(tmp_path):
    cfg = tiny_llama(num_kv_heads=2, dtype="bfloat16")
    params = llama.prepare_params(
        llama.quantize_params(
            llama.init_params(cfg, jax.random.PRNGKey(0)),
            QuantConfig(weights="int4", group_size=32)),
        donate=False)
    qc.save_prepared(str(tmp_path / "ckpt"), cfg, params)
    cfg2, params2 = qc.load_prepared(str(tmp_path / "ckpt"))
    assert cfg2 == cfg

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # QTensor static metadata survives (needed for the kernel fast path)
    w1, w2 = params["layers"]["wqkv"], params2["layers"]["wqkv"]
    assert isinstance(w2, QTensor)
    assert (w1.bits, w1.group_size, w1.block_n, w1.block_rows) == \
           (w2.bits, w2.group_size, w2.block_n, w2.block_rows)

    ids = jnp.array([[3, 5, 7]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]

    def run(p):
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                                   cfg.head_dim, jnp.bfloat16)
        return llama.forward(cfg, p, ids, pos, cache)[0]

    np.testing.assert_array_equal(np.asarray(run(params)),
                                  np.asarray(run(params2)))
