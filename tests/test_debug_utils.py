"""Debug activation dumps (the reference's SAVE_DATA workflow) and the
profiling op-attribution helper's formatting."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import tiny_llama
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.utils import debug, profiling


class TestActivationDumps:
    def test_dumps_written_and_match_forward(self, tmp_path):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.array([[3, 5, 7]], jnp.int32)
        pos = jnp.arange(3, dtype=jnp.int32)[None]

        def run():
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       16, cfg.head_dim, jnp.float32)
            return llama.forward(cfg, params, ids, pos, cache)[0]

        with debug.dump_activations(str(tmp_path), max_layer=0):
            logits = jax.jit(run)()
            logits.block_until_ready()

        files = sorted(os.listdir(tmp_path))
        assert "embed.npy" in files
        assert "layer000_out.npy" in files
        assert "layer001_out.npy" not in files      # max_layer gate
        assert "logits.npy" in files
        np.testing.assert_allclose(np.load(tmp_path / "logits.npy"),
                                   np.asarray(logits), atol=1e-6)
        emb = np.load(tmp_path / "embed.npy")
        np.testing.assert_allclose(
            emb, np.asarray(params["embed"])[np.asarray(ids[0])][None],
            atol=1e-6)

    def test_noop_outside_scope(self):
        # a tap with no active scope must not insert callbacks / fail
        debug.tap("x", jnp.ones(3))
        debug.tap("y", jnp.ones(3), layer=jnp.int32(1))


class TestProfilingFormat:
    def test_format_op_totals(self):
        s = profiling.format_op_totals(
            {"%fusion.1": (0.5, 10), "%dot.2": (1.5, 3)}, top=5)
        lines = s.splitlines()
        assert "dot.2" in lines[1]        # sorted by total time desc
        assert "fusion.1" in lines[2]
