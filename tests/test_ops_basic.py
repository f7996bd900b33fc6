"""Golden tests for elementwise/norm/rope/activation ops.

Same methodology as the reference's per-kernel CPU-golden tests
(reference: tests/unittests/test_rmsnorm.cu:33-65 — scalar CPU model,
abs tolerance ~1e-6 fp32), expressed against numpy oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import activations, embedding, norms, rope


class TestEmbedding:
    def test_lookup(self):
        table = np.random.randn(64, 16).astype(np.float32)
        ids = np.array([[0, 5, 63], [1, 1, 2]], dtype=np.int32)
        out = embedding.embedding_lookup(jnp.asarray(table), jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(out), table[ids], atol=0)


class TestRMSNorm:
    def _golden(self, x, w, eps):
        var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
        return (x / np.sqrt(var + eps)) * w

    def test_rms_norm_fp32(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 7, 128)).astype(np.float32)
        w = rng.standard_normal(128).astype(np.float32)
        out = norms.rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5)
        np.testing.assert_allclose(np.asarray(out), self._golden(x, w, 1e-5),
                                   atol=1e-5, rtol=1e-5)

    def test_add_residual_rms_norm(self):
        rng = np.random.default_rng(1)
        r = rng.standard_normal((2, 3, 64)).astype(np.float32)
        x = rng.standard_normal((2, 3, 64)).astype(np.float32)
        w = rng.standard_normal(64).astype(np.float32)
        normed, new_r = norms.add_residual_rms_norm(
            jnp.asarray(r), jnp.asarray(x), jnp.asarray(w), 1e-5)
        np.testing.assert_allclose(np.asarray(new_r), r + x, atol=1e-6)
        np.testing.assert_allclose(np.asarray(normed),
                                   self._golden(r + x, w, 1e-5),
                                   atol=1e-5, rtol=1e-5)


class TestRoPE:
    def _hf_rope(self, x, positions, theta, dim):
        """Independent numpy oracle of the HF rotate-half convention."""
        inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2) / dim))
        freqs = positions[..., None] * inv_freq          # [B, S, d/2]
        emb = np.concatenate([freqs, freqs], axis=-1)    # [B, S, d]
        cos, sin = np.cos(emb)[:, :, None, :], np.sin(emb)[:, :, None, :]
        half = dim // 2
        rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * cos + rot * sin

    def test_apply_rope_matches_hf_convention(self):
        rng = np.random.default_rng(2)
        B, S, H, D = 2, 5, 3, 8
        x = rng.standard_normal((B, S, H, D)).astype(np.float32)
        positions = np.array([[0, 1, 2, 3, 4], [10, 11, 12, 13, 14]],
                             dtype=np.int32)
        cos, sin = rope.make_rope_table(32, D, theta=10000.0)
        out = rope.apply_rope(jnp.asarray(x), jnp.asarray(positions), cos, sin)
        golden = self._hf_rope(x, positions.astype(np.float64), 10000.0, D)
        np.testing.assert_allclose(np.asarray(out), golden, atol=1e-4, rtol=1e-4)

    def test_rope_position_shift_equivariance(self):
        # rotating q and k by the same extra offset preserves q·k
        rng = np.random.default_rng(3)
        D = 16
        cos, sin = rope.make_rope_table(128, D)
        q = rng.standard_normal((1, 1, 1, D)).astype(np.float32)
        k = rng.standard_normal((1, 1, 1, D)).astype(np.float32)

        def dot_at(pq, pk):
            qq = rope.apply_rope(jnp.asarray(q), jnp.full((1, 1), pq, jnp.int32), cos, sin)
            kk = rope.apply_rope(jnp.asarray(k), jnp.full((1, 1), pk, jnp.int32), cos, sin)
            return float(jnp.sum(qq * kk))

        assert dot_at(7, 3) == pytest.approx(dot_at(27, 23), abs=1e-4)

    def test_linear_scaling(self):
        D = 8
        cos1, sin1 = rope.make_rope_table(64, D)
        cos2, sin2 = rope.make_rope_table(64, D,
                                          scaling={"type": "linear", "factor": 2.0})
        # position 2p with scaling factor 2 == position p unscaled
        np.testing.assert_allclose(np.asarray(cos2[10]), np.asarray(cos1[5]),
                                   atol=1e-6)


class TestSwiGLU:
    def test_swiglu(self):
        rng = np.random.default_rng(4)
        gate = rng.standard_normal((3, 8)).astype(np.float32)
        up = rng.standard_normal((3, 8)).astype(np.float32)
        fused = np.concatenate([gate, up], axis=-1)
        out = activations.swiglu(jnp.asarray(fused))
        golden = gate / (1 + np.exp(-gate)) * up
        np.testing.assert_allclose(np.asarray(out), golden, atol=1e-5, rtol=1e-5)
        out2 = activations.swiglu_split(jnp.asarray(gate), jnp.asarray(up))
        np.testing.assert_allclose(np.asarray(out2), golden, atol=1e-5, rtol=1e-5)
