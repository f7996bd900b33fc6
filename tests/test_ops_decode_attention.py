"""Fused decode-attention Pallas kernel vs the jnp golden model.

(Reference analogue: tests/unittests/test_fused_decoder_attention.cu — GPU
kernel vs scalar CPU golden; here the golden is ops.attention.decode_attend.)
Interpret mode on CPU; compiled-mode coverage comes from bench runs on chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import attention
from llm_inference_tpu.ops.pallas import decode_attention as DA


CASES = [
    # B, Hq, Hkv, S, D     (MHA, GQA, multi-batch, deep-cache)
    (1, 8, 8, 256, 128),
    (2, 8, 2, 256, 128),
    (4, 4, 4, 128, 64),
    (1, 32, 32, 1024, 128),
]


class TestDecodeAttention:
    @pytest.mark.parametrize("B,Hq,Hkv,S,D", CASES)
    def test_matches_golden(self, B, Hq, Hkv, S, D):
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
        pos = jnp.asarray(
            np.random.default_rng(1).integers(1, S - 1, (B,)), jnp.int32)
        assert DA.supports(q.shape, S)
        ref = attention.decode_attend(q, k, v, pos[:, None])
        out = DA.decode_attention(q, k[None], v[None], 0, pos)
        assert out.shape == ref.shape
        # kernel computes the dots on bf16 operands (the production dtype);
        # the f32 golden differs by bf16 rounding
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)

    @pytest.mark.parametrize("strips", [1, 2])
    def test_strip_mode_matches_golden(self, strips, monkeypatch):
        """Opt-in strip processing (LLMI_ATTN_STRIPS=N; a round-5 null
        result kept behind the flag) must stay exact vs the whole-block
        kernel."""
        monkeypatch.setenv("LLMI_ATTN_STRIPS", str(strips))
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        B, Hq, Hkv, S, D = 2, 8, 4, 256, 128
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
        pos = jnp.asarray([100, 37], jnp.int32)
        ref = attention.decode_attend(q, k, v, pos[:, None])
        out = DA.decode_attention(q, k[None], v[None], 0, pos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)

    def test_respects_position_mask(self):
        """Entries beyond `pos` must not contribute."""
        B, Hq, S, D = 1, 4, 128, 64
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hq, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hq, S, D), jnp.float32)
        pos = jnp.array([17], jnp.int32)
        out1 = DA.decode_attention(q, k[None], v[None], 0, pos)
        # poison the cache beyond pos — output must be identical
        k2 = k.at[:, :, 18:].set(1e4)
        v2 = v.at[:, :, 18:].set(-1e4)
        out2 = DA.decode_attention(q, k2[None], v2[None], 0, pos)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_softcap(self):
        B, Hq, S, D = 1, 2, 128, 64
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32) * 3
        k = jax.random.normal(ks[1], (B, Hq, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hq, S, D), jnp.float32)
        pos = jnp.array([100], jnp.int32)
        ref = attention.decode_attend(q, k, v, pos[:, None], logit_softcap=30.0)
        out = DA.decode_attention(q, k[None], v[None], 0, pos, logit_softcap=30.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)

    def test_supports_gating(self):
        assert not DA.supports((1, 2, 4, 32), 128)      # D=32 unsupported
        assert not DA.supports((1, 4, 4, 128), 100)     # S not 128-multiple
        assert not DA.supports((1, 4, 4, 128), 128 * 1024)  # too long


    def test_layer_indexing(self):
        """The kernel must read pages of the requested layer only."""
        L, B, Hq, S, D = 3, 1, 4, 128, 64
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (L, B, Hq, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (L, B, Hq, S, D), jnp.float32)
        pos = jnp.array([60], jnp.int32)
        for l in range(L):
            ref = attention.decode_attend(q, k[l], v[l], pos[:, None])
            out = DA.decode_attention(q, k, v, l, pos)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=4e-3, rtol=2e-2)


class TestWindowedDecode:
    """Sliding-window mode (gemma2's alternating-window layers): the
    kernel masks slots outside (pos-window, pos] AND clamps KV streaming
    to the window's slot blocks."""

    @pytest.mark.parametrize("B,Hq,Hkv,S,D,W", [
        (2, 8, 2, 512, 128, 100),    # window inside one block
        (1, 8, 8, 512, 128, 300),    # window spans blocks
        (2, 4, 4, 256, 64, 4096),    # window larger than cache = global
    ])
    def test_matches_masked_golden(self, B, Hq, Hkv, S, D, W):
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
        pos = jnp.asarray(
            np.random.default_rng(8).integers(S // 2, S - 1, (B,)),
            jnp.int32)
        mask = attention.make_attention_mask(pos[:, None], S,
                                             sliding_window=W)
        ref = attention.attend(q, k, v, mask)
        out = DA.decode_attention(q, k[None], v[None], 0, pos, window=W)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)

    def test_window_excludes_old_slots(self):
        """Slots at or below pos-window must not contribute."""
        B, Hq, S, D, W = 1, 4, 256, 64, 64
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hq, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hq, S, D), jnp.float32)
        pos = jnp.array([200], jnp.int32)
        out1 = DA.decode_attention(q, k[None], v[None], 0, pos, window=W)
        # poison everything outside the window — output must be identical
        k2 = k.at[:, :, :137].set(1e4)    # 200 - 64 + 1 = 137
        v2 = v.at[:, :, :137].set(-1e4)
        out2 = DA.decode_attention(q, k2[None], v2[None], 0, pos, window=W)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_traced_window_int8(self):
        """A traced per-layer window scalar (the gemma2 scan case) over an
        int8 cache — windowed kernel vs the windowed fp path."""
        from llm_inference_tpu.ops import kvcache
        B, Hq, Hkv, S, D, W = 2, 8, 8, 256, 128, 100
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        k_tok = jax.random.normal(ks[1], (B, S - 1, Hkv, D), jnp.float32)
        v_tok = jax.random.normal(ks[2], (B, S - 1, Hkv, D), jnp.float32)
        off = jnp.zeros((B,), jnp.int32)
        pos = jnp.array([180, 230], jnp.int32)

        cq = kvcache.init_cache(1, B, Hkv, S, D, "int8")
        cq = kvcache.update_cache_layer(cq, jnp.int32(0), k_tok, v_tok, off)
        mask = attention.make_attention_mask(pos[:, None], S,
                                             sliding_window=W)
        ref = attention.attend(q, cq.k[0], cq.v[0], mask,
                               k_scale=cq.k_scale[0], v_scale=cq.v_scale[0])

        def run(win):
            return DA.decode_attention(q, cq.k, cq.v, 0, pos, window=win,
                                       k_scale=cq.k_scale,
                                       v_scale=cq.v_scale)
        out = jax.jit(run)(jnp.int32(W))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-3, rtol=2e-2)
