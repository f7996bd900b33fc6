"""Pallas batched KV-write kernel (ops/pallas/kv_write.py) vs the DUS-chain
golden — bf16, int8 (codes + slot-major scales), int4-packed, at per-sequence
mixed offsets including non-sublane-aligned ones.

Reference analogue: the decode half of launchConcatKVCache (reference:
src/kernels/concat_past_kv.cu:17-145); the chain it replaces is
ops.kvcache._write_pages' prefill path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.ops.pallas import kv_write


def _dus_golden(k_all, v_all, layer, k_new, v_new, offsets):
    B = k_new.shape[0]
    zero = jnp.int32(0)
    for b in range(B):
        idx = (layer, jnp.int32(b), zero, offsets[b], zero)
        k_all = jax.lax.dynamic_update_slice(k_all, k_new[b][None, None], idx)
        v_all = jax.lax.dynamic_update_slice(v_all, v_new[b][None, None], idx)
    return k_all, v_all


@pytest.mark.parametrize("dtype,dc", [(jnp.bfloat16, 16), (jnp.int8, 16),
                                      (jnp.int8, 8)])  # dc=8 ≈ packed int4
def test_write_token_matches_dus(dtype, dc):
    L, B, H, S = 3, 5, 4, 64
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        k_all = jax.random.randint(key, (L, B, H, S, dc), -128, 128,
                                   jnp.int32).astype(jnp.int8)
        k_new = jax.random.randint(key, (B, H, 1, dc), -128, 128,
                                   jnp.int32).astype(jnp.int8)
    else:
        k_all = jax.random.normal(key, (L, B, H, S, dc), dtype)
        k_new = jax.random.normal(key, (B, H, 1, dc), dtype)
    v_all, v_new = k_all * 0, k_new  # distinct buffers, same values
    off = jnp.array([0, 7, 8, 33, 63], jnp.int32)
    lyr = jnp.int32(1)
    got_k, got_v = kv_write.write_token(k_all, v_all, lyr, k_new, v_new, off)
    want_k, want_v = _dus_golden(k_all, v_all, lyr, k_new, v_new, off)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_write_token_scales_matches_dus():
    L, B, H, S = 2, 4, 6, 32
    key = jax.random.PRNGKey(1)
    ks_all = jax.random.normal(key, (L, B, S, H), jnp.float32)
    vs_all = ks_all * 2
    ks_new = jax.random.normal(key, (B, 1, H), jnp.float32)
    vs_new = ks_new * -1
    off = jnp.array([0, 5, 8, 31], jnp.int32)
    lyr = jnp.int32(0)
    gk, gv = kv_write.write_token_scales(ks_all, vs_all, lyr, ks_new,
                                         vs_new, off)
    wk = kvcache._write_scales(ks_all, lyr, ks_new, off)
    wv = kvcache._write_scales(vs_all, lyr, vs_new, off)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


def test_update_cache_layer_decode_step_int8():
    """End-to-end through update_cache_layer (quantize + pallas write)."""
    c = kvcache.init_cache(2, 3, 2, 16, 8, dtype="int8")
    k_new = jnp.ones((3, 1, 2, 8), jnp.float32) * 2.5
    v_new = jnp.ones((3, 1, 2, 8), jnp.float32) * -1.25
    off = jnp.array([4, 0, 15], jnp.int32)
    c = kvcache.update_cache_layer(c, jnp.int32(1), k_new, v_new, off)
    k = np.asarray(c.k); ks = np.asarray(c.k_scale)
    for b, o in enumerate([4, 0, 15]):
        assert np.all(k[1, b, :, o] == 127)
        np.testing.assert_allclose(ks[1, b, o, :], 2.5 / 127.0, rtol=1e-6)
    assert np.all(k[0] == 0)
    # untouched slots stay zero
    assert np.all(k[1, 0, :, :4] == 0) and np.all(k[1, 0, :, 5:] == 0)


class TestFusedQuantizeWrite:
    """kv_write.quantize_write_token == quantize_kv → write_token →
    write_token_scales, bit-exactly (same f32 round/clip math)."""

    @pytest.mark.parametrize("B,Hkv,S,D", [(1, 8, 64, 128), (4, 2, 32, 64)])
    def test_matches_two_step(self, B, Hkv, S, D):
        from llm_inference_tpu.ops.quantization import quantize_kv
        rng = np.random.default_rng(17)
        L = 3
        k_all = jnp.zeros((L, B, Hkv, S, D), jnp.int8)
        v_all = jnp.zeros((L, B, Hkv, S, D), jnp.int8)
        ks_all = jnp.zeros((L, B, S, Hkv), jnp.float32)
        vs_all = jnp.zeros((L, B, S, Hkv), jnp.float32)
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)),
                            jnp.float32) * 3.0
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)),
                            jnp.float32)
        offsets = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        layer = jnp.int32(1)

        got = kv_write.quantize_write_token(k_all, v_all, ks_all, vs_all,
                                            layer, k_new, v_new, offsets)

        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        wk, wv = kv_write.write_token(k_all, v_all, layer, kq, vq, offsets)
        wks, wvs = kv_write.write_token_scales(
            ks_all, vs_all, layer, ks[:, :, 0].transpose(0, 2, 1),
            vs[:, :, 0].transpose(0, 2, 1), offsets)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(wk))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(wv))
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(wks),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got[3]), np.asarray(wvs),
                                   rtol=1e-6)

    def test_mixed_kv_widths_mla(self):
        """deepseek MLA: k pages latent-wide, v pages kv_lora-wide — the
        fused kernel must spec each pool by ITS width (regression: k's
        width was used for both, corrupting v writes → NaN logits)."""
        from llm_inference_tpu.ops.quantization import quantize_kv
        rng = np.random.default_rng(23)
        L, B, S, kD, vD = 2, 2, 32, 48, 32
        k_all = jnp.zeros((L, B, 1, S, kD), jnp.int8)
        v_all = jnp.zeros((L, B, 1, S, vD), jnp.int8)
        ks_all = jnp.zeros((L, B, S, 1), jnp.float32)
        vs_all = jnp.zeros((L, B, S, 1), jnp.float32)
        k_new = jnp.asarray(rng.standard_normal((B, 1, 1, kD)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, 1, 1, vD)), jnp.float32)
        offs = jnp.asarray([3, 17], jnp.int32)
        got = kv_write.quantize_write_token(k_all, v_all, ks_all, vs_all,
                                            jnp.int32(1), k_new, v_new,
                                            offs)
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(got[0][1, b, 0, offs[b]]), np.asarray(kq[b, 0, 0]))
            np.testing.assert_array_equal(
                np.asarray(got[1][1, b, 0, offs[b]]), np.asarray(vq[b, 0, 0]))

    def test_quantize_write_rows_matches_token(self):
        """B=1 rows-layout fused write (the megakernel's output path) must
        land the same codes/scales as quantize_write_token."""
        rng = np.random.default_rng(7)
        L, Hkv, S, D = 2, 4, 32, 128
        def fresh():
            return (jnp.zeros((L, 1, Hkv, S, D), jnp.int8),
                    jnp.zeros((L, 1, Hkv, S, D), jnp.int8),
                    jnp.zeros((L, 1, S, Hkv), jnp.float32),
                    jnp.zeros((L, 1, S, Hkv), jnp.float32))
        k_new = jnp.asarray(rng.standard_normal((Hkv, D)), jnp.bfloat16)
        v_new = jnp.asarray(rng.standard_normal((Hkv, D)), jnp.bfloat16)
        for off in (0, 5, 17, 31):
            a = kv_write.quantize_write_rows(*fresh(), jnp.int32(1),
                                             k_new, v_new, jnp.int32(off))
            b = kv_write.quantize_write_token(
                *fresh(), jnp.int32(1), k_new[None, :, None, :],
                v_new[None, :, None, :], jnp.asarray([off], jnp.int32))
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x, np.float32),
                                           np.asarray(y, np.float32),
                                           atol=1e-6)

    def test_write_rows_matches_token(self):
        rng = np.random.default_rng(8)
        L, Hkv, S, D = 2, 4, 32, 128
        k_new = jnp.asarray(rng.standard_normal((Hkv, D)), jnp.bfloat16)
        v_new = jnp.asarray(rng.standard_normal((Hkv, D)), jnp.bfloat16)
        z = lambda: jnp.zeros((L, 1, Hkv, S, D), jnp.bfloat16)
        for off in (0, 9, 31):
            ka, va = kv_write.write_rows(z(), z(), jnp.int32(0),
                                         k_new, v_new, jnp.int32(off))
            kb, vb = kv_write.write_token(
                z(), z(), jnp.int32(0), k_new[None, :, None, :],
                v_new[None, :, None, :], jnp.asarray([off], jnp.int32))
            np.testing.assert_array_equal(np.asarray(ka, np.float32),
                                          np.asarray(kb, np.float32))
            np.testing.assert_array_equal(np.asarray(va, np.float32),
                                          np.asarray(vb, np.float32))
