"""Tests for weight-only quantization and the fused dequant matmul.

The Pallas kernel runs in interpret mode on CPU (ops/pallas/__init__.py) —
the compiled-mode run happens on the real chip via bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.ops import quantization as Q
from llm_inference_tpu.ops.pallas import quant_matmul as QM


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


class TestPacking:
    def test_int4_pack_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.integers(-8, 8, size=(16, 8)).astype(np.int8)
        packed = Q._pack_int4(jnp.asarray(q))
        assert packed.shape == (8, 8)
        unpacked = Q._unpack_int4(packed)
        np.testing.assert_array_equal(np.asarray(unpacked), q)


class TestBlockPacking:
    def test_block_pack_roundtrip(self):
        rng = np.random.default_rng(9)
        q = rng.integers(-8, 8, size=(32, 8)).astype(np.int8)
        packed = Q._pack_int4(jnp.asarray(q), blocks=4)
        unpacked = Q._unpack_int4(packed, block_rows=4)  # 32/2/4 = 4
        np.testing.assert_array_equal(np.asarray(unpacked), q)

    def test_block_packed_shard_slice_is_self_contained(self):
        """Slicing a pack_blocks=t weight into t row chunks (what shard_map
        does to row-sharded weights) must yield valid standalone QTensors."""
        rng = np.random.default_rng(10)
        K, N, t = 512, 64, 4
        w = rng.standard_normal((K, N)).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), bits=4, group_size=64, pack_blocks=t)
        full = np.asarray(Q.dequantize(qt, jnp.float32))
        rows_per_shard = qt.q.shape[0] // t
        grp_per_shard = qt.scale.shape[0] // t
        for s in range(t):
            local = Q.QTensor(
                q=qt.q[s * rows_per_shard:(s + 1) * rows_per_shard],
                scale=qt.scale[s * grp_per_shard:(s + 1) * grp_per_shard],
                bits=4, group_size=qt.group_size, orig_dtype=qt.orig_dtype,
                block_rows=qt.block_rows)
            local_dq = np.asarray(Q.dequantize(local, jnp.float32))
            np.testing.assert_array_equal(
                local_dq, full[s * K // t:(s + 1) * K // t])

    def test_pallas_matmul_block_packed(self):
        rng = np.random.default_rng(11)
        M, K, N = 4, 512, 256
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
        qt = Q.quantize(jnp.asarray(w), bits=4, group_size=128, pack_blocks=2)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = QM.quant_matmul(jnp.asarray(x), Q.to_blocked(qt, 128))
        assert rel_err(out, golden) < 2e-2


class TestBlockedLayout:
    """Column-blocked streaming layout (QTensor.block_n > 0)."""

    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 64), (4, 0), (4, 64)])
    def test_roundtrip_and_ref(self, bits, gs):
        rng = np.random.default_rng(12)
        x = rng.standard_normal((3, 256)).astype(np.float32) * 0.1
        w = rng.standard_normal((256, 384)).astype(np.float32) * 0.1
        qt = Q.quantize(jnp.asarray(w), bits=bits, group_size=gs)
        qb = Q.to_blocked(qt, 128)
        assert qb.shape == qt.shape
        np.testing.assert_array_equal(np.asarray(Q.dequantize(qb)),
                                      np.asarray(Q.dequantize(qt)))
        np.testing.assert_array_equal(
            np.asarray(Q.from_blocked(qb).q), np.asarray(qt.q))
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        assert rel_err(Q.qmatmul_ref(jnp.asarray(x), qb, jnp.float32),
                       golden) < 2e-2

    def test_choose_block_n(self):
        assert Q.choose_block_n(4096, 12288) == 768  # 3 MB = budget
        assert Q.choose_block_n(11008, 4096) == 256
        assert Q.choose_block_n(4096, 96) == 0       # no 128-divisor
        assert Q.choose_block_n(32768, 128, target_bytes=3 << 20) == 0


class TestQuantize:
    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 64), (4, 0), (4, 64)])
    def test_roundtrip_error(self, bits, gs):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((256, 128)).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), bits=bits, group_size=gs)
        wd = np.asarray(Q.dequantize(qt, jnp.float32))
        # symmetric quant error bound: scale/2 per element
        tol = 0.5 if bits == 4 else 0.02
        # normalize by per-column absmax
        err = np.abs(wd - w) / (np.abs(w).max(0, keepdims=True) + 1e-9)
        assert err.max() < tol

    def test_scale_shapes(self):
        w = jnp.ones((256, 64))
        assert Q.quantize(w, 8, 0).scale.shape == (1, 64)
        assert Q.quantize(w, 8, 64).scale.shape == (4, 64)
        assert Q.quantize(w, 4, 128).q.shape == (128, 64)


class TestQMatmulRef:
    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 128), (4, 0), (4, 128)])
    def test_matches_dequant_matmul(self, bits, gs):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((4, 256)).astype(np.float32)
        w = rng.standard_normal((256, 128)).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), bits=bits, group_size=gs)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = Q.qmatmul_ref(jnp.asarray(x), qt, jnp.float32)
        assert rel_err(out, golden) < 2e-2  # bf16 dot path


class TestPallasQuantMatmul:
    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 128), (4, 0), (4, 128)])
    def test_matches_golden(self, bits, gs):
        rng = np.random.default_rng(3)
        M, K, N = 4, 512, 256
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
        qt = Q.to_blocked(Q.quantize(jnp.asarray(w), bits=bits, group_size=gs),
                          128)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = QM.quant_matmul(jnp.asarray(x), qt)
        assert out.shape == (M, N)
        assert rel_err(out, golden) < 2e-2

    def test_3d_input_and_batch1(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 1, 256)).astype(np.float32) * 0.1
        w = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
        qt = Q.to_blocked(Q.quantize(jnp.asarray(w), bits=8), 128)
        out = QM.quant_matmul(jnp.asarray(x), qt)
        golden = Q.qmatmul_ref(jnp.asarray(x), qt, jnp.float32)
        assert out.shape == (2, 1, 128)
        assert rel_err(out, np.asarray(golden)) < 2e-2

    def test_large_m_falls_back(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((128, 256)).astype(np.float32) * 0.1
        w = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
        qt = Q.to_blocked(Q.quantize(jnp.asarray(w), bits=8), 128)
        out = QM.quant_matmul(jnp.asarray(x), qt)
        golden = Q.qmatmul_ref(jnp.asarray(x), qt)
        assert rel_err(out, np.asarray(golden)) < 2e-2

    def test_unblocked_falls_back(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((4, 256)).astype(np.float32) * 0.1
        w = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
        qt = Q.quantize(jnp.asarray(w), bits=8)   # row-major layout
        out = QM.quant_matmul(jnp.asarray(x), qt)
        golden = Q.qmatmul_ref(jnp.asarray(x), qt)
        assert rel_err(out, np.asarray(golden)) < 2e-2


class TestKVQuant:
    def test_kv_roundtrip(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 3, 5, 32)).astype(np.float32)
        q, scale = Q.quantize_kv(jnp.asarray(x))
        back = np.asarray(Q.dequantize_kv(q, scale, jnp.float32))
        assert np.abs(back - x).max() < np.abs(x).max() / 100.0


class TestAsymmetricQuant:
    """Asymmetric (zero-point) quantization: better reconstruction for
    skewed weight groups; dequant w = q·scale + zbias with the matmul
    correction folded as rowsum(x)·zbias."""

    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 64), (4, 0), (4, 64)])
    def test_beats_symmetric_on_skewed_weights(self, bits, gs):
        rng = np.random.default_rng(7)
        # heavily shifted distribution: symmetric wastes half its codes
        w = (rng.standard_normal((256, 128)) * 0.3 + 2.0).astype(np.float32)
        sym = Q.quantize(jnp.asarray(w), bits=bits, group_size=gs)
        asym = Q.quantize(jnp.asarray(w), bits=bits, group_size=gs,
                          asymmetric=True)
        assert asym.zbias is not None and sym.zbias is None
        e_sym = np.abs(np.asarray(Q.dequantize(sym, jnp.float32)) - w).mean()
        e_asym = np.abs(np.asarray(Q.dequantize(asym,
                                                jnp.float32)) - w).mean()
        assert e_asym < 0.5 * e_sym, (e_asym, e_sym)

    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 128), (4, 0), (4, 128)])
    def test_ref_matmul_matches_dequant(self, bits, gs):
        rng = np.random.default_rng(8)
        x = rng.standard_normal((4, 256)).astype(np.float32)
        w = (rng.standard_normal((256, 128)) * 0.2 + 1.0).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), bits=bits, group_size=gs,
                        asymmetric=True)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = Q.qmatmul_ref(jnp.asarray(x), qt, jnp.float32)
        assert rel_err(out, golden) < 2e-2

    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 128), (4, 0), (4, 128)])
    def test_blocked_ref_matches(self, bits, gs):
        rng = np.random.default_rng(9)
        x = rng.standard_normal((4, 256)).astype(np.float32) * 0.1
        w = (rng.standard_normal((256, 256)) * 0.2 + 0.5).astype(np.float32)
        qt = Q.to_blocked(Q.quantize(jnp.asarray(w), bits=bits,
                                     group_size=gs, asymmetric=True), 128)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = Q.qmatmul_ref(jnp.asarray(x), qt, jnp.float32)
        assert rel_err(out, golden) < 2e-2

    @pytest.mark.parametrize("bits,gs", [(8, 0), (8, 128), (4, 0), (4, 128)])
    def test_pallas_kernel_matches_golden(self, bits, gs):
        rng = np.random.default_rng(10)
        M, K, N = 4, 512, 256
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        w = (rng.standard_normal((K, N)) * 0.2 + 0.7).astype(np.float32)
        qt = Q.to_blocked(Q.quantize(jnp.asarray(w), bits=bits,
                                     group_size=gs, asymmetric=True), 128)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = QM.quant_matmul(jnp.asarray(x), qt)
        assert out.shape == (M, N)
        assert rel_err(out, golden) < 2e-2

    def test_pallas_kernel_stacked_layers(self):
        rng = np.random.default_rng(11)
        L, M, K, N = 3, 4, 256, 256
        ws = (rng.standard_normal((L, K, N)) * 0.2 + 0.4).astype(np.float32)
        import jax as _jax
        qt = _jax.vmap(lambda m: Q.quantize(m, 4, 128,
                                            asymmetric=True))(
            jnp.asarray(ws))
        qt = Q.to_blocked(qt, 128)
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        for layer in range(L):
            one = Q.quantize(jnp.asarray(ws[layer]), 4, 128,
                             asymmetric=True)
            golden = np.asarray(x) @ np.asarray(Q.dequantize(one,
                                                             jnp.float32))
            out = QM.quant_matmul(jnp.asarray(x), qt, layer=layer)
            assert rel_err(out, golden) < 2e-2, layer

    def test_blocked_roundtrip_keeps_zbias(self):
        rng = np.random.default_rng(12)
        w = (rng.standard_normal((256, 256)) + 1.0).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), 4, 64, asymmetric=True)
        rt = Q.from_blocked(Q.to_blocked(qt, 128))
        np.testing.assert_array_equal(np.asarray(rt.zbias),
                                      np.asarray(qt.zbias))


class TestNPairPacking:
    """N-pair int4 layout (QTensor.pack_axis == "n") — the
    difference-of-dots unpack variant (quantization.to_blocked_npair)."""

    @pytest.mark.parametrize("gs,asym", [(0, False), (128, False),
                                         (128, True), (0, True)])
    def test_dequant_roundtrip(self, gs, asym):
        rng = np.random.default_rng(20)
        w = (rng.standard_normal((512, 512)) * 0.1 + 0.02).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), bits=4, group_size=gs,
                        asymmetric=asym)
        golden = np.asarray(Q.dequantize(qt, jnp.float32))
        npq = Q.to_blocked_npair(qt, 256)
        assert npq.pack_axis == "n"
        assert npq.q.shape == (2, 512, 128)          # [NB, K, bn/2]
        assert npq.in_features == 512 and npq.out_features == 512
        np.testing.assert_array_equal(
            np.asarray(Q.dequantize(npq, jnp.float32)), golden)

    def test_from_blocked_roundtrip(self):
        rng = np.random.default_rng(21)
        w = (rng.standard_normal((256, 512)) + 0.5).astype(np.float32)
        qt = Q.quantize(jnp.asarray(w), bits=4, group_size=64,
                        asymmetric=True)
        rt = Q.from_blocked(Q.to_blocked_npair(qt, 256))
        assert rt.block_n == 0 and rt.pack_axis == "k"
        np.testing.assert_array_equal(
            np.asarray(Q.dequantize(rt, jnp.float32)),
            np.asarray(Q.dequantize(qt, jnp.float32)))

    @pytest.mark.parametrize("gs,asym", [(0, False), (128, False),
                                         (128, True), (0, True)])
    def test_pallas_kernel_matches_golden(self, gs, asym):
        rng = np.random.default_rng(22)
        M, K, N = 4, 512, 512
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        w = (rng.standard_normal((K, N)) * 0.1 + 0.03).astype(np.float32)
        qt = Q.to_blocked_npair(
            Q.quantize(jnp.asarray(w), bits=4, group_size=gs,
                       asymmetric=asym), 256)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = QM.quant_matmul(jnp.asarray(x), qt)
        assert out.shape == (M, N)
        assert rel_err(out, golden) < 2e-2

    @pytest.mark.parametrize("gs,asym", [(128, False), (128, True),
                                         (64, False)])
    def test_groupdot_gemv_matches_plain(self, gs, asym, monkeypatch):
        """LLMI_NPAIR_GROUPDOT=1 (M-stacked per-group dots) must be exact
        vs the chunked path at M=1 — same dots, same f32 accumulation,
        scales applied post-dot per group. (The M=4 test above never
        engages it: the stacking uses the M dimension.)"""
        rng = np.random.default_rng(31)
        K, N = 512, 512
        x = rng.standard_normal((1, K)).astype(np.float32) * 0.1
        w = (rng.standard_normal((K, N)) * 0.1 + 0.03).astype(np.float32)
        qt = Q.to_blocked_npair(
            Q.quantize(jnp.asarray(w), bits=4, group_size=gs,
                       asymmetric=asym), 256)
        golden = np.asarray(QM.quant_matmul(jnp.asarray(x), qt))
        monkeypatch.setenv("LLMI_NPAIR_GROUPDOT", "1")
        out = np.asarray(QM.quant_matmul(jnp.asarray(x), qt))
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-4)

    def test_pallas_kernel_stacked_layers(self):
        rng = np.random.default_rng(23)
        L, M, K, N = 3, 4, 256, 512
        ws = (rng.standard_normal((L, K, N)) * 0.2 + 0.4).astype(np.float32)
        qt = jax.vmap(lambda m: Q.quantize(m, 4, 128, asymmetric=True))(
            jnp.asarray(ws))
        qt = Q.to_blocked_npair(qt, 256)
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        for layer in range(L):
            one = Q.quantize(jnp.asarray(ws[layer]), 4, 128,
                             asymmetric=True)
            golden = np.asarray(x) @ np.asarray(Q.dequantize(one,
                                                             jnp.float32))
            out = QM.quant_matmul(jnp.asarray(x), qt, layer=layer)
            assert rel_err(out, golden) < 2e-2, layer

    def test_large_m_ref_path(self):
        # prefill path: _qmatmul_ref_blocked must unpack npair correctly
        rng = np.random.default_rng(24)
        x = rng.standard_normal((200, 256)).astype(np.float32) * 0.1
        w = rng.standard_normal((256, 512)).astype(np.float32) * 0.1
        qt = Q.to_blocked_npair(Q.quantize(jnp.asarray(w), 4, 128), 256)
        golden = np.asarray(x) @ np.asarray(Q.dequantize(qt, jnp.float32))
        out = QM.quant_matmul(jnp.asarray(x), qt)
        assert rel_err(out, golden) < 2e-2


class TestPrefillTiledKernel:
    """m-tiled prefill path (LLMI_QMM_PREFILL=1): grid (NB, M/bm) with
    weight blocks reused across the inner m-tiles. Exact same math as the
    GEMV kernel — parity vs the XLA reference at M > 128."""

    @pytest.mark.parametrize("mode,gs,asym", [
        ("int8", 0, False), ("int8", 64, True),
        ("int4", 64, False), ("npair", 128, False), ("npair", 128, True)])
    def test_tiled_matches_ref(self, monkeypatch, mode, gs, asym):
        monkeypatch.setenv("LLMI_QMM_PREFILL", "1")
        rng = np.random.default_rng(31)
        M, K, N = 300, 512, 1024          # M > _PALLAS_MAX_M, non-multiple
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        w = (rng.standard_normal((K, N)) * 0.1 + 0.02).astype(np.float32)
        if mode == "npair":
            qt = Q.to_blocked_npair(
                Q.quantize(jnp.asarray(w), 4, gs, asymmetric=asym), 256)
        else:
            bits = 8 if mode == "int8" else 4
            qt = Q.to_blocked(
                Q.quantize(jnp.asarray(w), bits, gs, asymmetric=asym), 256)
        golden = np.asarray(Q.qmatmul_ref(jnp.asarray(x), qt))
        out = QM.quant_matmul(jnp.asarray(x), qt)
        assert out.shape == (M, N)
        assert rel_err(out, golden) < 2e-2

    def test_tiled_stacked_layers(self, monkeypatch):
        monkeypatch.setenv("LLMI_QMM_PREFILL", "1")
        rng = np.random.default_rng(32)
        L, M, K, N = 2, 256, 256, 512
        ws = (rng.standard_normal((L, K, N)) * 0.1).astype(np.float32)
        qt = jax.vmap(lambda m: Q.quantize(m, 4, 128))(jnp.asarray(ws))
        qt = Q.to_blocked_npair(qt, 256)
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.1
        for layer in range(L):
            one = Q.to_blocked_npair(
                Q.quantize(jnp.asarray(ws[layer]), 4, 128), 256)
            golden = np.asarray(Q.qmatmul_ref(jnp.asarray(x), one))
            out = QM.quant_matmul(jnp.asarray(x), qt, layer=layer)
            assert rel_err(out, golden) < 2e-2, layer

    def test_off_by_default(self):
        rng = np.random.default_rng(33)
        x = jnp.asarray(rng.standard_normal((300, 256)).astype(np.float32))
        qt = Q.to_blocked(Q.quantize(
            jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32)),
            8, 0), 256)
        # default: the XLA ref path serves M>128 (exact same numbers)
        np.testing.assert_allclose(np.asarray(QM.quant_matmul(x, qt)),
                                   np.asarray(Q.qmatmul_ref(x, qt)),
                                   rtol=2e-2, atol=2e-2)


class TestFFNMegakernel:
    """ffn_fused (norm → gate-up → SwiGLU → down, one pallas call) vs the
    separate norm_matmul + swiglu + matmul chain."""

    def test_matches_separate_chain(self):
        from llm_inference_tpu.ops.linear import matmul, norm_matmul
        rng = np.random.default_rng(41)
        M, K, I = 2, 512, 512           # npair engages (bn 256 | 2I=1024)
        wg = (rng.standard_normal((2, K, 2 * I)) * 0.05).astype(np.float32)
        wd = (rng.standard_normal((2, I, K)) * 0.05).astype(np.float32)
        gu = Q.to_blocked_npair(
            jax.vmap(lambda m: Q.quantize(m, 4, 64))(jnp.asarray(wg)), 512)
        dn = Q.to_blocked_npair(
            jax.vmap(lambda m: Q.quantize(m, 4, 64))(jnp.asarray(wd)), 256)
        x = jnp.asarray(rng.standard_normal((1, M, K)), jnp.float32) * 0.3
        res = jnp.asarray(rng.standard_normal((1, M, K)), jnp.float32) * 0.3
        gamma = jnp.ones((K,), jnp.float32)
        for layer in range(2):
            out = QM.ffn_fused(x, res, gamma, 1e-5, gu, dn, layer)
            assert out is not None, "megakernel must engage at these dims"
            y, h2 = out
            gateup, h2_ref = norm_matmul(x, gu, gamma, 1e-5, residual=res,
                                         layer=layer, want_x_out=True)
            gate, up = jnp.split(gateup, 2, axis=-1)
            act = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(
                jnp.float32)
            y_ref = matmul(act.astype(x.dtype), dn, layer=layer)
            # both paths bf16-round the x operand at different points;
            # each is within one bf16 ulp of the exact x + res
            np.testing.assert_allclose(np.asarray(h2), np.asarray(h2_ref),
                                       atol=5e-3, rtol=5e-3)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       atol=3e-2, rtol=3e-2)

    def test_falls_back_unsupported(self):
        rng = np.random.default_rng(42)
        wg = (rng.standard_normal((2, 128, 256)) * 0.05).astype(np.float32)
        qt8 = Q.to_blocked(jax.vmap(lambda m: Q.quantize(m, 8, 32))(
            jnp.asarray(wg)), 128)
        x = jnp.ones((1, 1, 128), jnp.float32)
        assert QM.ffn_fused(x, x, jnp.ones((128,)), 1e-5, qt8, qt8, 0) is None


class TestLayerTailMegakernel:
    def test_matches_separate_chain(self):
        from llm_inference_tpu.ops.linear import matmul, norm_matmul
        rng = np.random.default_rng(43)
        M, K, I = 2, 512, 512
        Ko = K
        wo = (rng.standard_normal((2, Ko, K)) * 0.05).astype(np.float32)
        wg = (rng.standard_normal((2, K, 2 * I)) * 0.05).astype(np.float32)
        wd = (rng.standard_normal((2, I, K)) * 0.05).astype(np.float32)
        woq = Q.to_blocked_npair(
            jax.vmap(lambda m: Q.quantize(m, 4, 64))(jnp.asarray(wo)), 256)
        gu = Q.to_blocked_npair(
            jax.vmap(lambda m: Q.quantize(m, 4, 64))(jnp.asarray(wg)), 512)
        dn = Q.to_blocked_npair(
            jax.vmap(lambda m: Q.quantize(m, 4, 64))(jnp.asarray(wd)), 256)
        h = jnp.asarray(rng.standard_normal((1, M, K)), jnp.float32) * 0.3
        attn = jnp.asarray(rng.standard_normal((1, M, Ko)),
                           jnp.float32) * 0.3
        gamma = jnp.asarray(rng.standard_normal((K,)), jnp.float32)
        for layer in range(2):
            out = QM.layer_tail_fused(h, attn, woq, gu, dn, gamma, 1e-5,
                                      layer)
            assert out is not None
            y, h2 = out
            wo_out = matmul(attn, woq, layer=layer)
            gateup, h2_ref = norm_matmul(h, gu, gamma, 1e-5,
                                         residual=wo_out, layer=layer,
                                         want_x_out=True)
            gate, up = jnp.split(gateup, 2, axis=-1)
            act = (jax.nn.silu(gate.astype(jnp.float32))
                   * up.astype(jnp.float32))
            y_ref = matmul(act.astype(h.dtype), dn, layer=layer)
            np.testing.assert_allclose(np.asarray(h2), np.asarray(h2_ref),
                                       atol=5e-3, rtol=5e-3)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       atol=3e-2, rtol=3e-2)
