"""Tests for on-device sampling (reference analogues:
tests/unittests/test_topk.cu, test_sampling.cu)."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.ops import sampling


class TestTopK:
    def test_top_k_masks_rest(self):
        logits = jnp.array([[1.0, 5.0, 3.0, 2.0, 4.0]])
        out = np.asarray(sampling.apply_top_k(logits, 2))
        assert out[0, 1] == 5.0 and out[0, 4] == 4.0
        assert (out[0, [0, 2, 3]] < -1e29).all()


class TestTopP:
    def test_top_p_keeps_nucleus(self):
        # probs: [0.5, 0.3, 0.1, 0.1] → p=0.7 keeps the first two
        p = np.array([0.5, 0.3, 0.1, 0.1])
        logits = jnp.asarray(np.log(p))[None, :]
        out = np.asarray(sampling.apply_top_p(logits, 0.7))
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert (out[0, 2:] < -1e29).all()

    def test_top_p_one_keeps_all(self):
        logits = jnp.array([[1.0, 2.0, 3.0]])
        out = np.asarray(sampling.apply_top_p(logits, 0.999999))
        assert np.isfinite(out).all()


class TestSample:
    def test_greedy(self):
        logits = jnp.array([[1.0, 9.0, 3.0], [7.0, 2.0, 1.0]])
        ids = sampling.sample(logits, None, greedy=True)
        np.testing.assert_array_equal(np.asarray(ids), [1, 0])

    def test_temperature_zero_is_greedy(self):
        logits = jnp.array([[1.0, 9.0, 3.0]])
        ids = sampling.sample(logits, jax.random.PRNGKey(0), temperature=0.0)
        assert int(ids[0]) == 1

    def test_categorical_distribution(self):
        # near-deterministic distribution should sample the mode
        logits = jnp.array([[0.0, 20.0, 0.0]])
        key = jax.random.PRNGKey(0)
        ids = [int(sampling.sample(logits, jax.random.fold_in(key, i))[0])
               for i in range(20)]
        assert all(i == 1 for i in ids)

    def test_top_k_sampling_stays_in_top_k(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((1, 100)).astype(np.float32))
        top2 = set(np.argsort(np.asarray(logits[0]))[-2:].tolist())
        key = jax.random.PRNGKey(1)
        for i in range(20):
            t = int(sampling.sample(logits, jax.random.fold_in(key, i),
                                    temperature=1.5, top_k=2)[0])
            assert t in top2


class TestPenalties:
    """Serving-API sampling penalties (no reference analogue — the
    reference's sampler is fixed top-K=5, sampling.cu)."""

    def test_apply_penalties_golden(self):
        B, V = 3, 50
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(B, V)), jnp.float32)
        counts = (jnp.zeros((B, V), jnp.int32)
                  .at[0, 5].set(2).at[1, 7].set(1))
        seen = (counts > 0).at[0, 9].set(True)     # 9: prompt-only token
        rep = jnp.asarray([1.5, 1.0, 1.0])
        pres = jnp.asarray([0.0, 0.6, 0.0])
        freq = jnp.asarray([0.3, 0.0, 0.0])
        out = np.asarray(sampling.apply_penalties(
            logits, counts, seen, rep, pres, freq))
        l = np.asarray(logits)
        exp05 = (l[0, 5] / 1.5 if l[0, 5] > 0 else l[0, 5] * 1.5) - 0.3 * 2
        exp09 = l[0, 9] / 1.5 if l[0, 9] > 0 else l[0, 9] * 1.5
        assert np.isclose(out[0, 5], exp05)
        assert np.isclose(out[0, 9], exp09)        # rep hits prompt tokens
        assert np.isclose(out[1, 7], l[1, 7] - 0.6)
        np.testing.assert_allclose(out[2], l[2])   # neutral row = identity

    def test_min_p_filters_below_fraction_of_max(self):
        logits = jnp.asarray(np.random.default_rng(1).normal(size=(2, 40))
                             * 3, jnp.float32)
        out = sampling.apply_min_p(logits, 0.5)
        p = np.asarray(jax.nn.softmax(logits, axis=-1))
        keep = p >= 0.5 * p.max(-1, keepdims=True)
        assert ((np.asarray(out) > -1e29) == keep).all()


class TestSeededRows:
    """Per-row seeded sampling: draws depend only on (seed, position) —
    the scheduler's batch-composition-independent reproducibility."""

    def test_same_seed_same_draw_any_batch(self):
        V = 64
        logits = jnp.asarray(np.random.default_rng(2).normal(size=(3, V)),
                             jnp.float32)
        seeds = jnp.asarray([11, 22, 33], jnp.int32)
        pos = jnp.asarray([4, 9, 4], jnp.int32)
        ones = jnp.ones((3,)); zi = jnp.zeros((3,), jnp.int32)
        g = jnp.zeros((3,), bool)
        tok = sampling.sample_per_row(
            logits, sampling.row_keys(seeds, pos), ones, zi, ones, g,
            max_top_k=0, use_top_p=False)
        solo = sampling.sample_per_row(
            logits[:1], sampling.row_keys(seeds[:1], pos[:1]), ones[:1],
            zi[:1], ones[:1], g[:1], max_top_k=0, use_top_p=False)
        assert int(tok[0]) == int(solo[0])

    def test_different_position_different_stream(self):
        V = 4096
        logits = jnp.zeros((1, V), jnp.float32)      # uniform: pure noise
        seeds = jnp.asarray([7], jnp.int32)
        ones = jnp.ones((1,)); zi = jnp.zeros((1,), jnp.int32)
        g = jnp.zeros((1,), bool)
        draws = {int(sampling.sample_per_row(
            logits, sampling.row_keys(seeds, jnp.asarray([p], jnp.int32)),
            ones, zi, ones, g, max_top_k=0, use_top_p=False)[0])
            for p in range(8)}
        assert len(draws) > 1
