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
