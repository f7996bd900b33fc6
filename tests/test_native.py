"""Native (C++) runtime components vs their Python twins.

The native tokenizer must be id-for-id identical to engine.tokenizer.
BPETokenizer; the converters must match numpy/ml_dtypes bit-for-bit.
Tests are skipped wholesale if the toolchain can't build the library.
"""

import os

import numpy as np
import pytest

from llm_inference_tpu import native
from llm_inference_tpu.engine.tokenizer import BPETokenizer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

_REF_VOCAB = "/root/reference/llama2-7b-tokenizer.bin"


def synth_vocab(tmp_path):
    """A small llama-style vocab exercising merges, scores, byte fallback."""
    vocab = {b"<unk>": (0, 0.0), b"<s>": (1, 0.0), b"</s>": (2, 0.0)}
    nid = 3
    for b in range(256):
        vocab[("<0x%02X>" % b).encode()] = (nid, -1000.0)
        nid += 1
    pieces = ["▁", "h", "e", "l", "o", "w", "r", "d", "he", "ll",
              "hell", "hello", "▁hello", "▁w", "or", "orld",
              "▁world", "lo", "wo"]
    for i, p in enumerate(pieces):
        vocab[p.encode()] = (nid, float(len(p)) - i * 0.01)
        nid += 1
    tok = BPETokenizer(vocab, kv={"bos_token_id": "1", "eos_token_id": "2"})
    path = os.path.join(tmp_path, "vocab.bin")
    tok.save_binary(path)
    return path, tok


TEXTS = [
    "hello world",
    "hello  world",                 # double space
    "wold hellllo",
    "",
    "héllo wörld ☃",               # multi-byte chars → byte fallback
    "x" * 50,
]


class TestNativeTokenizer:
    def test_parity_on_synth_vocab(self, tmp_path):
        path, py_tok = synth_vocab(str(tmp_path))
        c_tok = native.NativeBPETokenizer(path)
        assert c_tok.vocab_size == py_tok.vocab_size
        assert (c_tok.bos_id, c_tok.eos_id) == (py_tok.bos_id, py_tok.eos_id)
        for text in TEXTS:
            py_ids = py_tok.encode(text)
            c_ids = c_tok.encode(text)
            assert c_ids == py_ids, (text, c_ids, py_ids)
            assert c_tok.decode(py_ids[1:]) == py_tok.decode(py_ids[1:])

    @pytest.mark.skipif(not os.path.exists(_REF_VOCAB),
                        reason="reference vocab not present")
    def test_parity_on_llama2_vocab(self):
        py_tok = BPETokenizer.from_binary(_REF_VOCAB)
        c_tok = native.NativeBPETokenizer(_REF_VOCAB)
        for text in ["The quick brown fox jumps over the lazy dog.",
                     "def fib(n):\n    return fib(n-1) + fib(n-2)",
                     "数学は楽しい — Γειά σου Κόσμε"]:
            py_ids = py_tok.encode(text)
            assert c_tok.encode(text) == py_ids
            assert c_tok.decode(py_ids[1:]) == py_tok.decode(py_ids[1:])


class TestNativeConvert:
    def test_f32_to_bf16_bit_exact(self):
        import ml_dtypes
        rng = np.random.default_rng(0)
        x = np.concatenate([
            rng.standard_normal(4096).astype(np.float32) * 1e3,
            np.array([0.0, -0.0, np.inf, -np.inf, 1e-40, -1e-40], np.float32),
        ])
        got = native.convert_to_bf16(x)
        want = x.astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(got.view(np.uint16),
                                      want.view(np.uint16))

    def test_f16_to_bf16_matches_numpy(self):
        import ml_dtypes
        rng = np.random.default_rng(1)
        x = rng.standard_normal(4096).astype(np.float16)
        got = native.convert_to_bf16(x)
        want = x.astype(np.float32).astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(got.view(np.uint16),
                                      want.view(np.uint16))

    def test_nan_preserved_not_inf(self):
        """Low-payload NaNs must stay NaN through the native converter —
        round-to-nearest-even without a NaN guard carries into the
        exponent and produces Inf (ml_dtypes/XLA preserve NaN)."""
        bad = np.array([0x7F800001, 0xFF800001, 0x7FC00000, 0x7F801234],
                       np.uint32).view(np.float32)
        got = native.convert_to_bf16(bad)
        import ml_dtypes
        assert np.isnan(got.view(ml_dtypes.bfloat16)
                        .astype(np.float32)).all()
