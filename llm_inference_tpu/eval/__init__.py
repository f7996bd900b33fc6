"""Evaluation harnesses (perplexity; quality gates for quantization).

The reference has no automated quality evaluation at all — its only quality
check is manual tensor diffing against HuggingFace via SAVE_DATA dumps
(reference: src/utils/debug_utils.h:9-11). The BASELINE.md targets make
quantization quality a first-class gate (WikiText-2 Δppl ≤ 0.1 @ INT8,
≤ 0.5 @ INT4), so this package provides the measurement tooling.
"""

from llm_inference_tpu.eval.perplexity import perplexity, score_token_logprobs

__all__ = ["perplexity", "score_token_logprobs"]
