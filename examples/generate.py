"""Batch generation demo (analogue of the reference's examples/cpp drivers).

Runs with dummy weights out of the box:
    python examples/generate.py
or against a real checkpoint:
    python examples/generate.py --checkpoint /path/hf_dir --quant int8
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

# the environment's TPU plugin force-registers itself and ignores the
# JAX_PLATFORMS env var — honor an explicit cpu request (same workaround as
# tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      PRESETS, QuantConfig)
from llm_inference_tpu.engine import InferenceEngine, load_tokenizer
from llm_inference_tpu.models import llama
from llm_inference_tpu.utils import checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny-llama")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--quant", default="none")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    args = ap.parse_args()

    if args.checkpoint:
        cfg, params = checkpoint.load_hf_checkpoint(args.checkpoint)
    else:
        cfg = PRESETS[args.model]()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if args.quant != "none":
        params = llama.quantize_params(params, QuantConfig(weights=args.quant))
    params = llama.prepare_params(params)

    tok = load_tokenizer(args.tokenizer or args.checkpoint) \
        if (args.tokenizer or args.checkpoint) else None
    engine = InferenceEngine(cfg, params, tokenizer=tok,
                             engine_cfg=EngineConfig(max_seq_len=256))

    prompts = (["The capital of France is", "def fibonacci(n):"]
               if tok else [[1, 5, 9, 13], [1, 22, 7]])
    res = engine.generate(prompts, GenerationConfig(
        greedy=True, max_new_tokens=args.max_new_tokens))
    for p, r in zip(prompts, res):
        print(f"prompt: {p!r}")
        print(f"  → {(r.text or r.token_ids)!r}   "
              f"(ttft {r.ttft_s*1e3:.1f} ms, "
              f"{r.decode_tokens_per_s:.1f} tok/s)")


if __name__ == "__main__":
    main()
