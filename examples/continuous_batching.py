"""Continuous batching demo: many requests through a fixed decode-slot pool.

    python examples/continuous_batching.py [--slots 8] [--requests 32]

Shows admissions interleaving with decode and the aggregate throughput —
the serving mode the reference cannot express (batch_size hard-wired to 1,
reference: src/models/llama/llama.h:36).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

# the environment's TPU plugin force-registers itself and ignores the
# JAX_PLATFORMS env var — honor an explicit cpu request (same workaround as
# tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine import (ContinuousBatchingScheduler,
                                      InferenceEngine)
from llm_inference_tpu.models import llama


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-new-tokens", type=int, default=24)
    args = ap.parse_args()

    cfg = tiny_llama(num_kv_heads=4)
    params = llama.prepare_params(
        llama.init_params(cfg, jax.random.PRNGKey(0)))
    engine = InferenceEngine(cfg, params, engine_cfg=EngineConfig(
        max_seq_len=128, max_batch_size=args.slots, decode_chunk=8))
    sched = ContinuousBatchingScheduler(
        engine, GenerationConfig(greedy=True,
                                 max_new_tokens=args.max_new_tokens),
        slots=args.slots)

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(3, cfg.vocab_size, rng.integers(4, 24)))
               for _ in range(args.requests)]
    t0 = time.perf_counter()
    reqs = sched.run(prompts)
    dt = time.perf_counter() - t0
    produced = sum(len(r.output_ids) for r in reqs)
    ttfts = sorted(r.ttft_s for r in reqs)
    print(f"{len(reqs)} requests × ≤{args.max_new_tokens} tokens on "
          f"{args.slots} slots: {produced} tokens in {dt:.2f}s "
          f"({produced/dt:.1f} tok/s aggregate)")
    print(f"TTFT p50 {ttfts[len(ttfts)//2]*1e3:.1f} ms, "
          f"p99 {ttfts[int(len(ttfts)*0.99)]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
