"""Synthetic Δppl A/B: bf16 vs INT8 vs INT4(g=128) on dummy weights.

The BASELINE WikiText-2 gates (Δppl ≤ 0.1 INT8, ≤ 0.5 INT4 vs FP16) need a
real LLaMA-2 checkpoint, which this zero-egress environment cannot obtain —
`eval/perplexity.py --checkpoint ...` is the real-weights path, ready to run
wherever weights exist. This script keeps the gate EXERCISED in the
meantime: same scoring harness, same quantization pipeline, dummy weights,
synthetic token stream. Random weights are the structureless worst case, so
the deltas here bound the mechanism (quantizer + fused kernels + scoring),
not model quality. Results are recorded in BASELINE.md.

CPU:  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ppl_synthetic_ab.py
chip: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ppl_synthetic_ab.py --model llama2-7b
"""
import argparse
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.utils import compile_cache
compile_cache.enable()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--tokens", type=int, default=0)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--stride", type=int, default=0)
    args = ap.parse_args()

    from llm_inference_tpu.config import PRESETS, QuantConfig, tiny_llama
    from llm_inference_tpu.eval import perplexity
    from llm_inference_tpu.models import llama

    if args.model == "tiny":
        cfg = tiny_llama(num_kv_heads=4, num_heads=8, head_dim=64,
                         hidden_size=512, intermediate_size=1024,
                         vocab_size=2048)
        n_tok, window, stride = 512, 128, 64
    else:
        cfg = PRESETS[args.model]()
        n_tok, window, stride = 2048, 512, 256
    n_tok = args.tokens or n_tok
    window = args.window or window
    stride = args.stride or stride

    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(
        0, cfg.vocab_size, n_tok).astype(np.int32)

    base = perplexity(cfg, params, ids, window=window, stride=stride)
    log(f"[ppl-ab] {args.model} bf16 ppl={base:.4f} "
        f"({n_tok} tokens, window={window} stride={stride})")
    out = {"model": args.model, "tokens": n_tok, "ppl_bf16": round(base, 4)}
    for name, qcfg in (
        ("int8", QuantConfig(weights="int8")),
        ("int4_g128", QuantConfig(weights="int4", group_size=128)),
        ("int4_g128_asym", QuantConfig(weights="int4", group_size=128,
                                       asymmetric=True)),
    ):
        qp = llama.prepare_params(
            llama.quantize_params(params, qcfg), donate=False)
        ppl = perplexity(cfg, qp, ids, window=window, stride=stride)
        out[f"ppl_{name}"] = round(ppl, 4)
        out[f"dppl_{name}"] = round(ppl - base, 4)
        log(f"[ppl-ab] {name}: ppl={ppl:.4f} Δ={ppl-base:+.4f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
