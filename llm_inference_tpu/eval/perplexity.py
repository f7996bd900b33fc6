"""Perplexity scoring (WikiText-2-style sliding-window evaluation).

Computes token-level negative log-likelihoods with the SAME forward used for
serving (so the quantized kernels are what gets measured), over fixed-size
windows with a configurable stride — the standard HF `evaluate` protocol:
window w covers tokens [s, s+W); only the last W−overlap tokens contribute
loss, so every scored token conditions on ≥ (W−stride) tokens of context.

Usage (library):
    ppl = perplexity(cfg, params, token_ids, window=1024, stride=512)

Usage (CLI):
    python -m llm_inference_tpu.eval.perplexity \
        --checkpoint /path/hf_dir --text wiki.test.txt \
        [--quant int8 --group-size 0] [--window 1024 --stride 512]

The Δppl acceptance gates from BASELINE.md compare two calls of this with
the same ids: FP16/BF16 params vs quantized params.
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.models import registry as _registry
from llm_inference_tpu.ops import kvcache


def score_token_logprobs(
    cfg: ModelConfig,
    params,
    ids: np.ndarray,          # [N] int32 token ids (a full document stream)
    window: int = 1024,
    stride: int = 512,
) -> np.ndarray:
    """Log p(token_i | context) for every position i ≥ 1. Returns [N-1] f32.

    Each window is one prefill forward with logits_mode="all"; positions
    already scored by an earlier window are skipped (sliding-window overlap
    provides context only).
    """
    ids = np.asarray(ids, np.int32)
    N = ids.shape[0]
    window = min(window, N)
    if stride >= window and N > window:
        # next window's first target (position `end`) would never be
        # scored — caught hours later by the NaN assert; reject up front
        raise ValueError(f"stride ({stride}) must be < window ({window}) "
                         f"so consecutive windows overlap by ≥1 token")

    fwd = jax.jit(
        lambda p, i, q, c: _registry.get_model(cfg.name).forward(
            cfg, p, i, q, c, logits_mode="all"),
        donate_argnums=(3,))

    out = np.full((N - 1,), np.nan, np.float32)
    start = 0
    while True:
        end = min(start + window, N)
        chunk = jnp.asarray(ids[start:end])[None]
        pos = jnp.arange(end - start, dtype=jnp.int32)[None]
        # families with non-standard caches (deepseek's MLA latent cache)
        # provide their own constructor — same hook the engine uses
        model_nc = getattr(_registry.get_model(cfg.name), "new_cache", None)
        if model_nc is not None:
            cache = model_nc(cfg, 1, window, jnp.dtype(cfg.dtype))
        else:
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       window, cfg.head_dim,
                                       jnp.dtype(cfg.dtype))
        logits, _ = fwd(params, chunk, pos, cache)   # [1, T, V]
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        tgt = ids[start + 1:end]
        token_lp = np.asarray(
            jnp.take_along_axis(logp[:-1], jnp.asarray(tgt)[:, None],
                                axis=-1))[:, 0]
        # fill only not-yet-scored positions (the window's fresh tail)
        lo = start  # global index of first target this window could score
        fresh = np.isnan(out[lo:lo + token_lp.shape[0]])
        out[lo:lo + token_lp.shape[0]][fresh] = token_lp[fresh]
        if end == N:
            break
        start = end - (window - stride)
    assert not np.isnan(out).any()
    return out


def perplexity(cfg: ModelConfig, params, ids, window: int = 1024,
               stride: int = 512) -> float:
    """exp(mean NLL) over the token stream."""
    lp = score_token_logprobs(cfg, params, ids, window, stride)
    return float(np.exp(-lp.mean()))


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse
    ap = argparse.ArgumentParser(description="Perplexity harness")
    ap.add_argument("--checkpoint", required=True, help="HF safetensors dir")
    ap.add_argument("--text", required=True, help="plain-text eval file")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer.json / reference .bin (default: from "
                         "checkpoint dir)")
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int4"])
    ap.add_argument("--group-size", type=int, default=0)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=0,
                    help="truncate the eval stream (0 = all)")
    args = ap.parse_args(argv)

    from llm_inference_tpu.config import QuantConfig
    from llm_inference_tpu.engine import load_tokenizer
    from llm_inference_tpu.utils import checkpoint

    cfg, params = checkpoint.load_hf_checkpoint(args.checkpoint)
    tok = load_tokenizer(args.tokenizer or args.checkpoint)
    with open(args.text) as f:
        ids = np.asarray(tok.encode(f.read()), np.int32)
    if args.max_tokens:
        ids = ids[:args.max_tokens]
    print(f"[ppl] {ids.shape[0]} tokens", file=sys.stderr)

    # family-aware weight prep (same dispatch as cli.build_engine: fusing
    # qkv into wqkv is a LLAMA-layout contract — gemma2/mixtral keep raw
    # keys and only get the blocked streaming layout)
    from llm_inference_tpu.models import registry
    model_mod = registry.get_model(cfg.name)
    is_llama = model_mod is llama
    if args.quant != "none":
        quantize_fn = getattr(model_mod, "quantize_params",
                              llama.quantize_params)
        params = quantize_fn(
            params, QuantConfig(weights=args.quant,
                                group_size=args.group_size))
    if is_llama:
        params = llama.prepare_params(params)
    elif args.quant != "none":
        params = llama.prepare_params(params, fuse=False)
    ppl = perplexity(cfg, params, ids, args.window, args.stride)
    print(f"perplexity: {ppl:.4f}")


if __name__ == "__main__":
    main()
