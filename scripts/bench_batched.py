"""Batched decode bench + per-op profile (BASELINE.md row 3: continuous
batching bs=8-32).

Measures marginal ms/step of a jitted B-row greedy decode scan at several
batch sizes, reports aggregate tok/s vs the HBM roofline
(weights + B*KV per step), and optionally captures a per-XLA-op profile
of one scan to attribute the gap.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_batched.py \
            [--bs 8,32] [--quant int8|int4] [--kv int8|int4|bf16] [--profile]
"""
import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="8,32")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv", default="bf16")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    from llm_inference_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.config import QuantConfig, llama2_7b
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.ops import kvcache

    cfg = llama2_7b()
    hbm_bw = 819e9
    gs = 128 if args.quant == "int4" else 0
    # --quant none: the DENSE bf16 decode row (BASELINE config 1 — the
    # reference's actual shipped path, llama.cpp:318-361). ~13.5 GB of
    # weights; bs beyond 1-8 with long caches will not fit 16 GB HBM.
    qcfg = QuantConfig(weights=args.quant, group_size=gs,
                       quantize_embedding=args.quant != "none")
    cache_dtype = args.kv if args.kv in ("int8", "int4") else jnp.bfloat16

    t0 = time.time()
    params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
    params = llama.prepare_params(params)
    log(f"params {llama.param_bytes(params)/1e9:.2f} GB "
        f"({time.time()-t0:.0f}s)")
    wbytes = llama.param_bytes(params)
    wbytes -= params["embed"].size * params["embed"].dtype.itemsize

    S, P = args.seq_len, args.prompt_len

    def decode_n(params, cache, token, pos0, steps):
        def body(carry, _):
            cache, token, pos = carry
            logits, cache = llama.forward(cfg, params, token[:, None],
                                          pos[:, None], cache)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, nxt, pos + 1), nxt
        (cache, token, pos), toks = jax.lax.scan(
            body, (cache, token, pos0), None, length=steps)
        return toks, cache

    for B in [int(x) for x in args.bs.split(",")]:
        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, S,
                                   cfg.head_dim, cache_dtype)
        ids = jnp.ones((B, P), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
        prefill_j = jax.jit(
            lambda p, i, q, c: llama.forward(cfg, p, i, q, c),
            donate_argnums=(3,))
        t0 = time.time()
        logits, cache = prefill_j(params, ids, pos, cache)
        logits.block_until_ready()
        log(f"[bs={B}] prefill compile+run {time.time()-t0:.1f}s")
        token0 = jnp.argmax(logits, -1).astype(jnp.int32)
        pos0 = jnp.full((B,), P, jnp.int32)

        times = {}
        for steps in (16, 64):
            # donate the cache: without it XLA copies the whole cache at
            # scan entry (and an 8.6 GB int8 bs=32 cache plus its copy OOMs)
            fn = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s),
                         donate_argnums=(1,))
            t0 = time.time()
            toks, cache = fn(params, cache, token0, pos0)
            np.asarray(toks[-1])
            log(f"[bs={B}] decode[{steps}] compile+run {time.time()-t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                toks, cache = fn(params, cache, token0, pos0)
                np.asarray(toks[-1])
                best = min(best, time.perf_counter() - t0)
            times[steps] = best

        dt = (times[64] - times[16]) / 48
        kv_itemsize = {"int8": 1.0, "int4": 0.5}.get(cache_dtype, 2.0)
        kv_bytes = (cfg.num_layers * cfg.num_kv_heads * (P + 40)
                    * cfg.head_dim * 2 * kv_itemsize)
        sol = (wbytes + B * kv_bytes) / hbm_bw
        agg = B / dt
        roof = B / sol
        log(f"[bs={B}] {dt*1e3:.2f} ms/step → {agg:.0f} tok/s aggregate; "
            f"roofline {sol*1e3:.2f} ms ({roof:.0f} tok/s) → "
            f"{100*agg/roof:.1f}%")

        if args.profile:
            from llm_inference_tpu.utils import profiling
            fn = jax.jit(lambda p, c, t, q: decode_n(p, c, t, q, 16),
                         donate_argnums=(1,))
            toks, cache = fn(params, cache, token0, pos0)
            np.asarray(toks[-1])
            with profiling.trace() as d:
                toks, cache = fn(params, cache, token0, pos0)
                np.asarray(toks[-1])
            tot = profiling.op_totals(d)
            print(profiling.format_op_totals(tot, top=25))


if __name__ == "__main__":
    main()
