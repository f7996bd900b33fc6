"""Long-context chip A/Bs (the CLAUDE.md queue items that need S=4096).

1. Decode @ S=4096, LLaMA-2-7B INT4(g=128) weights: INT8 KV vs INT4 KV.
   This is the KV-stream-bound regime (int8 KV measured 89% of roofline);
   int4 halves the cache bytes so the absolute tok/s should rise even if
   the roofline fraction dips (the unpack costs VPU work).
2. Long prefill TTFT @ T=4096 (dense cache): the rewritten flash kernel
   with causal block skipping. The old kernel streamed the full S
   rectangle for every query block (~2x the work at T==S).

Run: env PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_longctx.py
Flags via env: LONGCTX_SKIP_PREFILL=1, LONGCTX_SKIP_DECODE=1.
"""
import os
import sys
import time

import numpy as np

HBM_BW = 819e9  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_decode(cfg, params, cache_dtype, *, seq_len, pos0_val,
                   steps_a, steps_b):
    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.ops import kvcache

    cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                               seq_len, cfg.head_dim, cache_dtype)

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

    token0 = jnp.ones((1,), jnp.int32)
    pos0 = jnp.full((1,), pos0_val, jnp.int32)
    times = {}
    for steps in (steps_a, steps_b):
        fn = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s),
                     donate_argnums=(1,))
        t0 = time.time()
        toks, cache2 = fn(params, cache, token0, pos0)
        np.asarray(toks[-1])
        log(f"[longctx:{cache_dtype}] decode[{steps}] compile+run "
            f"{time.time()-t0:.1f}s")
        del cache2
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                   seq_len, cfg.head_dim, cache_dtype)
        best = float("inf")
        for _ in range(3):
            cache_in = cache
            t0 = time.perf_counter()
            toks, cache_out = fn(params, cache_in, token0, pos0)
            np.asarray(toks[-1])
            best = min(best, time.perf_counter() - t0)
            cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                       seq_len, cfg.head_dim, cache_dtype)
        times[steps] = best
        log(f"[longctx:{cache_dtype}] decode {steps} steps: {best*1e3:.1f} ms")

    dt = (times[steps_b] - times[steps_a]) / (steps_b - steps_a)
    tok_s = 1.0 / dt

    from llm_inference_tpu.models import llama as L
    wbytes = L.param_bytes(params)
    wbytes -= params["embed"].size * params["embed"].dtype.itemsize
    wbytes += params["embed"].shape[1] * 2
    kv_item = {"int8": 1.0, "int4": 0.5}[cache_dtype]
    kv_mean = pos0_val + (steps_a + steps_b) // 2
    kv_bytes = (cfg.num_layers * cfg.num_kv_heads * kv_mean
                * (cfg.head_dim * kv_item + 4) * 2)   # +4B f32 scale/tok/head
    roofline = HBM_BW / (wbytes + kv_bytes)
    frac = tok_s / roofline
    log(f"[longctx:{cache_dtype}] marginal {dt*1e3:.2f} ms/tok → "
        f"{tok_s:.1f} tok/s; roofline {roofline:.1f} "
        f"({kv_bytes/1e6:.0f} MB KV/tok) → {frac*100:.1f}%")
    return tok_s, frac


def measure_prefill(cfg, params, *, T, cache_dtype):
    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.ops import kvcache

    def new_cache():
        return kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                  T, cfg.head_dim, cache_dtype)

    prefill_j = jax.jit(lambda p, i, q, c: llama.forward(cfg, p, i, q, c),
                        donate_argnums=(3,))
    ids = jnp.ones((1, T), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    t0 = time.time()
    logits, cache = prefill_j(params, ids, pos, new_cache())
    logits.block_until_ready()
    log(f"[longctx:prefill] T={T} compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        logits, cache = prefill_j(params, ids, pos, new_cache())
        np.asarray(logits[0, :8])
        ts.append(time.perf_counter() - t0)
    ttft = min(ts)
    log(f"[longctx:prefill] T={T} best-of-3 {ttft*1e3:.1f} ms "
        f"(incl ~30ms relay RTT)")
    return ttft


def main():
    import jax
    from llm_inference_tpu.config import QuantConfig, llama2_7b
    from llm_inference_tpu.models import llama

    assert jax.default_backend() == "tpu", "chip bench"
    cfg = llama2_7b()
    qcfg = QuantConfig(weights="int4", group_size=128,
                       quantize_embedding=True)
    t0 = time.time()
    params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
    params = llama.prepare_params(params)
    log(f"[longctx] int4 params built in {time.time()-t0:.1f}s")

    results = {}
    if not os.environ.get("LONGCTX_SKIP_DECODE"):
        for kvd in ("int8", "int4"):
            tok_s, frac = measure_decode(
                cfg, params, kvd, seq_len=4096, pos0_val=3900,
                steps_a=32, steps_b=160)
            results[f"decode_s4096_kv{kvd}"] = (tok_s, frac)

    if not os.environ.get("LONGCTX_SKIP_PREFILL"):
        import jax.numpy as jnp
        del params
        qcfg8 = QuantConfig(weights="int8", quantize_embedding=True)
        params8 = llama.init_params_quantized(cfg, jax.random.PRNGKey(0),
                                              qcfg8)
        params8 = llama.prepare_params(params8)
        for T in (2048, 4096):
            ttft = measure_prefill(cfg, params8, T=T,
                                   cache_dtype=jnp.bfloat16)
            results[f"prefill_t{T}_ttft_ms"] = ttft * 1e3

    log("[longctx] summary:", results)


if __name__ == "__main__":
    main()
