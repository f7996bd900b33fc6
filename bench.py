"""Headline benchmark: LLaMA-2-7B INT8 weight-only decode, batch=1, on one
TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline reports the
fraction of the chip's HBM-bandwidth ROOFLINE achieved — the honest
speed-of-light comparison for a memory-bound decode (v5e ≈ 819 GB/s; decode
cost ≈ weight bytes + KV bytes per token). 1.0 = speed of light.

A secondary INT4 + INT8-KV-cache config (BASELINE.md row 3) is measured and
logged to stderr.

Measurement notes: this environment reaches the chip through a relay with
~30 ms fixed round-trip latency, so the decode loop runs as ONE jitted
lax.scan of many steps (greedy sampling feeding back on device) and latency
is amortized + subtracted via two different step counts.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(cfg, qcfg, *, cache_dtype, seq_len, prompt_len, steps_a, steps_b,
            hbm_bw, tag):
    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.ops import kvcache

    t0 = time.time()
    params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
    # N-pair difference-of-dots int4 layout is the default (chip A/B:
    # 170.9 vs 155.4 tok/s); BENCH_INT4_NPAIR=0 A/Bs the plain layout
    params = llama.prepare_params(
        params, int4_npair=os.environ.get("BENCH_INT4_NPAIR", "1") == "1")
    log(f"[bench:{tag}] params built in {time.time()-t0:.1f}s, "
        f"{llama.param_bytes(params)/1e9:.2f} GB")

    def new_cache():
        return kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                  seq_len, cfg.head_dim, cache_dtype)

    # ---- prefill (TTFT component) ----
    prefill_j = jax.jit(lambda p, i, q, c: llama.forward(cfg, p, i, q, c),
                        donate_argnums=(3,))
    ids = jnp.ones((1, prompt_len), jnp.int32)
    pos = jnp.arange(prompt_len, dtype=jnp.int32)[None]
    t0 = time.time()
    logits, cache = prefill_j(params, ids, pos, new_cache())
    logits.block_until_ready()
    log(f"[bench:{tag}] prefill compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        logits, cache = prefill_j(params, ids, pos, new_cache())
        np.asarray(logits[0, :8])  # fetch → true completion
        ts.append(time.perf_counter() - t0)
    ttft = min(ts)
    log(f"[bench:{tag}] prefill({prompt_len} tokens) best-of-3 ≈ "
        f"{ttft*1e3:.1f} ms (includes ~30ms relay RTT)")

    # ---- decode: jitted scan of N greedy steps ----
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

    token0 = jnp.argmax(logits, -1).astype(jnp.int32)
    pos0 = jnp.full((1,), prompt_len, jnp.int32)

    times = {}
    for steps in (steps_a, steps_b):
        # donate the cache (scan carry) — without it XLA copies the whole
        # cache HBM→HBM at scan entry (scripts/bench_batched.py measured it)
        fn = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s),
                     donate_argnums=(1,))
        t0 = time.time()
        toks, cache = fn(params, cache, token0, pos0)
        np.asarray(toks[-1])
        log(f"[bench:{tag}] decode[{steps}] compile+run {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            toks, cache = fn(params, cache, token0, pos0)
            np.asarray(toks[-1])     # fetch → true completion
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
        log(f"[bench:{tag}] decode {steps} steps: {best*1e3:.1f} ms")

    # amortize fixed relay latency: marginal time per step
    dt = (times[steps_b] - times[steps_a]) / (steps_b - steps_a)
    tokens_per_s = 1.0 / dt

    # roofline: bytes touched per decode step
    wbytes = llama.param_bytes(params)
    # embed table is gathered (1 row), not streamed — subtract it
    wbytes -= params["embed"].size * params["embed"].dtype.itemsize
    wbytes += params["embed"].shape[1] * 2
    kv_itemsize = 1 if cache_dtype == "int8" else 2
    # mean KV length over the MARGINAL window (steps_a..steps_b — the steps
    # the metric actually measures); the decode kernel's position gating
    # streams only the live prefix, not the whole bucketed S
    kv_mean = prompt_len + (steps_a + steps_b) // 2
    kv_bytes = (cfg.num_layers * cfg.num_kv_heads
                * kv_mean * cfg.head_dim * 2 * kv_itemsize)
    roofline = hbm_bw / (wbytes + kv_bytes)
    frac = tokens_per_s / roofline
    log(f"[bench:{tag}] marginal decode: {dt*1e3:.2f} ms/token → "
        f"{tokens_per_s:.1f} tok/s; roofline {roofline:.1f} tok/s "
        f"({wbytes/1e9:.2f} GB weights + {kv_bytes/1e6:.0f} MB KV per token) "
        f"→ {frac*100:.1f}%")
    return tokens_per_s, frac, ttft


def main():
    from llm_inference_tpu.utils import compile_cache
    compile_cache.enable(verbose=True)

    import jax
    from llm_inference_tpu.config import QuantConfig, llama2_7b, tiny_llama

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"[bench] backend={backend} devices={jax.devices()}")

    if on_tpu:
        cfg = llama2_7b()
        steps_a, steps_b = 32, 160
        hbm_bw = 819e9  # v5e
    else:  # smoke mode for CI machines
        cfg = tiny_llama(num_kv_heads=4)
        steps_a, steps_b = 4, 12
        hbm_bw = 50e9

    # cache sized to the request limit (prompt + max generation), the way
    # a serving engine buckets it; the decode kernel position-gates its
    # streaming, so the KV cost scales with the LIVE prefix, not S
    seq_len = 512 if on_tpu else 64
    prompt_len = 128 if on_tpu else 16
    common = dict(seq_len=seq_len, prompt_len=prompt_len, steps_a=steps_a,
                  steps_b=steps_b, hbm_bw=hbm_bw)

    import jax.numpy as jnp

    # headline: INT8 weight-only (BASELINE.md row 2).
    # BENCH_ONLY=int4 skips it — kernel A/B iteration loops only need the
    # int4 secondary and the int8 run costs ~6 min of chip time each.
    only = os.environ.get("BENCH_ONLY", "")
    if only == "int4":
        tok_s, frac = float("nan"), float("nan")
    else:
        tok_s, frac, ttft = measure(
            cfg, QuantConfig(weights="int8", quantize_embedding=True),
            cache_dtype=jnp.bfloat16, tag="int8", **common)

    # secondary: INT4 weights (g=128) + INT8 KV cache (BASELINE.md row 3)
    if on_tpu:
        try:
            tok4, frac4, _ = measure(
                cfg, QuantConfig(weights="int4", group_size=128,
                                 quantize_embedding=True),
                cache_dtype="int8", tag="int4+kv8", **common)
            log(f"[bench] secondary int4+int8kv: {tok4:.1f} tok/s "
                f"({frac4*100:.1f}% of roofline)")
        except Exception as e:  # secondary must never sink the headline
            log(f"[bench] secondary int4 config failed: {type(e).__name__}: {e}")

    metric = ("llama2_7b_int8_decode_tokens_per_s" if on_tpu
              else "tiny_llama_int8_decode_tokens_per_s_cpu_smoke")
    print(json.dumps({
        "metric": metric,
        "value": round(tok_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
