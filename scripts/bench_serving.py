"""Serving-stack bench: the SCHEDULER on real hardware (VERDICT r3 #3).

Every prior TPU number drove a raw jitted forward/scan; this script drives
the actual serving stack — ContinuousBatchingScheduler / PagedScheduler /
SpeculativeBatchingScheduler end-to-end (admission, prefill-insert, decode
interleave, host loop) — under a Poisson-ish arrival trace, and reports:

  - aggregate generated tok/s over the busy window
  - p50/p95 TTFT under load (admission + prefill + queueing)
  - p50/p95 steady-state inter-token latency per request
  - the raw-scan ceiling at the same batch size (measured in-process with
    the same engine) and the serving/raw ratio — the host-loop+admission
    overhead the reference's single-request Response loop
    (reference: src/models/llama/llama.cpp:363-449) never had to face.

Usage (chip):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_serving.py \
      [--model 7b] [--quant int4] [--kv int8] [--slots 8] [--paged]
      [--speculative] [--requests 32] [--rate 16] [--prompt-len 128]
      [--max-new 64] [--json BENCH_serving.json]
CPU smoke:
  JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/bench_serving.py \
      --model tiny --requests 6 --rate 100 --max-new 8 --slots 2
"""
import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pctl(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b")
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--rate", type=float, default=16.0,
                    help="mean arrivals/s (Poisson)")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--prefix-cache", action="store_true",
                    help="paged + prefix cache; half the trace repeats "
                    "earlier prompts — reports repeat-TTFT vs fresh-TTFT")
    ap.add_argument("--speculative", action="store_true",
                    help="n-gram speculative scheduler (repetitive "
                    "prompts; reports accepted/device-step)")
    ap.add_argument("--no-raw", action="store_true",
                    help="skip the raw-scan ceiling measurement")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from llm_inference_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                          QuantConfig, llama2_7b,
                                          tiny_llama)
    from llm_inference_tpu.engine import InferenceEngine
    from llm_inference_tpu.engine.scheduler import (
        ContinuousBatchingScheduler, PagedScheduler)
    from llm_inference_tpu.models import llama

    if args.model == "tiny":
        cfg = tiny_llama()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        if args.quant in ("int8", "int4"):
            params = llama.quantize_params(
                params, QuantConfig(weights=args.quant,
                                    group_size=min(args.group_size, 32)))
            params = llama.prepare_params(params)
        cache_dtype = (args.kv if args.kv in ("int8", "int4")
                       else jnp.bfloat16)
    else:
        cfg = llama2_7b()
        qcfg = QuantConfig(weights=args.quant, group_size=args.group_size,
                           quantize_embedding=True)
        t0 = time.time()
        params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0),
                                             qcfg)
        params = llama.prepare_params(params)
        log(f"params {llama.param_bytes(params)/1e9:.2f} GB "
            f"({time.time()-t0:.0f}s)")
        cache_dtype = (args.kv if args.kv in ("int8", "int4")
                       else jnp.bfloat16)

    paged_mode = args.paged or args.prefix_cache
    ecfg = EngineConfig(max_seq_len=args.seq_len,
                        max_batch_size=args.slots,
                        prefill_buckets=(args.prompt_len,),
                        decode_chunk=8,
                        page_size=(args.page_size if paged_mode else 0))
    eng = InferenceEngine(cfg, params, engine_cfg=ecfg,
                          cache_dtype=cache_dtype)
    gen = GenerationConfig(greedy=True, max_new_tokens=args.max_new,
                           eos_token_ids=())
    if args.speculative:
        from llm_inference_tpu.engine.speculative import (
            SpeculativeBatchingScheduler)
        sched = SpeculativeBatchingScheduler(eng, gen, slots=args.slots)
    elif args.prefix_cache:
        sched = PagedScheduler(eng, gen, slots=args.slots,
                               prefix_cache=True)
    elif args.paged:
        sched = PagedScheduler(eng, gen, slots=args.slots)
    else:
        sched = ContinuousBatchingScheduler(eng, gen, slots=args.slots)

    rng = np.random.default_rng(0)
    P = args.prompt_len
    if args.speculative:
        # repetitive prompts (the n-gram drafter's regime): a short cycle
        # repeated across the prompt, greedy continuation stays cyclic
        base = rng.integers(5, 97, 8)
        prompts = [list(np.tile(base, P // len(base) + 1)[:P])
                   for _ in range(args.requests)]
    else:
        prompts = [list(rng.integers(5, cfg.vocab_size - 1, P))
                   for _ in range(args.requests)]
    repeat_idx = set()
    if args.prefix_cache:
        # every second request repeats an earlier prompt — its prefill
        # should hit shared pages and TTFT collapse to the suffix cost
        for i in range(1, args.requests, 2):
            prompts[i] = list(prompts[i - 1])
            repeat_idx.add(i)
    gaps = rng.exponential(1.0 / args.rate, args.requests)
    gaps[0] = 0.0
    arrivals = np.cumsum(gaps)

    # warm-up: compile prefill + all-slots decode programs outside the
    # timed window (a full batch so every admission/decode shape is seen)
    log("warm-up (compiles)...")
    t0 = time.time()
    chunk = ecfg.decode_chunk
    # compile every program the trace can hit: wave-admission prefills at
    # each power-of-two batch bucket, and the steps=decode_chunk decode
    # program (max_new spans a full chunk) — none compile mid-trace
    g = 1
    warmed = set()
    while g <= args.slots:
        for p in prompts[:g]:
            sched.submit(list(p), max_new_tokens=2 * chunk + 1)
        while sched.step():
            pass
        warmed.add(g)
        g *= 2
    if args.slots not in warmed:
        # non-power-of-two slots: a trace wave of k in (g/2, slots] pads
        # to a batch bucket the pow2 loop never compiled — warm one burst
        # of exactly `slots` requests so no compile lands mid-trace
        for p in prompts[:args.slots]:
            sched.submit(list(p), max_new_tokens=2 * chunk + 1)
        while sched.step():
            pass
    log(f"warm-up done ({time.time()-t0:.0f}s)")
    sched.phase_s = {k: 0.0 for k in sched.phase_s}
    sched.phase_n = {k: 0 for k in sched.phase_n}

    log(f"trace: {args.requests} reqs @ {args.rate}/s, prompt {P}, "
        f"max_new {args.max_new}, slots {args.slots}")
    reqs = []
    t_start = time.perf_counter()
    nxt = 0
    while True:
        now = time.perf_counter() - t_start
        while nxt < len(prompts) and arrivals[nxt] <= now:
            reqs.append(sched.submit(list(prompts[nxt])))
            nxt += 1
        busy = sched.step()
        if not busy and nxt >= len(prompts):
            break
        if not busy:
            # idle until the next arrival
            time.sleep(max(0.0, arrivals[nxt] - (time.perf_counter()
                                                 - t_start)))
    t_end = time.perf_counter()

    produced = sum(len(r.output_ids) for r in reqs)
    span = max(r.done_t for r in reqs) - min(r.submit_t for r in reqs)
    tok_s = produced / span
    ttfts = [r.ttft_s for r in reqs]
    itls = [(r.done_t - r.first_token_t) / (len(r.output_ids) - 1)
            for r in reqs if len(r.output_ids) > 1]
    log(f"serving: {produced} tokens in {span:.2f}s → {tok_s:.1f} tok/s")
    ph, pn = sched.phase_s, sched.phase_n
    log(f"phases: admit {ph['admit']:.2f}s ({pn['admit']} admissions, "
        f"{ph['admit']/max(pn['admit'],1)*1e3:.0f} ms each), "
        f"dispatch {ph['dispatch']:.2f}s / harvest {ph['harvest']:.2f}s "
        f"({pn['chunks']} chunks, "
        f"{(ph['dispatch']+ph['harvest'])/max(pn['chunks'],1)*1e3:.0f} ms "
        f"each)")
    # transport-RTT accounting: each blocking fetch (pn['syncs']) pays one
    # device round trip — through the bench relay that is ~30 ms of pure
    # transport the on-chip deployment would not pay. Measure the actual
    # round-trip floor with a trivial fetch and report the RTT-adjusted
    # serving rate alongside the raw one.
    import jax as _jax
    import jax.numpy as _jnp
    # a FRESH tiny computation each rep: device_get of an already-fetched
    # array replays the cached host copy and measures 0 — each rep must
    # dispatch + execute + fetch to see the true transport cost
    tick = _jax.jit(lambda x: x + 1)
    z = tick(_jnp.zeros((), _jnp.int32))
    _jax.device_get(z)
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        z = tick(z)
        _jax.device_get(z)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    rtt_total = pn["syncs"] * rtt
    log(f"syncs: {pn['syncs']} blocking fetches × {rtt*1e3:.1f} ms RTT "
        f"= {rtt_total:.2f}s transport ({rtt_total/span*100:.0f}% of span)")
    log(f"TTFT p50 {pctl(ttfts,50)*1e3:.0f} ms  p95 "
        f"{pctl(ttfts,95)*1e3:.0f} ms")
    log(f"ITL  p50 {pctl(itls,50)*1e3:.2f} ms  p95 "
        f"{pctl(itls,95)*1e3:.2f} ms")
    result = {
        "metric": "serving_tok_s", "value": round(tok_s, 1),
        "unit": "tok/s",
        "config": {"model": cfg.name, "quant": args.quant, "kv": args.kv,
                   "slots": args.slots, "paged": paged_mode,
                   "prefix_cache": args.prefix_cache,
                   "speculative": args.speculative,
                   "requests": args.requests, "rate": args.rate,
                   "prompt_len": P, "max_new": args.max_new},
        "ttft_p50_ms": round(pctl(ttfts, 50) * 1e3, 1),
        "ttft_p95_ms": round(pctl(ttfts, 95) * 1e3, 1),
        "itl_p50_ms": round(pctl(itls, 50) * 1e3, 2),
        "itl_p95_ms": round(pctl(itls, 95) * 1e3, 2),
        "wall_s": round(t_end - t_start, 2),
        "phases": {"admit_s": round(ph["admit"], 3),
                   "dispatch_s": round(ph["dispatch"], 3),
                   "harvest_s": round(ph["harvest"], 3),
                   "admissions": pn["admit"], "chunks": pn["chunks"],
                   "syncs": pn["syncs"]},
        "rtt_ms": round(rtt * 1e3, 2),
        "rtt_total_s": round(rtt_total, 3),
    }
    if args.speculative:
        st = sched.spec_stats
        result["accepted_per_step"] = round(
            st["produced"] / max(st["steps"], 1), 2)
        log(f"speculative: {st['produced']} tokens / {st['steps']} device "
            f"steps = {result['accepted_per_step']} tok/device-step")
    if repeat_idx:
        fresh = [r.ttft_s for i, r in enumerate(reqs)
                 if i not in repeat_idx]
        reps = [r.ttft_s for i, r in enumerate(reqs) if i in repeat_idx]
        result["ttft_fresh_p50_ms"] = round(pctl(fresh, 50) * 1e3, 1)
        result["ttft_repeat_p50_ms"] = round(pctl(reps, 50) * 1e3, 1)
        log(f"prefix cache: fresh TTFT p50 {pctl(fresh,50)*1e3:.0f} ms, "
            f"repeat TTFT p50 {pctl(reps,50)*1e3:.0f} ms")

    if not args.no_raw:
        # raw-scan ceiling: same engine forward, all slots decoding, no
        # host loop — the delta is scheduler+admission overhead
        from llm_inference_tpu.ops import kvcache
        B, S = args.slots, args.seq_len
        cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, S,
                                   cfg.head_dim, cache_dtype)
        ids = jnp.ones((B, P), jnp.int32)
        pos2 = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None],
                                (B, P))
        prefill_j = jax.jit(
            lambda p, i, q, c: llama.forward(cfg, p, i, q, c),
            donate_argnums=(3,))
        logits, cache = prefill_j(params, ids, pos2, cache)
        token0 = jnp.argmax(logits, -1).astype(jnp.int32)
        pos0 = jnp.full((B,), P, jnp.int32)

        def decode_n(params, cache, token, p0, steps):
            def body(carry, _):
                cache, token, p = carry
                lg, cache = llama.forward(cfg, params, token[:, None],
                                          p[:, None], cache)
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                return (cache, nxt, p + 1), nxt
            (cache, token, p), toks = jax.lax.scan(
                body, (cache, token, p0), None, length=steps)
            return toks, cache

        times = {}
        for steps in (8, 32):
            jfn = jax.jit(lambda pr, c, t, p: decode_n(pr, c, t, p, steps),
                          donate_argnums=(1,))
            toks, cache = jfn(params, cache, token0, pos0)
            toks.block_until_ready()      # compile
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                toks, cache = jfn(params, cache, token0, pos0)
                toks.block_until_ready()
                reps.append(time.perf_counter() - t0)
            times[steps] = min(reps)
        ms_step = (times[32] - times[8]) / 24 * 1e3
        raw = B / (ms_step / 1e3)
        log(f"raw-scan ceiling bs={B}: {ms_step:.2f} ms/step "
            f"→ {raw:.1f} tok/s; serving/raw = {tok_s/raw:.2f}")
        result["raw_scan_tok_s"] = round(raw, 1)
        result["serving_over_raw"] = round(tok_s / raw, 3)
        # what the ratio would be without the relay's transport RTT on
        # every blocking fetch (the on-chip-deployment equivalent)
        adj = produced / max(span - rtt_total, 1e-9)
        result["serving_tok_s_rtt_adj"] = round(adj, 1)
        result["serving_over_raw_rtt_adj"] = round(adj / raw, 3)
        log(f"RTT-adjusted: {adj:.1f} tok/s, serving/raw = {adj/raw:.2f}")

    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
