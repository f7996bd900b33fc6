"""Marginal-timed streaming-width sweep for the decode GEMV kernels.

Round 3 picked the npair block widths (qkv 768, wo 512, gu 512, down 256)
with per-dispatch timing that, per the round-4 lm_head finding, can be
dominated by the ~1.3 ms relay dispatch latency — the lm_head's "sweet
spot" 768 actually ran at 51% of SoL while 1536 hit 98%. This re-sweeps
every layer GEMV with the only trustworthy method here: a jitted scan at
two lengths, marginal time per iteration, with the output fed back so the
scan cannot be collapsed.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_gemv_widths.py
Env: SWEEP_BITS=int4|int8 (default int4, g=128)
"""
import os
import sys
import time

import numpy as np

from llm_inference_tpu.utils import compile_cache
compile_cache.enable()

import jax
import jax.numpy as jnp

from llm_inference_tpu.ops import quantization as Q
from llm_inference_tpu.ops.pallas import quant_matmul as QM


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BITS = os.environ.get("SWEEP_BITS", "int4")
HBM = 819e9
key = jax.random.PRNGKey(0)

# 7B layer shapes: (name, K, N, current default out-width)
SHAPES = [
    ("qkv", 4096, 12288, 768),
    ("wo", 4096, 4096, 512),
    ("gate_up", 4096, 22016, 512),
    ("down", 11008, 4096, 256),
    ("lm_head", 4096, 32256, 768),
]


def marginal_us(qt, K):
    x0 = jax.random.normal(key, (1, K), jnp.bfloat16)

    def fn(x, steps):
        def body(x, _):
            y = QM.quant_matmul(x, qt)
            return (x + y[:, :K].astype(x.dtype) * 1e-6), None
        x, _ = jax.lax.scan(body, x, None, length=steps)
        return x

    ts = {}
    for steps in (8, 40):
        j = jax.jit(lambda x, s=steps: fn(x, s))
        y = j(x0)
        y.block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            y = j(x0)
            y.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts[steps] = best
    return (ts[40] - ts[8]) / 32 * 1e6


def widths(N):
    quantum = 256
    out = []
    w = quantum
    while w <= min(N, 4096):
        if N % w == 0:
            out.append(w)
        w += quantum
    return out


for name, K, N, cur in SHAPES:
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    if BITS == "int4":
        qrow = Q.quantize(w, 4, 128)
        sol = (K * N / 2 + K * N / 32) / HBM * 1e6
        mk = lambda bn: Q.to_blocked_npair(qrow, bn)
        # down's K=11008 needs y[:, :K] feedback — N may be < K; guard
    else:
        qrow = Q.quantize(w, 8, 0)
        sol = (K * N + N * 4) / HBM * 1e6
        mk = lambda bn: Q.to_blocked(qrow, bn)
    cand = [b for b in widths(N) if b in
            (256, 512, 768, 1024, 1536, 2048, 3072, 4096)]
    results = {}
    for bn in cand:
        try:
            qt = mk(bn)
        except AssertionError:
            continue
        # feedback needs N >= K; pad the slice circularly when N < K
        if N < K:
            def marg(qt=qt):
                x0 = jax.random.normal(key, (1, K), jnp.bfloat16)

                def fn(x, steps):
                    def body(x, _):
                        y = QM.quant_matmul(x, qt)
                        reps = -(-K // N)
                        yk = jnp.tile(y, (1, reps))[:, :K]
                        return (x + yk.astype(x.dtype) * 1e-6), None
                    x, _ = jax.lax.scan(body, x, None, length=steps)
                    return x
                ts = {}
                for steps in (8, 40):
                    j = jax.jit(lambda x, s=steps: fn(x, s))
                    y = j(x0)
                    y.block_until_ready()
                    best = 1e9
                    for _ in range(3):
                        t0 = time.perf_counter()
                        y = j(x0)
                        y.block_until_ready()
                        best = min(best, time.perf_counter() - t0)
                    ts[steps] = best
                return (ts[40] - ts[8]) / 32 * 1e6
            us = marg()
        else:
            us = marginal_us(qt, K)
        results[bn] = us
        mark = " <- current" if bn == cur else ""
        log(f"{name} ({BITS}) bn={bn}: {us:.1f} us "
            f"({sol/us*100:.0f}% of {sol:.1f}){mark}")
    best_bn = min(results, key=results.get)
    log(f"{name}: BEST bn={best_bn} ({results[best_bn]:.1f} us)"
        f"{' != current ' + str(cur) if best_bn != cur else ''}")
