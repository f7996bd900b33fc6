"""Sweep quant_matmul block sizes at decode GEMV shapes on the real chip.

Each shape is timed as a jitted scan of CALLS iterations (data-dependent
chain via x feedback) to amortize relay RTT; reports achieved GB/s vs 819.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.ops.quantization import quantize
from llm_inference_tpu.ops.pallas import quant_matmul as qm


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM = 819e9
CALLS = 200

# (name, K, N) at 7B decode: fused qkv, wo, fused gate_up, down, lm_head-int8
SHAPES = [
    ("qkv", 4096, 12288),
    ("wo", 4096, 4096),
    ("gate_up", 4096, 22016),
    ("down", 11008, 4096),
    ("lm_head", 4096, 32000),
]


def bench(K, N, bn, bk, bits=8, M=8):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    qt = quantize(w, bits, 0)  # per-channel
    x0 = jnp.ones((M, K), jnp.bfloat16)

    def step(x, _):
        y = qm.quant_matmul(x, qt, block_n=bn, block_k=bk)
        # feed back: fold N → K cheaply to create dependency
        xn = jnp.sum(y, axis=-1, keepdims=True) * 1e-6
        return x0 + xn.astype(jnp.bfloat16), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(step, x, None, length=CALLS)
        return x

    r = run(x0)
    np.asarray(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x0))
        best = min(best, time.perf_counter() - t0)
    dt = best / CALLS
    bytes_ = qt.q.size + qt.scale.size * 4 + M * K * 2 + M * N * 2
    return dt, bytes_ / dt / HBM


CONFIGS = [(256, 512), (512, 2048), (512, 4096), (1024, 2048), (256, 11008)]

for name, K, N in SHAPES:
    kdim = K
    rows = []
    for bn, bk in CONFIGS:
            if N % bn or kdim % bk:
                continue
            tile_mb = bk * bn / 1e6
            if tile_mb > 4.5:
                continue
            try:
                dt, eff = bench(K, N, bn, bk)
                rows.append((eff, bn, bk, dt))
                log(f"{name:8s} bn={bn:5d} bk={bk:5d} tile={tile_mb:4.1f}MB "
                    f"{dt*1e6:7.1f}us eff={eff*100:5.1f}%")
            except Exception as e:
                log(f"{name:8s} bn={bn:5d} bk={bk:5d} FAIL {type(e).__name__}")
    rows.sort(reverse=True)
    if rows:
        eff, bn, bk, dt = rows[0]
        log(f">>> {name}: best bn={bn} bk={bk} {dt*1e6:.1f}us {eff*100:.1f}%\n")
