"""Prototype: npair GEMV dot-dtype and M-padding variants, on chip.

The round-3 profile (scripts/profile_int4.py) put the four decode GEMVs at
72-85% of their DMA speed-of-light. Two suspects:
  - the difference-of-dots runs BOTH dots on the MXU's f32 path (several
    passes per tile) — at GEMV widths the MXU may no longer be free;
  - M is padded 1→8 outside the kernel (jnp.pad + output slice per call,
    ~0.19 ms/step of XLA small-ops in the trace).
Variants per shape: (f32|bf16 dots) × (M=8|M=1). bf16 is EXACT here: raw
bytes are ints in [-128, 127] and lo-nibbles ints in [0, 15], both exactly
representable in bf16; accumulation stays f32 via preferred_element_type.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto_npair_dots.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.utils import compile_cache
compile_cache.enable()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM = 819e9
GSIZE = 128

# (name, K, N, bn_out) — production choose_block_n picks for the 7B stack
SHAPES = [
    ("gate_up", 4096, 22016, 512),
    ("qkv", 4096, 12288, 512),
    ("down", 11008, 4096, 256),
    ("wo", 4096, 4096, 512),
    ("lm_head", 4096, 32000, 256),
]


def make_kernel(M, K, bn_out, dot_dtype):
    bnp = bn_out // 2
    G = K // GSIZE

    def kernel(x_ref, w_ref, s_ref, o_ref):
        x = x_ref[:]
        w = w_ref[0]                     # [K, bnp]
        acc_lo = jnp.zeros((M, bnp), jnp.float32)
        acc_hi = jnp.zeros((M, bnp), jnp.float32)
        for c0 in range(0, K, GSIZE):
            wb = w[c0:c0 + GSIZE]
            bf = wb.astype(dot_dtype)
            lo_u = (wb & 0xF).astype(dot_dtype)
            xg = x[:, c0:c0 + GSIZE].astype(dot_dtype)
            d1 = jnp.dot(xg, bf, preferred_element_type=jnp.float32)
            d2 = jnp.dot(xg, lo_u, preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), -1, keepdims=True)
            g = c0 // GSIZE
            s = s_ref[0][g:g + 1]
            acc_lo += (d2 - 8.0 * xsum) * s[:, :bnp]
            acc_hi += (d1 - d2) * 0.0625 * s[:, bnp:]
        o_ref[:] = jnp.concatenate([acc_lo, acc_hi], 1).astype(o_ref.dtype)
    return kernel


def bench(name, K, N, bn_out, M, dot_dtype, calls_a=400, calls_b=80):
    bnp = bn_out // 2
    NB = N // bn_out
    G = K // GSIZE
    key = jax.random.PRNGKey(0)
    q = jax.random.randint(key, (NB, K, bnp), -128, 128,
                           jnp.int32).astype(jnp.int8)
    s = jnp.full((NB, G, bn_out), 1e-3, jnp.float32)
    x0 = jnp.ones((M, K), jnp.bfloat16)
    kern = make_kernel(M, K, bn_out, dot_dtype)

    def call(xc):
        return pl.pallas_call(
            kern, grid=(NB,),
            in_specs=[pl.BlockSpec((M, K), lambda n: (0, 0)),
                      pl.BlockSpec((1, K, bnp), lambda n: (n, 0, 0)),
                      pl.BlockSpec((1, G, bn_out), lambda n: (n, 0, 0))],
            out_specs=pl.BlockSpec((M, bn_out), lambda n: (0, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xc, q, s)

    def make_run(length):
        @jax.jit
        def run(x):
            def step(xc, _):
                y = call(xc)
                return x0 + (jnp.sum(y, -1, keepdims=True)
                             * 1e-9).astype(jnp.bfloat16), None
            xc, _ = jax.lax.scan(step, x, None, length=length)
            return xc
        return run

    times = {}
    for length in (calls_a, calls_b):
        run = make_run(length)
        np.asarray(run(x0))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    dt = (times[calls_a] - times[calls_b]) / (calls_a - calls_b)
    wbytes = q.size + s.size * 4
    eff = wbytes / dt / HBM
    log(f"{name:8s} M={M} {str(dot_dtype.__name__ if hasattr(dot_dtype, '__name__') else dot_dtype):8s} "
        f"{dt*1e6:7.1f}us  {wbytes/dt/1e9:6.0f} GB/s ({eff*100:4.1f}% HBM)")
    return dt


# (shape, K, N, [bn variants]) — r2 default first, r3 full-budget second
MATRIX = [
    ("gate_up", 4096, 22016, [512]),
    ("qkv", 4096, 12288, [768, 1536]),
    ("down", 11008, 4096, [256, 512]),
    ("wo", 4096, 4096, [512, 1024]),
    ("lm_head", 4096, 32000, [256, 1280]),
    ("lm_pad", 4096, 32256, [768, 1536]),
]

if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    results = {}
    for name, K, N, bns in MATRIX:
        for bn_out in bns:
            results[(name, bn_out)] = bench(f"{name}/bn{bn_out}", K, N,
                                            bn_out, 1, jnp.float32)
    # dot-dtype sanity on the largest shape
    bench("gate_up/bn512/bf16", 4096, 22016, 512, 1, jnp.bfloat16)
    log("\nsummary (us, M=1 f32 dots):")
    for name, K, N, bns in MATRIX:
        row = " ".join(f"bn{bn}={results[(name, bn)]*1e6:7.1f}"
                       for bn in bns)
        log(f"{name:8s} {row}")
