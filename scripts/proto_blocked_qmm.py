"""Prototype: N-blocked contiguous weight layout for the decode GEMV.

Hypothesis: the current [bk, bn] tiles of a row-major [K, N] int8 weight are
strided DMAs (bn-byte rows) and cap at ~25% HBM bw; storing the weight as
[N/bn, K, bn] makes each grid step one contiguous chunk → near-roofline.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM = 819e9
CALLS = 100
M = 8


def blocked_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[0].astype(jnp.bfloat16)              # [K, bn]
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, 0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn",))
def blocked_qmm(x, w3, s3, *, bn):
    NB, K, _ = w3.shape
    return pl.pallas_call(
        blocked_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((M, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, bn), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NB * bn), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * NB * bn,
            bytes_accessed=w3.size, transcendentals=0),
    )(x, w3, s3)


def bench(K, N, bn):
    NB = N // bn
    key = jax.random.PRNGKey(0)
    w3 = jax.random.randint(key, (NB, K, bn), -128, 128, jnp.int32
                            ).astype(jnp.int8)
    s3 = jnp.full((NB, 1, bn), 1e-4, jnp.float32)
    x0 = jnp.ones((M, K), jnp.bfloat16)

    def step(x, _):
        y = blocked_qmm(x, w3, s3, bn=bn)
        xn = jnp.sum(y, axis=-1, keepdims=True).astype(jnp.bfloat16) * 0
        return x0 + xn, None

    def timed(calls):
        @jax.jit
        def run(x):
            x, _ = jax.lax.scan(step, x, None, length=calls)
            return x
        np.asarray(run(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    ca, cb = 50, 250
    dt = (timed(cb) - timed(ca)) / (cb - ca)   # marginal: relay RTT cancels
    eff = (NB * K * bn) / dt / HBM
    log(f"K={K:6d} N={N:6d} bn={bn:5d} ({K*bn/1e6:4.1f}MB/blk): "
        f"{dt*1e6:7.1f}us  eff={eff*100:5.1f}%")
    return eff


for bn in (256, 512, 1024):
    bench(4096, 12288, bn)
bench(11008, 4096, 256)
bench(4096, 22016, 512)
