"""A/B: int8 grouped dequant GEMV — bf16 dots (current) vs f32 dots.
Same methodology as proto_int4_unpack.py (interleaved reps, marginal time).

RESULT (v5e, 3 interleaved reps): no difference — both 90-95% HBM, ranking
flips with run-to-run noise. Unlike int4 (where i32→bf16 lowers via f32 and
the f32 dot saves a convert per element), int8's single i8→bf16 convert
costs the same as i8→f32, so the int8 kernel keeps bf16 dots."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def log(*a): print(*a, file=sys.stderr, flush=True)

HBM = 819e9
M, K, N, gsize, bn = 8, 4096, 12288, 128, 768
NB = N // bn
CALLS = 600
G = K // gsize

key = jax.random.PRNGKey(0)
q8 = jax.random.randint(key, (NB, K, bn), -128, 128, jnp.int32).astype(jnp.int8)
scale = jnp.full((NB, G, bn), 1e-3, jnp.float32)
x0 = jnp.ones((M, K), jnp.bfloat16)


def kern_bf16(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for g in range(K // gsize):
        r0 = g * gsize
        d = jnp.dot(x[:, r0:r0+gsize], w[r0:r0+gsize].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        acc += d * s_ref[0][g][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_f32(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for g in range(K // gsize):
        r0 = g * gsize
        d = jnp.dot(x[:, r0:r0+gsize].astype(jnp.float32),
                    w[r0:r0+gsize].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        acc += d * s_ref[0][g][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def bench(kern, name):
    def build(calls):
        @jax.jit
        def run(x):
            def step(xc, _):
                y = pl.pallas_call(
                    kern, grid=(NB,),
                    in_specs=[pl.BlockSpec((M, K), lambda n: (0, 0)),
                              pl.BlockSpec((1, K, bn), lambda n: (n, 0, 0)),
                              pl.BlockSpec((1, G, bn), lambda n: (n, 0, 0))],
                    out_specs=pl.BlockSpec((M, bn), lambda n: (0, n)),
                    out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(xc, q8, scale)
                return x0 + (jnp.sum(y, -1, keepdims=True) * 1e-9).astype(jnp.bfloat16), None
            xc, _ = jax.lax.scan(step, x, None, length=calls)
            return xc
        return run

    r1, r2 = build(CALLS), build(CALLS // 3)
    np.asarray(r1(x0)); np.asarray(r2(x0))
    b1 = b2 = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); np.asarray(r1(x0)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(r2(x0)); b2 = min(b2, time.perf_counter() - t0)
    per = (b1 - b2) / (CALLS - CALLS // 3)
    bytes_per = NB * K * bn * 1 + NB * G * bn * 4
    log(f"{name}: {per*1e6:7.1f}us  {bytes_per/per/1e9:5.0f} GB/s ({bytes_per/per/HBM*100:.1f}% HBM)")


for rep in range(3):
    bench(kern_bf16, f"[{rep}] int8 bf16 dots (cur)")
    bench(kern_f32, f"[{rep}] int8 f32 dots       ")
