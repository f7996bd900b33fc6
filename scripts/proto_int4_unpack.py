"""Prototype: int4 unpack strategies for the dequant GEMV, measured on chip.

Variants (shape: 7B fused-qkv, g=128, packed [NB, 2048, bn]):
  a) current: i32 shl/ashr nibble extraction + f32 group-dequant
  b) float-extract: byte→bf16 once; hi=floor(f/16); lo_u=f-16h (offset-lo
     packing assumed: lo stored +8; correction folded via an extra tiny dot)
"""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def log(*a): print(*a, file=sys.stderr, flush=True)

HBM = 819e9
M, K, N, gsize, bn = 8, 4096, 12288, 128, 768
Kp = K // 2
NB = N // bn
CALLS = 600

key = jax.random.PRNGKey(0)
q4 = jax.random.randint(key, (NB, Kp, bn), -128, 128, jnp.int32).astype(jnp.int8)
G = K // gsize
scale = jnp.full((NB, G, bn), 1e-3, jnp.float32)
x0 = jnp.ones((M, K), jnp.bfloat16)
CH = 128


def kern_current(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):
        p32 = w[c0:c0+CH].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
        s_lo = s_ref[0][c0 // gsize:(c0 + CH) // gsize]
        s_hi = s_ref[0][(Kp + c0) // gsize:(Kp + c0 + CH) // gsize]
        wlo = (lo.astype(jnp.float32).reshape(-1, gsize, bn) * s_lo[:, None]).reshape(CH, bn)
        whi = (hi.astype(jnp.float32).reshape(-1, gsize, bn) * s_hi[:, None]).reshape(CH, bn)
        acc += jnp.dot(x[:, c0:c0+CH], wlo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, Kp+c0:Kp+c0+CH], whi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_float(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):
        f = w[c0:c0+CH].astype(jnp.float32)
        hi = jnp.floor(f * 0.0625)                    # signed hi nibble
        lo_u = f - hi * 16.0                          # lo + 8 in [0,15]
        s_lo = s_ref[0][c0 // gsize:(c0 + CH) // gsize]
        s_hi = s_ref[0][(Kp + c0) // gsize:(Kp + c0 + CH) // gsize]
        wlo = (lo_u.reshape(-1, gsize, bn) * s_lo[:, None]).reshape(CH, bn)
        whi = (hi.reshape(-1, gsize, bn) * s_hi[:, None]).reshape(CH, bn)
        acc += jnp.dot(x[:, c0:c0+CH], wlo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, Kp+c0:Kp+c0+CH], whi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        # offset correction: -8 * sum_g(x_g) @ s_lo  (tiny dot)
        xg = x[:, c0:c0+CH].astype(jnp.float32).reshape(M, -1, gsize).sum(-1)
        acc -= 8.0 * jnp.dot(xg.astype(jnp.bfloat16), s_lo.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def bench(kern, name):
    @jax.jit
    def run(x):
        def step(xc, _):
            y = pl.pallas_call(
                kern,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda n: (0, 0)),
                    pl.BlockSpec((1, Kp, bn), lambda n: (n, 0, 0)),
                    pl.BlockSpec((1, G, bn), lambda n: (n, 0, 0)),
                ],
                out_specs=pl.BlockSpec((M, bn), lambda n: (0, n)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(xc, q4, scale)
            return x0 + (jnp.sum(y, -1, keepdims=True) * 1e-9).astype(jnp.bfloat16), None
        xc, _ = jax.lax.scan(step, x, None, length=CALLS)
        return xc

    def timed(calls):
        nonlocal run
        best = 1e9
        np.asarray(run(x0))
        for _ in range(5):
            t0 = time.perf_counter(); np.asarray(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best
    t = timed(CALLS)
    # marginal vs RTT: second scan length
    @jax.jit
    def run2(x):
        def step(xc, _):
            y = pl.pallas_call(
                kern, grid=(NB,),
                in_specs=[pl.BlockSpec((M, K), lambda n: (0, 0)),
                          pl.BlockSpec((1, Kp, bn), lambda n: (n, 0, 0)),
                          pl.BlockSpec((1, G, bn), lambda n: (n, 0, 0))],
                out_specs=pl.BlockSpec((M, bn), lambda n: (0, n)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(xc, q4, scale)
            return x0 + (jnp.sum(y, -1, keepdims=True) * 1e-9).astype(jnp.bfloat16), None
        xc, _ = jax.lax.scan(step, x, None, length=100)
        return xc
    np.asarray(run2(x0))
    best2 = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(run2(x0))
        best2 = min(best2, time.perf_counter() - t0)
    dt = (t - best2) / (CALLS - 100)
    eff = q4.size / dt / HBM
    log(f"{name}: {dt*1e6:7.1f}us  {q4.size/dt/1e9:6.0f} GB/s ({eff*100:4.1f}% HBM)")


def kern_pc(x_ref, w_ref, s_ref, o_ref):
    """int4 extraction only, per-channel-style (no group dequant mul)."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):
        p32 = w[c0:c0+CH].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
        acc += jnp.dot(x[:, c0:c0+CH], lo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, Kp+c0:Kp+c0+CH], hi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0][0][None]).astype(o_ref.dtype)


def kern_outscale(x_ref, w_ref, s_ref, o_ref):
    """grouped int4 with OUTPUT-side scaling: per-group raw dot, then
    column-scale the partial accumulator — no dequant intermediates."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):          # CH == gsize == 128 here
        g = c0 // gsize
        p32 = w[c0:c0+CH].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
        d_lo = jnp.dot(x[:, c0:c0+CH], lo.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        d_hi = jnp.dot(x[:, Kp+c0:Kp+c0+CH], hi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        acc += d_lo * s_ref[0][g][None] + d_hi * s_ref[0][Kp // gsize + g][None]
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_and_offset(x_ref, w_ref, s_ref, o_ref):
    """offset-lo packing: lo_u = w & 0xF (i8 AND, cheap); hi = floor(f/16)
    via one f32 convert; -8 offset folded via a per-group correction dot."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):          # CH == gsize
        g = c0 // gsize
        wb = w[c0:c0+CH]
        lo_u = (wb & 0xF).astype(jnp.bfloat16)          # unsigned nibble
        f = wb.astype(jnp.float32)
        hi = jnp.floor(f * 0.0625).astype(jnp.bfloat16)  # signed nibble
        s_lo = s_ref[0][g]
        s_hi = s_ref[0][Kp // gsize + g]
        x_lo = x[:, c0:c0+CH]
        x_hi = x[:, Kp+c0:Kp+c0+CH]
        d_lo = jnp.dot(x_lo, lo_u, preferred_element_type=jnp.float32)
        d_hi = jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)
        # -8 offset on lo: subtract 8*rowsum(x_lo)*s_lo per column
        xsum = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
        acc += (d_lo - 8.0 * xsum) * s_lo[None, :] + d_hi * s_hi[None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_and_f32dot(x_ref, w_ref, s_ref, o_ref):
    """AND-lo/f32-hi, but feed the f32 nibbles STRAIGHT to the dot —
    skips both f32->bf16 converts; the MXU runs its f32 path, which is
    idle headroom at GEMV widths."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):          # CH == gsize
        g = c0 // gsize
        wb = w[c0:c0+CH]
        lo_u = (wb & 0xF).astype(jnp.float32)
        hi = jnp.floor(wb.astype(jnp.float32) * 0.0625)
        s_lo = s_ref[0][g]
        s_hi = s_ref[0][Kp // gsize + g]
        x_lo = x[:, c0:c0+CH].astype(jnp.float32)
        x_hi = x[:, Kp+c0:Kp+c0+CH].astype(jnp.float32)
        d_lo = jnp.dot(x_lo, lo_u, preferred_element_type=jnp.float32)
        d_hi = jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)
        xsum = jnp.sum(x_lo, axis=1, keepdims=True)
        acc += (d_lo - 8.0 * xsum) * s_lo[None, :] + d_hi * s_hi[None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_1cvt(x_ref, w_ref, s_ref, o_ref):
    """Single i8->f32 convert: hi = floor(f/16); lo_u = f - 16*hi (exact
    for offset-lo packing); bf16 dots."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):
        g = c0 // gsize
        f = w[c0:c0+CH].astype(jnp.float32)
        hi = jnp.floor(f * 0.0625)
        lo_u = f - 16.0 * hi
        s_lo = s_ref[0][g]
        s_hi = s_ref[0][Kp // gsize + g]
        x_lo = x[:, c0:c0+CH]
        d_lo = jnp.dot(x_lo, lo_u.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        d_hi = jnp.dot(x[:, Kp+c0:Kp+c0+CH], hi.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        xsum = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
        acc += (d_lo - 8.0 * xsum) * s_lo[None, :] + d_hi * s_hi[None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_shift_f32dot(x_ref, w_ref, s_ref, o_ref):
    """current i32-shift extraction, but f32 dots (no bf16 converts)."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):
        g = c0 // gsize
        p32 = w[c0:c0+CH].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.float32)
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(jnp.float32)
        d_lo = jnp.dot(x[:, c0:c0+CH].astype(jnp.float32), lo,
                       preferred_element_type=jnp.float32)
        d_hi = jnp.dot(x[:, Kp+c0:Kp+c0+CH].astype(jnp.float32), hi,
                       preferred_element_type=jnp.float32)
        acc += d_lo * s_ref[0][g][None] + d_hi * s_ref[0][Kp // gsize + g][None]
    o_ref[:] = acc.astype(o_ref.dtype)


def kern_diffdot(x_ref, w_ref, s_ref, o_ref):
    """difference-of-dots unpack: dot the RAW packed bytes b = 16*hi+lo_u
    on the MXU (d1) and the AND-extracted lo_u (d2); the hi-nibble dot is
    (d1 - d2)/16 — no floor/mul hi extraction on the VPU at all. Needs
    x_lo == x_hi per packed byte, i.e. N-PAIR packing: byte (k, n) packs
    columns 2n (lo) and 2n+1 (hi) of the SAME k — here emulated with the
    K-split layout by using the same x slice for both halves (upper bound
    on the win; exact with repacked weights)."""
    x = x_ref[:]
    w = w_ref[0]
    acc = jnp.zeros((M, bn), jnp.float32)
    for c0 in range(0, Kp, CH):          # CH == gsize
        g = c0 // gsize
        wb = w[c0:c0+CH]
        bf = wb.astype(jnp.float32)                  # one convert
        lo_u = (wb & 0xF).astype(jnp.float32)        # AND + convert
        s_lo = s_ref[0][g]
        s_hi = s_ref[0][Kp // gsize + g]
        xs = x[:, c0:c0+CH].astype(jnp.float32)
        d1 = jnp.dot(xs, bf, preferred_element_type=jnp.float32)
        d2 = jnp.dot(xs, lo_u, preferred_element_type=jnp.float32)
        d_hi = (d1 - d2) * 0.0625
        xsum = jnp.sum(xs, axis=1, keepdims=True)
        acc += (d2 - 8.0 * xsum) * s_lo[None, :] + d_hi * s_hi[None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


for rep in range(3):
    bench(kern_outscale, f"[{rep}] i32-shift bf16 (cur) ")
    bench(kern_shift_f32dot, f"[{rep}] i32-shift f32 dots  ")
    bench(kern_and_offset, f"[{rep}] AND/floor bf16 dots  ")
    bench(kern_and_f32dot, f"[{rep}] AND/floor f32 dots   ")
    bench(kern_diffdot, f"[{rep}] diff-of-dots         ")
