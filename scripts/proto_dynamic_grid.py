"""Probe: DYNAMIC last grid dim in a Pallas TPU kernel (Mosaic), combined
with PrefetchScalarGridSpec — does it compile, is it correct, and does it
cut the decode-attention DMA cost to the LIVE prefix?

Background (measured by scripts/proto_decode_blocks.py at B=16 S=512
fill=168): the index-map CLAMP of dead slot blocks does NOT elide their
DMA — kernel time matches full-S streaming (163.7 us vs clamped-SOL 82).
A dynamic grid bound (ns = max(pos)//sb + 1, a traced scalar) should make
the kernel stream only live blocks with one compiled program.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto_dynamic_grid.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel(pos_ref, q_ref, k_ref, o_ref, acc_ref, *, sb):
    b = pl.program_id(0)
    j = pl.program_id(2)
    ns = pl.num_programs(2)
    pos = pos_ref[b]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j * sb <= pos)
    def _():
        q = q_ref[0].reshape(-1, q_ref.shape[-1])
        kb = k_ref[0, 0].reshape(-1, k_ref.shape[-1])
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j * sb + col % sb <= pos, s, 0.0)
        acc_ref[:] += jax.lax.dot_general(
            s.astype(jnp.bfloat16), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == ns - 1)
    def _():
        o_ref[0] = acc_ref[:].reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sb", "dyn"))
def run(q, k, pos, *, sb, dyn):
    B, Hkv, G, D = q.shape
    S = k.shape[3]
    hb = 8
    ns = jnp.max(pos) // sb + 1 if dyn else S // sb
    grid = (B, Hkv // hb, ns)

    def kv_map(b, g, j, pos):
        return (0, b, g, jnp.minimum(j, pos[b] // sb), 0)

    return pl.pallas_call(
        functools.partial(kernel, sb=sb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, G, D), lambda b, g, j, pos: (b, g, 0, 0)),
                pl.BlockSpec((1, 1, hb, sb, D), kv_map),
            ],
            out_specs=pl.BlockSpec((1, hb, G, D),
                                   lambda b, g, j, pos: (b, g, 0, 0)),
            scratch_shapes=[pltpu.VMEM((hb * G, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(pos, q, k)


def main():
    B, Hq, Hkv, G, S, D = 16, 32, 32, 1, 512, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hkv, G, D), jnp.bfloat16)
    k = jax.random.normal(key, (1, B, Hkv, S, D), jnp.bfloat16)

    for fill in (168, 400):
        pos = jnp.full((B,), fill, jnp.int32)
        a = run(q, k, pos, sb=128, dyn=False)
        b = run(q, k, pos, sb=128, dyn=True)
        log(f"fill={fill}: dyn-vs-static allclose "
            f"{np.allclose(np.asarray(a), np.asarray(b), atol=2e-2)} "
            f"maxdiff {np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max():.4f}")

    def many(q, k, pos, n, dyn):
        def body(carry, _):
            out = run(carry, k, pos, sb=128, dyn=dyn)
            return out.astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out

    for dyn in (False, True):
        for fill in (168, 400, 504):
            pos = jnp.full((B,), fill, jnp.int32)
            ts = {}
            for n in (8, 72):
                f = jax.jit(lambda q, k, p, n=n, d=dyn: many(q, k, p, n, d))
                f(q, k, pos).block_until_ready()
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    f(q, k, pos).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
            us = (ts[72] - ts[8]) / 64 * 1e6
            live = (fill // 128 + 1) * 128
            sol_full = B * Hkv * S * D * 2 / 819e9 * 1e6
            sol_live = B * Hkv * live * D * 2 / 819e9 * 1e6
            log(f"dyn={dyn} fill={fill}: {us:6.1f} us/call "
                f"(full-S SOL {sol_full:.0f}, live SOL {sol_live:.0f})")


if __name__ == "__main__":
    main()
