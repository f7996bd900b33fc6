"""A/B decode-attention kernel block shapes (hb, sb) on the real chip.

The int8-KV dequant loop costs per-iteration overhead (slice+mul+concat per
head page); the S-block clamp saves HBM reads on short fills. This sweeps
(hb, sb) at serving shapes to pick _pick_blocks' policy.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto_decode_blocks.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.ops.pallas import decode_attention as DA


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(B, Hq, Hkv, S, D, fill, quant, hb, sb, iters=64):
    DA._pick_blocks = lambda *_: (hb, sb)
    L = 4
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (B, 1, Hq, D), jnp.bfloat16)
    if quant:
        k = (jax.random.normal(key, (L, B, Hkv, S, D)) * 30).astype(jnp.int8)
        ks = jnp.full((L, B, S, Hkv), 0.03, jnp.float32)
    else:
        k = jax.random.normal(key, (L, B, Hkv, S, D), jnp.bfloat16)
        ks = None
    pos = jnp.full((B,), fill, jnp.int32)

    def many(q, k, ks, n):
        def body(carry, _):
            out = DA.decode_attention(carry, k, k, 2, pos,
                                      k_scale=ks, v_scale=ks)
            return out.astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out

    ts = {}
    for n in (8, 8 + iters):
        f = jax.jit(lambda q, k, ks, n=n: many(q, k, ks, n))
        r = f(q0, k, ks); r.block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            f(q0, k, ks).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    us = (ts[8 + iters] - ts[8]) / iters * 1e6
    item = 1 if quant else 2
    sol = 2 * B * Hkv * S * D * item / 819e9 * 1e6
    sol_fill = 2 * B * Hkv * min(S, (fill // sb + 1) * sb) * D * item \
        / 819e9 * 1e6
    log(f"  hb={hb:3d} sb={sb:4d}: {us:7.1f} us/call  "
        f"(full-S SOL {sol:.0f}, clamped SOL {sol_fill:.0f})")
    return us


def main():
    B, Hq, Hkv, S, D = 32, 32, 32, 512, 128
    for quant in (True, False):
        for fill in (170, 500):
            log(f"B={B} S={S} fill={fill} {'int8' if quant else 'bf16'}:")
            for hb, sb in [(32, 256), (16, 256), (8, 256), (16, 512),
                           (8, 512), (4, 512), (32, 128), (8, 128)]:
                if Hkv % hb or S % sb:
                    continue
                bench(B, Hq, Hkv, S, D, fill, quant, hb, sb)


if __name__ == "__main__":
    main()
