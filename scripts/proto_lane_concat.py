"""Probe: does Mosaic (v5e) lower a 64+64 lane-axis concat in-kernel?

If yes, the int4-KV kernels can take FULL-D q/out blocks and rebuild the
dequantized K as concat(k_lo, k_hi) on the lane axis — one 128-contraction
MXU dot (full systolic-array width) instead of two 64-contractions, with
zero host-side q half-copies (the Mosaic block rule rejects half-D
BlockSpecs over a 128-wide array: last block dim must be 128-divisible or
the full array dim).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BT, BS, D2 = 256, 512, 64
D = 2 * D2


def kern(q_ref, kp_ref, o_ref):
    q = q_ref[:].astype(jnp.float32)                 # [BT, D]
    kp = kp_ref[:].astype(jnp.int32)                 # [BS, D2] packed
    k_hi = jnp.right_shift(kp, 4).astype(jnp.float32)
    k_lo = (kp & 0xF).astype(jnp.float32)
    kfull = jnp.concatenate([k_lo, k_hi], axis=1)    # [BS, D] lane concat
    o_ref[:] = jax.lax.dot_general(
        q, kfull, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def kern_out_concat(q_ref, kp_ref, o_ref):
    # output-side concat: two [BT, D2] halves merged into a full-D store
    q = q_ref[:].astype(jnp.float32)
    kp = kp_ref[:].astype(jnp.int32)
    k_hi = jnp.right_shift(kp, 4).astype(jnp.float32)
    k_lo = (kp & 0xF).astype(jnp.float32)
    a = jnp.dot(q[:, :D2], k_lo.T[:D2], preferred_element_type=jnp.float32)
    b = jnp.dot(q[:, D2:], k_hi.T[:D2], preferred_element_type=jnp.float32)
    o_ref[:] = jnp.concatenate([a[:, :D2], b[:, :D2]], axis=1)


def main():
    assert jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (BT, D), jnp.bfloat16)
    kp = jax.random.randint(key, (BS, D2), -128, 128, jnp.int32
                            ).astype(jnp.int8)
    for name, k, oshape in [
        ("lane concat k (input side)", kern, (BT, BS)),
        ("lane concat out (store side)", kern_out_concat, (BT, D)),
    ]:
        try:
            got = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            )(q, kp)
            got = np.asarray(got)
            if name.startswith("lane concat k"):
                kpi = np.asarray(kp).astype(np.int32)
                kf = np.concatenate([(kpi & 0xF), kpi >> 4], 1
                                    ).astype(np.float32)
                want = np.asarray(q, np.float32) @ kf.T
                rel = np.abs(got - want).max() / np.abs(want).max()
                log(f"[OK ] {name}: rel={rel:.2e}")
            else:
                log(f"[OK ] {name}: compiled + ran")
        except Exception as e:  # noqa: BLE001
            log(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
