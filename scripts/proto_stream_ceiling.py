"""Pure-DMA streaming ceiling for the 7B int4 decode access pattern.

Every round-4 e2e A/B (megakernel vs split, lm_head widths) landed on the
same ~674 GB/s achieved bandwidth for the int4+kv8 config while int8
reaches ~721 and 13B ~753 — suggesting the binding constraint is the
sustained HBM rate for THIS block-size mix (possibly degraded by the VPU
unpack riding along). This kernel streams the exact same stacked blocked
arrays with a near-zero-compute body (one sublane-row touch per block) —
the marginal time is the DMA-only ceiling:
  - if it matches the e2e time, the config is DMA-bound and ~82% of the
    819 GB/s spec IS the practical ceiling for this pattern → document
    as the bound;
  - if it is meaningfully faster, the gap is unpack/compute interference
    → kernel-level pipelining work can still win.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto_stream_ceiling.py
"""
import sys
import time

import numpy as np

from llm_inference_tpu.utils import compile_cache
compile_cache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


L = 32
HBM = 819e9
key = jax.random.PRNGKey(0)

# the 7B npair stacks: (NB, Kp, bnp) packed-byte block shapes + scales
STACKS = [
    ("qkv", 16, 4096, 384, 32),
    ("wo", 8, 4096, 256, 32),
    ("gate_up", 43, 4096, 256, 32),
    ("down", 16, 11008, 128, 86),
]


def make_touch(NB, Kp, bnp, G):
    q = jax.random.randint(key, (L, NB, Kp, bnp), -128, 128,
                           jnp.int32).astype(jnp.int8)
    s = jnp.ones((L, NB, G, 2 * bnp), jnp.float32)

    def kernel(lyr_ref, w_ref, s_ref, o_ref):
        # touch one sublane row of the DMA'd block (forces the fetch,
        # ~zero compute) and fold the scale block's first row in
        o_ref[:] = (w_ref[0, 0][:1].astype(jnp.float32)[:, :128]
                    + s_ref[0, 0][:1, :128])

    # NB: the arrays are returned and passed through the jit boundary as
    # ARGUMENTS — closing over them ships them as program constants and the
    # relay's remote_compile dies on the multi-GB body (CLAUDE.md failure
    # mode (c); the first version of this probe hit exactly that)
    def call(lyr, q, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, 1, Kp, bnp),
                                 lambda n, lyr: (lyr[0], n, 0, 0)),
                    pl.BlockSpec((1, 1, G, 2 * bnp),
                                 lambda n, lyr: (lyr[0], n, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 128), lambda n, lyr: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=128, bytes_accessed=NB * Kp * bnp + NB * G * 8 * bnp,
                transcendentals=0),
        )(lyr, q, s)

    bytes_per_layer = NB * (Kp * bnp + G * 2 * bnp * 4)
    return call, (q, s), bytes_per_layer


calls = []
arrays = []
total_bytes = 0
for name, NB, Kp, bnp, G in STACKS:
    c, qs, b = make_touch(NB, Kp, bnp, G)
    calls.append(c)
    arrays.extend(qs)
    total_bytes += b


def run(steps, *arrs):
    # the touch results MUST feed the carry: as per-step scan OUTPUTS with
    # only outs[-1] consumed, XLA dead-code-eliminated every iteration's
    # pallas calls and the first measurement printed a NEGATIVE marginal
    def body(carry, _):
        x, tot = carry
        # one "layer" sweep over all four stacks, layer index on the carry
        lyr = x % L
        acc = jnp.zeros((1, 128), jnp.float32)
        for c, q, s in zip(calls, arrs[0::2], arrs[1::2]):
            acc = acc + c(lyr.reshape(1), q, s)
        return ((x + 1) % L, tot + acc[0, 0]), None
    (x, tot), _ = jax.lax.scan(body, (jnp.int32(0), jnp.float32(0)), None,
                               length=steps)
    return tot


ts = {}
for steps in (2 * L, 6 * L):
    j = jax.jit(lambda *a, s=steps: run(s, *a))
    y = j(*arrays)
    float(y)   # data fetch: through the relay, block_until_ready alone
    best = 1e9     # returns early — every bench here times a real fetch
    for _ in range(3):
        t0 = time.perf_counter()
        y = j(*arrays)
        float(y)
        best = min(best, time.perf_counter() - t0)
    ts[steps] = best
    log(f"scan[{steps}]: best {best*1e3:.2f} ms "
        f"({best/steps*1e6:.1f} us/sweep incl. overhead)")
per_layer = (ts[6 * L] - ts[2 * L]) / (4 * L)
gbps = total_bytes / per_layer / 1e9
log(f"stream-only: {per_layer*1e6:.1f} us/layer-sweep "
    f"({total_bytes/1e6:.1f} MB) -> {gbps:.0f} GB/s "
    f"= {gbps/819*100:.1f}% of spec")
log(f"for reference: e2e int4 layers run ~{total_bytes/674e9*1e6:.1f} "
    f"us at the measured 674 GB/s")
