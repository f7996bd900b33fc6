"""Kernel-isolated bandwidth of the REAL int4 npair decode GEMVs.

Companion to proto_stream_ceiling.py (pure-DMA ceiling: 802 GB/s = 97.9 %
of spec, round 5): this runs the ACTUAL `quant_matmul` GEMV kernels over
the actual 7B int4 g=128 npair blocked stacks in the same marginal-scan
harness, so the achieved GB/s is attributable to the kernels alone (no
attention, no KV write, no sampling, no XLA glue). The gap between this
number and 802 GB/s is what kernel work (unpack VPU ops, double MXU dots,
grid bubbles) costs; the gap between this and the e2e ~674 GB/s is what
the REST of the step costs.

Knobs for A/B (env): LLMI_NPAIR_DOT=f32|bf16, LLMI_NPAIR_UNPACK=floor|and.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto_npair_isolated.py
"""
import sys
import time

import numpy as np

from llm_inference_tpu.utils import compile_cache
compile_cache.enable()

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import QuantConfig, llama2_7b
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops.pallas.quant_matmul import quant_matmul


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = llama2_7b()
L = cfg.num_layers
t0 = time.time()
params = llama.init_params_quantized(
    cfg, jax.random.PRNGKey(0),
    QuantConfig(weights="int4", group_size=128, quantize_embedding=True))
params = llama.prepare_params(params)
log(f"params ready ({time.time()-t0:.0f}s)")

qw = params["layers"]
STACKS = [("wqkv", cfg.hidden_size), ("wo", cfg.hidden_size),
          ("w_gateup", cfg.hidden_size),
          ("w_down", cfg.intermediate_size)]


def stack_bytes(qt):
    per_layer = qt.q.size // qt.q.shape[0] + 4 * (qt.scale.size
                                                  // qt.scale.shape[0])
    return per_layer


total_bytes = sum(stack_bytes(qw[k]) for k, _ in STACKS)
log(f"layer bytes: {total_bytes/1e6:.1f} MB")


def run(steps, qkv, wo, gu, dn):
    stacks = {"wqkv": qkv, "wo": wo, "w_gateup": gu, "w_down": dn}

    def body(carry, _):
        x, tot = carry
        lyr = x % L
        acc = jnp.float32(0)
        for name, K in STACKS:
            # the input depends on the carry (no hoisting) and the carry
            # depends on the outputs (no DCE); tanh keeps it bounded
            xin = jax.lax.broadcast_in_dim(
                (jnp.tanh(tot) * 1e-3 + 1e-3).astype(jnp.bfloat16),
                (1, K), ())
            y = quant_matmul(xin, stacks[name], lyr)
            acc = acc + y[0, :8].astype(jnp.float32).sum()
        return ((x + 1) % L, tot + acc * 1e-6), None

    (x, tot), _ = jax.lax.scan(body, (jnp.int32(0), jnp.float32(0)), None,
                               length=steps)
    return tot


ts = {}
for steps in (2 * L, 6 * L):
    j = jax.jit(lambda a, b, c, d, s=steps: run(s, a, b, c, d))
    args = tuple(qw[k] for k, _ in STACKS)
    y = j(*args)
    float(y)                      # data fetch (relay: never trust
    best = 1e9                    # block_until_ready alone)
    for _ in range(3):
        t0 = time.perf_counter()
        y = j(*args)
        float(y)
        best = min(best, time.perf_counter() - t0)
    ts[steps] = best
    log(f"scan[{steps}]: best {best*1e3:.2f} ms")
per_layer = (ts[6 * L] - ts[2 * L]) / (4 * L)
gbps = total_bytes / per_layer / 1e9
log(f"npair GEMVs only: {per_layer*1e6:.1f} us/layer-sweep "
    f"({total_bytes/1e6:.1f} MB) -> {gbps:.0f} GB/s "
    f"= {gbps/819*100:.1f}% of spec "
    f"(DMA-only ceiling 802, e2e ~674)")
