"""Per-op profile of the 7B INT4(g=128, npair) + INT8-KV decode step.

Captures a jax.profiler trace of the bench.py secondary-config decode scan
and prints the per-XLA-op device-time table (utils/profiling.op_totals),
divided by the step count — the attack list for the BASELINE north-star
roofline gap (>85% of HBM speed-of-light; BENCH_r02: 75.7%).

Usage (chip): PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_int4.py
Env: PROF_STEPS (default 32), PROF_S (cache len, default 512),
     PROF_WEIGHTS (int4|int8, default int4), PROF_B (batch, default 1),
     PROF_MODEL (llama2-7b|llama2-13b, default 7b — 13B int4+scales is
     ~7.4 GB, fits the 16 GB chip).
"""
import os
import sys
import time

import numpy as np

from llm_inference_tpu.utils import compile_cache
compile_cache.enable(verbose=True)

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import PRESETS, QuantConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.utils import profiling


def log(*a):
    print(*a, file=sys.stderr, flush=True)


STEPS = int(os.environ.get("PROF_STEPS", "32"))
S = int(os.environ.get("PROF_S", "512"))
B = int(os.environ.get("PROF_B", "1"))
weights = os.environ.get("PROF_WEIGHTS", "int4")
prompt_len = 128

cfg = PRESETS[os.environ.get("PROF_MODEL", "llama2-7b")]()
if weights == "int4":
    qcfg = QuantConfig(weights="int4", group_size=128,
                       quantize_embedding=True)
    cache_dtype = "int8"
else:
    qcfg = QuantConfig(weights="int8", quantize_embedding=True)
    cache_dtype = jnp.bfloat16

t0 = time.time()
params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
params = llama.prepare_params(params)
log(f"params built {time.time()-t0:.1f}s, {llama.param_bytes(params)/1e9:.2f} GB")

cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, S,
                           cfg.head_dim, cache_dtype)


def decode_n(params, cache, token, pos0, steps):
    def body(carry, _):
        cache, token, pos = carry
        logits, cache = llama.forward(cfg, params, token[:, None],
                                      pos[:, None], cache)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (cache, nxt, pos + 1), nxt
    (cache, token, pos), toks = jax.lax.scan(
        body, (cache, token, pos0), None, length=steps)
    return toks, cache


fn = jax.jit(lambda p, c, t, q: decode_n(p, c, t, q, STEPS),
             donate_argnums=(1,))
token0 = jnp.zeros((B,), jnp.int32)
pos0 = jnp.full((B,), prompt_len, jnp.int32)

t0 = time.time()
toks, cache = fn(params, cache, token0, pos0)
np.asarray(toks[-1])
log(f"decode[{STEPS}] compile+run {time.time()-t0:.1f}s")

# timed reference run (no tracing overhead)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    toks, cache = fn(params, cache, token0, pos0)
    np.asarray(toks[-1])
    best = min(best, time.perf_counter() - t0)
log(f"untraced decode[{STEPS}]: {best*1e3:.1f} ms "
    f"({best/STEPS*1e3:.3f} ms/step incl. relay RTT)")

with profiling.trace() as d:
    toks, cache = fn(params, cache, token0, pos0)
    np.asarray(toks[-1])
log(f"trace dir: {d}")

totals = profiling.op_totals(d)
dev_total = sum(t for t, _ in totals.values())
log(f"device total {dev_total*1e3:.1f} ms over {STEPS} steps "
    f"= {dev_total/STEPS*1e3:.3f} ms/step")
rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
print(f"{'ms/step':>9} {'count/step':>11}  op")
for name, (t, c) in rows[:40]:
    print(f"{t/STEPS*1e3:9.4f} {c/STEPS:11.1f}  {name[:100]}")
