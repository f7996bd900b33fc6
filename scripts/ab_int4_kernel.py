"""A/B driver for the round-3 npair GEMV kernel variants, on chip.

Runs the same 7B int4+kv8 decode-scan measurement (bench.py's secondary
config) across the kernel-variant env matrix and prints a comparison:
  - dots: bf16 (new default) vs f32 (round 2)  [LLMI_NPAIR_DOT]
  - M:    unpadded 1 (new default) vs pad8 (round 2)  [LLMI_QMM_PAD8]
The block-budget and lm_head-vocab-pad changes ride along in all variants
(they are layout-time, not kernel-time, choices).

Each variant runs in a SUBPROCESS (env must be set before the kernels
trace). Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_int4_kernel.py
"""
import json
import os
import subprocess
import sys

VARIANTS = [
    ("bf16_m1", {}),                                       # new defaults
    ("bf16_pad8", {"LLMI_QMM_PAD8": "1"}),
    ("f32_m1", {"LLMI_NPAIR_DOT": "f32"}),
    ("f32_pad8", {"LLMI_NPAIR_DOT": "f32", "LLMI_QMM_PAD8": "1"}),
]

SNIPPET = r"""
import time, sys
import numpy as np
from llm_inference_tpu.utils import compile_cache
compile_cache.enable()
import jax, jax.numpy as jnp
from llm_inference_tpu.config import QuantConfig, llama2_7b
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache

cfg = llama2_7b()
qcfg = QuantConfig(weights="int4", group_size=128, quantize_embedding=True)
params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
params = llama.prepare_params(params)
cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 512,
                           cfg.head_dim, "int8")

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

token0 = jnp.zeros((1,), jnp.int32)
pos0 = jnp.full((1,), 128, jnp.int32)
times = {}
for steps in (32, 160):
    fn = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s),
                 donate_argnums=(1,))
    t0 = time.time()
    toks, cache = fn(params, cache, token0, pos0)
    np.asarray(toks[-1])
    print(f"[ab] decode[{steps}] compile+run {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        toks, cache = fn(params, cache, token0, pos0)
        np.asarray(toks[-1])
        best = min(best, time.perf_counter() - t0)
    times[steps] = best
dt = (times[160] - times[32]) / 128
print(f"RESULT {dt*1e3:.4f} ms/step {1/dt:.1f} tok/s")
"""


def main():
    results = {}
    for name, env in VARIANTS:
        e = dict(os.environ)
        e.update(env)
        print(f"=== {name} {env}", file=sys.stderr, flush=True)
        p = subprocess.run([sys.executable, "-c", SNIPPET], env=e,
                           capture_output=True, text=True, timeout=3600)
        sys.stderr.write(p.stderr[-2000:])
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            parts = line[0].split()
            results[name] = {"ms_per_step": float(parts[1]),
                             "tok_s": float(parts[3])}
            print(f"=== {name}: {line[0]}", file=sys.stderr, flush=True)
        else:
            results[name] = {"error": p.returncode}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
