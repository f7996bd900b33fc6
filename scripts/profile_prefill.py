"""Per-op profile of long prefill (TTFT) — 7B INT8, T=4096 by default.

VERDICT r2 item 6: T=4096 TTFT measured 557 ms, 65-70% of compute
speed-of-light — a third of the MXU idle. This prints the per-XLA-op
table so the gap gets names (flash kernel block shapes? dequant GEMM?
non-matmul tail?), plus the matmul-FLOPs speed-of-light for reference.

Usage (chip): PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_prefill.py
Env: PROF_T (default 4096), PROF_WEIGHTS (int8|int4|none), PROF_B (1).
"""
import os
import sys
import time

import numpy as np

from llm_inference_tpu.utils import compile_cache
compile_cache.enable()

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import QuantConfig, llama2_7b
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.utils import profiling


def log(*a):
    print(*a, file=sys.stderr, flush=True)


T = int(os.environ.get("PROF_T", "4096"))
B = int(os.environ.get("PROF_B", "1"))
weights = os.environ.get("PROF_WEIGHTS", "int8")

cfg = llama2_7b()
if weights == "none":
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    params = llama.prepare_params(params)
else:
    qcfg = QuantConfig(weights=weights,
                       group_size=128 if weights == "int4" else 0,
                       quantize_embedding=True)
    params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
    params = llama.prepare_params(params)
log(f"params {llama.param_bytes(params)/1e9:.2f} GB")

S = T
cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, S,
                           cfg.head_dim, jnp.bfloat16)

prefill = jax.jit(lambda p, i, q, c: llama.forward(cfg, p, i, q, c),
                  donate_argnums=(3,))
ids = jnp.ones((B, T), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

t0 = time.time()
logits, cache2 = prefill(params, ids, pos, cache)
np.asarray(logits[0, :4])
log(f"compile+run {time.time()-t0:.1f}s")

best = float("inf")
for _ in range(4):
    cache = kvcache.init_cache(cfg.num_layers, B, cfg.num_kv_heads, S,
                               cfg.head_dim, jnp.bfloat16)
    t0 = time.perf_counter()
    logits, cache2 = prefill(params, ids, pos, cache)
    np.asarray(logits[0, :4])
    best = min(best, time.perf_counter() - t0)

# compute speed-of-light: matmul FLOPs at bf16 peak (v5e ~197 TFLOP/s),
# plus causal attention FLOPs
H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
L, D, Hq = cfg.num_layers, cfg.head_dim, cfg.num_heads
mm_flops = 2 * B * T * L * (H * (Hq * D + 2 * cfg.num_kv_heads * D)
                            + Hq * D * H + 3 * H * I) + 2 * B * H * V
attn_flops = 2 * B * L * Hq * D * T * T  # QK^T + PV over causal half x2
flops = mm_flops + attn_flops
peak = 197e12
log(f"T={T}: best {best*1e3:.1f} ms (incl ~30 ms relay RTT); "
    f"{flops/1e12:.2f} TFLOP → SoL {flops/peak*1e3:.1f} ms → "
    f"{flops/peak/best*100:.1f}% of compute SoL")

with profiling.trace() as d:
    logits, cache2 = prefill(params, ids, pos, cache2)
    np.asarray(logits[0, :4])
totals = profiling.op_totals(d)
dev = sum(t for t, _ in totals.values())
log(f"device total {dev*1e3:.1f} ms")
print(profiling.format_op_totals(totals, top=30))
