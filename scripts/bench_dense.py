"""Dense bf16 7B decode bs=1 (BASELINE row 1 — the reference-parity
config, reference: src/models/llama/llama.cpp:318-361). See NOTE at EOF.

Two paths, A/B'd by LLMI_DENSE_STREAM:
  =1 (default): bf16 weights live in the column-blocked streaming layout
      as bits-16 QTensors (quantization.dense_blocked_qtensor) and decode
      through the Pallas GEMV — the same contiguous-chunk streaming that
      took int8 to 88% of roofline, with dequant skipped. Weights are
      GENERATED directly in blocked+fused form (no re-layout transient —
      a 13.5 GB stack cannot be duplicated on a 16 GB chip).
  =0: round-3 configuration — unfused row-major bf16 arrays through XLA's
      own GEMV (measured 41.1 tok/s = 66.6% of roofline, 2026-08-20).
"""
import os, time, sys
import numpy as np
from llm_inference_tpu.utils import compile_cache
compile_cache.enable()
import jax, jax.numpy as jnp
from llm_inference_tpu.config import llama2_7b
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache
from llm_inference_tpu.ops.quantization import (choose_block_n,
                                                dense_blocked_qtensor)

def log(*a): print(*a, file=sys.stderr, flush=True)

STREAM = os.environ.get("LLMI_DENSE_STREAM", "1") == "1"

cfg = llama2_7b()
H, I, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads

def rnd(key, shape):
    f = jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32) * 0.02
                           ).astype(jnp.bfloat16))
    out = f(key)
    out.block_until_ready()
    return out

ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))

t0 = time.time()
if STREAM:
    # fused + blocked bits-16 QTensors, generated straight into the
    # streaming layout: [L, N/bn, K, bn] bf16 (+ tiny ones scales)
    def blocked(K, N, budget=3 << 20):
        bn = choose_block_n(K, N, budget, itemsize=2)
        assert bn, (K, N)
        return dense_blocked_qtensor(rnd(next(ks), (L, N // bn, K, bn)))

    layers = {
        "attn_norm": jnp.ones((L, H), jnp.bfloat16),
        "wqkv": blocked(H, (Hq + 2 * Hkv) * D),
        "wo": blocked(Hq * D, H),
        "ffn_norm": jnp.ones((L, H), jnp.bfloat16),
        "w_gateup": blocked(H, 2 * I),
        "w_down": blocked(I, H),
    }
    lm_bn = choose_block_n(H, V, 3 << 20, itemsize=2)
    lm = dense_blocked_qtensor(rnd(next(ks), (V // lm_bn, H, lm_bn)))
else:
    def stack(shape):
        # one jitted program per stacked tensor: XLA fuses rng+cast so
        # the f32 intermediate never materializes
        return rnd(next(ks), (L,) + shape)

    layers = {
        "attn_norm": jnp.ones((L, H), jnp.bfloat16),
        "wq": stack((H, Hq * D)),
        "wk": stack((H, Hkv * D)),
        "wv": stack((H, Hkv * D)),
        "wo": stack((Hq * D, H)),
        "ffn_norm": jnp.ones((L, H), jnp.bfloat16),
        "w_gate": stack((H, I)),
        "w_up": stack((H, I)),
        "w_down": stack((I, H)),
    }
    lm = rnd(next(ks), (H, V))
params = {"embed": rnd(next(ks), (V, H)), "layers": layers,
          "final_norm": jnp.ones((H,), jnp.bfloat16), "lm_head": lm}
wb = llama.param_bytes(params)
log(f"params {wb/1e9:.2f} GB stream={STREAM} ({time.time()-t0:.0f}s)")

S, P = 256, 64
cache = kvcache.init_cache(L, 1, Hkv, S, D, jnp.bfloat16)

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
pos0 = jnp.full((1,), P, jnp.int32)
times = {}
for steps in (16, 64):
    fn = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s),
                 donate_argnums=(1,))
    t0 = time.time()
    toks, cache = fn(params, cache, token0, pos0)
    np.asarray(toks[-1])
    log(f"decode[{steps}] compile+run {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        toks, cache = fn(params, cache, token0, pos0)
        np.asarray(toks[-1])
        best = min(best, time.perf_counter() - t0)
    times[steps] = best
dt = (times[64] - times[16]) / 48
kv = L * Hkv * (P + 40) * D * 2 * 2
# scale arrays are ones the kernel never reads — exclude from the roofline
# denominator (they are still resident, but tiny: ~0.2% of weights)
sbytes = sum(w.scale.size * 4 for w in
             [v for v in layers.values() if hasattr(v, "scale")]
             + ([lm] if hasattr(lm, "scale") else [])) if STREAM else 0
roof = 819e9 / (wb - sbytes - V * H * 2 + kv)
print(f"DENSE bf16 stream={int(STREAM)} {dt*1e3:.4f} ms/step "
      f"{1/dt:.1f} tok/s; roofline {roof:.1f} -> {1/dt/roof*100:.1f}%")

# NOTE (how this script came to look this way): a 7B bf16 model is
# 13.48 GB against ~14-15 GB of usable HBM on the bench chip, so
# (a) weights must be generated as ONE fused rng+cast program per stacked
#     tensor (any full-stack f32 intermediate or jnp.stack double-buffer
#     OOMs), and
# (b) runtime fuse/re-layout passes are skipped — they CONCATENATE new
#     buffers next to the old ones (transient ~19 GB). Both layouts are
#     therefore generated directly in their final form.
# Measured 2026-08-20 (v5e, bs=1), LLMI_DENSE_STREAM=0: 41.1 tok/s =
# 66.6% of the 61.7 tok/s bf16 roofline — the XLA dense-dot decode path.
# The quantized kernels are the product path: INT8 107.1 tok/s (2.6x),
# INT4+kv8 188.7 tok/s (4.6x).
