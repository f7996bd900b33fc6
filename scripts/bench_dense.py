"""Dense bf16 7B decode bs=1 (BASELINE row 1 — the reference-parity
config, reference: src/models/llama/llama.cpp:318-361). See NOTE at EOF.
transients (full-stack init OOMs a 16 GB chip next to 13.5 GB of bf16)."""
import time, sys
import numpy as np
from llm_inference_tpu.utils import compile_cache
compile_cache.enable()
import jax, jax.numpy as jnp
from llm_inference_tpu.config import llama2_7b
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = llama2_7b()
H, I, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads

@jax.jit
def mk(key, shape_id):
    pass

def rnd(key, shape):
    f = jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32) * 0.02
                           ).astype(jnp.bfloat16))
    out = f(key)
    out.block_until_ready()
    return out

ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))
def stack(shape):
    # one jitted program per stacked tensor: XLA fuses rng+cast so the
    # f32 intermediate never materializes
    return rnd(next(ks), (L,) + shape)

t0 = time.time()
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
params = {"embed": rnd(next(ks), (V, H)), "layers": layers,
          "final_norm": jnp.ones((H,), jnp.bfloat16),
          "lm_head": rnd(next(ks), (H, V))}
# no prepare: fusing concatenates copies (transient ~19 GB on a
# 16 GB chip); the dense path serves unfused weights fine
wb = llama.param_bytes(params)
log(f"params {wb/1e9:.2f} GB ({time.time()-t0:.0f}s)")

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
roof = 819e9 / (wb - V * H * 2 + kv)
print(f"DENSE bf16 {dt*1e3:.4f} ms/step {1/dt:.1f} tok/s; "
      f"roofline {roof:.1f} -> {1/dt/roof*100:.1f}%")

# NOTE (how this script came to look this way): a 7B bf16 model is
# 13.48 GB against ~14-15 GB of usable HBM on the bench chip, so
# (a) weights must be generated as ONE fused rng+cast program per stacked
#     tensor (any full-stack f32 intermediate or jnp.stack double-buffer
#     OOMs), and
# (b) prepare_params is skipped — fusing qkv/gate-up CONCATENATES new
#     buffers next to the old ones (transient ~19 GB). The dense forward
#     serves unfused weights; this is also the honest reference-parity
#     configuration (the reference never fuses at runtime either —
#     reference: src/weights/llama/layer_weights.cc:48 loads offline-fused
#     files).
# Measured 2026-08-20 (v5e, bs=1): 41.1 tok/s = 66.6% of the 61.7 tok/s
# bf16 roofline — the XLA dense-dot decode path. The quantized kernels are
# the product path: INT8 107.1 tok/s (2.6x), INT4+kv8 188.7 tok/s (4.6x).
