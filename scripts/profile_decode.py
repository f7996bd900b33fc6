"""Component-level timing of one 7B INT8 decode step on the real chip.

Runs scans of N steps with parts of the layer disabled, subtracts timings to
attribute cost: full step (real model forward) vs matmuls-only vs attn-only.
Marginal time over two step counts amortizes the ~30 ms relay RTT.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import QuantConfig, llama2_7b
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import attention, kvcache, norms, rope, activations
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.ops.pallas import decode_attention as pallas_decode


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = llama2_7b()
# match bench.py's headline config exactly (int8 lm_head too) — otherwise
# the attribution explains a DIFFERENT model than the number it explains
qcfg = QuantConfig(weights="int8", quantize_embedding=True)
S = 1024
params = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
params = llama.prepare_params(params)
cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S,
                           cfg.head_dim, jnp.bfloat16)
log(f"params {llama.param_bytes(params)/1e9:.2f} GB")

D = cfg.head_dim
NQ = cfg.num_heads * D
NKV = cfg.num_kv_heads * D


def split_qkv(qkv):
    return qkv[..., :NQ], qkv[..., NQ:NQ + NKV], qkv[..., NQ + NKV:]


def layer_matmuls(h, lp, qw, k_all, v_all, idx, positions,
                  write_offsets, mask, cos, sin):
    # QTensors come from qw (the WHOLE stack, layer-indexed inside the
    # kernel) — scan-slicing them into the Pallas custom call would
    # materialize an HBM->HBM copy of every weight every step and corrupt
    # this very attribution (CLAUDE.md invariant #1; llama._layer)
    B, T, H = h.shape

    def mm(name, x):
        if name in qw:
            return matmul(x, qw[name], layer=idx)
        return matmul(x, lp[name])

    normed = norms.rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
    q, k, v = split_qkv(mm("wqkv", normed))
    attn = q + jnp.pad(k + v, ((0, 0), (0, 0), (0, NQ - NKV)))
    h = h + mm("wo", attn)
    normed = norms.rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
    gate, up = jnp.split(mm("w_gateup", normed), 2, axis=-1)
    h = h + mm("w_down", activations.swiglu_split(gate, up))
    return h, k_all, v_all


def layer_attn(h, lp, qw, k_all, v_all, idx, positions,
               write_offsets, mask, cos, sin):
    B, T, H = h.shape
    normed = norms.rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
    q = jnp.broadcast_to(normed[:, :, None, :D], (B, T, cfg.num_heads, D))
    k = q[:, :, :cfg.num_kv_heads]
    v = k
    q = rope.apply_rope(q, positions, cos, sin)
    k = rope.apply_rope(k, positions, cos, sin)
    k_all, v_all = kvcache.update_kv_cache_layer(k_all, v_all, idx, k, v,
                                                 write_offsets)
    attn = pallas_decode.decode_attention(q, k_all, v_all, idx,
                                          positions[:, -1])
    h = h + attn.reshape(B, T, -1)[:, :, :H]
    return h, k_all, v_all


def make_decode(layer_fn=None, with_head=True):
    def fwd(params, token, pos, cache):
        if layer_fn is None:
            return llama.forward(cfg, params, token, pos, cache)
        B, T = token.shape
        h = jnp.take(params["embed"], token, axis=0).astype(jnp.bfloat16)
        mask = attention.make_attention_mask(pos, S, 0)
        cos, sin = rope.make_rope_table(cfg.max_position_embeddings,
                                        cfg.head_dim, cfg.rope_theta, None)

        from llm_inference_tpu.ops.quantization import QTensor
        qw = {k: v for k, v in params["layers"].items()
              if isinstance(v, QTensor)}
        xs = {k: v for k, v in params["layers"].items()
              if not isinstance(v, QTensor)}

        def body(carry, lp):
            h, k_all, v_all, idx = carry
            h, k_all, v_all = layer_fn(h, lp, qw, k_all, v_all, idx, pos,
                                       pos[:, 0], mask, cos, sin)
            return (h, k_all, v_all, idx + 1), None

        (h, kn, vn, _), _ = jax.lax.scan(
            body, (h, cache.k, cache.v, jnp.int32(0)), xs)
        nc = kvcache.KVCache(k=kn, v=vn)
        h = norms.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
        if with_head:
            logits = matmul(h[:, -1], params["lm_head"]).astype(jnp.float32)
        else:
            logits = jnp.pad(h[:, -1], ((0, 0), (0, cfg.vocab_size - h.shape[-1])))
        return logits, nc

    def decode_n(params, cache, token, pos0, steps):
        def body(carry, _):
            cache, token, pos = carry
            logits, cache = fwd(params, token[:, None], pos[:, None], cache)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, nxt, pos + 1), nxt
        (cache, token, pos), toks = jax.lax.scan(
            body, (cache, token, pos0), None, length=steps)
        return toks
    return decode_n


def marginal(fn_name, decode_n, steps_a=16, steps_b=80):
    token0 = jnp.zeros((1,), jnp.int32)
    pos0 = jnp.full((1,), 128, jnp.int32)
    times = {}
    for steps in (steps_a, steps_b):
        f = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s))
        t0 = time.time()
        toks = f(params, cache, token0, pos0)
        np.asarray(toks[-1])
        log(f"  [{fn_name} {steps}] compile+run {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            toks = f(params, cache, token0, pos0)
            np.asarray(toks[-1])
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    dt = (times[steps_b] - times[steps_a]) / (steps_b - steps_a)
    log(f"{fn_name}: {dt*1e3:.3f} ms/step")
    return dt


full = marginal("full", make_decode())
mm = marginal("matmuls-only", make_decode(layer_matmuls))
at = marginal("attn-only", make_decode(layer_attn, with_head=False))
log(f"\nfull {full*1e3:.2f} | matmuls {mm*1e3:.2f} | attn {at*1e3:.2f} "
    f"| sum(parts) {(mm+at)*1e3:.2f}")
