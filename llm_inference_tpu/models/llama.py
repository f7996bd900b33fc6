"""LLaMA-family decoder as a pure JAX function.

Covers the reference's entire model layer in one module:
- LlamaContextDecoder (prefill) + LlamaSelfDecoder (decode) stacks
  (reference: src/layers/decoder/context_decoder.cpp:47-143,
  self_decoder.cpp:23-89) — here ONE `forward` handles both: prefill is
  T>1 tokens, decode is T=1, same code path, same cache discipline.
- LLaMAContextAttentionLayer / LLaMASelfAttentionLayer / LLaMAFFNLayer
  (reference: src/layers/attention/, src/layers/ffn/) — inlined into the
  scanned layer body; XLA fuses what the reference hand-fused.
- Llama<T>::firstTokenGen / continueTokenGen orchestration (reference:
  src/models/llama/llama.cpp:273-361) — the engine jits `forward` directly.

TPU-first choices:
- Layers are STACKED along a leading axis and iterated with `lax.scan`, so
  compile time and HLO size are O(1) in depth.
- Weights follow the reference's fusion conventions (qkv fused, gate∥up
  fused — reference: src/weights/llama/layer_weights.cc:5-45), which is also
  optimal on the MXU: fewer, larger matmuls.
- The KV cache is functional state threaded through scan; in the jitted
  engine programs the buffers are donated so updates are in-place.

Weight pytree layout (dense arrays or QTensor for the 4 matmul weights):
  embed:      [V, H]
  layers/attn_norm:  [L, H]
  layers/wqkv:       [L, H, (Hq + 2·Hkv)·D]
  layers/wqkv_bias:  [L, (Hq + 2·Hkv)·D]      (optional, qwen2)
  layers/wo:         [L, Hq·D, H]
  layers/ffn_norm:   [L, H]
  layers/w_gate_up:  [L, H, 2·I]
  layers/w_down:     [L, I, H]
  final_norm: [H]
  lm_head:    [H, V]                           (absent if tied)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig, QuantConfig
from llm_inference_tpu.ops import activations, attention, embedding, kvcache, norms, rope
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.ops.quantization import QTensor, quantize

Params = Dict[str, Any]


def _act_dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


# ---------------------------------------------------------------------------
# Parameter init / quantization
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Params:
    """Random dummy weights — the perf-testing path, equivalent of the
    reference's dummy loaders (reference: src/weights/llama/
    llama_weights.cc:56-88, layer_weights.cc:70-146)."""
    dtype = dtype or _act_dtype(cfg)
    H, L = cfg.hidden_size, cfg.num_layers
    I, V = cfg.intermediate_size, cfg.vocab_size
    qkv_out = cfg.qkv_out_dim
    o_in = cfg.num_heads * cfg.head_dim
    ks = jax.random.split(key, 8)
    std = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "wqkv": rnd(ks[0], (L, H, qkv_out)),
        "wo": rnd(ks[1], (L, o_in, H)),
        "ffn_norm": jnp.ones((L, H), dtype),
        "w_gate_up": rnd(ks[2], (L, H, 2 * I)),
        "w_down": rnd(ks[3], (L, I, H)),
    }
    if cfg.qkv_bias:
        layers["wqkv_bias"] = jnp.zeros((L, qkv_out), dtype)
    params: Params = {
        "embed": rnd(ks[4], (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rnd(ks[5], (H, V))
    return params


_QUANT_KEYS = ("wqkv", "wo", "w_gate_up", "w_down")


def quantize_params(params: Params, qcfg: QuantConfig) -> Params:
    """Quantize the per-layer matmul weights to QTensors (stacked over L).

    lm_head/embed stay dense unless qcfg.quantize_embedding — the gather and
    the final logits matmul are accuracy-sensitive.
    """
    if not qcfg.enabled:
        return params
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_KEYS:
        w = layers[name]  # [L, K, N]
        qt = jax.vmap(lambda m: quantize(m, bits, qcfg.group_size))(w)
        # vmap over quantize returns QTensor with leading L on q/scale
        layers[name] = qt
    out["layers"] = layers
    if qcfg.quantize_embedding and "lm_head" in params:
        out["lm_head"] = quantize(params["lm_head"], bits, qcfg.group_size)
    return out


def param_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer(cfg: ModelConfig, h, lp, kc, vc, positions, write_offsets, mask,
           cos, sin):
    """One decoder layer. h: [B, T, H]; kc/vc: [B, Hkv, S, D]."""
    B, T, H = h.shape
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    # --- attention block ---
    normed = norms.rms_norm(h, lp["attn_norm"], eps)
    qkv = matmul(normed, lp["wqkv"], bias=lp.get("wqkv_bias"))
    q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=-1)
    q = q.reshape(B, T, Hq, D)
    k = k.reshape(B, T, Hkv, D)
    v = v.reshape(B, T, Hkv, D)
    q = rope.apply_rope(q, positions, cos, sin)
    k = rope.apply_rope(k, positions, cos, sin)
    kc, vc = kvcache.update_kv_cache(kc, vc, k, v, write_offsets)
    attn = attention.attend(q, kc, vc, mask,
                            logit_softcap=cfg.attn_logit_softcap)
    attn = matmul(attn.reshape(B, T, Hq * D), lp["wo"])
    h = h + attn

    # --- FFN block ---
    normed = norms.rms_norm(h, lp["ffn_norm"], eps)
    gate_up = matmul(normed, lp["w_gate_up"])
    h = h + matmul(activations.swiglu(gate_up), lp["w_down"])
    return h, kc, vc


def forward(
    cfg: ModelConfig,
    params: Params,
    ids: jnp.ndarray,            # [B, T] int32
    positions: jnp.ndarray,      # [B, T] int32 absolute positions
    cache: kvcache.KVCache,
    *,
    logits_mode: str = "last",   # "last" | "all" | "none"
    last_idx: Optional[jnp.ndarray] = None,  # [B] index of last valid token
) -> Tuple[Optional[jnp.ndarray], kvcache.KVCache]:
    """Run the decoder over T tokens per sequence, updating the cache.

    Prefill = T>1 (reference firstTokenGen), decode = T=1 (continueTokenGen).
    Returns (logits, new_cache); logits is [B, V] for "last", [B, T, V] for
    "all" (perplexity scoring), None for "none" (cache warm-up).
    """
    B, T = ids.shape
    S = cache.max_seq_len
    dtype = _act_dtype(cfg)

    h = embedding.embedding_lookup(params["embed"], ids).astype(dtype)
    mask = attention.make_attention_mask(positions, S, cfg.sliding_window)
    write_offsets = positions[:, 0]
    cos, sin = rope.make_rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling)

    def body(h, xs):
        lp, kc, vc = xs
        h, kc, vc = _layer(cfg, h, lp, kc, vc, positions, write_offsets,
                           mask, cos, sin)
        return h, (kc, vc)

    h, (k_new, v_new) = jax.lax.scan(
        body, h, (params["layers"], cache.k, cache.v))
    new_cache = kvcache.KVCache(k=k_new, v=v_new)

    if logits_mode == "none":
        return None, new_cache

    h = norms.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if logits_mode == "last":
        if last_idx is None:
            last_idx = jnp.full((B,), T - 1, jnp.int32)
        h = h[jnp.arange(B), last_idx]          # [B, H]

    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(h.astype(jnp.float32),
                         params["embed"].T.astype(jnp.float32))
    else:
        logits = matmul(h, lm_head).astype(jnp.float32)
    if cfg.final_logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits, new_cache


# register with the factory
from llm_inference_tpu.models import registry as _registry  # noqa: E402
import sys as _sys  # noqa: E402
_registry.register_model("llama", _sys.modules[__name__])
_registry.register_model("llama2", _sys.modules[__name__])
_registry.register_model("llama3", _sys.modules[__name__])
_registry.register_model("tiny", _sys.modules[__name__])
