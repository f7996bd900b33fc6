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
- Projection weights are kept SEPARATE (wq/wk/wv, w_gate/w_up) rather than
  fused as the reference does offline (reference: src/weights/llama/
  layer_weights.cc:5-45). Fusion is a kernel-launch economy that XLA makes
  irrelevant; separate weights keep every tensor-parallel shard boundary
  clean (a fused qkv axis would interleave q/k/v across shards and force
  reshards at the split points).
- Tensor parallelism is explicit: `forward(..., tp_axis="tensor")` runs the
  SAME code inside `shard_map` with manual collectives (psum after the
  row-sharded o_proj/down_proj, masked-gather+psum for the vocab-sharded
  embedding, all-gather for vocab-sharded logits). This keeps Pallas kernels
  shard-local — the supported way to combine custom kernels with SPMD.
- The KV cache is functional state threaded through scan; in the jitted
  engine programs the buffers are donated so updates are in-place.

Weight pytree layout (dense arrays or QTensor for the 7 matmul weights):
  embed:      [V, H]                 (vocab-sharded under TP)
  layers/attn_norm:  [L, H]
  layers/wq:         [L, H, Hq·D]    (+ optional bq [L, Hq·D], qwen2)
  layers/wk:         [L, H, Hkv·D]   (+ bk)
  layers/wv:         [L, H, Hkv·D]   (+ bv)
  layers/wo:         [L, Hq·D, H]
  layers/ffn_norm:   [L, H]
  layers/w_gate:     [L, H, I]
  layers/w_up:       [L, H, I]
  layers/w_down:     [L, I, H]
  final_norm: [H]
  lm_head:    [H, V]                 (absent if tied; vocab-sharded under TP)
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
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 16)
    std = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "wq": rnd(ks[0], (L, H, Hq * D)),
        "wk": rnd(ks[1], (L, H, Hkv * D)),
        "wv": rnd(ks[2], (L, H, Hkv * D)),
        "wo": rnd(ks[3], (L, Hq * D, H)),
        "ffn_norm": jnp.ones((L, H), dtype),
        "w_gate": rnd(ks[4], (L, H, I)),
        "w_up": rnd(ks[5], (L, H, I)),
        "w_down": rnd(ks[6], (L, I, H)),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, Hq * D), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * D), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * D), dtype)
    params: Params = {
        "embed": rnd(ks[7], (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rnd(ks[8], (H, V))
    return params


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params(params: Params, qcfg: QuantConfig,
                    row_shards: int = 1) -> Params:
    """Quantize the per-layer matmul weights to QTensors (stacked over L).

    lm_head/embed stay dense unless qcfg.quantize_embedding — the gather and
    the final logits matmul are accuracy-sensitive.

    `row_shards`: tensor-parallel degree. Row-sharded weights (wo, w_down)
    get INT4 pack blocks aligned to shard boundaries so each TP shard's
    slice is a self-contained packed matrix (see ops/quantization.QTensor).
    """
    if not qcfg.enabled:
        return params
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_KEYS:
        w = layers[name]  # [L, K, N]
        blocks = row_shards if name in ("wo", "w_down") else 1
        layers[name] = jax.vmap(
            lambda m: quantize(m, bits, qcfg.group_size, pack_blocks=blocks))(w)
    out["layers"] = layers
    if qcfg.quantize_embedding and "lm_head" in params:
        out["lm_head"] = quantize(params["lm_head"], bits, qcfg.group_size)
    return out


def init_params_quantized(cfg: ModelConfig, key: jax.Array,
                          qcfg: QuantConfig, dtype=None,
                          row_shards: int = 1) -> Params:
    """Random quantized dummy weights, built directly as QTensors — the
    perf-bench path for big models (never materializes the dense weights,
    so a 7B INT8 model needs ~7 GB instead of ~20 GB peak)."""
    if not qcfg.enabled:
        return init_params(cfg, key, dtype)
    dtype = dtype or _act_dtype(cfg)
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    H, L = cfg.hidden_size, cfg.num_layers
    I, V = cfg.intermediate_size, cfg.vocab_size
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = iter(jax.random.split(key, 16))
    qmax = 2 ** (bits - 1) - 1
    # scale chosen so dequantized weights look like N(0, 0.02)-ish
    scale_val = 0.02 / qmax

    def qrnd(k, K, N, blocks=1):
        rows = K // 2 if bits == 4 else K
        q = jax.random.randint(k, (L, rows, N), -128, 128, jnp.int32
                               ).astype(jnp.int8)
        gs = qcfg.group_size
        groups = K // gs if (0 < gs < K) else 1
        scale = jnp.full((L, groups, N), scale_val, jnp.float32)
        return QTensor(q=q, scale=scale, bits=bits,
                       group_size=qcfg.group_size, orig_dtype=str(dtype),
                       block_rows=(K // 2 // blocks if bits == 4 else 0))

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "wq": qrnd(next(ks), H, Hq * D),
        "wk": qrnd(next(ks), H, Hkv * D),
        "wv": qrnd(next(ks), H, Hkv * D),
        "wo": qrnd(next(ks), Hq * D, H, blocks=row_shards),
        "ffn_norm": jnp.ones((L, H), dtype),
        "w_gate": qrnd(next(ks), H, I),
        "w_up": qrnd(next(ks), H, I),
        "w_down": qrnd(next(ks), I, H, blocks=row_shards),
    }
    params: Params = {
        "embed": rnd(next(ks), (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rnd(next(ks), (H, V))
    return params


def param_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# TP collectives (no-ops when tp_axis is None / outside shard_map)
# ---------------------------------------------------------------------------

def _psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _sharded_embedding_lookup(table, ids, tp_axis):
    """Vocab-sharded gather: local rows cover [lo, lo + V_local); out-of-shard
    ids contribute zero and the psum restores the full row."""
    if not tp_axis:
        return embedding.embedding_lookup(table, ids)
    v_local = table.shape[0]
    lo = jax.lax.axis_index(tp_axis) * v_local
    local = ids - lo
    in_shard = (local >= 0) & (local < v_local)
    rows = jnp.take(table, jnp.clip(local, 0, v_local - 1), axis=0)
    rows = jnp.where(in_shard[..., None], rows, 0)
    return jax.lax.psum(rows, tp_axis)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer(cfg: ModelConfig, h, lp, kc, vc, positions, write_offsets, mask,
           cos, sin, tp_axis: Optional[str]):
    """One decoder layer. h: [B, T, H] (replicated across TP); kc/vc:
    [B, Hkv_local, S, D]."""
    B, T, H = h.shape
    D = cfg.head_dim
    eps = cfg.rms_norm_eps

    # --- attention block ---
    normed = norms.rms_norm(h, lp["attn_norm"], eps)
    q = matmul(normed, lp["wq"], bias=lp.get("bq"))
    k = matmul(normed, lp["wk"], bias=lp.get("bk"))
    v = matmul(normed, lp["wv"], bias=lp.get("bv"))
    q = q.reshape(B, T, -1, D)       # [B, T, Hq_local, D]
    k = k.reshape(B, T, -1, D)
    v = v.reshape(B, T, -1, D)
    q = rope.apply_rope(q, positions, cos, sin)
    k = rope.apply_rope(k, positions, cos, sin)
    kc, vc = kvcache.update_kv_cache(kc, vc, k, v, write_offsets)
    attn = attention.attend(q, kc, vc, mask,
                            logit_softcap=cfg.attn_logit_softcap)
    attn = matmul(attn.reshape(B, T, -1), lp["wo"])
    h = h + _psum(attn, tp_axis)

    # --- FFN block ---
    normed = norms.rms_norm(h, lp["ffn_norm"], eps)
    act = activations.swiglu_split(matmul(normed, lp["w_gate"]),
                                   matmul(normed, lp["w_up"]))
    h = h + _psum(matmul(act, lp["w_down"]), tp_axis)
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
    tp_axis: Optional[str] = None,           # shard_map axis name for TP
) -> Tuple[Optional[jnp.ndarray], kvcache.KVCache]:
    """Run the decoder over T tokens per sequence, updating the cache.

    Prefill = T>1 (reference firstTokenGen), decode = T=1 (continueTokenGen).
    Returns (logits, new_cache); logits is [B, V] for "last", [B, T, V] for
    "all" (perplexity scoring), None for "none" (cache warm-up).
    """
    B, T = ids.shape
    S = cache.max_seq_len
    dtype = _act_dtype(cfg)

    h = _sharded_embedding_lookup(params["embed"], ids, tp_axis).astype(dtype)
    mask = attention.make_attention_mask(positions, S, cfg.sliding_window)
    write_offsets = positions[:, 0]
    cos, sin = rope.make_rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling)

    def body(h, xs):
        lp, kc, vc = xs
        h, kc, vc = _layer(cfg, h, lp, kc, vc, positions, write_offsets,
                           mask, cos, sin, tp_axis)
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
        # tied embeddings: embed is vocab-sharded under TP, so the local dot
        # yields the local vocab slice — same layout as the lm_head branch.
        logits = jnp.dot(h.astype(jnp.float32),
                         params["embed"].T.astype(jnp.float32))
    else:
        logits = matmul(h, lm_head).astype(jnp.float32)
    if tp_axis:
        # vocab-sharded logits → full logits on every shard (B is small)
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
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
