"""Gemma-2 decoder as a pure JAX function.

Second model FAMILY beyond the reference's LLaMA-only scope (the reference
hard-codes LLaMA throughout — src/models/llama/*; its factory knows one
name, src/utils/model_utils.h:16-61). Gemma-2 differs architecturally, not
just by hyperparameters:

- SANDWICH norms: pre- AND post-norms around both the attention and FFN
  blocks (4 RMSNorms/layer vs llama's 2), with the Gemma RMSNorm variant
  that multiplies by (1 + weight) IN float32.
- GeGLU FFN: gelu_tanh(gate) * up instead of SwiGLU.
- Attention-logit soft-capping (tanh at ±50) and final-logit capping (±30).
- Query scaling by query_pre_attn_scalar^-0.5 instead of head_dim^-0.5.
- ALTERNATING sliding-window attention: even layers see a 4096 window, odd
  layers are global — expressed as a per-layer window scalar riding the
  layer scan (a static per-layer branch would break the uniform scan).
- Embeddings scaled by sqrt(hidden); lm_head tied.

Shares the framework's cache/rope/attention/sampling machinery and the
engine serves it through the model registry; tensor-parallel over a mesh
(sandwich post-norms after the row-shard psums — see _layer). Dense OR
paged KV cache (paged serving incl. prefix caching goes through the gather
path). DECODE runs the fused Pallas kernel: the per-layer alternating
window rides the layer scan as a traced scalar into the kernel's scalar
prefetch (ops/pallas/decode_attention), so windowed layers stream ~window
cache slots, not S. Prefill uses the jnp path (the flash kernel's window
is static; a traced-window variant is the remaining kernel gap).
Quantization reuses the same QTensor layer keys.

Numerics validated against transformers' Gemma2ForCausalLM
(tests/test_gemma2.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.models.llama import (_psum,
                                            _sharded_embedding_lookup)
from llm_inference_tpu.ops import attention, kvcache, paged_kvcache, rope
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.ops.quantization import QTensor

Params = Dict[str, Any]


def gemma_rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
                   eps: float) -> jnp.ndarray:
    """Gemma RMSNorm: normalize AND scale by (1 + w) in float32, then cast
    (HF Gemma2RMSNorm ordering — llama casts before the weight multiply)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(dtype)


def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Params:
    """Random dummy weights (perf/testing path; norms at 0 ⇒ identity+1)."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    H, L = cfg.hidden_size, cfg.num_layers
    I, V = cfg.intermediate_size, cfg.vocab_size
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 8)
    std = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "attn_norm": jnp.zeros((L, H), dtype),
        "post_attn_norm": jnp.zeros((L, H), dtype),
        "wq": rnd(ks[0], (L, H, Hq * D)),
        "wk": rnd(ks[1], (L, H, Hkv * D)),
        "wv": rnd(ks[2], (L, H, Hkv * D)),
        "wo": rnd(ks[3], (L, Hq * D, H)),
        "ffn_norm": jnp.zeros((L, H), dtype),
        "post_ffn_norm": jnp.zeros((L, H), dtype),
        "w_gate": rnd(ks[4], (L, H, I)),
        "w_up": rnd(ks[5], (L, H, I)),
        "w_down": rnd(ks[6], (L, I, H)),
    }
    if cfg.qk_norm:          # gemma3: per-head (1+w) norms, zeros = identity
        layers["q_norm"] = jnp.zeros((L, D), dtype)
        layers["k_norm"] = jnp.zeros((L, D), dtype)
    return {
        "embed": rnd(ks[7], (V, H)),
        "layers": layers,
        "final_norm": jnp.zeros((H,), dtype),
    }


def _layer_windows(cfg: ModelConfig) -> jnp.ndarray:
    """Per-layer sliding window sizes [L] (0 = global attention)."""
    L = cfg.num_layers
    if cfg.layer_types is not None:          # gemma3: explicit per-layer
        return jnp.asarray(
            [cfg.sliding_window if t == "sliding_attention" else 0
             for t in cfg.layer_types], jnp.int32)
    if cfg.sliding_window <= 0:
        return jnp.zeros((L,), jnp.int32)
    if cfg.sliding_pattern == "alternating":
        # even layers windowed, odd global (HF Gemma2: not bool(idx % 2))
        return jnp.asarray([cfg.sliding_window if i % 2 == 0 else 0
                            for i in range(L)], jnp.int32)
    return jnp.full((L,), cfg.sliding_window, jnp.int32)


def _layer(cfg: ModelConfig, h, lp, qw, cache, layer_idx, positions,
           write_offsets, base_mask, cos, sin, window, tp_axis):
    """One Gemma-2 layer: sandwich-normed attention + GeGLU FFN.
    `window` is this layer's sliding-window size (0 = global), a traced
    per-layer scalar from the scan xs.

    Under TP (tp_axis set, inside shard_map) the Megatron pattern applies
    exactly as in llama: wq/wk/wv/w_gate/w_up are column-sharded so each
    shard computes its local heads / FFN columns; wo/w_down are row-sharded
    and the partial sums are completed by one psum each. The psum must land
    BEFORE the sandwich post-norm — RMSNorm reduces over the full hidden
    dim, so it needs the completed sum, not a partial."""
    B, T, H = h.shape
    D = cfg.head_dim
    eps = cfg.rms_norm_eps
    scale = (cfg.query_pre_attn_scalar or cfg.head_dim) ** -0.5

    def mm(name, x):
        if name in qw:
            return matmul(x, qw[name], layer=layer_idx)
        return matmul(x, lp[name])

    normed = gemma_rms_norm(h, lp["attn_norm"], eps)
    q = mm("wq", normed).reshape(B, T, -1, D)
    k = mm("wk", normed).reshape(B, T, -1, D)
    v = mm("wv", normed).reshape(B, T, -1, D)
    if cfg.qk_norm:
        # gemma3: per-head (1+w) RMSNorm before RoPE (HF Gemma3Attention)
        q = gemma_rms_norm(q, lp["q_norm"], eps)
        k = gemma_rms_norm(k, lp["k_norm"], eps)
    # cos/sin arrive pre-gathered at `positions` ([B, T, D]) — see forward
    q = rope.apply_rope_gathered(q, cos, sin)
    k = rope.apply_rope_gathered(k, cos, sin)

    from llm_inference_tpu.models.llama import write_kv_and_views
    from llm_inference_tpu.ops.pallas import decode_attention as pallas_decode
    from llm_inference_tpu.ops.pallas import flash_attention as pallas_flash
    from llm_inference_tpu.ops.pallas import paged_attention as pallas_paged
    paged = isinstance(cache, paged_kvcache.PagedKVCache)
    if (T == 1 and paged
            and pallas_paged.supports(q.shape, cache.page_size)):
        # fused paged decode (continuous-batching serving), window-aware
        cache = paged_kvcache.write_token(cache, layer_idx, k, v,
                                          positions[:, 0])
        attn = pallas_paged.paged_decode_attention(
            q, cache.k_pages, cache.v_pages, cache.page_table, layer_idx,
            positions[:, -1], scale=scale,
            logit_softcap=cfg.attn_logit_softcap,
            k_scale=cache.k_scale, v_scale=cache.v_scale, window=window)
    elif (T == 1 and not paged
            and pallas_decode.supports(q.shape, cache.max_seq_len)):
        # fused decode kernel, window-aware: the traced per-layer window
        # rides scalar prefetch — windowed layers stream ~window slots of
        # the stacked cache, global layers the live prefix (llama's decode
        # path, plus gemma2's alternating window and query scale)
        cache = kvcache.update_cache_layer(cache, layer_idx, k, v,
                                           write_offsets)
        attn = pallas_decode.decode_attention(
            q, cache.k, cache.v, layer_idx, positions[:, -1], scale=scale,
            logit_softcap=cfg.attn_logit_softcap,
            k_scale=cache.k_scale, v_scale=cache.v_scale, window=window)
    elif (T > 1 and not paged
            and pallas_flash.supports(q.shape, cache.max_seq_len,
                                      cache.quantized)):
        # long prefill: memory-flat flash kernel; the per-layer TRACED
        # window rides scalar prefetch (this previously forced gemma's
        # prefill onto the score-materializing XLA path)
        cache = kvcache.update_cache_layer(cache, layer_idx, k, v,
                                           write_offsets)
        attn = pallas_flash.flash_attention(
            q, cache.k, cache.v, layer_idx, positions, scale=scale,
            logit_softcap=cfg.attn_logit_softcap, sliding_window=window,
            k_scale=cache.k_scale, v_scale=cache.v_scale)
    else:
        cache, kd, vd, ksd, vsd, S = write_kv_and_views(
            cache, layer_idx, k, v, positions, write_offsets, B, T)
        # only the per-layer WINDOW term is layer-varying; the causal mask
        # is computed once in forward
        slots = jnp.arange(S, dtype=positions.dtype)
        win_ok = (window <= 0) | (slots[None, None, :]
                                  > positions[:, :, None] - window)
        mask = base_mask & win_ok[:, None, :, :]
        attn = attention.attend(q, kd, vd, mask,
                                scale=scale,
                                logit_softcap=cfg.attn_logit_softcap,
                                k_scale=ksd, v_scale=vsd)
    attn = mm("wo", attn.reshape(B, T, -1))
    h = h + gemma_rms_norm(_psum(attn, tp_axis), lp["post_attn_norm"], eps)

    normed = gemma_rms_norm(h, lp["ffn_norm"], eps)
    act = (jax.nn.gelu(mm("w_gate", normed).astype(jnp.float32),
                       approximate=True).astype(h.dtype)
           * mm("w_up", normed))
    ffn = mm("w_down", act)
    h = h + gemma_rms_norm(_psum(ffn, tp_axis), lp["post_ffn_norm"], eps)
    return h, cache


def forward(
    cfg: ModelConfig,
    params: Params,
    ids: jnp.ndarray,            # [B, T] int32
    positions: jnp.ndarray,      # [B, T] int32 absolute positions
    cache: kvcache.KVCache,
    *,
    logits_mode: str = "last",
    last_idx: Optional[jnp.ndarray] = None,
    tp_axis: Optional[str] = None,
    paged_history: bool = False,
) -> Tuple[Optional[jnp.ndarray], kvcache.KVCache]:
    """Same contract as models/llama.forward (dense cache), including
    tensor parallelism (tp_axis inside shard_map — parallel/sharding.py
    builds the wrapper; specs are family-agnostic since gemma2 reuses the
    llama weight names)."""
    paged = isinstance(cache, paged_kvcache.PagedKVCache)
    B, T = ids.shape
    S = (cache.max_blocks * cache.page_size if paged
         else cache.max_seq_len)
    dtype = jnp.dtype(cfg.dtype)

    h = _sharded_embedding_lookup(params["embed"], ids, tp_axis
                                  ).astype(dtype)
    if cfg.scale_embeddings:
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, dtype)
    write_offsets = positions[:, 0]
    base_mask = attention.make_attention_mask(positions, S)
    P = min(cfg.max_position_embeddings, S)
    cos_t, sin_t = rope.make_rope_table(P, cfg.head_dim, cfg.rope_theta,
                                        cfg.rope_scaling)
    # gather ONCE at the positions ([B, T, D]) — the per-layer dual-RoPE
    # pick then selects these tiny gathered values inside the scan; a
    # lax.select over the full [P, D] tables in the scan body would
    # materialize an HBM copy of both tables every layer every step
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)
    if cfg.rope_local_theta > 0:
        # gemma3 dual RoPE: sliding layers rotate with the LOCAL theta
        # (no scaling on the local tables, matching HF Gemma3RotaryEmbedding
        # local variant); the per-layer pick rides the scan as a selector
        cos_lt, sin_lt = rope.make_rope_table(P, cfg.head_dim,
                                              cfg.rope_local_theta)
        cos_l = jnp.take(cos_lt, positions, axis=0)
        sin_l = jnp.take(sin_lt, positions, axis=0)
    else:
        cos_l, sin_l = cos, sin

    qw = {k: v for k, v in params["layers"].items() if isinstance(v, QTensor)}
    xs = {k: v for k, v in params["layers"].items()
          if not isinstance(v, QTensor)}
    xs["_window"] = _layer_windows(cfg)

    dual_rope = cfg.rope_local_theta > 0

    def body(carry, lp):
        h, cache, idx = carry
        window = lp.pop("_window")
        if dual_rope:
            c = jax.lax.select(window > 0, cos_l, cos)
            s = jax.lax.select(window > 0, sin_l, sin)
        else:
            c, s = cos, sin
        h, cache = _layer(cfg, h, lp, qw, cache, idx, positions,
                          write_offsets, base_mask, c, s, window,
                          tp_axis)
        return (h, cache, idx + 1), None

    (h, new_cache, _), _ = jax.lax.scan(body, (h, cache, jnp.int32(0)), xs)

    if logits_mode == "none":
        return None, new_cache
    h = gemma_rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if logits_mode == "hidden":
        return h.astype(jnp.float32), new_cache
    if logits_mode == "last":
        if last_idx is None:
            last_idx = jnp.full((B,), T - 1, jnp.int32)
        h = h[jnp.arange(B), last_idx]
    lm_head = params.get("lm_head")
    if lm_head is None:          # tied (the gemma2 default)
        # embed is vocab-sharded under TP → local vocab slice of logits
        logits = jnp.dot(h.astype(jnp.float32),
                         params["embed"].T.astype(jnp.float32))
    else:                        # untied finetunes
        logits = matmul(h, lm_head).astype(jnp.float32)
    if tp_axis:
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    if logits.shape[-1] > cfg.vocab_size:
        # vocab was padded for TP lane alignment (llama.pad_params_for_tp)
        logits = logits[..., :cfg.vocab_size]
    if cfg.final_logit_softcap > 0.0:
        logits = (jnp.tanh(logits / cfg.final_logit_softcap)
                  * cfg.final_logit_softcap)
    return logits, new_cache


# register with the factory
from llm_inference_tpu.models import registry as _registry  # noqa: E402
import sys as _sys  # noqa: E402
_registry.register_model("gemma2", _sys.modules[__name__])
_registry.register_model("gemma3", _sys.modules[__name__])
