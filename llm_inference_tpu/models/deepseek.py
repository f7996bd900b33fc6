"""DeepSeek V3/R1 family: Multi-head Latent Attention + fine-grained MoE.

Reference analogue: none (the reference is a dense-MHA LLaMA-2 engine,
src/models/llama/llama.h:14-207); this family extends the framework to the
architecture of DeepSeek-V3/R1 — HF-parity-tested against
transformers.DeepseekV3ForCausalLM.

TPU-first design decisions (vs the HF eager graph, which expands the
latent into per-head K/V and caches THAT):

- The KV cache stores the LATENT: k = [c_kv ∥ roped k_rot]
  (kv_lora_rank + qk_rope_head_dim per token, ONE kv head), v = c_kv.
  For V3 that is ~1088 B/token(bf16·2) against the expanded cache's
  num_heads·(qk_head_dim + v_head_dim) = 81920 — the whole point of MLA,
  and exactly the quantity the decode roofline streams.
- Attention runs ABSORBED: q_eff[h] = [q_nope[h] @ W_uk[h] ∥ q_rot[h]]
  attends over the shared latent rows (MQA with one 576-wide key), and
  the per-head output re-expands via W_uv. By associativity this equals
  HF's expanded computation exactly — scores are q_nope·(W_uk c) + RoPE
  dot either way. The per-head expansion matmuls move to the QUERY side
  (T tokens), not the cache side (S tokens): decode touches
  S·(kv_lora+rope) latent bytes instead of S·H·(192+128).
- The dense KV-cache machinery is reused unchanged (scan-carry DUS
  writes, int8 quantized mode with per-(token, head=1) scales, sharded
  batch axis); k and v simply have different widths. The fused Pallas
  attention kernels gate themselves off (D=576 ∉ {64,128,256}) — decode
  attention here is ONE [B·H, 576]×[576, S] MQA dot chain that XLA
  already runs near bandwidth on the tiny latent cache.
- Paged serving reuses the pool machinery with k/v pages of different
  widths (latent_dim vs kv_lora_rank, ONE kv head) via new_paged_cache;
  reads gather the pool into the same dense MQA views (at MLA row sizes
  the gather costs what one dense-head gather would).
- MoE (V3 semantics): sigmoid router + e_score_correction bias,
  group-limited routing (top-2-sum group scores, topk_group groups kept),
  raw-sigmoid top-k weights (norm_topk_prob, routed_scaling_factor), one
  always-on shared expert, first `first_k_dense` layers dense — the layer
  stack runs as TWO scans (dense prefix, MoE rest) so each scan's pytree
  is shape-uniform.
- YaRN rope (ops/rope.py "yarn") with the mscale² score-scale fold;
  checkpoints with rope_interleave store interleaved rope pairs — the
  conversion bakes the de-interleave permutation into the projection
  COLUMNS once, so the runtime always uses the standard HF pairing.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.ops import (activations, attention, kvcache, norms,
                                   paged_kvcache, rope)
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.utils import debug

Params = Dict[str, Any]


def is_deepseek(cfg: ModelConfig) -> bool:
    return cfg.kv_lora_rank > 0


def _act_dtype(cfg: ModelConfig):
    return jnp.float32 if cfg.dtype == "float32" else jnp.bfloat16


def qk_head_dim(cfg: ModelConfig) -> int:
    return cfg.qk_nope_head_dim + cfg.qk_rope_head_dim


def latent_dim(cfg: ModelConfig) -> int:
    return cfg.kv_lora_rank + cfg.qk_rope_head_dim


def score_scale(cfg: ModelConfig) -> float:
    """HF DeepseekV3Attention.scaling: qk_head_dim^-0.5, times the yarn
    mscale(factor, mscale_all_dim)^2 when that key is set."""
    s = qk_head_dim(cfg) ** -0.5
    rs = cfg.rope_scaling or {}
    mad = rs.get("mscale_all_dim", 0)
    factor = rs.get("factor", 1.0)
    if mad and factor > 1:
        m = 0.1 * float(mad) * math.log(float(factor)) + 1.0
        s = s * m * m
    return s


def new_cache(cfg: ModelConfig, batch: int, max_seq: int,
              dtype=jnp.bfloat16) -> kvcache.KVCache:
    """Latent MLA cache: ONE kv head; k rows are [c_kv ∥ k_rot]
    (latent_dim wide), v rows the bare c_kv (kv_lora_rank)."""
    L = cfg.num_layers
    kshape = (L, batch, 1, max_seq, latent_dim(cfg))
    vshape = (L, batch, 1, max_seq, cfg.kv_lora_rank)
    if dtype == jnp.int8 or dtype == "int8":
        sshape = (L, batch, max_seq, 1)
        return kvcache.KVCache(k=jnp.zeros(kshape, jnp.int8),
                               v=jnp.zeros(vshape, jnp.int8),
                               k_scale=jnp.zeros(sshape, jnp.float32),
                               v_scale=jnp.zeros(sshape, jnp.float32),
                               bits=8)
    if dtype == "int4":
        # INT4 latents: split-half packed codes (quantization.quantize_kv4)
        # halve the resident bytes AGAIN on top of MLA's head-free rows —
        # the one int4-KV deployment with no speed-downside argument: the
        # latent path attends via attention.attend (one kv head, D=576),
        # where the unpack is one XLA fusion, not a per-block VPU tax.
        # k rows pack latent_dim/2 bytes, v rows kv_lora_rank/2; scales
        # stay per-(slot, head=1) like int8.
        sshape = (L, batch, max_seq, 1)
        return kvcache.KVCache(
            k=jnp.zeros(kshape[:-1] + (latent_dim(cfg) // 2,), jnp.int8),
            v=jnp.zeros(vshape[:-1] + (cfg.kv_lora_rank // 2,), jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
            bits=4)
    return kvcache.KVCache(k=jnp.zeros(kshape, dtype),
                           v=jnp.zeros(vshape, dtype))


def new_paged_cache(cfg: ModelConfig, num_pages: int, page_size: int,
                    batch: int, max_blocks: int,
                    dtype=jnp.bfloat16) -> paged_kvcache.PagedKVCache:
    """Paged MLA latent pool (PagedScheduler hook — engine dispatches here
    instead of ops.paged_kvcache.init_paged_cache): ONE kv head, k pages
    latent_dim wide ([c_kv ∥ k_rot]) and v pages kv_lora_rank wide — the
    pool write/gather paths are D-agnostic, so the only MLA-specific part
    is this constructor."""
    L = cfg.num_layers
    kshape = (L, num_pages, 1, page_size, latent_dim(cfg))
    vshape = (L, num_pages, 1, page_size, cfg.kv_lora_rank)
    pt = jnp.zeros((batch, max_blocks), jnp.int32)
    if dtype == jnp.int8 or dtype == "int8":
        sshape = (L, num_pages, page_size, 1)
        return paged_kvcache.PagedKVCache(
            k_pages=jnp.zeros(kshape, jnp.int8),
            v_pages=jnp.zeros(vshape, jnp.int8), page_table=pt,
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32), bits=8)
    if dtype == "int4":
        # packed-latent pool (see new_cache's int4 note): pool write /
        # gather paths are code-width-agnostic, attend unpacks
        sshape = (L, num_pages, page_size, 1)
        return paged_kvcache.PagedKVCache(
            k_pages=jnp.zeros(kshape[:-1] + (latent_dim(cfg) // 2,),
                              jnp.int8),
            v_pages=jnp.zeros(vshape[:-1] + (cfg.kv_lora_rank // 2,),
                              jnp.int8),
            page_table=pt,
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32), bits=4)
    return paged_kvcache.PagedKVCache(k_pages=jnp.zeros(kshape, dtype),
                                      v_pages=jnp.zeros(vshape, dtype),
                                      page_table=pt)


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def _mla_attention(cfg, h, lp, qw, cache, layer_idx, w_idx, positions,
                   write_offsets, mask, cos, sin, paged_history=False,
                   tp_axis=None):
    """Multi-head latent attention (absorbed form) over the latent cache
    (dense KVCache or paged pool). `layer_idx` indexes the cache
    (absolute); `w_idx` indexes this stack's QTensor weights
    (stack-relative).

    Head-sharded under a mesh axis (round 3): when the pspecs head-shard
    the dense attention projections (sharding.deepseek_param_pspecs),
    w_uk arrives [Hh_local, nope, kvr] — everything here is shape-driven
    off that leading dim, the latent cache stays replicated (it is head-
    free — the MLA win), and the row-sharded wo partials psum below."""
    B, T, _ = h.shape
    # LOCAL head count: w_uk is always dense and per-layer [Hh?, nope, kvr]
    Hh = lp["w_uk"].shape[0]
    attn_sharded = tp_axis is not None and Hh != cfg.num_heads
    nope, rdim = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    kvr = cfg.kv_lora_rank
    eps = cfg.rms_norm_eps

    def mm(name, x):
        if name in qw:
            return matmul(x, qw[name], layer=w_idx)
        return matmul(x, lp[name])

    normed = norms.rms_norm(h, lp["attn_norm"], eps)
    if cfg.q_lora_rank > 0:
        qa = norms.rms_norm(mm("wq_a", normed), lp["q_a_norm"], eps)
        q = mm("wq_b", qa)
    else:
        q = mm("wq", normed)
    q = q.reshape(B, T, Hh, nope + rdim)
    q_nope, q_rot = q[..., :nope], q[..., nope:]

    ckv = mm("wkv_a", normed)                      # [B, T, kvr + rdim]
    c = norms.rms_norm(ckv[..., :kvr], lp["kv_a_norm"], eps)
    k_rot = ckv[..., None, kvr:]                   # [B, T, 1, rdim]

    q_rot = rope.apply_rope(q_rot, positions, cos, sin)
    k_rot = rope.apply_rope(k_rot, positions, cos, sin)

    # absorb W_uk into the query: scores = q_nope·(W_uk c) = (q_nope W_uk)·c
    # (operands stay in the activation dtype; preferred_element_type gives
    # the f32 accumulator — casting the weight slice to f32 would
    # materialize an f32 copy per layer per step)
    q_abs = jnp.einsum("bthn,hnr->bthr", q_nope, lp["w_uk"],
                       preferred_element_type=jnp.float32).astype(q.dtype)
    q_eff = jnp.concatenate([q_abs, q_rot], axis=-1)       # [B,T,Hh,kvr+r]
    k_eff = jnp.concatenate([c, k_rot[:, :, 0]], axis=-1)[:, :, None, :]
    v_eff = c[:, :, None, :]                               # [B,T,1,kvr]

    if isinstance(cache, paged_kvcache.PagedKVCache):
        # paged latent pool: ONE kv head makes every page row the whole
        # token — write into the pool (decode slot / prompt blocks /
        # prefix-suffix blocks), then attend over the gathered dense view.
        # The gather streams ~S·latent_dim bytes per layer — at MLA's
        # ~40x-smaller rows this costs what ONE dense-head gather would,
        # so the llama-style in-pool Pallas kernel (D=576 unsupported)
        # is not needed for parity-grade serving.
        from llm_inference_tpu.models.llama import _gather_paged
        if T == 1:
            cache = paged_kvcache.write_token(cache, layer_idx, k_eff,
                                              v_eff, positions[:, 0])
        else:
            start = (write_offsets // cache.page_size if paged_history
                     else None)
            cache = paged_kvcache.write_prompt_batch(
                cache, layer_idx, k_eff, v_eff,
                T // cache.page_size, start_blocks=start)
        kd, vd, ksd, vsd = _gather_paged(cache, layer_idx, B)
        out_lat = attention.attend(q_eff, kd, vd, mask,
                                   scale=score_scale(cfg),
                                   k_scale=ksd, v_scale=vsd)
        out = jnp.einsum("bthr,hrv->bthv", out_lat, lp["w_uv"],
                         preferred_element_type=jnp.float32).astype(h.dtype)
        attn = mm("wo", out.reshape(B, T, Hh * cfg.v_head_dim))
        if attn_sharded:
            attn = jax.lax.psum(attn, tp_axis)
        return attn, cache

    cache = kvcache.update_cache_layer(cache, layer_idx, k_eff, v_eff,
                                       write_offsets)

    def at_layer(x):
        return (None if x is None else
                jax.lax.dynamic_index_in_dim(x, layer_idx, 0,
                                             keepdims=False))

    out_lat = attention.attend(q_eff, at_layer(cache.k), at_layer(cache.v),
                               mask, scale=score_scale(cfg),
                               k_scale=at_layer(cache.k_scale),
                               v_scale=at_layer(cache.v_scale))
    # re-expand per head: out[h] = latent_out[h] @ W_uv[h]
    out = jnp.einsum("bthr,hrv->bthv", out_lat, lp["w_uv"],
                     preferred_element_type=jnp.float32).astype(h.dtype)
    attn = mm("wo", out.reshape(B, T, Hh * cfg.v_head_dim))
    if attn_sharded:
        attn = jax.lax.psum(attn, tp_axis)
    return attn, cache


def _mlp(x, gate, up, down, layer=None):
    act = activations.swiglu_split(matmul(x, gate, layer=layer),
                                   matmul(x, up, layer=layer))
    return matmul(act, down, layer=layer)


def _v3_moe(cfg, x, lp, qw, w_idx, expert_axis=None):
    """V3 routed mixture + shared expert (HF DeepseekV3MoE semantics).
    Under expert parallelism (`expert_axis` inside shard_map) each shard
    computes its LOCAL experts' router-masked contributions and one psum
    completes the routed mixture; the shared expert is replicated and
    added OUTSIDE the psum (it would otherwise be summed N times)."""
    B, T, H = x.shape
    E, k = cfg.num_experts, cfg.experts_per_token
    G = cfg.n_group
    logits = jnp.einsum("bth,he->bte", x.astype(jnp.float32),
                        lp["router"].astype(jnp.float32))
    scores = jax.nn.sigmoid(logits)                       # [B, T, E] f32
    biased = scores + lp["router_bias"].astype(jnp.float32)
    # group-limited routing: per-group top-2 sum → keep topk_group groups
    gs = jnp.sum(jax.lax.top_k(biased.reshape(B, T, G, E // G), 2)[0],
                 axis=-1)                                 # [B, T, G]
    _, gidx = jax.lax.top_k(gs, cfg.topk_group)
    gmask = jnp.sum(jax.nn.one_hot(gidx, G, dtype=jnp.float32),
                    axis=-2) > 0                          # [B, T, G]
    emask = jnp.repeat(gmask, E // G, axis=-1)            # [B, T, E]
    choice = jnp.where(emask, biased, 0.0)
    _, tidx = jax.lax.top_k(choice, k)
    w = jnp.take_along_axis(scores, tidx, axis=-1)        # RAW sigmoid
    if cfg.norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    w = w * cfg.routed_scaling_factor
    sel = jnp.sum(jax.nn.one_hot(tidx, E, dtype=jnp.float32)
                  * w[..., None], axis=-2)                # [B, T, E]

    quantized = "e_gate" in qw
    if expert_axis is not None:
        # local slice of the expert axis (quantized EP stacks arrive in
        # quantize_params' expert-block-major order, so the shard's stack
        # is its own [Lm·El] kernel-indexable stack)
        n_sh = jax.lax.psum(1, expert_axis)
        e_local = E // n_sh
        off = jax.lax.axis_index(expert_axis) * e_local
        sel = jax.lax.dynamic_slice_in_dim(sel, off, e_local, axis=2)
    else:
        e_local = E
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for e in range(e_local):                              # static loop
        if quantized:
            # flattened [Lm·El] QTensor stacks, kernel-indexed (mixtral's
            # stacked-operand convention — no scan-sliced custom calls)
            idx = w_idx * e_local + e
            y = _mlp(x, qw["e_gate"], qw["e_up"], qw["e_down"], layer=idx)
        else:
            y = _mlp(x, lp["e_gate"][e], lp["e_up"][e], lp["e_down"][e])
        out = out + sel[..., e:e + 1] * y.astype(jnp.float32)
    if expert_axis is not None:
        out = jax.lax.psum(out, expert_axis)
    out = out.astype(x.dtype)
    if "s_gate" in qw:
        out = out + _mlp(x, qw["s_gate"], qw["s_up"], qw["s_down"],
                         layer=w_idx)
    else:
        out = out + _mlp(x, lp["s_gate"], lp["s_up"], lp["s_down"])
    return out


def _layer(cfg, h, lp, qw, cache, layer_idx, w_idx, positions,
           write_offsets, mask, cos, sin, moe: bool, expert_axis=None,
           paged_history=False):
    attn, cache = _mla_attention(cfg, h, lp, qw, cache, layer_idx, w_idx,
                                 positions, write_offsets, mask, cos, sin,
                                 paged_history=paged_history,
                                 tp_axis=expert_axis)
    h = h + attn
    normed = norms.rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
    if moe:
        h = h + _v3_moe(cfg, normed, lp, qw, w_idx, expert_axis)
    elif "w_gate" in qw:
        h = h + _mlp(normed, qw["w_gate"], qw["w_up"], qw["w_down"],
                     layer=w_idx)
    else:
        h = h + _mlp(normed, lp["w_gate"], lp["w_up"], lp["w_down"])
    return h, cache


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def forward(
    cfg: ModelConfig,
    params: Params,
    ids: jnp.ndarray,            # [B, T] int32
    positions: jnp.ndarray,      # [B, T] int32
    cache: kvcache.KVCache,
    *,
    logits_mode: str = "last",
    last_idx: Optional[jnp.ndarray] = None,
    tp_axis: Optional[str] = None,
    paged_history: bool = False,
) -> Tuple[Optional[jnp.ndarray], kvcache.KVCache]:
    """Prefill (T>1) / decode (T=1) over the latent cache. Two layer
    scans: the dense prefix (first_k_dense layers) then the MoE rest."""
    # tp_axis names the EXPERT axis (mixtral convention): expert stacks
    # shard over it, attention/latent-cache replicate across it
    B, T = ids.shape
    dtype = _act_dtype(cfg)
    h = jnp.take(params["embed"], ids, axis=0).astype(dtype)
    if isinstance(cache, paged_kvcache.PagedKVCache):
        S = cache.max_blocks * cache.page_size
    else:
        S = cache.max_seq_len
    mask = attention.make_attention_mask(positions, S)
    write_offsets = positions[:, 0]
    cos, sin = rope.make_rope_table(
        min(cfg.max_position_embeddings, S), cfg.qk_rope_head_dim,
        cfg.rope_theta, cfg.rope_scaling)
    debug.tap("embed", h)

    def run_stack(h, cache, stack, idx0, moe):
        from llm_inference_tpu.ops.quantization import QTensor
        qw = {k: v for k, v in stack.items() if isinstance(v, QTensor)}
        xs = {k: v for k, v in stack.items() if not isinstance(v, QTensor)}

        def body(carry, lp):
            h, cache, idx = carry
            h, cache = _layer(cfg, h, lp, qw, cache, idx, idx - idx0,
                              positions, write_offsets, mask, cos, sin,
                              moe, expert_axis=tp_axis,
                              paged_history=paged_history)
            debug.tap("out", h, layer=idx)
            return (h, cache, idx + 1), None

        (h, cache, _), _ = jax.lax.scan(
            body, (h, cache, jnp.int32(idx0)), xs)
        return h, cache

    if params.get("dense_layers"):
        h, cache = run_stack(h, cache, params["dense_layers"], 0, False)
    h, cache = run_stack(h, cache, params["moe_layers"],
                         cfg.first_k_dense, True)

    if logits_mode == "none":
        return None, cache
    h = norms.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if logits_mode == "hidden":
        return h, cache
    if logits_mode == "last":
        if last_idx is None:
            last_idx = jnp.full((B,), T - 1, jnp.int32)
        h = h[jnp.arange(B), last_idx]
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(h.astype(jnp.float32),
                         params["embed"].T.astype(jnp.float32))
    else:
        logits = matmul(h, lm_head).astype(jnp.float32)
    debug.tap("logits", logits)
    return logits, cache


# ---------------------------------------------------------------------------
# params: random init + HF conversion
# ---------------------------------------------------------------------------

def _attn_keys(cfg: ModelConfig):
    keys = ["attn_norm", "wkv_a", "kv_a_norm", "w_uk", "w_uv", "wo",
            "ffn_norm"]
    if cfg.q_lora_rank > 0:
        keys += ["wq_a", "q_a_norm", "wq_b"]
    else:
        keys += ["wq"]
    return keys


def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Params:
    """Random dummy weights (perf/tests), matching the HF layout."""
    dtype = dtype or _act_dtype(cfg)
    H, V = cfg.hidden_size, cfg.vocab_size
    Hh, nope, rdim = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    kvr, vd = cfg.kv_lora_rank, cfg.v_head_dim
    E = cfg.num_experts
    ks = iter(jax.random.split(key, 64))

    def rnd(shape, scale=0.02):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dtype)

    def attn_stack(L):
        d = {
            "attn_norm": jnp.ones((L, H), dtype),
            "wkv_a": rnd((L, H, kvr + rdim)),
            "kv_a_norm": jnp.ones((L, kvr), dtype),
            "w_uk": rnd((L, Hh, nope, kvr)),
            "w_uv": rnd((L, Hh, kvr, vd)),
            "wo": rnd((L, Hh * vd, H)),
            "ffn_norm": jnp.ones((L, H), dtype),
        }
        if cfg.q_lora_rank > 0:
            d["wq_a"] = rnd((L, H, cfg.q_lora_rank))
            d["q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), dtype)
            d["wq_b"] = rnd((L, cfg.q_lora_rank, Hh * (nope + rdim)))
        else:
            d["wq"] = rnd((L, H, Hh * (nope + rdim)))
        return d

    Ld = cfg.first_k_dense
    Lm = cfg.num_layers - Ld
    dense = attn_stack(Ld) if Ld else {}
    if Ld:
        dense.update({
            "w_gate": rnd((Ld, H, cfg.intermediate_size)),
            "w_up": rnd((Ld, H, cfg.intermediate_size)),
            "w_down": rnd((Ld, cfg.intermediate_size, H)),
        })
    mi = cfg.moe_intermediate_size
    si = mi * cfg.n_shared_experts
    moe = attn_stack(Lm)
    moe.update({
        "router": rnd((Lm, H, E)),
        "router_bias": jnp.zeros((Lm, E), jnp.float32),
        "e_gate": rnd((Lm, E, H, mi)),
        "e_up": rnd((Lm, E, H, mi)),
        "e_down": rnd((Lm, E, mi, H)),
        "s_gate": rnd((Lm, H, si)),
        "s_up": rnd((Lm, H, si)),
        "s_down": rnd((Lm, si, H)),
    })
    params: Params = {
        "embed": rnd((V, H)),
        "dense_layers": dense,
        "moe_layers": moe,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rnd((H, V))
    return params


def _deinterleave_cols(w: np.ndarray) -> np.ndarray:
    """Rope-pair de-interleave on the LAST axis: [x0,x1,x2,x3,..] →
    [x0,x2,.. ∥ x1,x3,..] (bakes HF's apply_rotary_pos_emb_interleave
    reshuffle into the projection, so runtime rope uses the standard
    half-split pairing)."""
    return np.concatenate([w[..., 0::2], w[..., 1::2]], axis=-1)


def convert_hf_state_dict(cfg: ModelConfig, sd: Dict[str, Any],
                          dtype=None) -> Params:
    """transformers DeepseekV3 state dict → our two-stack pytree."""
    from llm_inference_tpu.utils.checkpoint import _np
    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = {(k[6:] if k.startswith("model.") else k): v for k, v in sd.items()}

    def get(name):
        a = _np(sd[name])
        return a if a.dtype == np.float16 else a.astype(np.float32)

    Hh, nope, rdim = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    kvr, vd = cfg.kv_lora_rank, cfg.v_head_dim
    qk = nope + rdim
    Ld = cfg.first_k_dense

    def attn_entries(i, acc):
        p = f"layers.{i}."
        acc.setdefault("attn_norm", []).append(
            get(p + "input_layernorm.weight"))
        if cfg.q_lora_rank > 0:
            acc.setdefault("wq_a", []).append(
                get(p + "self_attn.q_a_proj.weight").T)
            acc.setdefault("q_a_norm", []).append(
                get(p + "self_attn.q_a_layernorm.weight"))
            wqb = get(p + "self_attn.q_b_proj.weight").T  # [qr, Hh·qk]
        else:
            wqb = get(p + "self_attn.q_proj.weight").T    # [H, Hh·qk]
        wkva = get(p + "self_attn.kv_a_proj_with_mqa.weight").T
        if cfg.rope_interleave:
            # de-interleave the rope output columns once, per head
            w3 = wqb.reshape(wqb.shape[0], Hh, qk)
            w3 = np.concatenate(
                [w3[..., :nope], _deinterleave_cols(w3[..., nope:])], -1)
            wqb = w3.reshape(wqb.shape[0], Hh * qk)
            wkva = np.concatenate(
                [wkva[:, :kvr], _deinterleave_cols(wkva[:, kvr:])], -1)
        acc.setdefault("wq_b" if cfg.q_lora_rank > 0 else "wq",
                       []).append(wqb)
        acc.setdefault("wkv_a", []).append(wkva)
        acc.setdefault("kv_a_norm", []).append(
            get(p + "self_attn.kv_a_layernorm.weight"))
        # kv_b_proj [Hh·(nope+vd), kvr] → per-head W_uk [Hh, nope, kvr]
        # (k_nope[h] = W_uk[h] @ c) and W_uv [Hh, kvr, vd] (v = c·W_uv)
        wkvb = get(p + "self_attn.kv_b_proj.weight").reshape(
            Hh, nope + vd, kvr)
        acc.setdefault("w_uk", []).append(wkvb[:, :nope, :])
        acc.setdefault("w_uv", []).append(
            wkvb[:, nope:, :].transpose(0, 2, 1))
        acc.setdefault("wo", []).append(get(p + "self_attn.o_proj.weight").T)
        acc.setdefault("ffn_norm", []).append(
            get(p + "post_attention_layernorm.weight"))

    dense_acc: Dict[str, list] = {}
    for i in range(Ld):
        p = f"layers.{i}."
        attn_entries(i, dense_acc)
        dense_acc.setdefault("w_gate", []).append(
            get(p + "mlp.gate_proj.weight").T)
        dense_acc.setdefault("w_up", []).append(
            get(p + "mlp.up_proj.weight").T)
        dense_acc.setdefault("w_down", []).append(
            get(p + "mlp.down_proj.weight").T)

    moe_acc: Dict[str, list] = {}
    for i in range(Ld, cfg.num_layers):
        p = f"layers.{i}."
        attn_entries(i, moe_acc)
        moe_acc.setdefault("router", []).append(get(p + "mlp.gate.weight").T)
        moe_acc.setdefault("router_bias", []).append(
            get(p + "mlp.gate.e_score_correction_bias"))
        moe_acc.setdefault("e_gate", []).append(np.stack(
            [get(p + f"mlp.experts.{e}.gate_proj.weight").T
             for e in range(cfg.num_experts)]))
        moe_acc.setdefault("e_up", []).append(np.stack(
            [get(p + f"mlp.experts.{e}.up_proj.weight").T
             for e in range(cfg.num_experts)]))
        moe_acc.setdefault("e_down", []).append(np.stack(
            [get(p + f"mlp.experts.{e}.down_proj.weight").T
             for e in range(cfg.num_experts)]))
        moe_acc.setdefault("s_gate", []).append(
            get(p + "mlp.shared_experts.gate_proj.weight").T)
        moe_acc.setdefault("s_up", []).append(
            get(p + "mlp.shared_experts.up_proj.weight").T)
        moe_acc.setdefault("s_down", []).append(
            get(p + "mlp.shared_experts.down_proj.weight").T)

    def fin(acc, f32_keys=("router", "router_bias")):
        return {k: jnp.asarray(np.stack(v),
                               jnp.float32 if k in f32_keys else dtype)
                for k, v in acc.items()}

    params: Params = {
        "embed": jnp.asarray(get("embed_tokens.weight"), dtype),
        "dense_layers": fin(dense_acc) if Ld else {},
        "moe_layers": fin(moe_acc),
        "final_norm": jnp.asarray(get("norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            np.ascontiguousarray(get("lm_head.weight").T), dtype)
    return params


# 2-D matmul weights per stack (quantizable; norms/router/absorb tensors
# stay dense — w_uk/w_uv are per-head 3-D einsum operands and the router
# is an accuracy-critical sliver)
_QUANT_KEYS = ("wq", "wq_a", "wq_b", "wkv_a", "wo",
               "w_gate", "w_up", "w_down", "s_gate", "s_up", "s_down")
_EXPERT_KEYS = ("e_gate", "e_up", "e_down")


def quantize_params(params: Params, qcfg, ep_shards: int = 1,
                    **kw) -> Params:
    """INT8/INT4 weight-only quantization over the two-stack MLA layout:
    per-stack [Lx, K, N] weights become stacked QTensors (kernel-indexed
    by the stack-relative layer), expert stacks flatten to [Lm·E, K, N]
    indexed w_idx·E_local + e — the mixtral convention. ep_shards > 1
    lays the expert stacks out EXPERT-BLOCK-MAJOR (shard, layer, local
    expert) so an axis-0 PartitionSpec chunks them into shard-local
    kernel-indexable stacks."""
    from llm_inference_tpu.ops.quantization import quantize
    if not getattr(qcfg, "enabled", False):
        return params
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    asym = getattr(qcfg, "asymmetric", False)

    def qstack(w):                          # [Lx, K, N]
        return jax.vmap(lambda m: quantize(m, bits, qcfg.group_size,
                                           asymmetric=asym))(w)

    out = dict(params)
    for sk in ("dense_layers", "moe_layers"):
        stack = dict(params[sk])
        for name in _QUANT_KEYS:
            if name in stack:
                stack[name] = qstack(stack[name])
        for name in _EXPERT_KEYS:
            if name in stack:
                w = stack[name]             # [Lm, E, K, N]
                Lm, E, K, N = w.shape
                if ep_shards > 1:
                    if E % ep_shards:
                        raise ValueError(f"num_experts={E} not divisible "
                                         f"by ep_shards={ep_shards}")
                    El = E // ep_shards
                    w = (w.reshape(Lm, ep_shards, El, K, N)
                          .transpose(1, 0, 2, 3, 4))
                stack[name] = qstack(w.reshape(Lm * E, K, N))
        out[sk] = stack
    return out


def prepare_params(params: Params, tp_size: int = 1, *, donate: bool = True,
                   **_ignored) -> Params:
    """Re-lay every QTensor into the column-blocked streaming layout
    (quantization.to_blocked) for the Pallas decode GEMV — the deepseek
    analogue of llama.prepare_params (no qkv fusion here; the projections
    are already the checkpoint's fused forms)."""
    from llm_inference_tpu.ops.quantization import (QTensor, choose_block_n,
                                                    to_blocked)

    def _transform(p):
        out = dict(p)
        for sk in ("dense_layers", "moe_layers"):
            stack = dict(p[sk])
            for name, w in stack.items():
                if not isinstance(w, QTensor) or w.block_n:
                    continue
                budget = (3 << 20) if w.bits == 8 else (3 << 20) // 2
                bn = choose_block_n(w.q.shape[-2], w.q.shape[-1], budget)
                if bn:
                    stack[name] = to_blocked(w, bn)
            out[sk] = stack
        return out

    if donate:
        # lifetime-only donation (see llama.prepare_params): re-layouts
        # change shapes, so the "donated buffers were not usable" warning
        # is expected here — silence it locally
        import warnings
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message="Some donated buffers were not usable")
            return jax.jit(_transform, donate_argnums=0)(params)
    return _transform(params)


# register with the factory
from llm_inference_tpu.models import registry as _registry  # noqa: E402
import sys as _sys  # noqa: E402
_registry.register_model("deepseek", _sys.modules[__name__])
_registry.register_model("tiny-deepseek", _sys.modules[__name__])
