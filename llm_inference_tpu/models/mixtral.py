"""Mixtral (sparse mixture-of-experts) decoder as a pure JAX function.

Third model family; adds the MoE dimension the reference never had
(LLaMA-only, src/models/llama/*) and completes the parallelism inventory:
expert parallelism (see expert_axis below) joins dp/tp/pp/sp.

Architecture = llama attention (GQA + RoPE) with the FFN replaced by a
top-k routed expert mixture (HF MixtralSparseMoeBlock semantics, matched
exactly):
    probs  = softmax(router(x))             # over ALL experts
    top-k  = highest-k probs, renormalized to sum 1
    y      = Σ_{e ∈ top-k} w_e · SwiGLU_e(x)

TPU-first evaluation: DENSE-MASKED compute — every expert runs on every
token and the router mask zeroes the non-selected terms. At serving batch
sizes this is the right trade: with B·T tokens ≪ E·capacity there is no
MXU-friendly way to pack ragged per-expert token groups, while dense
compute keeps every matmul static-shaped (XLA-tileable) and makes expert
parallelism trivially correct: shard the EXPERT axis of the stacked
weights [L, E, ...] over a mesh axis, let each shard compute its local
experts' masked contributions, and psum — one collective per layer, no
all-to-all. (A capacity-based gather path is the known optimization for
prefill-heavy workloads; the shard-local structure here composes with it.)

Dense and paged caches; single device or expert-parallel via
`expert_axis` inside shard_map (specs: parallel/sharding.moe_param_pspecs).
Validated against transformers' MixtralForCausalLM
(tests/test_mixtral.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.ops import (activations, attention, kvcache, norms,
                                   paged_kvcache, rope)
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.ops.quantization import QTensor

Params = Dict[str, Any]


def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Params:
    """Random dummy weights (perf/testing path)."""
    assert cfg.num_experts > 0, "mixtral needs num_experts > 0"
    dtype = dtype or jnp.dtype(cfg.dtype)
    H, L, E = cfg.hidden_size, cfg.num_layers, cfg.num_experts
    I, V = cfg.intermediate_size, cfg.vocab_size
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 10)
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
        "router": rnd(ks[4], (L, H, E)),
        "e_gate": rnd(ks[5], (L, E, H, I)),
        "e_up": rnd(ks[6], (L, E, H, I)),
        "e_down": rnd(ks[7], (L, E, I, H)),
    }
    return {
        "embed": rnd(ks[8], (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": rnd(ks[9], (H, V)),
    }


def init_params_quantized(cfg: ModelConfig, key: jax.Array, qcfg,
                          dtype=None) -> Params:
    """Random quantized dummy weights built directly as QTensors — the
    perf path for 8x7B-class models (a dense bf16 init would need ~93 GB
    before quantization ever ran; cf. llama.init_params_quantized)."""
    if not qcfg.enabled:
        return init_params(cfg, key, dtype)
    dtype = dtype or jnp.dtype(cfg.dtype)
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    H, L, E = cfg.hidden_size, cfg.num_layers, cfg.num_experts
    I, V = cfg.intermediate_size, cfg.vocab_size
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = iter(jax.random.split(key, 16))
    qmax = 2 ** (bits - 1) - 1
    scale_val = 0.02 / qmax

    def qrnd(k, n_stack, K, N):
        rows = K // 2 if bits == 4 else K
        q = jax.random.randint(k, (n_stack, rows, N), -128, 128,
                               jnp.int32).astype(jnp.int8)
        gs = qcfg.group_size
        groups = K // gs if (0 < gs < K) else 1
        scale = jnp.full((n_stack, groups, N), scale_val, jnp.float32)
        return QTensor(q=q, scale=scale, bits=bits,
                       group_size=qcfg.group_size, orig_dtype=str(dtype),
                       block_rows=(K // 2 if bits == 4 else 0))

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02
                ).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "wq": qrnd(next(ks), L, H, Hq * D),
        "wk": qrnd(next(ks), L, H, Hkv * D),
        "wv": qrnd(next(ks), L, H, Hkv * D),
        "wo": qrnd(next(ks), L, Hq * D, H),
        "ffn_norm": jnp.ones((L, H), dtype),
        "router": rnd(next(ks), (L, H, E)),
        "e_gate": qrnd(next(ks), L * E, H, I),
        "e_up": qrnd(next(ks), L * E, H, I),
        "e_down": qrnd(next(ks), L * E, I, H),
    }
    return {
        "embed": rnd(next(ks), (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": rnd(next(ks), (H, V)),
    }


def moe_ffn(cfg: ModelConfig, x: jnp.ndarray, router_w, e_gate, e_up,
            e_down, expert_axis: Optional[str] = None,
            layer_idx=None) -> jnp.ndarray:
    """Top-k routed expert mixture over tokens x [B, T, H] (HF semantics:
    full softmax, select top-k, renormalize). Dense-masked: every local
    expert computes, router weights zero the unselected terms.

    Expert weights are either dense per-layer slices [E, K, N] (scan xs)
    or QUANTIZED whole-model stacks: QTensors flattened to [L·E, K', N]
    (quantize_params below), indexed inside the kernel at layer_idx·E + e —
    the stacked-operand/scalar-prefetch rule that keeps scanned custom
    calls copy-free (CLAUDE.md invariant) applied to a second stack axis.

    Under expert parallelism the caller passes shard-local expert slices
    and the EP axis name; the psum completes the mixture."""
    E, k = cfg.num_experts, cfg.experts_per_token
    quantized = isinstance(e_gate, QTensor)
    logits = jnp.einsum("bth,he->bte", x.astype(jnp.float32),
                        router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                   # [B, T, E]
    # exactly k experts, index-tie-broken like torch.topk (a >=kth-value
    # mask would select extras on ties)
    top_vals, top_idx = jax.lax.top_k(probs, k)
    sel = jnp.sum(jax.nn.one_hot(top_idx, E, dtype=probs.dtype)
                  * top_vals[..., None], axis=-2)             # [B, T, E]
    sel = sel / jnp.maximum(jnp.sum(sel, axis=-1, keepdims=True), 1e-9)
    # quantized stacks are [L·El, K', N] (axis 0 = stack count, El experts
    # per shard — quantize_params' ep_shards ordering); dense are [El, K, N]
    e_local = (e_gate.q.shape[0] // cfg.num_layers if quantized
               else e_gate.shape[0])
    if expert_axis is not None:
        # local slice of the expert axis: offset the weight columns
        off = jax.lax.axis_index(expert_axis) * e_local
        sel = jax.lax.dynamic_slice_in_dim(sel, off, e_local, axis=2)
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for e in range(e_local):                                  # static loop
        if quantized:
            idx = layer_idx * e_local + e
            act = activations.swiglu_split(
                matmul(x, e_gate, layer=idx), matmul(x, e_up, layer=idx))
            y = matmul(act, e_down, layer=idx).astype(jnp.float32)
        else:
            act = activations.swiglu_split(
                matmul(x, e_gate[e]), matmul(x, e_up[e]))
            y = matmul(act, e_down[e]).astype(jnp.float32)
        out = out + sel[..., e:e + 1] * y
    if expert_axis is not None:
        out = jax.lax.psum(out, expert_axis)
    return out.astype(x.dtype)


def quantize_params(params: Params, qcfg, row_shards: int = 1,
                    ep_shards: int = 1) -> Params:
    """Quantize attention weights (stacked [L, K, N]) AND expert weights
    (flattened to [L·E, K, N] so the layer-indexed quant-matmul kernels
    serve them with index layer·e_local + e). The router stays dense (it
    is a [H, E] sliver and accuracy-critical).

    ep_shards > 1 lays the expert stack out EXPERT-BLOCK-MAJOR —
    (shard, layer, local expert) — so a plain axis-0
    PartitionSpec("expert") chunks it into shard-local [L·El] stacks
    (every layer's local experts, in kernel index order layer·El + e).
    Per-expert quantized values are identical either way (quantize is
    per-matrix); only the stack ORDER changes, so an ep_shards stack is
    only valid under a matching expert-parallel mesh."""
    from llm_inference_tpu.ops.quantization import quantize
    if not qcfg.enabled:
        return params
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    asym = getattr(qcfg, "asymmetric", False)
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo"):
        # row_shards aligns wo's INT4 pack blocks to TP shard boundaries
        # (same contract as llama.quantize_params; under pure EP the
        # attention weights replicate and row_shards stays 1)
        blocks = row_shards if name == "wo" else 1
        layers[name] = jax.vmap(
            lambda m, _b=blocks: quantize(m, bits, qcfg.group_size,
                                          pack_blocks=_b,
                                          asymmetric=asym))(layers[name])
    for name in ("e_gate", "e_up", "e_down"):
        w = layers[name]                       # [L, E, K, N]
        L_, E_, K, N = w.shape
        if ep_shards > 1:
            if E_ % ep_shards:
                raise ValueError(f"num_experts={E_} not divisible by "
                                 f"ep_shards={ep_shards}")
            El = E_ // ep_shards
            w = (w.reshape(L_, ep_shards, El, K, N)
                  .transpose(1, 0, 2, 3, 4))   # [ep, L, El, K, N]
        layers[name] = jax.vmap(
            lambda m: quantize(m, bits, qcfg.group_size,
                               asymmetric=asym))(
                w.reshape(L_ * E_, K, N))
    out["layers"] = layers
    return out


def _layer(cfg: ModelConfig, h, lp, qw, cache, layer_idx, positions,
           write_offsets, mask, cos, sin, expert_axis,
           paged_history: bool = False):
    B, T, H = h.shape
    D = cfg.head_dim
    eps = cfg.rms_norm_eps

    def mm(name, x):
        if name in qw:
            return matmul(x, qw[name], layer=layer_idx)
        return matmul(x, lp[name])

    normed = norms.rms_norm(h, lp["attn_norm"], eps)
    q = mm("wq", normed).reshape(B, T, -1, D)
    k = mm("wk", normed).reshape(B, T, -1, D)
    v = mm("wv", normed).reshape(B, T, -1, D)
    q = rope.apply_rope(q, positions, cos, sin)
    k = rope.apply_rope(k, positions, cos, sin)

    from llm_inference_tpu.models.llama import cached_attention
    attn, cache = cached_attention(cfg, q, k, v, cache, layer_idx,
                                   positions, write_offsets, mask,
                                   paged_history)
    attn_out = mm("wo", attn.reshape(B, T, -1))
    # head-sharded attention over the expert axis (sharding.moe_attn_
    # shards): wo is row-sharded so its partials complete with a psum —
    # shape-driven off the LOCAL wq column count, so quantized (replicated)
    # attention stays psum-free
    wq_cols = (qw["wq"].out_features if "wq" in qw else lp["wq"].shape[-1])
    if expert_axis is not None and wq_cols != cfg.num_heads * D:
        attn_out = jax.lax.psum(attn_out, expert_axis)
    h = h + attn_out

    normed = norms.rms_norm(h, lp["ffn_norm"], eps)
    eg = qw.get("e_gate", lp.get("e_gate"))
    eu = qw.get("e_up", lp.get("e_up"))
    ed = qw.get("e_down", lp.get("e_down"))
    h = h + moe_ffn(cfg, normed, lp["router"], eg, eu, ed, expert_axis,
                    layer_idx=layer_idx)
    return h, cache


def forward(
    cfg: ModelConfig,
    params: Params,
    ids: jnp.ndarray,
    positions: jnp.ndarray,
    cache: kvcache.KVCache,
    *,
    logits_mode: str = "last",
    last_idx: Optional[jnp.ndarray] = None,
    tp_axis: Optional[str] = None,       # reused as the EXPERT axis here
    paged_history: bool = False,
) -> Tuple[Optional[jnp.ndarray], kvcache.KVCache]:
    """Same contract as models/llama.forward. `tp_axis` names the EXPERT-
    parallel mesh axis when running inside shard_map (attention and
    non-expert weights replicated; expert weights sharded on E)."""
    expert_axis = tp_axis
    B, T = ids.shape
    paged = isinstance(cache, paged_kvcache.PagedKVCache)
    S = (cache.max_blocks * cache.page_size if paged
         else cache.max_seq_len)
    dtype = jnp.dtype(cfg.dtype)

    h = params["embed"][ids].astype(dtype)
    write_offsets = positions[:, 0]
    # llama's mask convention: paged prefill attends the FRESH tokens only
    # (history attendance goes through cached_attention's gather branches)
    mask = attention.make_attention_mask(positions, T if paged else S,
                                         cfg.sliding_window)
    cos, sin = rope.make_rope_table(
        min(cfg.max_position_embeddings, S), cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling)

    qw = {k: v for k, v in params["layers"].items() if isinstance(v, QTensor)}
    xs = {k: v for k, v in params["layers"].items()
          if not isinstance(v, QTensor)}

    def body(carry, lp):
        h, cache, idx = carry
        h, cache = _layer(cfg, h, lp, qw, cache, idx, positions,
                          write_offsets, mask, cos, sin, expert_axis,
                          paged_history=paged_history)
        return (h, cache, idx + 1), None

    (h, new_cache, _), _ = jax.lax.scan(body, (h, cache, jnp.int32(0)), xs)

    if logits_mode == "none":
        return None, new_cache
    h = norms.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if logits_mode == "hidden":
        return h.astype(jnp.float32), new_cache
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
    return logits, new_cache


# register with the factory
from llm_inference_tpu.models import registry as _registry  # noqa: E402
import sys as _sys  # noqa: E402
_registry.register_model("mixtral", _sys.modules[__name__])
