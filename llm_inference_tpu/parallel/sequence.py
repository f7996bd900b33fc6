"""Sequence (context) parallelism for long-prompt prefill.

The reference caps sequence length at a constructor arg and has no length
scaling story at all (SURVEY §5 "Long-context": max_seq_len=64 in the
factory, reference: src/utils/model_utils.h:24; `use_dynamic_ntk` plumbed
but never read, src/models/llama/llama_params.h:7). This module is the
TPU-native long-context complement to chunked prefill (engine/engine.py):
it parallelizes ONE long prompt's prefill compute across chips, cutting
TTFT by ~N — prefill is MXU-bound, so splitting the query tokens splits
the FLOPs.

Scheme (all-gather sequence parallelism, Ulysses-style but simpler because
serving prefill wants the full KV cache materialized anyway):

- The prompt's TIME axis shards over the mesh's data axis (idle during a
  single-request prefill): shard j holds the contiguous token chunk
  [j·T/N, (j+1)·T/N).
- Per layer, each shard projects q/k/v for its chunk, ALL-GATHERS k/v over
  the sequence axis (tiled → global order restored), writes the full-length
  K/V into its replica of the cache, and runs flash attention for its local
  queries only — the causal mask trims to positions ≤ the chunk's own, so
  attention FLOPs also split ~N ways (triangle-balanced enough at serving
  chunk counts).
- The all-gather moves 2·T·Hkv·D bytes per layer over ICI — the same
  traffic the ring schedule moves, without partial-softmax bookkeeping; at
  serving lengths the gathered KV is tiny next to weights. For contexts
  whose full KV no longer fits a chip's spare HBM, `ring=True` swaps in
  blockwise RING ATTENTION (_ring_attention): chunks rotate shard-to-shard
  with ppermute while each shard folds them into an online-softmax
  accumulator — peak transient is ONE chunk, O(T/N).
- The produced cache is REPLICATED across the sequence axis and bitwise
  identical to a single-device prefill's — decode proceeds on any replica
  (or re-sharded by batch for continuous batching).

Composes with tensor parallelism (tp_axis collectives inside, same rules
as models/llama.forward). Dense KV cache; B is typically 1 (one long
prompt) but any B replicates fine.

No reference analogue; validated against the single-device forward in
tests/test_sequence_parallel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import (activations, attention, kvcache,
                                   norms, rope)
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.ops.pallas import flash_attention as pallas_flash
from llm_inference_tpu.ops.quantization import QTensor
from llm_inference_tpu.parallel import sharding


def _ring_attention(q, k_loc, v_loc, pos_local, global_start, T_loc,
                    cache, layer_idx, seq_axis, sp_size, scale,
                    logit_softcap, sliding_window: int = 0):
    """Blockwise ring attention over the sequence shards.

    Each shard keeps only its LOCAL K/V chunk resident; chunks rotate
    around the ring with `ppermute` while every shard (a) folds each
    visiting chunk into an online-softmax accumulator (running max m,
    normalizer l, weighted sum acc) for its local queries and (b) writes
    the chunk into its cache replica at the chunk's global offset. Peak
    transient memory per shard is ONE chunk — O(T/N) — vs the all-gather
    schedule's O(T); total ICI traffic is the same ring of 2·T·Hkv·D
    bytes. f32 math throughout (attention.attend's fp32-softmax numerics).

    Returns ([B, T_loc, Hq, D], cache).
    """
    B, T_q, Hq, D = q.shape
    Hkv = k_loc.shape[2]
    G = Hq // Hkv
    me = lax.axis_index(seq_axis)
    q5 = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T_q, D)

    m = jnp.full((B, Hkv, G, T_q), -1e30, jnp.float32)
    l = jnp.zeros((B, Hkv, G, T_q), jnp.float32)
    acc = jnp.zeros((B, Hkv, G, T_q, D), jnp.float32)
    kc, vc = k_loc, v_loc                        # [B, Tc, Hkv, D]
    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]

    for j in range(sp_size):                     # static ring schedule
        src = (me - j) % sp_size                 # chunk's home shard
        c_start = global_start + src * T_loc     # [B]
        cache = kvcache.update_cache_layer(cache, layer_idx, kc, vc,
                                           c_start)
        c_pos = (c_start[:, None]
                 + jnp.arange(kc.shape[1], dtype=jnp.int32)[None])  # [B, Tc]
        s = jnp.einsum("bhgtd,bshd->bhgts", q5, kc.astype(q5.dtype),
                       preferred_element_type=jnp.float32)
        s = s.astype(jnp.float32) * scale
        if logit_softcap > 0.0:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        causal = (c_pos[:, None, :] <= pos_local[:, :, None])  # [B, Tq, Tc]
        if sliding_window > 0:
            causal &= (c_pos[:, None, :]
                       > pos_local[:, :, None] - sliding_window)
        s = jnp.where(causal[:, None, None, :, :], s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * corr + jnp.sum(p, axis=-1)
        acc = (acc * corr[..., None]
               + jnp.einsum("bhgts,bshd->bhgtd", p, vc.astype(jnp.float32),
                            preferred_element_type=jnp.float32))
        m = m_new
        if j < sp_size - 1:
            kc = lax.ppermute(kc, seq_axis, perm)
            vc = lax.ppermute(vc, seq_axis, perm)

    out = acc / l[..., None]
    return (out.reshape(B, Hq, T_q, D).transpose(0, 2, 1, 3)
            .astype(q.dtype), cache)


def _sp_layer(cfg, h, lp, qw, cache, layer_idx, positions_local,
              global_start, mask_local, cos, sin, seq_axis, tp_axis,
              ring: bool = False, sp_size: int = 1):
    """One decoder layer over a LOCAL query chunk with sequence-gathered
    KV. Mirrors models/llama._layer's dense path; the difference is the
    all-gather between the qkv projection and the cache write. With
    ring=True, attention instead runs the blockwise ring schedule
    (_ring_attention) and the cache collects chunks as they rotate past —
    no full-length K/V is ever materialized on one shard."""
    B, T_loc, H = h.shape
    D = cfg.head_dim
    eps = cfg.rms_norm_eps

    def mm(name, x, bias=None):
        if name in qw:
            return matmul(x, qw[name], bias=bias, layer=layer_idx)
        return matmul(x, lp[name], bias=bias)

    normed = norms.rms_norm(h, lp["attn_norm"], eps)
    if "wqkv" in qw or "wqkv" in lp:
        qkv = mm("wqkv", normed, bias=lp.get("bqkv"))
        n_local = qkv.shape[-1]
        nq = n_local * cfg.num_heads // (cfg.num_heads + 2 * cfg.num_kv_heads)
        nkv = (n_local - nq) // 2
        q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nkv], qkv[..., nq + nkv:])
    else:
        q = mm("wq", normed, bias=lp.get("bq"))
        k = mm("wk", normed, bias=lp.get("bk"))
        v = mm("wv", normed, bias=lp.get("bv"))
    q = q.reshape(B, T_loc, -1, D)
    k = k.reshape(B, T_loc, -1, D)
    v = v.reshape(B, T_loc, -1, D)
    if cfg.qk_norm:
        # qwen3: per-head RMSNorm before RoPE (mirrors llama._layer)
        q = norms.rms_norm(q, lp["q_norm"], eps)
        k = norms.rms_norm(k, lp["k_norm"], eps)
    q = rope.apply_rope(q, positions_local, cos, sin)
    k = rope.apply_rope(k, positions_local, cos, sin)

    if ring:
        attn, cache = _ring_attention(
            q, k, v, positions_local, global_start, T_loc, cache,
            layer_idx, seq_axis, sp_size, 1.0 / (D ** 0.5),
            cfg.attn_logit_softcap, cfg.sliding_window)
        attn = mm("wo", attn.reshape(B, T_loc, -1))
        h = h + llama._psum(attn, tp_axis)
        normed = norms.rms_norm(h, lp["ffn_norm"], eps)
        if "w_gateup" in qw or "w_gateup" in lp:
            gate, up = jnp.split(mm("w_gateup", normed), 2, axis=-1)
            act = activations.swiglu_split(gate, up)
        else:
            act = activations.swiglu_split(mm("w_gate", normed),
                                           mm("w_up", normed))
        h = h + llama._psum(mm("w_down", act), tp_axis)
        return h, cache

    # restore the full sequence in global order (chunks are contiguous)
    k_full = lax.all_gather(k, seq_axis, axis=1, tiled=True)  # [B, T, Hkv, D]
    v_full = lax.all_gather(v, seq_axis, axis=1, tiled=True)

    cache = kvcache.update_cache_layer(cache, layer_idx, k_full, v_full,
                                       global_start)
    S = cache.max_seq_len
    if pallas_flash.supports(q.shape, S, cache.quantized):
        attn = pallas_flash.flash_attention(
            q, cache.k, cache.v, layer_idx, positions_local,
            logit_softcap=cfg.attn_logit_softcap,
            sliding_window=cfg.sliding_window,
            k_scale=cache.k_scale, v_scale=cache.v_scale)
    else:
        def at_layer(x):
            return (None if x is None else
                    lax.dynamic_index_in_dim(x, layer_idx, 0,
                                             keepdims=False))
        attn = attention.attend(q, at_layer(cache.k), at_layer(cache.v),
                                mask_local,
                                logit_softcap=cfg.attn_logit_softcap,
                                k_scale=at_layer(cache.k_scale),
                                v_scale=at_layer(cache.v_scale))
    attn = mm("wo", attn.reshape(B, T_loc, -1))
    h = h + llama._psum(attn, tp_axis)

    normed = norms.rms_norm(h, lp["ffn_norm"], eps)
    if "w_gateup" in qw or "w_gateup" in lp:
        gate, up = jnp.split(mm("w_gateup", normed), 2, axis=-1)
        act = activations.swiglu_split(gate, up)
    else:
        act = activations.swiglu_split(mm("w_gate", normed),
                                             mm("w_up", normed))
    h = h + llama._psum(mm("w_down", act), tp_axis)
    return h, cache


def sequence_parallel_prefill(cfg: ModelConfig, mesh: Mesh, params,
                              *, seq_axis: str = "data",
                              tensor_axis: str = "tensor",
                              donate_cache: bool = True, jit: bool = True,
                              cache_bits: int = 16,
                              ring: bool = False):
    """Build the sequence-parallel prefill:
        f(params, ids, positions, cache, last_idx) -> (logits, cache)

    ids/positions are [B, T] with T sharded over `seq_axis` (T divisible by
    its size); the cache is replicated over `seq_axis` (every shard ends up
    with the identical full cache) and kv-head-sharded over `tensor_axis`.
    Returns last-token logits [B, V], replicated.

    ring=True swaps the per-layer KV all-gather for the blockwise ring
    schedule (_ring_attention): same result and ICI traffic, but the peak
    per-shard transient is one chunk instead of the full sequence — the
    schedule for contexts whose KV no longer fits one chip's spare HBM.
    """
    sp_size = mesh.shape[seq_axis]
    tp_size = mesh.shape[tensor_axis]
    sharding.validate_tp(cfg, tp_size)
    tp_axis = tensor_axis if tp_size > 1 else None

    pspecs = sharding.param_pspecs(params, mesh, tensor_axis)
    cspec = sharding.cache_pspec(None, tensor_axis, bits=cache_bits)

    def fn(params, ids, positions, cache, last_idx):
        B, T_loc = ids.shape          # local chunk
        shard = lax.axis_index(seq_axis)
        S = cache.max_seq_len
        dtype = llama._act_dtype(cfg)

        h = llama._sharded_embedding_lookup(
            params["embed"], ids, tp_axis).astype(dtype)
        mask_local = attention.make_attention_mask(positions, S,
                                                   cfg.sliding_window)
        # every shard writes the SAME gathered [B, T] block: offsets are the
        # global prompt start = shard 0's first position, broadcast around
        global_start = lax.psum(
            jnp.where(shard == 0, positions[:, 0], 0), seq_axis)
        cos, sin = rope.make_rope_table(
            min(cfg.max_position_embeddings, S), cfg.head_dim,
            cfg.rope_theta, cfg.rope_scaling)

        qw = {k: v for k, v in params["layers"].items()
              if isinstance(v, QTensor)}
        xs = {k: v for k, v in params["layers"].items()
              if not isinstance(v, QTensor)}

        def body(carry, lp):
            h, cache, idx = carry
            h, cache = _sp_layer(cfg, h, lp, qw, cache, idx, positions,
                                 global_start, mask_local, cos, sin,
                                 seq_axis, tp_axis, ring=ring,
                                 sp_size=sp_size)
            return (h, cache, idx + 1), None

        (h, cache, _), _ = lax.scan(body, (h, cache, jnp.int32(0)), xs)

        h = norms.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
        # the shard owning the last token broadcasts its hidden state
        if last_idx is None:
            last_idx = jnp.full((B,), sp_size * T_loc - 1, jnp.int32)
        owner = last_idx // T_loc
        li_loc = jnp.clip(last_idx - owner * T_loc, 0, T_loc - 1)
        h_last = h[jnp.arange(B), li_loc]                    # [B, H]
        h_last = lax.psum(
            jnp.where((owner == shard)[:, None], h_last, 0), seq_axis)

        lm_head = params.get("lm_head")
        if lm_head is None:
            logits = jnp.dot(h_last.astype(jnp.float32),
                             params["embed"].T.astype(jnp.float32))
        else:
            logits = matmul(h_last, lm_head).astype(jnp.float32)
        if tp_axis:
            logits = lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
        if logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]
        if cfg.final_logit_softcap > 0.0:
            logits = (jnp.tanh(logits / cfg.final_logit_softcap)
                      * cfg.final_logit_softcap)
        return logits, cache

    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P(None, seq_axis), P(None, seq_axis), cspec,
                  P()),
        out_specs=(P(), cspec),
        check_vma=False,
    )
    if not jit:
        return mapped
    donate = (3,) if donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)
