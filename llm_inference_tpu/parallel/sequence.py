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
  traffic a ring-attention schedule would move, without needing partial-
  softmax accumulator plumbing in the kernel. (The flash kernel is already
  blockwise, so a ring schedule remains a drop-in future optimization for
  T beyond HBM; at serving lengths the gathered KV is tiny next to
  weights.)
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


def _sp_layer(cfg, h, lp, qw, cache, layer_idx, positions_local,
              global_start, mask_local, cos, sin, seq_axis, tp_axis):
    """One decoder layer over a LOCAL query chunk with sequence-gathered
    KV. Mirrors models/llama._layer's dense path; the difference is the
    all-gather between the qkv projection and the cache write."""
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
    q = rope.apply_rope(q, positions_local, cos, sin)
    k = rope.apply_rope(k, positions_local, cos, sin)

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
            sliding_window=cfg.sliding_window)
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
                              cache_quantized: bool = False):
    """Build the sequence-parallel prefill:
        f(params, ids, positions, cache, last_idx) -> (logits, cache)

    ids/positions are [B, T] with T sharded over `seq_axis` (T divisible by
    its size); the cache is replicated over `seq_axis` (every shard ends up
    with the identical full cache) and kv-head-sharded over `tensor_axis`.
    Returns last-token logits [B, V], replicated.
    """
    sp_size = mesh.shape[seq_axis]
    tp_size = mesh.shape[tensor_axis]
    sharding.validate_tp(cfg, tp_size)
    tp_axis = tensor_axis if tp_size > 1 else None

    pspecs = sharding.param_pspecs(params, mesh, tensor_axis)
    cspec = sharding.cache_pspec(None, tensor_axis,
                                 quantized=cache_quantized)

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
            cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
            cfg.rope_scaling)

        qw = {k: v for k, v in params["layers"].items()
              if isinstance(v, QTensor)}
        xs = {k: v for k, v in params["layers"].items()
              if not isinstance(v, QTensor)}

        def body(carry, lp):
            h, cache, idx = carry
            h, cache = _sp_layer(cfg, h, lp, qw, cache, idx, positions,
                                 global_start, mask_local, cos, sin,
                                 seq_axis, tp_axis)
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
