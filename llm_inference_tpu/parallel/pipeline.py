"""Pipeline parallelism: decoder layers sharded over a "pipe" mesh axis.

The reference is strictly single-GPU (SURVEY §2.12 — no distributed code
anywhere under src/); pipelining is new, TPU-first functionality required by
the BASELINE.md 70B rows, where one model no longer fits a TP group.

Design (GPipe-style microbatch schedule, expressed the SPMD way):

- The stacked per-layer params [L, ...] and the stacked KV cache
  [L, B, ...] shard their leading LAYER axis over the "pipe" mesh axis
  (sharding.param_pspecs / cache_pspec with pipe_axis set) — each stage
  holds L/P contiguous layers and ONLY its own layers' cache: total HBM per
  chip shrinks with P, which is the point of PP.
- The local batch splits into M microbatches. One forward = M + P - 1
  "ticks" under `lax.scan`. At tick t, stage s runs its local layer scan on
  microbatch (t - s) and hands the activations to stage s+1 with a single
  `ppermute` — the only inter-stage traffic, [mb, T, H] per tick, riding
  ICI. Stage 0 injects embedded microbatches; the last stage collects
  final-layer activations. Bubble fraction is the usual (P-1)/(M+P-1).
- SPMD means every stage traces the SAME program, so the microbatch a
  stage works on is a traced function of `lax.axis_index("pipe")`: the
  per-tick cache rows are addressed with dynamic slices. Ticks outside a
  stage's valid range compute garbage that is (a) masked out of the cache
  write-back with a scalar `where` and (b) naturally overwritten /
  discarded in the output buffer.

Cost note: the per-tick dynamic slice + write-back of the microbatch's
cache rows is an HBM round trip the single-stage path does not pay (its
layer scan aliases the whole cache as carry). Zero-copy stage-local
addressing needs batch-offset support inside the attention kernels — a
planned follow-up; this module is the correctness + topology layer.

Composes with tensor parallelism (same `tp_axis` collectives inside
`_layer`) and data parallelism (batch axis) on a (data, pipe, tensor) mesh.

No reference analogue (new capability); validated against the single-device
forward in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache, norms, rope, attention
from llm_inference_tpu.ops.linear import matmul
from llm_inference_tpu.ops.quantization import QTensor
from llm_inference_tpu.parallel import sharding


def validate_pp(cfg: ModelConfig, pp_size: int, batch: int,
                microbatches: int) -> None:
    if cfg.num_layers % pp_size:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by "
                         f"pipe={pp_size}")
    if batch % microbatches:
        raise ValueError(f"batch={batch} not divisible by "
                         f"microbatches={microbatches}")


def _slice_rows(tree, start, size, axis):
    return jax.tree.map(
        lambda a: lax.dynamic_slice_in_dim(a, start, size, axis), tree)


def pipelined_forward(cfg: ModelConfig, mesh: Mesh, params,
                      *, microbatches: int,
                      logits_mode: str = "last",
                      data_axis: str = "data", pipe_axis: str = "pipe",
                      tensor_axis: str = "tensor",
                      donate_cache: bool = True, jit: bool = True,
                      cache_bits: int = 16):
    """Build the pipelined forward:
        f(params, ids, positions, cache, last_idx) -> (logits, cache)

    Same signature/semantics as sharding.sharded_forward, with layers
    additionally sharded over `pipe_axis` and the batch processed in
    `microbatches` pipeline microbatches. Dense KV cache only.
    logits_mode: "last" | "none".
    """
    if logits_mode not in ("last", "none"):
        raise NotImplementedError("pipelined_forward: logits_mode=last|none")
    pp_size = mesh.shape[pipe_axis]
    tp_size = mesh.shape[tensor_axis]
    sharding.validate_tp(cfg, tp_size)
    tp_axis = tensor_axis if tp_size > 1 else None
    M = microbatches

    pspecs = sharding.param_pspecs(params, mesh, tensor_axis,
                                   pipe_axis=pipe_axis)
    cspec = sharding.cache_pspec(data_axis, tensor_axis,
                                 bits=cache_bits,
                                 pipe_axis=pipe_axis)
    dspec = P(data_axis)

    def fn(params, ids, positions, cache, last_idx):
        B, T = ids.shape            # local (per-data-shard) batch
        validate_pp(cfg, pp_size, B, M)
        mb = B // M
        stage = lax.axis_index(pipe_axis)
        S = cache.max_seq_len
        dtype = llama._act_dtype(cfg)

        h_embed = llama._sharded_embedding_lookup(
            params["embed"], ids, tp_axis).astype(dtype)
        mask = attention.make_attention_mask(positions, S,
                                             cfg.sliding_window)
        write_offsets = positions[:, 0]
        cos, sin = rope.make_rope_table(
            min(cfg.max_position_embeddings, S), cfg.head_dim,
            cfg.rope_theta, cfg.rope_scaling)
        if last_idx is None:
            last_idx = jnp.full((B,), T - 1, jnp.int32)

        qw = {k: v for k, v in params["layers"].items()
              if isinstance(v, QTensor)}
        xs = {k: v for k, v in params["layers"].items()
              if not isinstance(v, QTensor)}

        def run_stage_layers(h, cache_mb, pos_mb, woff_mb, mask_mb):
            def body(carry, lp):
                h2, c2, idx = carry
                h2, c2 = llama._layer(cfg, h2, lp, qw, c2, idx, pos_mb,
                                      woff_mb, mask_mb, cos, sin, tp_axis)
                return (h2, c2, idx + 1), None
            (h, cache_mb, _), _ = lax.scan(
                body, (h, cache_mb, jnp.int32(0)), xs)
            return h, cache_mb

        def tick(carry, t):
            h_prev, cache, out = carry
            # stage 0 injects microbatch t (garbage past M — never collected)
            m_in = jnp.clip(t, 0, M - 1)
            h_inj = lax.dynamic_slice_in_dim(h_embed, m_in * mb, mb, 0)
            h_cur = jnp.where(stage == 0, h_inj, h_prev)
            # this stage's microbatch at this tick
            m = t - stage
            valid = (m >= 0) & (m < M)
            cm = jnp.clip(m, 0, M - 1)
            row = cm * mb
            pos_mb = lax.dynamic_slice_in_dim(positions, row, mb, 0)
            woff_mb = lax.dynamic_slice_in_dim(write_offsets, row, mb, 0)
            mask_mb = lax.dynamic_slice_in_dim(mask, row, mb, 0)
            cache_mb0 = _slice_rows(cache, row, mb, 1)
            h_out, cache_mb1 = run_stage_layers(h_cur, cache_mb0, pos_mb,
                                                woff_mb, mask_mb)
            # invalid ticks must not corrupt the clipped microbatch's rows
            cache_mb = jax.tree.map(lambda n, o: jnp.where(valid, n, o),
                                    cache_mb1, cache_mb0)
            cache = jax.tree.map(
                lambda a, u: lax.dynamic_update_slice_in_dim(a, u, row, 1),
                cache, cache_mb)
            # collect the stage's last-token activations; only the LAST
            # stage's buffer survives (psum-masked below). Early invalid
            # ticks land on clipped row 0 and are overwritten by the valid
            # tick for microbatch 0 (t = P-1 > any invalid tick).
            li_mb = lax.dynamic_slice_in_dim(last_idx, row, mb, 0)
            h_last = h_out[jnp.arange(mb), li_mb]              # [mb, H]
            out = lax.dynamic_update_slice_in_dim(out, h_last, row, 0)
            # hand activations to the next stage (ring; stage0 re-injects)
            h_next = lax.ppermute(
                h_out, pipe_axis,
                [(i, (i + 1) % pp_size) for i in range(pp_size)])
            return (h_next, cache, out), None

        h0 = jnp.zeros((mb, T, h_embed.shape[-1]), dtype)
        out0 = jnp.zeros((B, h_embed.shape[-1]), dtype)
        (_, cache, out), _ = lax.scan(
            tick, (h0, cache, out0),
            jnp.arange(M + pp_size - 1, dtype=jnp.int32))

        if logits_mode == "none":
            return None, cache

        # broadcast the last stage's collected activations to every stage
        out = lax.psum(jnp.where(stage == pp_size - 1, out, 0), pipe_axis)
        h = norms.rms_norm(out, params["final_norm"], cfg.rms_norm_eps)
        lm_head = params.get("lm_head")
        if lm_head is None:
            logits = jnp.dot(h.astype(jnp.float32),
                             params["embed"].T.astype(jnp.float32))
        else:
            logits = matmul(h, lm_head).astype(jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis,
                                        axis=logits.ndim - 1, tiled=True)
        if logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]
        if cfg.final_logit_softcap > 0.0:
            logits = (jnp.tanh(logits / cfg.final_logit_softcap)
                      * cfg.final_logit_softcap)
        return logits, cache

    logits_spec = None if logits_mode == "none" else P(data_axis, None)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P(data_axis, None), P(data_axis, None), cspec,
                  dspec),
        out_specs=(logits_spec, cspec),
        check_vma=False,
    )
    if not jit:
        return mapped
    donate = (3,) if donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)


def pipelined_prefill_seq(cfg: ModelConfig, mesh: Mesh, params,
                          *, chunks: int,
                          data_axis: str = "data", pipe_axis: str = "pipe",
                          tensor_axis: str = "tensor",
                          donate_cache: bool = True, jit: bool = True,
                          cache_bits: int = 16):
    """Pipeline-parallel prefill microbatched over the TIME axis:
        f(params, ids, positions, cache, last_idx) -> (logits, cache)

    The PP complement of chunked prefill for LONG PROMPTS at small batch
    (where batch microbatching has nothing to split): the prompt divides
    into `chunks` token chunks; stage s runs chunk c at tick c+s, so a
    stage always wrote chunk c-1's KV into its cache shard before chunk c
    attends to it — the causal dependency rides the pipeline order for
    free. Activations [B, T/chunks, H] hop stages via one ppermute per
    tick. Ticks outside a stage's valid range are masked out of the cache
    by restoring the written time window (a window-sized select, same cost
    class as the batch schedule's row slices).

    All rows must share the same start position (positions[:, 0] uniform —
    the chunk windows slice one absolute time range for the whole batch).
    Returns last-token logits [B, V]. Dense cache.
    """
    pp_size = mesh.shape[pipe_axis]
    tp_size = mesh.shape[tensor_axis]
    sharding.validate_tp(cfg, tp_size)
    tp_axis = tensor_axis if tp_size > 1 else None
    M = chunks

    pspecs = sharding.param_pspecs(params, mesh, tensor_axis,
                                   pipe_axis=pipe_axis)
    cspec = sharding.cache_pspec(data_axis, tensor_axis,
                                 bits=cache_bits,
                                 pipe_axis=pipe_axis)

    def fn(params, ids, positions, cache, last_idx):
        B, T = ids.shape
        if T % M:
            raise ValueError(f"T={T} not divisible by chunks={M}")
        Tc = T // M
        stage = lax.axis_index(pipe_axis)
        S = cache.max_seq_len
        dtype = llama._act_dtype(cfg)

        h_embed = llama._sharded_embedding_lookup(
            params["embed"], ids, tp_axis).astype(dtype)
        mask = attention.make_attention_mask(positions, S,
                                             cfg.sliding_window)
        start = positions[0, 0]              # uniform across rows
        cos, sin = rope.make_rope_table(
            min(cfg.max_position_embeddings, S), cfg.head_dim,
            cfg.rope_theta, cfg.rope_scaling)
        if last_idx is None:
            last_idx = jnp.full((B,), T - 1, jnp.int32)

        qw = {k: v for k, v in params["layers"].items()
              if isinstance(v, QTensor)}
        xs = {k: v for k, v in params["layers"].items()
              if not isinstance(v, QTensor)}

        def run_stage_layers(h, cache, pos_mb, woff_mb, mask_mb):
            def body(carry, lp):
                h2, c2, idx = carry
                h2, c2 = llama._layer(cfg, h2, lp, qw, c2, idx, pos_mb,
                                      woff_mb, mask_mb, cos, sin, tp_axis)
                return (h2, c2, idx + 1), None
            (h, cache, _), _ = lax.scan(body, (h, cache, jnp.int32(0)), xs)
            return h, cache

        def slice_window(cache, w0):
            return jax.tree.map(
                lambda a: lax.dynamic_slice_in_dim(a, w0, Tc, 3), cache)

        def tick(carry, t):
            h_prev, cache, out = carry
            m_in = jnp.clip(t, 0, M - 1)
            h_inj = lax.dynamic_slice_in_dim(h_embed, m_in * Tc, Tc, 1)
            h_cur = jnp.where(stage == 0, h_inj, h_prev)
            m = t - stage
            valid = (m >= 0) & (m < M)
            cm = jnp.clip(m, 0, M - 1)
            col = cm * Tc
            pos_mb = lax.dynamic_slice_in_dim(positions, col, Tc, 1)
            woff_mb = pos_mb[:, 0]
            mask_mb = lax.dynamic_slice_in_dim(mask, col, Tc, 2)
            w0 = start + col                 # absolute cache window start
            win_old = slice_window(cache, w0)
            h_out, cache = run_stage_layers(h_cur, cache, pos_mb, woff_mb,
                                            mask_mb)
            # invalid ticks: restore the time window they scribbled on
            win = jax.tree.map(
                lambda n, o: jnp.where(valid, n, o),
                slice_window(cache, w0), win_old)
            cache = jax.tree.map(
                lambda a, u: lax.dynamic_update_slice_in_dim(a, u, w0, 3),
                cache, win)
            # collect the last token's hidden state when its chunk passes
            # the LAST stage (psum-broadcast below)
            owner = last_idx // Tc                            # [B]
            li_loc = jnp.clip(last_idx - cm * Tc, 0, Tc - 1)
            h_last = h_out[jnp.arange(B), li_loc]             # [B, H]
            take = (owner == cm)[:, None] & valid
            out = jnp.where(take, h_last, out)
            h_next = lax.ppermute(
                h_out, pipe_axis,
                [(i, (i + 1) % pp_size) for i in range(pp_size)])
            return (h_next, cache, out), None

        h0 = jnp.zeros((B, Tc, h_embed.shape[-1]), dtype)
        out0 = jnp.zeros((B, h_embed.shape[-1]), dtype)
        (_, cache, out), _ = lax.scan(
            tick, (h0, cache, out0),
            jnp.arange(M + pp_size - 1, dtype=jnp.int32))

        out = lax.psum(jnp.where(stage == pp_size - 1, out, 0), pipe_axis)
        h = norms.rms_norm(out, params["final_norm"], cfg.rms_norm_eps)
        lm_head = params.get("lm_head")
        if lm_head is None:
            logits = jnp.dot(h.astype(jnp.float32),
                             params["embed"].T.astype(jnp.float32))
        else:
            logits = matmul(h, lm_head).astype(jnp.float32)
        if tp_axis:
            logits = jax.lax.all_gather(logits, tp_axis,
                                        axis=logits.ndim - 1, tiled=True)
        if logits.shape[-1] > cfg.vocab_size:
            logits = logits[..., :cfg.vocab_size]
        if cfg.final_logit_softcap > 0.0:
            logits = (jnp.tanh(logits / cfg.final_logit_softcap)
                      * cfg.final_logit_softcap)
        return logits, cache

    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P(data_axis, None), P(data_axis, None), cspec,
                  P(data_axis)),
        out_specs=(P(data_axis, None), cspec),
        check_vma=False,
    )
    if not jit:
        return mapped
    donate = (3,) if donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)
