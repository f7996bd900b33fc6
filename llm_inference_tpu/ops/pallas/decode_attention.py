"""Fused single-step (decode) cached attention — Pallas TPU kernel.

Reference analogue: `launchDecoderMaskedMHA` (reference:
src/kernels/fused_decoder_self_attention.cu:80-390) — one fused kernel doing
q·K over the cache, online softmax, and P·V per (batch, head). The reference
assigns one CUDA block per (batch, q-head) and loops over cached tokens; on
TPU the design criteria are DMA size (HBM streaming of KV pages) and keeping
the per-step compute in a FIXED, small number of MXU ops:

- Grid (B, Hkv/hb): each invocation streams `hb` whole KV head pages
  k/v [hb, S, D] (natural cache layout — see kvcache.py for why K is NOT
  stored transposed), sized so k+v give the pipeline enough grid steps to
  hide DMA latency while staying well within VMEM.
- ALL hb pages fold into ONE MXU dot per tensor by flattening pages into the
  contraction/row dims (a per-head Python loop would serialize 3·hb tiny
  MXU ops):
    scoresᵀ = K.reshape(hb·S, D) ·ᵀ q.reshape(hb·G, D)   → [hb·S, hb·G]
              (dot_general contracting D of both — NT form, MXU-native)
    out     = Pᵀ(hb·S, hb·G) ·ᵀᴺ V.reshape(hb·S, D)      → [hb·G, D]
              (dot_general contracting the hb·S rows of both — TN form)
  Cross-head entries (row page ≠ column head) are masked to -inf before the
  softmax, so they contribute exp(-inf)=0 to the P·V sum — correctness
  without any block-diagonal data movement. The hb× extra MXU work rides
  idle MXU columns; decode attention is HBM-bound.
- Softmax runs in f32 over the hb·S row dim (sublane reductions), masked by
  `slot <= position` — the same rule as ops.attention.make_attention_mask.
  Positions arrive via scalar prefetch; no [B, 1, T, S] mask tensor exists.
- GQA folds the q-head group G into the dot's N dimension — the kernel never
  materializes repeated KV heads (the reference needs a separate repeat_kv
  gather kernel for prefill; its decode kernel is MHA-only).
- INT8 KV cache: per-(head, slot) scales fold EXACTLY outside the dots —
  scoresᵀ rows scale by k_scale, softmaxed P rows scale by v_scale.
- The layer index rides scalar prefetch so pages are read straight out of
  the FULL stacked cache (a scan-sliced operand into an opaque Pallas call
  would be materialized by XLA — an HBM→HBM copy every layer every step).

The new token's k/v are written by ops.kvcache.update_cache_layer BEFORE the
call (in-place under jit donation), so slot[position] is already valid —
same ordering as the reference, which appends inside the kernel
(fused_decoder_self_attention.cu:237-249).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret

NEG_INF = -1e30

# Per-grid-step KV bytes: small enough that Hkv/hb gives the pipeline ≥4-8
# steps to hide DMA latency, big enough for efficient DMA (≥0.5 MB/page set).
_KV_BYTES_PER_STEP = 1024 * 1024
# Above this cache length the XLA path is used (needs S-blocked online
# softmax to go longer; engine buckets keep S at or below this).
_MAX_S = 8192


def _kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *,
            hb: int, scale: float, softcap: float, quantized: bool):
    b = pl.program_id(0)
    pos = pos_ref[b]
    _, _, G, D = q_ref.shape
    S = k_ref.shape[3]
    HG = hb * G
    HS = hb * S

    q = q_ref[0].reshape(HG, D).astype(jnp.bfloat16)       # rows (h, g)
    kb = k_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)   # rows (h, s)
    # scores[(h',g), (h,s)] — contract D of both operands (NT form)
    scores = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if quantized:
        # per-(head, slot) k scales fold EXACTLY into score columns;
        # ks arrives pre-flattened as a [1, hb·S] lane vector (see caller)
        scores = scores * ks_ref[0, 0, 0]
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    row = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (HG, HS), 1)
    ok = ((col // S) == (row // G)) & ((col % S) <= pos)
    scores = jnp.where(ok, scores, NEG_INF)

    m = jnp.max(scores, axis=1, keepdims=True)             # [HG, 1]
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)              # [HG, HS] f32

    if quantized:
        # ... and v scales fold into the probability columns
        p = p * vs_ref[0, 0, 0]
    vb = v_ref[0, 0].reshape(HS, D).astype(jnp.bfloat16)
    # cross-head entries of p are exp(-inf) = 0, so the plain [HG, HS] ×
    # [HS, D] dot sums each output head only over its own page
    out = jnp.dot(p.astype(jnp.bfloat16), vb,
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(hb, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "interpret"))
def _decode_attn(q, k_all, v_all, ks_all, vs_all, pos, layer, *,
                 scale: float, softcap: float, interpret: bool):
    B, Hkv, G, D = q.shape
    S = k_all.shape[3]
    quantized = ks_all is not None
    hb = max(1, min(Hkv,
                    _KV_BYTES_PER_STEP // (S * D * k_all.dtype.itemsize)))
    while Hkv % hb:
        hb -= 1
    grid = (B, Hkv // hb)
    kernel = functools.partial(_kernel, hb=hb, scale=scale, softcap=softcap,
                               quantized=quantized)
    in_specs = [
        pl.BlockSpec((1, hb, G, D),
                     lambda b, g, pos, lyr: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, hb, S, D),
                     lambda b, g, pos, lyr: (lyr[0], b, g, 0, 0)),
        pl.BlockSpec((1, 1, hb, S, D),
                     lambda b, g, pos, lyr: (lyr[0], b, g, 0, 0)),
    ]
    operands = [q, k_all, v_all]
    if quantized:
        # reshape scales [L, B, Hkv, S] → [L, B, Hkv/hb, 1, hb·S] (an XLA
        # bitcast — the dims are contiguous) so the kernel receives each
        # grid step's scales as a [1, hb·S] LANE vector: a lanes→sublanes
        # relayout inside the kernel is an unsupported Mosaic shape cast.
        L = k_all.shape[0]
        ks2 = ks_all.reshape(L, B, Hkv // hb, 1, hb * S)
        vs2 = vs_all.reshape(L, B, Hkv // hb, 1, hb * S)
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, hb * S),
                         lambda b, g, pos, lyr: (lyr[0], b, g, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, hb * S),
                         lambda b, g, pos, lyr: (lyr[0], b, g, 0, 0)),
        ]
        operands += [ks2, vs2]
    else:
        # dummy 1-element scale blocks so the kernel arity is fixed
        dummy = jnp.zeros((1, 1, 1, 1, 128), jnp.float32)
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, 128),
                         lambda b, g, pos, lyr: (0, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, 128),
                         lambda b, g, pos, lyr: (0, 0, 0, 0, 0)),
        ]
        operands += [dummy, dummy]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, G, D),
                                   lambda b, g, pos, lyr: (b, g, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=(k_all.size + v_all.size) * k_all.dtype.itemsize
            // k_all.shape[0],
            transcendentals=B * Hkv * G * S),
        interpret=interpret,
    )(pos, layer, *operands)


def decode_attention(
    q: jnp.ndarray,            # [B, 1, Hq, D] — single new token per sequence
    k_all: jnp.ndarray,        # [L, B, Hkv, S, D] full cache (token written)
    v_all: jnp.ndarray,        # [L, B, Hkv, S, D]
    layer: jnp.ndarray,        # scalar int32 — which layer's pages to read
    positions: jnp.ndarray,    # [B] or [B, 1] absolute position of the token
    scale: float | None = None,
    logit_softcap: float = 0.0,
    k_scale: jnp.ndarray | None = None,   # [L, B, Hkv, S] — int8 cache mode
    v_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused decode attention; returns [B, 1, Hq, D] in q.dtype.

    Callers check `supports(...)` first and use ops.attention otherwise.
    """
    B, T, Hq, D = q.shape
    assert T == 1, "decode kernel is single-step"
    Hkv, S = k_all.shape[2], k_all.shape[3]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    qg = q.reshape(B, Hkv, G, D)
    # positions + layer ride scalar prefetch (SMEM); the kernel indexes pos
    # with program_id(0), and the index maps pick the cache layer.
    pos = positions.reshape(B).astype(jnp.int32)
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = _decode_attn(qg, k_all, v_all, k_scale, v_scale, pos, lyr,
                       scale=scale, softcap=logit_softcap,
                       interpret=use_interpret())
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


def supports(q_shape, S: int) -> bool:
    """Whether the fused kernel handles this case (else use ops.attention)."""
    B, T, Hq, D = q_shape
    return T == 1 and S <= _MAX_S and D in (64, 128, 256) and S % 128 == 0
