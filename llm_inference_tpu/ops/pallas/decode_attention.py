"""Fused single-step (decode) cached attention — Pallas TPU kernel.

Reference analogue: `launchDecoderMaskedMHA` (reference:
src/kernels/fused_decoder_self_attention.cu:80-390) — one fused kernel doing
q·K over the cache, online softmax, and P·V per (batch, head). The reference
assigns one CUDA block per (batch, q-head) and loops over cached tokens; on
TPU the design criteria are DMA size (HBM streaming of KV pages) and keeping
the per-step compute in a FIXED, small number of MXU ops:

- Grid (B, Hkv/hb): each invocation streams `hb` whole KV head pages —
  k [hb, D, S] (the cache keeps K transposed, kvcache.py) and v [hb, S, D] —
  sized so k+v ≈ 2-4 MB: big enough to hit bandwidth, small enough to
  double-buffer in ~16 MB VMEM.
- ALL hb heads are folded into ONE dot per tensor via block-diagonal
  operands (a per-head Python loop would serialize 3·hb tiny MXU ops):
    scores = blockdiag(q) [hb·G, hb·D] @ k.reshape(hb·D, S)   → [hb·G, S]
    out    = blockdiag(p) [hb·G, hb·S] @ v.reshape(hb·S, D)   → [hb·G, D]
  The block-diagonal operands are built in VMEM with an iota mask over a
  lane-tiled copy — O(hb²·G·D) bytes, negligible. The reshapes are free
  (merging the leading page dims). The hb× extra MXU work multiplies against
  idle MXU columns — decode attention is HBM-bound.
- Softmax runs in f32 over the lane dim (S), masked by `slot <= position`
  (subsumes causal + current-length masking, the same rule as
  ops.attention.make_attention_mask). Positions arrive via scalar prefetch;
  no [B, 1, T, S] mask tensor ever exists.
- GQA folds the q-head group G into the dot M dimension — the kernel never
  materializes repeated KV heads (the reference needs a separate repeat_kv
  gather kernel for prefill, and its decode kernel is MHA-only).

The new token's k/v are written by ops.kvcache.update_kv_cache BEFORE the
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

# Stream ≤ ~4 MB of KV per grid step (k+v), so two buffered steps fit VMEM.
_KV_BYTES_PER_STEP = 4 * 1024 * 1024
# Above this cache length the XLA path is used (needs S-blocked online
# softmax to go longer; engine buckets keep S at or below this).
_MAX_S = 8192


def _block_diag(x: jnp.ndarray, blocks: int, rows_per_block: int):
    """[R, C] → [R, blocks·C] with row r's values at column block r//rpb,
    zero elsewhere. Built as lane-tile + iota mask (VPU only)."""
    R, C = x.shape
    tiled = jnp.tile(x, (1, blocks))                       # [R, blocks*C]
    col = jax.lax.broadcasted_iota(jnp.int32, (R, blocks * C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, blocks * C), 0)
    return jnp.where((col // C) == (row // rows_per_block), tiled, 0)


def _kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *,
            hb: int, scale: float, softcap: float, quantized: bool):
    b = pl.program_id(0)
    pos = pos_ref[b]
    _, _, G, D = q_ref.shape
    S = k_ref.shape[4]
    HG = hb * G

    def per_head_to_rows(s):            # [hb, S] → [HG, S] (repeat over G)
        return jnp.broadcast_to(s[:, None, :], (hb, G, S)).reshape(HG, S)

    q = q_ref[0].reshape(HG, D).astype(jnp.bfloat16)       # rows (h, g)
    qbd = _block_diag(q, hb, G)                            # [HG, hb*D]
    kb = k_ref[0, 0].reshape(hb * D, S).astype(jnp.bfloat16)
    scores = jnp.dot(qbd, kb, preferred_element_type=jnp.float32) * scale
    if quantized:
        # per-(head, slot) k scales fold EXACTLY into score columns
        scores = scores * per_head_to_rows(ks_ref[0, 0])
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    slot = jax.lax.broadcasted_iota(jnp.int32, (HG, S), 1)
    scores = jnp.where(slot <= pos, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)             # [HG, S] f32

    if quantized:
        # ... and v scales fold into the probability columns
        p = p * per_head_to_rows(vs_ref[0, 0])
    pbd = _block_diag(p.astype(jnp.bfloat16), hb, G)       # [HG, hb*S]
    vb = v_ref[0, 0].reshape(hb * S, D).astype(jnp.bfloat16)
    out = jnp.dot(pbd, vb, preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(hb, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "interpret"))
def _decode_attn(q, k_all, v_all, ks_all, vs_all, pos, layer, *,
                 scale: float, softcap: float, interpret: bool):
    B, Hkv, G, D = q.shape
    S = k_all.shape[-1]
    quantized = ks_all is not None
    hb = max(1, min(Hkv,
                    _KV_BYTES_PER_STEP // (2 * S * D * k_all.dtype.itemsize)))
    while Hkv % hb:
        hb -= 1
    grid = (B, Hkv // hb)
    kernel = functools.partial(_kernel, hb=hb, scale=scale, softcap=softcap,
                               quantized=quantized)
    in_specs = [
        pl.BlockSpec((1, hb, G, D),
                     lambda b, g, pos, lyr: (b, g, 0, 0)),
        # KV pages are read straight out of the FULL stacked cache —
        # the layer index rides scalar prefetch, so the layer scan
        # never materializes a per-layer cache slice.
        pl.BlockSpec((1, 1, hb, D, S),
                     lambda b, g, pos, lyr: (lyr[0], b, g, 0, 0)),
        pl.BlockSpec((1, 1, hb, S, D),
                     lambda b, g, pos, lyr: (lyr[0], b, g, 0, 0)),
    ]
    operands = [q, k_all, v_all]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, hb, S),
                         lambda b, g, pos, lyr: (lyr[0], b, g, 0)),
            pl.BlockSpec((1, 1, hb, S),
                         lambda b, g, pos, lyr: (lyr[0], b, g, 0)),
        ]
        operands += [ks_all, vs_all]
    else:
        # dummy 1-element scale blocks so the kernel arity is fixed
        dummy = jnp.zeros((1, 1, hb, 128), jnp.float32)
        in_specs += [
            pl.BlockSpec((1, 1, hb, 128), lambda b, g, pos, lyr: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, hb, 128), lambda b, g, pos, lyr: (0, 0, 0, 0)),
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
    k_all: jnp.ndarray,        # [L, B, Hkv, D, S] full cache (token written)
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
    Hkv, S = k_all.shape[2], k_all.shape[4]
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
