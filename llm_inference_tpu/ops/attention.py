"""Attention — pure-JAX reference path (golden model and XLA-fused fallback).

Covers, in one masked-attention function, what the reference spreads over six
kernels: causal mask build (reference: src/kernels/build_causal_mask.cu:5-59),
GQA head broadcast (repeat_kv.cu:27-124), batched Q·Kᵀ and P·V GEMMs
(linear.cu:126-229), fused scale+mask+softmax (attn_softmax_kernel.cu:79-390),
and the fused decode attention (fused_decoder_self_attention.cu:80-390).

Design: keys/values always come FROM THE CACHE (shape [B, Hkv, S, D]); queries
carry absolute positions. The mask `key_slot <= q_position` subsumes both the
prefill causal mask (including multi-round history, which the reference
handles with its `k ≥ klen−qlen` mask arithmetic) and the decode prefix mask.
Padding slots beyond a sequence's current length are never readable because
they exceed every valid query position.

Softmax is computed in float32 with a max-subtraction, matching HF numerics
(the reference adds a 1e-4/1e-6 fudge to the denominator instead —
attn_softmax_kernel.cu:158 — which we deliberately do NOT replicate).

Pallas flash-attention (prefill) and fused decode-attention kernels live in
ops/pallas/; this module is their numerical oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_attention_mask(
    q_positions: jnp.ndarray,   # [B, T] absolute positions of queries
    kv_len: int,                # S — cache slots
    sliding_window: int = 0,
) -> jnp.ndarray:
    """Boolean mask [B, 1, T, S]: True where query may attend key slot."""
    slots = jnp.arange(kv_len, dtype=q_positions.dtype)          # [S]
    mask = slots[None, None, :] <= q_positions[:, :, None]       # [B, T, S]
    if sliding_window > 0:
        mask &= slots[None, None, :] > (q_positions[:, :, None] - sliding_window)
    return mask[:, None, :, :]


def attend(
    q: jnp.ndarray,            # [B, T, Hq, D]
    k: jnp.ndarray,            # [B, Hkv, S, D]
    v: jnp.ndarray,            # [B, Hkv, S, D]
    mask: jnp.ndarray,         # [B, 1, T, S] bool
    scale: Optional[float] = None,
    logit_softcap: float = 0.0,
    k_scale: Optional[jnp.ndarray] = None,   # [B, S, Hkv] — int8 cache mode
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked multi-head attention with GQA, fp32 softmax.

    With an INT8 KV cache, k/v hold int8 codes and the per-(head, slot)
    scales fold exactly into the score / probability columns (same math as
    the Pallas decode kernel). An INT4 cache additionally packs two dims
    per byte (split-half along head_dim, quantization.quantize_kv4) —
    detected by the halved last axis and unpacked here.

    Returns [B, T, Hq, D] in q.dtype.
    """
    B, T, Hq, D = q.shape
    if jnp.issubdtype(k.dtype, jnp.integer) and k.shape[-1] * 2 == D:
        from llm_inference_tpu.ops.quantization import unpack_kv4
        k = unpack_kv4(k)
        v = unpack_kv4(v)
    Hkv = k.shape[1]
    G = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    qg = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D)
    # scores: [B, Hkv, G, T, S]
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, k.astype(qg.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if k_scale is not None:     # [B, S, Hkv] slot-major → [B, Hkv, 1, 1, S]
        scores = scores * jnp.swapaxes(k_scale, 1, 2)[:, :, None, None, :]
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    scores = jnp.where(mask[:, :, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        vs = jnp.swapaxes(v_scale, 1, 2)[:, :, None, None, :]
        # same 0×inf guard as for V below: a diverged idle row can leave
        # an inf scale on a slot no query attends
        vs = jnp.where(mask.any(axis=2)[:, :, None, None, :], vs, 0)
        probs = probs * vs
    # sanitize V on slots NO query may attend: their probs are exactly 0,
    # but 0 × NaN = NaN in the einsum. A retired slot keeps decoding its
    # own sampled garbage between requests (full-chunk dispatch), its
    # hidden state can diverge to inf/NaN, and the clamped edge writes
    # leave NaN K/V in the row — a freshly re-admitted request would then
    # read NaN THROUGH its causal mask. (The Pallas decode/flash kernels
    # never load blocks beyond the query position — block skip — so only
    # this jnp path needs the guard; the scores side is already `where`d.)
    attendable = mask.any(axis=2)[:, :, :, None]            # [B, 1, S, 1]
    vq = jnp.where(attendable, v.astype(q.dtype), 0)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs.astype(q.dtype),
                     vq, preferred_element_type=jnp.float32)
    # Dv may differ from the q/k dim (MLA latent attention: k carries the
    # rope tail, v is the bare latent — models/deepseek.py)
    out = out.reshape(B, Hq, T, v.shape[-1]).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def decode_attend(
    q: jnp.ndarray,            # [B, 1, Hq, D] single new token per sequence
    k: jnp.ndarray,            # [B, Hkv, S, D] cache (new token already written)
    v: jnp.ndarray,            # [B, Hkv, S, D]
    positions: jnp.ndarray,    # [B, 1] absolute position of the new token
    scale: Optional[float] = None,
    logit_softcap: float = 0.0,
    k_scale: Optional[jnp.ndarray] = None,   # [B, S, Hkv] (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-step cached attention (reference's launchDecoderMaskedMHA).
    Quantized (int8) caches must pass their k/v scales — attending over
    raw codes would be silently wrong, so that case is rejected."""
    if jnp.issubdtype(k.dtype, jnp.integer) and k_scale is None:
        raise ValueError("int8 KV cache passed without k_scale/v_scale — "
                         "raw codes are not attendable")
    mask = make_attention_mask(positions, k.shape[2])
    return attend(q, k, v, mask, scale, logit_softcap,
                  k_scale=k_scale, v_scale=v_scale)
