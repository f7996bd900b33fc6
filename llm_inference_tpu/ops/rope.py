"""Rotary position embeddings (RoPE), HF LLaMA pairing convention.

Equivalent of the reference's two RoPE kernels — the fused prefill
`launchAddFusedQKVBiasTransposeAndRoPE` (reference:
src/kernels/qkv_bias_and_RoPE.cu:49-144) and the decode `launchRoPE`
(reference: qkv_bias_and_RoPE.cu:333-459) — with two deliberate design
departures:

1. cos/sin are precomputed once into a [max_pos, head_dim] table instead of
   recomputing `powf(theta, 2i/d)` per thread per step (the reference does the
   latter; its own notes call this out as wasteful).
2. The HF "rotate_half" pairing (x[i] pairs with x[i + d/2]) is kept for
   checkpoint parity — the reference notes this pairing defeats its float4
   vectorization (项目整理.md:14); on TPU the VPU handles the strided halves
   fine since the table is laid out as two concatenated halves.

This also fixes two reference bugs we must not replicate: its decode RoPE
assumes MHA only (head_num = qkv_head_num/3, qkv_bias_and_RoPE.cu:416) and its
fp16 kernel body is empty (:384-396). Here GQA head counts and all dtypes work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def make_rope_table(
    max_positions: int,
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[dict] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin) tables of shape [max_positions, head_dim].

    The table is laid out HF-style: freqs for dims [0, d/2) duplicated into
    both halves, so `q * cos + rotate_half(q) * sin` applies the rotation.

    `scaling` supports {"type": "linear", "factor": f} (position
    interpolation), {"type": "ntk", "factor": f} (NTK-aware base scaling —
    the functional version of the reference's never-implemented
    `use_dynamic_ntk` placeholder, reference: llama_params.h:7), and
    {"type": "llama3", "factor": f, "low_freq_factor": lo,
    "high_freq_factor": hi, "original_max_position_embeddings": n}
    (Llama-3.1's piecewise frequency-dependent interpolation, matching HF
    `_compute_llama3_parameters`).
    """
    # HF checkpoint configs use "rope_type"; our presets use "type"
    stype = None
    if scaling:
        stype = scaling.get("type") or scaling.get("rope_type")
    if scaling and stype == "ntk":
        factor = float(scaling["factor"])
        theta = theta * factor ** (head_dim / (head_dim - 2))
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if scaling and stype in ("llama3", "llama3.1"):
        factor = float(scaling["factor"])
        lo = float(scaling.get("low_freq_factor", 1.0))
        hi = float(scaling.get("high_freq_factor", 4.0))
        orig = float(scaling.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * jnp.pi / inv_freq
        # long wavelengths interpolate by `factor`, short ones stay exact,
        # the band between blends smoothly (HF-identical formulation)
        scaled = jnp.where(wavelen > orig / lo, inv_freq / factor, inv_freq)
        smooth = (orig / wavelen - lo) / (hi - lo)
        blended = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        medium = (wavelen >= orig / hi) & (wavelen <= orig / lo)
        inv_freq = jnp.where(medium, blended, scaled)
    mscale = 1.0
    if scaling and stype == "yarn":
        # YaRN (DeepSeek V2/V3): interpolate low-frequency dims by
        # `factor`, keep high-frequency dims exact, linear-ramp the band
        # between (found from the beta_fast/beta_slow rotation counts);
        # cos/sin get the attention factor mscale(factor, mscale) /
        # mscale(factor, mscale_all_dim) — HF _compute_yarn_parameters.
        import math
        factor = float(scaling["factor"])
        # HF falls back to config.max_position_embeddings when the key is
        # absent; checkpoint conversion bakes that in — a bare dict here
        # defaults to the table length (the closest available analogue)
        orig = float(scaling.get("original_max_position_embeddings")
                     or max_positions)
        beta_fast = float(scaling.get("beta_fast", 32.0))
        beta_slow = float(scaling.get("beta_slow", 1.0))
        dim = head_dim

        def corr_dim(n_rot):
            return (dim * math.log(orig / (n_rot * 2 * math.pi))
                    / (2 * math.log(theta)))

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), dim - 1)
        ramp = jnp.clip((jnp.arange(dim // 2, dtype=jnp.float32) - low)
                        / max(high - low, 1e-3), 0.0, 1.0)
        extrap = 1.0 - ramp                       # 1 → keep exact
        inv_freq = (inv_freq / factor) * (1.0 - extrap) + inv_freq * extrap

        def _ms(scale, m=1.0):
            return 0.1 * m * math.log(scale) + 1.0 if scale > 1 else 1.0

        # HF: explicit attention_factor wins; else the mscale ratio only
        # when BOTH mscale keys are set; else get_mscale(factor)
        af = scaling.get("attention_factor")
        ms, msad = scaling.get("mscale"), scaling.get("mscale_all_dim")
        if af is not None:
            mscale = float(af)
        elif ms and msad:
            mscale = _ms(factor, float(ms)) / _ms(factor, float(msad))
        else:
            mscale = _ms(factor)
    if scaling and stype == "longrope":
        # Phi-3 LongRoPE: per-dimension frequency rescale factors plus an
        # attention magnitude factor on cos/sin. HF picks short vs long
        # factors by the RUNTIME sequence length crossing
        # original_max_position_embeddings (re-roping cached history!);
        # here the choice is static by the table size — consistent for a
        # KV-cache serving engine, identical to HF whenever the serving
        # context sits entirely on one side of the threshold.
        orig = float(scaling.get("original_max_position_embeddings",
                                 max_positions))
        use_long = max_positions > orig
        fac = scaling["long_factor" if use_long else "short_factor"]
        inv_freq = inv_freq / jnp.asarray(fac, jnp.float32)
        s = max(float(scaling.get("max_position_embeddings",
                                  max_positions)) / orig, 1.0)
        if s > 1.0:
            import math
            mscale = math.sqrt(1.0 + math.log(s) / math.log(orig))
    pos = jnp.arange(max_positions, dtype=jnp.float32)
    if scaling and stype == "linear":
        pos = pos / float(scaling["factor"])
    freqs = jnp.outer(pos, inv_freq)                       # [P, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)         # [P, d]
    return ((jnp.cos(emb) * mscale).astype(dtype),
            (jnp.sin(emb) * mscale).astype(dtype))


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
) -> jnp.ndarray:
    """Apply rotary embedding.

    Args:
      x:         [batch, seq, heads, head_dim] query or key.
      positions: [batch, seq] absolute positions (int32).
      cos_table / sin_table: [max_pos, head_dim] from make_rope_table.

    Returns: rotated x, same shape/dtype.
    """
    cos = jnp.take(cos_table, positions, axis=0)  # [B, S, d]
    sin = jnp.take(sin_table, positions, axis=0)
    return apply_rope_gathered(x, cos, sin)


def apply_rope_gathered(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """apply_rope with the tables already gathered at the positions:
    cos/sin are [batch, seq, head_dim]. Lets callers that pick between
    multiple tables per layer (gemma3 dual RoPE) gather ONCE outside the
    layer scan and select the tiny gathered values inside it — selecting
    whole [max_pos, head_dim] tables in the scan body materializes an
    HBM copy of both tables every layer every step."""
    # Split form (round 5): the rotate_half formulation materialized the
    # negated f32 halves to HBM as their own fusion at prefill lengths
    # (T=4096 profile: 19.4 ms/fwd of slice_negate fusions) — expanding
    # per half keeps everything inside one producer-consumer chain with a
    # single concat at the end. Same math bit-for-bit: the tables store
    # each frequency duplicated across both halves, so cos1 == cos2 and
    # sin1 == sin2 elementwise, and (x1·c − x2·s, x2·c + x1·s) is exactly
    # x·cos + rotate_half(x)·sin. LLMI_ROPE_SPLIT=0 re-runs the A/B.
    import os
    half = x.shape[-1] // 2
    x32 = x.astype(jnp.float32)
    if os.environ.get("LLMI_ROPE_SPLIT") == "0":
        out = (x32 * cos[:, :, None, :]
               + _rotate_half(x32) * sin[:, :, None, :])
        return out.astype(x.dtype)
    c1 = cos[:, :, None, :half]
    c2 = cos[:, :, None, half:]
    s1 = sin[:, :, None, :half]
    s2 = sin[:, :, None, half:]
    x1 = x32[..., :half]
    x2 = x32[..., half:]
    out = jnp.concatenate([x1 * c1 - x2 * s1, x2 * c2 + x1 * s2], -1)
    return out.astype(x.dtype)
