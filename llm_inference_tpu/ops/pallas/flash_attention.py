"""Blockwise (flash) prefill attention — Pallas TPU kernel.

Reference analogue: the prefill attention chain
QKᵀ GEMM → scale+mask+softmax → PV GEMM (reference:
src/layers/attention/context_attention.cpp:146-161 using
linear.cu:126-229 + attn_softmax_kernel.cu:79-390), which materializes the
full [B, H, T, S] score tensor — at T=S=2048 that is 0.5 GB per layer in
f32. This kernel runs the classic online-softmax recurrence over S blocks so
scores never leave VMEM, making long-context prefill memory-flat.

Design:
- Grid (B, Hq, T/bt, S/bs), S innermost ("arbitrary"); running max/sum and
  the [bt, D] f32 accumulator live in VMEM scratch across S steps; the
  output block is written once at the last step.
- Reads KV pages straight from the FULL stacked cache with the layer index
  via scalar prefetch — same zero-copy pattern as decode_attention (a scan-
  sliced operand into a Pallas call gets materialized by XLA).
- q·Kᵀ runs as an NT dot_general ([bt, D] × [bs, D] contracting D of both) —
  MXU-native from the natural [B, Hkv, S, D] cache layout, no transposes.
- GQA: grid runs over Q heads; the index maps divide by the group size to
  pick the KV page (no repeated-KV materialization — the reference needs a
  dedicated repeat_kv.cu gather for this).
- Masking uses absolute query positions (an input, so multi-round chat /
  continuous-batching prefills at history offsets just work): key slot s is
  visible iff s <= q_pos (and within the sliding window if configured) —
  the same rule as ops.attention.make_attention_mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_tpu.ops.pallas import use_interpret

NEG_INF = -1e30
_DEF_BT = 256
_DEF_BS = 512


def _kernel(lyr_ref, qpos_ref, q_ref, k_ref, v_ref, o_ref,
            acc_ref, m_ref, l_ref, *, scale: float, softcap: float,
            window: int, bs: int):
    s = pl.program_id(3)
    ns = pl.num_programs(3)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.bfloat16)                    # [bt, D]
    k = k_ref[0, 0, 0].astype(jnp.bfloat16)                 # [bs, D]
    v = v_ref[0, 0, 0].astype(jnp.bfloat16)                 # [bs, D]
    qpos = qpos_ref[0]                                      # [bt] int32

    # NT form: contract D of both operands → [bt, bs]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    bt = scores.shape[0]
    slot = s * bs + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 1)
    ok = slot <= qpos[:, None]
    if window > 0:
        ok &= slot > (qpos[:, None] - window)
    scores = jnp.where(ok, scores, NEG_INF)

    m_prev = m_ref[:]                                       # [bt, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, -1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                             # [bt, bs] f32
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, -1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)

    @pl.when(s == ns - 1)
    def _():
        # fully-masked rows (padding tails) produce l=0 → emit zeros
        l = l_ref[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "window",
                                             "bt", "bs", "interpret"))
def _flash(q, k_all, v_all, qpos, lyr, *, scale, softcap, window, bt, bs,
           interpret):
    # q arrives [B, Hq, T, D] so the q/out block (1, 1, bt, D) satisfies the
    # Mosaic constraint that the last two block dims tile (8, 128)
    B, Hq, T, D = q.shape
    L, _, Hkv, S, _ = k_all.shape
    G = Hq // Hkv
    grid = (B, Hq, T // bt, S // bs)
    kernel = functools.partial(_kernel, scale=scale, softcap=softcap,
                               window=window, bs=bs)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bt), lambda b, h, t, s, lyr: (b, t)),
                pl.BlockSpec((1, 1, bt, D),
                             lambda b, h, t, s, lyr: (b, h, t, 0)),
                pl.BlockSpec((1, 1, 1, bs, D),
                             lambda b, h, t, s, lyr:
                             (lyr[0], b, h // G, s, 0)),
                pl.BlockSpec((1, 1, 1, bs, D),
                             lambda b, h, t, s, lyr:
                             (lyr[0], b, h // G, s, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bt, D),
                                   lambda b, h, t, s, lyr: (b, h, t, 0)),
            scratch_shapes=[
                pltpu.VMEM((bt, D), jnp.float32),
                pltpu.VMEM((bt, 1), jnp.float32),
                pltpu.VMEM((bt, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * S * D,
            bytes_accessed=(k_all.size + v_all.size) * k_all.dtype.itemsize
            // L * (T // bt),
            transcendentals=B * Hq * T * S),
        interpret=interpret,
    )(lyr, qpos, q, k_all, v_all)


def flash_attention(
    q: jnp.ndarray,            # [B, T, Hq, D] — T prefill tokens
    k_all: jnp.ndarray,        # [L, B, Hkv, S, D] full cache (pages written)
    v_all: jnp.ndarray,        # [L, B, Hkv, S, D]
    layer: jnp.ndarray,        # scalar int32
    positions: jnp.ndarray,    # [B, T] absolute query positions
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sliding_window: int = 0,
    block_t: int = _DEF_BT,
    block_s: int = _DEF_BS,
) -> jnp.ndarray:
    """Blockwise masked attention over the cache; returns [B, T, Hq, D]."""
    B, T, Hq, D = q.shape
    S = k_all.shape[3]
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    bt = min(block_t, T)
    bs = min(block_s, S)
    # bs must DIVIDE S: the grid's slot dim is S // bs, so a non-dividing
    # block would silently drop the trailing S % bs cache slots from
    # attention (supports() guarantees S % 128 == 0, so 128 always works)
    while S % bs:
        bs -= 128
    pad_t = (-T) % bt
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        # padded rows mask everything (qpos −1 < every slot) → zero output
        positions = jnp.pad(positions, ((0, 0), (0, pad_t)),
                            constant_values=-1)
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = _flash(q.transpose(0, 2, 1, 3), k_all, v_all,
                 positions.astype(jnp.int32), lyr,
                 scale=scale, softcap=logit_softcap, window=sliding_window,
                 bt=bt, bs=bs, interpret=use_interpret())
    out = out.transpose(0, 2, 1, 3)
    if pad_t:
        out = out[:, :T]
    return out.astype(q.dtype)


def supports(q_shape, S: int, quantized: bool) -> bool:
    B, T, Hq, D = q_shape
    # below ~1M score elements per head the XLA path (which materializes
    # [B,H,T,S] scores) is faster — the flash grid's per-(head, t-block)
    # invocation overhead dominates short prefills (measured: T=128, S=512
    # prefill got 2x slower through this kernel). Flash exists for the long-
    # context regime where materialized scores blow up memory.
    return (T > 1 and not quantized and D in (64, 128, 256)
            and S % 128 == 0 and T >= 8 and T * S >= (1 << 20))
