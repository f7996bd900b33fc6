"""On-device token sampling: greedy, temperature, top-k, top-p.

Replaces the reference's two-round cub top-K reduction
(reference: src/kernels/topK.cu:25-191) with `jax.lax.top_k`, and its
softmax-free weighted sampler (reference: src/kernels/sampling.cu:28-115)
with a Gumbel-max categorical draw. Everything is static-shape and runs
inside the jitted decode program, so sampled ids never round-trip to the
host per token (the reference copies every sampled id D2H and back —
llama.cpp:266,440-443).

The reference seeds curand with the step index (sampling.cu:48); here the
caller threads a `jax.random` key, which is both reproducible and
batch-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask logits outside the top-k to -inf. k is a static int."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of sorted probs with
    cumulative mass >= p; mask the rest to -inf."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < p
    keep_sorted = (cum - probs) < p
    # threshold logit = smallest kept logit
    num_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    threshold = jnp.take_along_axis(sorted_logits, num_keep - 1, axis=-1)
    return jnp.where(logits < threshold, NEG_INF, logits)


def apply_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """Min-p filtering: drop tokens whose probability is below
    min_p × P(argmax). Works directly on (temperature-scaled) logits:
    p_i < min_p·p_max  ⇔  logit_i < logit_max + log(min_p)."""
    thresh = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(min_p)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_penalties(
    logits: jnp.ndarray,          # [B, V] float
    out_counts: jnp.ndarray,      # [B, V] i32 — OUTPUT token counts
    seen_mask: jnp.ndarray,       # [B, V] bool — prompt ∪ output tokens
    repetition: jnp.ndarray,      # [B] f32 (1.0 ⇒ off)
    presence: jnp.ndarray,        # [B] f32 (0.0 ⇒ off)
    frequency: jnp.ndarray,       # [B] f32 (0.0 ⇒ off)
) -> jnp.ndarray:
    """Standard serving-API sampling penalties (no reference analogue —
    the reference's sampler is fixed top-K=5, src/kernels/sampling.cu).

    Scopes follow the common convention: the CTRL-style repetition
    penalty divides positive / multiplies negative logits of every token
    seen in the PROMPT OR OUTPUT; presence (once-off) and frequency
    (per-count) penalties subtract from OUTPUT tokens only."""
    logits = logits.astype(jnp.float32)
    rep = repetition[:, None]
    pen = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen_mask & (rep != 1.0), pen, logits)
    emitted = out_counts > 0
    logits = logits - presence[:, None] * emitted
    logits = logits - frequency[:, None] * out_counts
    return logits


def row_keys(seeds: jnp.ndarray, positions: jnp.ndarray) -> jax.Array:
    """Per-row PRNG keys `fold_in(PRNGKey(seed_b), pos_b)` — sampling
    noise depends only on (request seed, absolute position), so a
    request's draws are reproducible regardless of its batch-mates and a
    preempted-and-replayed sampled request regenerates the identical
    continuation (engine/scheduler.py relies on this)."""
    def one(s, p):
        return jax.random.fold_in(jax.random.PRNGKey(s), p)
    return jax.vmap(one)(seeds.astype(jnp.uint32),
                         positions.astype(jnp.uint32))


def chosen_logprob(logits: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
    """log P(token) under softmax(logits): [B, V], [B] -> [B] f32."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, token[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]


def top_logprobs(logits: jnp.ndarray, n: int):
    """Top-n (logprob, token-id) alternatives under softmax(logits):
    [B, V] -> ([B, n] f32, [B, n] i32). The serving API's `top_logprobs`
    field (OpenAI semantics: the model's distribution, pre-filtering)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(lp, n)
    return vals, ids.astype(jnp.int32)


def sample_per_row(
    logits: jnp.ndarray,          # [B, V] float
    key: jax.Array,
    temperature: jnp.ndarray,     # [B] f32 (0 ⇒ greedy for that row)
    top_k: jnp.ndarray,           # [B] i32 (0 ⇒ no top-k filter)
    top_p: jnp.ndarray,           # [B] f32 (1 ⇒ no nucleus filter)
    greedy: jnp.ndarray,          # [B] bool
    max_top_k: int = 64,
    use_top_p: bool = True,
    min_p: Optional[jnp.ndarray] = None,       # [B] f32 (0 ⇒ off)
    penalties: Optional[tuple] = None,         # (counts, seen, rep, pres,
                                               #  freq) — apply_penalties
    bias: Optional[jnp.ndarray] = None,        # [B, V] f32 logit bias
    allowed: Optional[jnp.ndarray] = None,     # [B, V] bool constraint mask
) -> jnp.ndarray:
    """Per-ROW sampling knobs as runtime arrays: ONE compiled program serves
    any mix of per-request configs in a continuously batched decode (the
    static-knob `sample` would recompile the decode scan per distinct
    config set). `max_top_k` is the static bound for the top-k sort width;
    per-row k is clamped to it (0 statically disables the top-k stage,
    use_top_p=False the nucleus sort, min_p=None the min-p stage and
    penalties=None the penalty stage — callers key their jit on whether any
    live row needs each stage, so unused filters cost nothing). Greedy rows
    take the argmax of the (penalized) unscaled logits.

    `key` may be per-row keys from `row_keys` (seeded mode: one key row per
    batch row) or a single key shared by the batch.

    `bias` (OpenAI logit_bias) is added to the logits before everything;
    `allowed` (guided decoding, engine/guided.py) masks disallowed tokens
    to -inf — both shape selection (including the greedy argmax) but not
    the reported logprobs (callers compute those on the raw logits)."""
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    if allowed is not None:
        logits = jnp.where(allowed, logits, NEG_INF)
    if penalties is not None:
        logits = apply_penalties(logits, *penalties)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.where(temperature <= 0.0, 1.0, temperature)[:, None]
    scaled = logits / t
    if min_p is not None:
        thresh = (jnp.max(scaled, axis=-1, keepdims=True)
                  + jnp.log(jnp.maximum(min_p, 1e-10))[:, None])
        scaled = jnp.where((min_p > 0.0)[:, None] & (scaled < thresh),
                           NEG_INF, scaled)
    if max_top_k > 0:
        vals = jax.lax.top_k(scaled, max_top_k)[0]          # [B, K]
        k_eff = jnp.clip(top_k, 1, max_top_k) - 1
        kth = jnp.take_along_axis(vals, k_eff[:, None], axis=-1)
        scaled = jnp.where((top_k > 0)[:, None] & (scaled < kth),
                           NEG_INF, scaled)
    if use_top_p:
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < top_p[:, None]
        num_keep = jnp.maximum(
            jnp.sum(keep_sorted, axis=-1, keepdims=True), 1)
        threshold = jnp.take_along_axis(sorted_logits, num_keep - 1,
                                        axis=-1)
        scaled = jnp.where((top_p < 1.0)[:, None] & (scaled < threshold),
                           NEG_INF, scaled)
    per_row = (key.ndim == 2 or          # raw uint32 keys: [B, 2]
               (key.ndim == 1 and jnp.issubdtype(key.dtype, jax.dtypes.prng_key)))
    if per_row:                          # seeded mode: Gumbel-max per row
        gumbel = jax.vmap(
            lambda k, s: jax.random.gumbel(k, s.shape, jnp.float32))(
                key, scaled)
        drawn = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
    else:
        drawn = jax.random.categorical(key, scaled,
                                       axis=-1).astype(jnp.int32)
    return jnp.where(greedy | (temperature <= 0.0), arg, drawn)


def sample(
    logits: jnp.ndarray,          # [B, V] float
    key: Optional[jax.Array],
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    greedy: bool = False,
    min_p: float = 0.0,
) -> jnp.ndarray:
    """Sample next-token ids [B] int32. All knobs are static Python values
    (they select the compiled program, matching bucketed-jit discipline)."""
    logits = logits.astype(jnp.float32)
    if greedy or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature != 1.0:
        logits = logits / temperature
    if min_p > 0.0:
        logits = apply_min_p(logits, min_p)
    if top_k > 0:
        logits = apply_top_k(logits, top_k)
    if top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
