"""Prompt-lookup (n-gram) speculative decoding — draft-model-free.

No reference analogue (strictly serial decode there). Greedy speculative
decoding with proposals mined from the sequence's own history: when the
last `ngram` tokens reappear earlier in the context, the tokens that
followed that occurrence are proposed, and ONE forward over γ+1 positions
verifies them — device decode steps collapse ~(accepted+1)× on repetitive
spans (code, quotations, structured output). Measured on a 7B/v5e with a
cyclic prompt: 96 tokens in 42 verify steps (2.3 tokens/step).

Caveats, honestly stated:
- Wall-clock wins require low host-dispatch latency: each verify step is a
  host round trip (vs the plain engine's one round trip per decode_chunk).
  Through this environment's ~30 ms relay the plain chunked decode is
  faster; on a directly attached chip (sub-ms dispatch) the step reduction
  dominates.
- Acceptance is exact w.r.t. the VERIFY forward's argmax. The verify runs
  the T>1 attention path while plain decode runs the T=1 kernel; on bf16
  near-ties the two greedy streams can legitimately diverge (both are
  argmax-consistent continuations of their own numeric path).

Why no cache rollback exists here: the verify forward writes K/V for all
γ+1 positions, including rejected ones, but this engine's standing
invariant is that a decode write at position p happens before ANY read of
p (attention masks by `slot <= current position`) — so the next window
simply overwrites the rejected tail just in time, exactly like the padding
tails of bucketed prefill. Acceptance math for greedy is exact: a proposed
token is accepted iff it equals the argmax at the previous position, and
the first mismatch position contributes its own argmax as the bonus token.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import GenerationConfig


def propose_ngram(ids: Sequence[int], gamma: int, ngram: int = 3,
                  min_ngram: int = 1) -> List[int]:
    """Longest-suffix n-gram lookup: find the most recent earlier occurrence
    of the last n tokens (n from `ngram` down to `min_ngram`) and return up
    to `gamma` tokens that followed it."""
    ids = list(ids)
    L = len(ids)
    for n in range(min(ngram, L - 1), min_ngram - 1, -1):
        tail = ids[L - n:]
        # most recent match strictly before the suffix itself
        for s in range(L - n - 1, -1, -1):
            if ids[s:s + n] == tail:
                return ids[s + n:s + n + gamma]
    return []


class SpeculativeDecoder:
    """Greedy speculative decoding over an InferenceEngine (batch 1)."""

    def __init__(self, engine, gamma: int = 4, ngram: int = 3):
        self.engine = engine
        self.gamma = gamma
        self.ngram = ngram
        cfg = engine.cfg
        model = engine._model        # registry-dispatched (gemma2 included)

        def verify(params, ids, positions, cache):
            return model.forward(cfg, params, ids, positions, cache,
                                 logits_mode="all")

        self._verify_jit = jax.jit(verify, donate_argnums=(3,))
        self.stats = {"steps": 0, "accepted": 0, "produced": 0}

    # proposal strategy hooks (overridden by DraftModelSpeculativeDecoder)

    def _start(self, prompt: List[int]) -> None:
        """Called once after the target prefill, before the verify loop."""

    def _propose(self, history: List[int], cur: int, pos: int) -> List[int]:
        return propose_ngram(history, self.gamma, self.ngram)

    def _window(self, cache, tokens: List[int], pos0: int):
        """One verify forward over a fixed-width γ+1 window (padded with
        repeats of the last token so the jit shape is constant)."""
        W = self.gamma + 1
        padded = (tokens + [tokens[-1]] * W)[:W]
        ids = jnp.asarray([padded], jnp.int32)
        positions = (pos0 + jnp.arange(W, dtype=jnp.int32))[None]
        logits, cache = self._verify_jit(self.engine.params, ids, positions,
                                         cache)
        return np.asarray(jnp.argmax(logits[0], -1)), cache

    def generate(self, prompt: Sequence[int],
                 gen: Optional[GenerationConfig] = None
                 ) -> Tuple[List[int], dict]:
        """Returns (token_ids, stats). Greedy only (speculative acceptance
        is exact for argmax; sampled acceptance needs rejection sampling,
        which plain batched decode serves better on TPU)."""
        gen = gen or GenerationConfig(greedy=True)
        assert gen.greedy, "speculative decoding here is greedy-only"
        eos = set(gen.eos_token_ids)
        engine = self.engine
        S = engine.engine_cfg.max_seq_len
        need = len(prompt) + gen.max_new_tokens + self.gamma + 1
        if need > S:
            raise ValueError(
                f"prompt + max_new_tokens + speculative window needs {need} "
                f"cache slots but max_seq_len is {S} (the verify window "
                f"writes gamma+1 positions ahead; a clamped write would "
                f"corrupt committed KV)")

        logits, cache = engine.prefill([list(prompt)])
        cur = int(np.asarray(jnp.argmax(logits, -1))[0])
        out = [cur]
        history = list(prompt) + out
        pos = len(prompt)
        self._start(list(prompt))

        while len(out) < gen.max_new_tokens and cur not in eos:
            proposal = self._propose(history, cur, pos)
            greedy, cache = self._window(cache, [cur] + proposal, pos)
            self.stats["steps"] += 1
            # accept proposal tokens while they match the running argmax
            a = 0
            while a < len(proposal) and proposal[a] == int(greedy[a]):
                a += 1
            emitted = proposal[:a] + [int(greedy[a])]
            self.stats["accepted"] += a
            for t in emitted:
                out.append(t)
                history.append(t)
                if t in eos or len(out) >= gen.max_new_tokens:
                    break
            cur = out[-1]
            pos += len(emitted)
        self.stats["produced"] += len(out)
        return out, dict(self.stats)


class DraftModelSpeculativeDecoder(SpeculativeDecoder):
    """Classic two-model speculative decoding: a small DRAFT model decodes
    γ tokens autoregressively (its own jitted scan — one host round trip),
    the TARGET verifies all γ+1 positions in one forward. Same exact greedy
    acceptance as the n-gram variant; expected tokens/verify-step is
    1 + γ·(draft/target agreement rate).

    Cache discipline on both models is the overwrite-just-in-time invariant
    documented in the module docstring: the draft's KV rows for rejected
    proposals sit beyond the committed position and are rewritten by the
    next window before any read can see them.

    The draft must share the target's tokenizer/vocab. Its engine needs
    max_seq_len ≥ the target's (same window arithmetic).
    """

    def __init__(self, engine, draft_engine, gamma: int = 4):
        super().__init__(engine, gamma)
        if draft_engine.cfg.vocab_size != engine.cfg.vocab_size:
            raise ValueError(
                f"draft vocab {draft_engine.cfg.vocab_size} != target "
                f"vocab {engine.cfg.vocab_size}")
        if (draft_engine.engine_cfg.max_seq_len
                < engine.engine_cfg.max_seq_len):
            raise ValueError(
                "draft max_seq_len must cover the target's (the draft "
                "window advances in lockstep)")
        self.draft = draft_engine
        self._draft_step = draft_engine._get_decode_jit(
            gamma, GenerationConfig(greedy=True))
        self._draft_one = draft_engine._get_decode_jit(
            1, GenerationConfig(greedy=True))
        self._key = jax.random.PRNGKey(0)   # unused under greedy
        self._dcache = None
        self._dnext = 0                     # next unwritten draft position

    def _start(self, prompt: List[int]) -> None:
        _, self._dcache = self.draft.prefill([prompt])
        self._dnext = len(prompt)

    def _propose(self, history: List[int], cur: int, pos: int) -> List[int]:
        # backfill: when a whole window was accepted, the target's bonus
        # token advanced `pos` one past the draft's last written position —
        # feed the skipped history token first, or the draft would forever
        # attend a zero KV row at that position
        while self._dnext < pos:
            tok = jnp.asarray([history[self._dnext]], jnp.int32)
            p = jnp.asarray([self._dnext], jnp.int32)
            _, _, self._dcache, *_ = self._draft_one(
                self.draft.params, self._dcache, tok, p, self._key)
            self._dnext += 1
        tok = jnp.asarray([cur], jnp.int32)
        p = jnp.asarray([pos], jnp.int32)
        toks, _, self._dcache, *_ = self._draft_step(
            self.draft.params, self._dcache, tok, p, self._key)
        self._dnext = pos + self.gamma
        return [int(t) for t in np.asarray(toks)[0]]


from llm_inference_tpu.engine.scheduler import ContinuousBatchingScheduler


class SpeculativeBatchingScheduler(ContinuousBatchingScheduler):
    """Continuous batching with per-slot n-gram speculation (greedy-only).

    One batched verify forward of width gamma+1 replaces each decode
    step: every live slot proposes up to gamma tokens from its own
    history (propose_ngram); acceptance is argmax-exact; a slot with no
    match degenerates to a plain one-token step inside the same program.
    The rejected tail's KV writes are overwritten just in time by the
    engine's position-masking invariant (see module docstring). Rows too
    close to the cache end fall back to the plain chunked decode for
    that dispatch. Greedy-only: requests asking for sampling, penalties,
    logit_bias, guided decoding, adapters, or top_logprobs are rejected
    at submit (use the plain scheduler for those)."""

    # the proposal step reads req.output_ids (history) on host at
    # dispatch time — the admission first token must be fetched eagerly
    defer_admit_fetch = False

    def __init__(self, engine, gen=None, slots=None, gamma: int = 4,
                 ngram: int = 3):
        if engine._sharded:
            # the verify closure calls model.forward directly (no
            # shard_map); sharded params would crash in the scheduler
            # loop thread, hanging every client
            raise ValueError("speculative scheduler is single-device "
                             "for now (use the plain scheduler under "
                             "tp/dp)")
        super().__init__(engine, gen, slots)
        # the accept loop syncs on every verify forward (np.array of g):
        # harvest pipelining cannot apply, and the plain-chunk fallback
        # dispatch must complete synchronously too
        self.pipeline_harvest = False
        self.gamma = gamma
        self.ngram = ngram
        self.spec_stats = {"steps": 0, "accepted": 0, "produced": 0}
        cfg = engine.cfg
        model = engine._model

        def verify(params, ids, positions, cache):
            logits, cache = model.forward(cfg, params, ids, positions,
                                          cache, logits_mode="all")
            g = jnp.argmax(logits, -1).astype(jnp.int32)     # [B, W]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            glp = jnp.take_along_axis(lp, g[..., None], -1)[..., 0]
            return g, glp, cache

        self._verify_batched = jax.jit(verify, donate_argnums=(3,))

    def _propose_all(self, live, tok_np, pos_np) -> dict:
        """Proposal hook: slot → up to γ proposed token ids. Base class:
        n-gram lookup over each request's own history."""
        props = {}
        for b in live:
            req = self.slot_req[b]
            hist = list(req.prompt_ids) + req.output_ids
            props[b] = propose_ngram(hist, self.gamma, self.ngram)
        return props

    def _resolve_sampling(self, req):
        out = super()._resolve_sampling(req)
        t, k, p, gr, minp, rep, pres, freq = out
        if not gr or rep != 1.0 or pres != 0.0 or freq != 0.0:
            raise ValueError(
                "speculative scheduler serves greedy requests only "
                "(acceptance is argmax-exact)")
        if (req.logit_bias or req.adapter or req.top_logprobs
                or req.guided_choice is not None
                or req.guided_regex is not None
                or req.guided_json is not None):
            raise ValueError(
                "speculative scheduler does not support logit_bias/"
                "guided/adapter/top_logprobs (use the plain scheduler)")
        return out

    def _dispatch_decode(self, steps: int) -> None:
        import time as _time
        live = [b for b, r in enumerate(self.slot_req) if r is not None]
        # one blocking fetch, not two: each np.array pays a transport
        # round trip (~24 ms through the bench relay)
        self.phase_n["syncs"] += 1
        tok_np, pos_np = (np.asarray(a) for a in
                          jax.device_get((self.token, self.pos)))
        W = self.gamma + 1
        if any(int(pos_np[b]) + W > self.S for b in live):
            # too close to the cache end for a speculative window (a
            # clamped write would corrupt committed KV): plain chunk
            super()._dispatch_decode(steps)
            return
        ids = np.zeros((self.B, W), np.int32)
        posm = np.tile(np.arange(W, dtype=np.int32), (self.B, 1))
        props = self._propose_all(live, tok_np, pos_np)
        for b in live:
            cur = int(tok_np[b])
            ids[b] = ([cur] + props[b] + [cur] * W)[:W]
            posm[b] += int(pos_np[b])
        g, glp, self.cache = self._verify_batched(
            self.engine.params, jnp.asarray(ids), jnp.asarray(posm),
            self.cache)
        self.phase_n["syncs"] += 1
        g, glp = (np.asarray(a) for a in jax.device_get((g, glp)))
        self.spec_stats["steps"] += 1
        now = _time.perf_counter()
        new_tok, new_pos = tok_np.copy(), pos_np.copy()
        for b in live:
            req = self.slot_req[b]
            p = props[b]
            a = 0
            while a < len(p) and p[a] == int(g[b, a]):
                a += 1
            emitted = [int(t) for t in p[:a]] + [int(g[b, a])]
            self.spec_stats["accepted"] += a
            stops = self._stops(req)
            kept = 0
            for j, t in enumerate(emitted):
                if req.cancelled:
                    break
                req.output_ids.append(t)
                req.output_logprobs.append(float(glp[b, j]))
                kept += 1
                if t in stops:
                    req.finished = True
                else:
                    self._check_stop_strings(req, t)
                if (req.finished
                        or len(req.output_ids) >= req.max_new_tokens):
                    break
            self.spec_stats["produced"] += kept
            self._emit(req)
            if (req.cancelled or req.finished
                    or len(req.output_ids) >= req.max_new_tokens):
                req.done_t = now
                self.slot_req[b] = None
                self.dstate_host[b] = -1
                self._on_retire(b)
            else:
                new_tok[b] = req.output_ids[-1]
                new_pos[b] = int(pos_np[b]) + kept
        self.token = jnp.asarray(new_tok)
        self.pos = jnp.asarray(new_pos)


class DraftSpeculativeBatchingScheduler(SpeculativeBatchingScheduler):
    """Classic two-model speculative decoding inside continuous batching:
    a small DRAFT model keeps its own batched KV cache aligned with the
    target's slots; each step it (a) catches its cache up with whatever
    the target committed since last time (one fixed-width forward per
    lag window — plain chunks from fallbacks included), then (b) runs a
    batched γ-step greedy scan to propose, and the target verifies all
    rows in the shared γ+1-wide forward of the base class. Rejected
    draft KV is overwritten just in time by the same position-masking
    invariant as the target's. Greedy-exact: the emitted streams equal
    the plain scheduler's regardless of draft quality."""

    # the per-request draft prefill hook has no batched counterpart yet
    wave_admission = False

    def __init__(self, engine, draft_engine, gen=None, slots=None,
                 gamma: int = 4):
        if draft_engine.cfg.vocab_size != engine.cfg.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        if draft_engine._sharded:
            raise ValueError("draft engine must be single-device")
        super().__init__(engine, gen, slots, gamma=gamma)
        self.draft = draft_engine
        dcfg = draft_engine.cfg
        dmodel = draft_engine._model
        self._dcache = draft_engine.new_cache(self.B)
        self._dtok = jnp.zeros((self.B,), jnp.int32)
        self._dpos = jnp.zeros((self.B,), jnp.int32)
        self._dnext = np.zeros((self.B,), np.int64)  # next unwritten pos
        self._dinsert = jax.jit(self._insert_fn, donate_argnums=(0,))
        self._draft_scan = draft_engine._get_decode_jit(
            gamma, GenerationConfig(greedy=True))
        self._key = jax.random.PRNGKey(0)            # unused under greedy

        def catchup(params, ids, positions, cache):
            _, cache = dmodel.forward(dcfg, params, ids, positions, cache,
                                      logits_mode="none")
            return cache

        self._catchup = jax.jit(catchup, donate_argnums=(3,))

    def _admit_one(self, slot, req) -> bool:
        ok = super()._admit_one(slot, req)
        if ok and self.slot_req[slot] is req:
            # draft-prefill the prompt into this slot's draft-cache row
            _, one = self.draft.prefill([list(req.prompt_ids)])
            z = jnp.zeros((1,), jnp.int32)
            self._dcache, self._dtok, self._dpos = self._dinsert(
                self._dcache, one, z, z, self._dtok, self._dpos,
                jnp.int32(slot), jnp.int32(0))
            self._dnext[slot] = len(req.prompt_ids)
        return ok

    def _propose_all(self, live, tok_np, pos_np) -> dict:
        C = self.gamma + 1
        # (a) catch up: write committed-but-unseen history into the draft
        # cache, C tokens per round (fallback plain chunks can lag more)
        while True:
            lag = [b for b in live if self._dnext[b] < int(pos_np[b])]
            if not lag:
                break
            ids = np.zeros((self.B, C), np.int32)
            posm = np.tile(np.arange(C, dtype=np.int32), (self.B, 1))
            for b in live:
                req = self.slot_req[b]
                hist = list(req.prompt_ids) + req.output_ids
                o = int(self._dnext[b])
                w = hist[o:min(o + C, int(pos_np[b]))]
                ids[b, :len(w)] = w
                posm[b] += o
                self._dnext[b] = o + len(w)
            self._dcache = self._catchup(
                self.draft.params, jnp.asarray(ids), jnp.asarray(posm),
                self._dcache)
        # (b) batched draft proposals: γ-step greedy scan fed the target's
        # pending token (writes its KV at pos, proposes pos+1..pos+γ)
        toks, _, self._dcache, self._dtok, self._dpos, *_ = \
            self._draft_scan(self.draft.params, self._dcache,
                             jnp.asarray(tok_np), jnp.asarray(pos_np),
                             self._key, None, None, None, None)
        toks = np.asarray(toks)                      # [B, γ]
        for b in live:
            self._dnext[b] = int(pos_np[b]) + self.gamma
        return {b: [int(t) for t in toks[b]] for b in live}
