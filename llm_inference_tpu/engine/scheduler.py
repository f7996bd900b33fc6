"""Continuous batching scheduler.

The reference serves exactly one request at a time through a blocking
host loop (`Llama<T>::Response`, reference: src/models/llama/llama.cpp:
363-449, with batch_size hard-wired to 1 at llama.h:36). This scheduler is
the TPU-native replacement targeted by BASELINE.md row 3 ("continuous
batching bs=8-32"):

- A fixed pool of B decode SLOTS shares one batched KV cache; the decode
  program is a single jitted multi-step scan over all slots (shapes never
  change → zero recompiles in steady state).
- Requests queue up; whenever a slot is free, the next request is prefilled
  ALONE (bucketed length → bounded compile set) into a fresh single-row
  cache whose pages are then inserted into the slot's rows of the batch
  cache (jitted dynamic_update_slice along the batch axis, cache donated —
  an HBM page copy for the prompt, the standard prefill-insert design).
- Decode proceeds for ALL active slots between admissions; finished slots
  (EOS / request token budget) are retired on the host between chunks and
  immediately become admissible. Empty slots keep computing garbage tokens
  that are masked on the host — cheaper than reshaping the batch.

Sampling parameters are PER-REQUEST (temperature / top_k / top_p /
greedy ride as per-slot runtime arrays through ONE compiled decode program
— ops/sampling.sample_per_row); per-request `max_new_tokens` is enforced
host-side.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from typing import Callable, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import GenerationConfig
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.ops import kvcache, sampling

TOP_LOGPROBS_CAP = 16   # static top-k width of the logprobs program (one
                        # extra compiled variant, any request n ≤ cap)
# HBM budget for the stacked guided-decoding DFA tables ([C,S,V] bool +
# int16); exceeding it rejects the SUBMIT (never the scheduler loop)
GUIDED_TABLE_MAX_ENTRIES = 256 * 1024 * 1024


@dataclasses.dataclass
class Request:
    req_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    stream: Optional[Callable[[int, int], None]] = None  # (req_id, token)
    # -- per-request sampling (None → scheduler GenerationConfig default;
    #    any explicit sampling knob turns greedy off unless greedy is set) --
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    greedy: Optional[bool] = None
    min_p: Optional[float] = None
    repetition_penalty: Optional[float] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    # per-request sampling seed: draws depend only on (seed, position) —
    # reproducible independent of batch-mates (None → scheduler-assigned,
    # stored back here so a preemption replay regenerates identical tokens)
    seed: Optional[int] = None
    # extra per-request stop tokens (on top of the scheduler's eos set);
    # the stop token itself is not emitted to the stream
    stop_token_ids: Optional[Sequence[int]] = None
    # stop STRINGS (needs a tokenizer): generation halts when the decoded
    # output contains any of them; `final_text` is the output trimmed at
    # the match, `stop_hit` the matched string
    stop: Optional[Sequence[str]] = None
    # top-N alternative logprobs per emitted token (OpenAI `top_logprobs`;
    # N ≤ TOP_LOGPROBS_CAP) — filled into output_top_logprobs as
    # [(token_id, logprob), ...] lists
    top_logprobs: Optional[int] = None
    # LoRA adapter (name registered with the engine, or stack slot int;
    # None/0 = base model) — multi-LoRA serving, models/lora.py
    adapter: Optional[Union[str, int]] = None
    # OpenAI logit_bias {token_id: bias}: added to this request's logits
    # before sampling (selection only; logprobs stay raw)
    logit_bias: Optional[dict] = None
    # guided decoding (engine/guided.py): exactly one may be set —
    # choices (strings, or token-id sequences for tokenizer-free use),
    # an anchored regex, or a flat JSON schema. Compiled to a token DFA
    # at submit; the DFA state rides the decode scan on device.
    guided_choice: Optional[Sequence] = None
    guided_regex: Optional[str] = None
    guided_json: Optional[dict] = None
    constraint: Optional[object] = None   # compiled guided.TokenDFA
    _cidx: Optional[int] = None           # registered constraint index
    # -- filled by the scheduler --
    output_ids: List[int] = dataclasses.field(default_factory=list)
    output_logprobs: List[float] = dataclasses.field(default_factory=list)
    output_top_logprobs: List[list] = dataclasses.field(
        default_factory=list)
    submit_t: float = 0.0
    first_token_t: float = 0.0
    done_t: float = 0.0
    finished: bool = False          # EOS seen (vs budget exhausted)
    cancelled: bool = False         # aborted by client / cancel()
    stream_pos: int = 0             # tokens already delivered to `stream`
                                    # (survives preemption replay — the
                                    # client never sees duplicates)
    stop_hit: Optional[str] = None  # the stop string that fired
    final_text: Optional[str] = None  # decoded output trimmed at stop_hit
    _text: str = ""                 # incremental decode for stop matching
    halt_stream_at: Optional[int] = None  # first output index NOT streamed

    def reset_generation(self) -> None:
        """Reset for a from-the-prompt replay (preemption / elastic
        drain). stream_pos is KEPT so clients never see duplicate tokens;
        the replay is byte-identical under seeded sampling."""
        self.output_ids = []
        self.output_logprobs = []
        self.output_top_logprobs = []
        self.first_token_t = 0.0
        self.finished = False
        self._text = ""
        self.halt_stream_at = None

    @property
    def ttft_s(self) -> float:
        return self.first_token_t - self.submit_t


class ContinuousBatchingScheduler:
    """Slot-based continuous batching over an InferenceEngine."""

    # class supports batched (wave) admission: k concurrently-arriving
    # requests prefill in ONE padded program per suffix chunk instead of k
    # serial prefills (subclasses whose _admit_one has per-request device
    # work with no batched counterpart set this False)
    wave_admission = True
    # admission first-token fetch may defer past the next chunk dispatch
    # (merged into the harvest's device_get — one round trip per step);
    # subclasses whose dispatch consumes output_ids on host (speculative
    # proposal history) set this False to keep the eager fetch
    defer_admit_fetch = True

    def __init__(self, engine: InferenceEngine,
                 gen: Optional[GenerationConfig] = None,
                 slots: Optional[int] = None):
        self.engine = engine
        self.gen = gen or GenerationConfig()
        self.B = slots or engine.engine_cfg.max_batch_size
        self.S = engine.engine_cfg.max_seq_len

        self.cache = self._make_cache()
        self.token = jnp.zeros((self.B,), jnp.int32)
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.key = jax.random.PRNGKey(self.gen.seed)

        self.queue: deque[Request] = deque()
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self._ids = itertools.count()
        self._eos = set(self.gen.eos_token_ids)
        self._insert_jit = jax.jit(self._insert_fn, donate_argnums=(0,))
        # per-slot sampling knobs (ops/sampling.sample_per_row)
        g = self.gen
        self.temp_host = np.full((self.B,), g.temperature, np.float32)
        self.topk_host = np.full((self.B,), g.top_k, np.int32)
        self.topp_host = np.full((self.B,), g.top_p, np.float32)
        self.greedy_host = np.full((self.B,), g.greedy, bool)
        self.minp_host = np.full((self.B,), getattr(g, "min_p", 0.0),
                                 np.float32)
        self.rep_host = np.full((self.B,),
                                getattr(g, "repetition_penalty", 1.0),
                                np.float32)
        self.pres_host = np.full((self.B,),
                                 getattr(g, "presence_penalty", 0.0),
                                 np.float32)
        self.freq_host = np.full((self.B,),
                                 getattr(g, "frequency_penalty", 0.0),
                                 np.float32)
        self.seed_host = np.zeros((self.B,), np.int32)
        self.aidx_host = np.zeros((self.B,), np.int32)   # LoRA slots
        self._seed_rng = np.random.default_rng(self.gen.seed ^ 0x5EED)
        # [B, V] output-token counts + prompt∪output seen masks, allocated
        # lazily (only when a penalized request is admitted)
        self._counts = None
        self._seen = None
        # per-slot logit_bias rows (lazy [B, V]) + which slots use them
        self._bias = None
        self.bias_on_host = np.zeros((self.B,), bool)
        # guided decoding: per-slot DFA state (-1 = unconstrained) and
        # constraint index into the stacked device tables
        self.dstate_host = np.full((self.B,), -1, np.int32)
        self.cidx_host = np.zeros((self.B,), np.int32)
        self._dfa_list: List = []          # registered guided.TokenDFA s
        self._dfa_key2idx: dict = {}
        self._gmask_dev = None             # [C, S, V] bool
        self._gtrans_dev = None            # [C, S, V] int32
        self._row_set_jit = jax.jit(
            lambda a, row, s: jax.lax.dynamic_update_slice(
                a, row[None], (s, jnp.int32(0))),
            donate_argnums=(0,))
        # admission penalty-row seeding with the first token as a DEVICE
        # array (no fetch on the admission path)
        self._seed_penalty_jit = jax.jit(self._seed_penalty_fn,
                                         donate_argnums=(0, 1))
        # wall-time phase accounting (scripts/bench_serving.py): seconds in
        # admissions (prefill + first-token sync + insert), decode dispatch
        # (program call, async), and harvest (device sync + host
        # bookkeeping), plus event counts — names the host-loop overhead
        # vs the raw-scan ceiling
        self.phase_s = {"admit": 0.0, "dispatch": 0.0, "harvest": 0.0}
        # syncs = blocking device fetches (each pays one relay/PCIe round
        # trip) — lets benches separate transport RTT from host-loop cost
        self.phase_n = {"admit": 0, "chunks": 0, "syncs": 0}
        # one-chunk-deep harvest pipeline (EngineConfig.pipeline_harvest):
        # (toks, lps, tvs, tis, slot_req snapshot) futures of the chunk
        # whose tokens have not been fetched yet. The snapshot pins row→
        # request attribution to DISPATCH-time occupancy: a slot admitted
        # after the dispatch must not receive the stale chunk's rows.
        self._pending = None
        self.pipeline_harvest = bool(
            getattr(engine.engine_cfg, "pipeline_harvest", True))
        # deferred admissions within one step: (slot, req, first-token /
        # logprob / top-logprob futures), flushed by _finish_admissions
        self._admit_pend: List[tuple] = []

    def _resolve_sampling(self, req: Request):
        """(temperature, top_k, top_p, greedy, min_p, rep, pres, freq)
        with scheduler defaults."""
        g = self.gen
        explicit = any(x is not None
                       for x in (req.temperature, req.top_k, req.top_p,
                                 req.min_p))
        greedy = (req.greedy if req.greedy is not None
                  else (False if explicit else g.greedy))
        topk = req.top_k if req.top_k is not None else g.top_k
        mk = self.engine.engine_cfg.max_top_k
        if topk > mk:
            raise ValueError(f"top_k={topk} exceeds EngineConfig.max_top_k"
                             f"={mk}")
        minp = (req.min_p if req.min_p is not None
                else getattr(g, "min_p", 0.0))
        if not 0.0 <= minp < 1.0:
            raise ValueError(f"min_p={minp} must be in [0, 1)")
        rep = (req.repetition_penalty if req.repetition_penalty is not None
               else getattr(g, "repetition_penalty", 1.0))
        if rep <= 0.0:
            raise ValueError(f"repetition_penalty={rep} must be > 0")
        if req.stop and self.engine.tokenizer is None:
            raise ValueError("stop strings need a tokenizer")
        if req.top_logprobs is not None and not (
                0 <= req.top_logprobs <= TOP_LOGPROBS_CAP):
            raise ValueError(f"top_logprobs={req.top_logprobs} must be in "
                             f"[0, {TOP_LOGPROBS_CAP}]")
        self.engine.resolve_adapter(req.adapter)   # validates name/slot
        return (req.temperature if req.temperature is not None
                else g.temperature,
                topk,
                req.top_p if req.top_p is not None else g.top_p,
                greedy,
                minp, rep,
                (req.presence_penalty if req.presence_penalty is not None
                 else getattr(g, "presence_penalty", 0.0)),
                (req.frequency_penalty if req.frequency_penalty is not None
                 else getattr(g, "frequency_penalty", 0.0)))

    def _resolve_seed(self, req: Request) -> int:
        """Assign (once) and return the request's sampling seed."""
        if req.seed is None:
            req.seed = int(self._seed_rng.integers(0, 2**31 - 1))
        return req.seed

    def _ensure_penalty_state(self):
        if self._counts is None:
            V = self.engine.cfg.vocab_size
            self._counts = jnp.zeros((self.B, V), jnp.int32)
            self._seen = jnp.zeros((self.B, V), bool)

    def _register_dfa(self, dfa) -> int:
        """Register a compiled TokenDFA, rebuilding the stacked device
        tables if it is new. Identical constraints (same key) share one
        slot, so e.g. a popular JSON schema compiles+uploads once. Tables
        are padded to power-of-two (C, S) buckets to bound the number of
        distinct compiled decode programs."""
        k = dfa.key()
        idx = self._dfa_key2idx.get(k)
        if idx is not None:
            return idx
        V = self.engine.cfg.vocab_size
        # validate the CANDIDATE registry fully before mutating anything:
        # a raise after registration would poison the key cache (a retry
        # of the same constraint would be admitted with NO device tables
        # and decode unconstrained)
        if dfa.vocab_size != V:
            raise ValueError(f"constraint vocab {dfa.vocab_size} != "
                             f"model vocab {V}")
        cand = self._dfa_list + [dfa]
        S = max(d.n_states for d in cand)
        S_pad = max(8, 1 << (S - 1).bit_length())
        C_pad = 1 << (len(cand) - 1).bit_length() if len(cand) > 1 else 1
        # int16 transitions halve the dominant table (S is capped at
        # guided.MAX_CHAR_STATES + done < 2^15); guard total HBM cost
        if C_pad * S_pad * V > GUIDED_TABLE_MAX_ENTRIES:
            raise ValueError(
                f"guided-decoding tables would need {C_pad}x{S_pad}x{V} "
                f"entries — too many resident constraints / states; "
                f"simplify the constraint or retire old ones")
        gmask = np.zeros((C_pad, S_pad, V), bool)
        gtrans = np.zeros((C_pad, S_pad, V), np.int16)
        for i, d in enumerate(cand):
            gmask[i, :d.n_states] = d.mask
            gtrans[i, :d.n_states] = d.trans.astype(np.int16)
        idx = len(self._dfa_list)
        self._dfa_list.append(dfa)
        self._dfa_key2idx[k] = idx
        self._gmask_dev = jnp.asarray(gmask)
        self._gtrans_dev = jnp.asarray(gtrans)
        return idx

    def _set_slot_sampling(self, slot: int, req: Request,
                           first=None) -> None:
        """Program the slot's sampling state at ADMISSION DISPATCH time —
        no device fetch needed: the scalar knobs and bias rows are
        host-known, and the penalty rows are seeded device-side with the
        sampled-first-token ARRAY (`first`) instead of its fetched value,
        so a burst of admissions costs zero extra round trips. The one
        token-dependent piece that must run on host — the guided DFA walk
        — stays in `_finish_admissions` (guided admissions force an eager
        fetch before the next dispatch; see step())."""
        t, k, p, gr, minp, rep, pres, freq = self._resolve_sampling(req)
        self.temp_host[slot] = t
        self.topk_host[slot] = k
        self.topp_host[slot] = p
        self.greedy_host[slot] = gr
        self.minp_host[slot] = minp
        self.rep_host[slot] = rep
        self.pres_host[slot] = pres
        self.freq_host[slot] = freq
        self.seed_host[slot] = self._resolve_seed(req)
        self.aidx_host[slot] = self.engine.resolve_adapter(req.adapter)
        if rep != 1.0 or pres != 0.0 or freq != 0.0:
            # seed the slot's penalty rows: prompt tokens (repetition
            # scope) + the admission-sampled first token (output scope) —
            # the first token rides in as a device array, folded in-jit
            self._ensure_penalty_state()
            V = self.engine.cfg.vocab_size
            seen_row = np.zeros((V,), bool)
            seen_row[np.asarray(req.prompt_ids, np.int64) % V] = True
            self._counts, self._seen = self._seed_penalty_jit(
                self._counts, self._seen, jnp.asarray(seen_row),
                first[:1].astype(jnp.int32), jnp.int32(slot))
        # (neutral-knob rows are identity under apply_penalties, so stale
        # counts in non-penalized slots are harmless; every penalized
        # admission rewrites its own row)
        if req.logit_bias:
            if self._bias is None:
                self._bias = jnp.zeros(
                    (self.B, self.engine.cfg.vocab_size), jnp.float32)
        if self._bias is not None and (req.logit_bias
                                       or self.bias_on_host[slot]):
            row = self.engine._bias_row_np(req.logit_bias)
            self._bias = self._row_set_jit(self._bias, jnp.asarray(row),
                                           jnp.int32(slot))
        self.bias_on_host[slot] = bool(req.logit_bias)
        if req.constraint is not None:
            # registered at submit (req._cidx); _register_dfa here only
            # dedups — it cannot raise for an already-registered key
            cidx = req._cidx
            if cidx is None:
                cidx = self._register_dfa(req.constraint)
            self.cidx_host[slot] = cidx
            # dstate needs the FETCHED first token (DFA walk is host
            # code) — set in _finish_admissions, which step() forces
            # before the next dispatch for guided admissions
        else:
            self.cidx_host[slot] = 0
            self.dstate_host[slot] = -1

    @staticmethod
    def _seed_penalty_fn(counts, seen, prompt_seen, first, slot):
        V = counts.shape[1]
        oh = jnp.arange(V, dtype=jnp.int32) == first[0]
        crow = oh.astype(counts.dtype)[None]
        srow = (prompt_seen | oh)[None]
        counts = jax.lax.dynamic_update_slice(counts, crow,
                                              (slot, jnp.int32(0)))
        seen = jax.lax.dynamic_update_slice(seen, srow,
                                            (slot, jnp.int32(0)))
        return counts, seen

    # ------------------------------------------------------------------

    def _make_cache(self):
        return self.engine.new_cache(self.B)

    @staticmethod
    def _insert_fn(batch_cache, one_cache, token1, pos1, token, pos, slot,
                   row):
        def put(dst, src):
            if dst is None:
                return None
            # `row` of the admission prefill's cache (0 for a single
            # admission — prefill may carry dp replicas; wave admissions
            # insert row i of one batched prefill). The source cache may
            # be PROMPT-BUCKET sized (shorter S than the batch cache):
            # the update writes only its own extent.
            src = jax.lax.dynamic_slice_in_dim(src, row, 1, axis=1)
            zeros = (jnp.int32(0),) * (dst.ndim - 2)
            return jax.lax.dynamic_update_slice(
                dst, src, (jnp.int32(0), slot) + zeros)
        # replace() keeps the static bits field — rebuilding with the
        # KVCache(...) default silently reset int4 caches to bits=16 and
        # the next decode quantized with the int8 path into a packed pool
        new = batch_cache.replace(
            k=put(batch_cache.k, one_cache.k),
            v=put(batch_cache.v, one_cache.v),
            k_scale=put(batch_cache.k_scale, one_cache.k_scale),
            v_scale=put(batch_cache.v_scale, one_cache.v_scale))
        token = jax.lax.dynamic_update_slice(token, token1, (slot,))
        pos = jax.lax.dynamic_update_slice(pos, pos1, (slot,))
        return new, token, pos

    # ------------------------------------------------------------------

    def submit(self, prompt: Union[str, Sequence[int]],
               max_new_tokens: Optional[int] = None,
               stream: Optional[Callable[[int, int], None]] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               greedy: Optional[bool] = None,
               min_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               seed: Optional[int] = None,
               stop_token_ids: Optional[Sequence[int]] = None,
               stop: Optional[Union[str, Sequence[str]]] = None,
               top_logprobs: Optional[int] = None,
               adapter: Optional[Union[str, int]] = None,
               logit_bias: Optional[dict] = None,
               guided_choice: Optional[Sequence] = None,
               guided_regex: Optional[str] = None,
               guided_json: Optional[dict] = None) -> Request:
        ids = self.engine._encode_prompts([prompt])[0]
        if len(ids) + (max_new_tokens or self.gen.max_new_tokens) > self.S:
            raise ValueError(
                f"prompt({len(ids)}) + max_new_tokens exceeds max_seq_len "
                f"{self.S}")
        self._validate_capacity(len(ids),
                                max_new_tokens or self.gen.max_new_tokens)
        if isinstance(stop, str):
            stop = [stop]
        req = Request(req_id=next(self._ids), prompt_ids=ids,
                      max_new_tokens=max_new_tokens or self.gen.max_new_tokens,
                      stream=stream, submit_t=time.perf_counter(),
                      temperature=temperature, top_k=top_k, top_p=top_p,
                      greedy=greedy, min_p=min_p,
                      repetition_penalty=repetition_penalty,
                      presence_penalty=presence_penalty,
                      frequency_penalty=frequency_penalty, seed=seed,
                      stop_token_ids=stop_token_ids, stop=stop,
                      top_logprobs=top_logprobs, adapter=adapter,
                      logit_bias=logit_bias, guided_choice=guided_choice,
                      guided_regex=guided_regex, guided_json=guided_json)
        self._resolve_sampling(req)       # validate (top_k bound) up front
        if logit_bias:
            self.engine._bias_rows(logit_bias, 1)   # validate token ids
        if (guided_choice is not None or guided_regex is not None
                or guided_json is not None):
            from llm_inference_tpu.engine import guided as _guided
            req.constraint = _guided.compile_constraint(
                self.engine.cfg.vocab_size, sorted(self._stops(req)),
                tokenizer=self.engine.tokenizer,
                choice=guided_choice, regex=guided_regex,
                json_schema=guided_json)
            # register NOW: table-size errors must reach the submitting
            # thread as a 400, never the scheduler loop (which has no
            # handler — a raise there would hang every live request)
            req._cidx = self._register_dfa(req.constraint)
        if len(self.queue) >= self.engine.engine_cfg.max_queued_requests:
            raise RuntimeError("request queue full")
        self.queue.append(req)
        return req

    # ------------------------------------------------------------------

    def _admit_one(self, slot: int, req: Request) -> bool:
        """Prefill `req` alone and insert it into `slot` — DISPATCH only.

        Everything here is an async device dispatch (prefill → first-token
        sample → batch-cache insert form one functional chain); the
        first-token fetch and host bookkeeping are deferred to
        `_finish_admissions`, so a burst of admissions in one step pays ONE
        device round trip, not one per request.

        Under a data-sharded mesh the prompt is replicated across the data
        axis (a batch-1 prefill can't shard over dp>1); row 0 is inserted."""
        dp = self.engine.data_parallel
        aidx1 = (jnp.full((dp,), self.engine.resolve_adapter(req.adapter),
                          jnp.int32) if self.engine.has_lora else None)
        small = self.engine.new_cache(
            dp, max_seq=self.engine.prefill_cache_len(len(req.prompt_ids)))
        logits, one_cache = self.engine.prefill(
            [list(req.prompt_ids)] * dp, cache=small, adapter_idx=aidx1)
        logits = logits[:1]
        first = self._first_token_dispatch(slot, req, logits)
        pos1 = jnp.asarray([len(req.prompt_ids)], jnp.int32)
        self.cache, self.token, self.pos = self._insert_jit(
            self.cache, one_cache, first.astype(jnp.int32), pos1,
            self.token, self.pos, jnp.int32(slot), jnp.int32(0))
        self.slot_req[slot] = req
        return True

    def _admit_batch(self, slots: List[int], reqs: List[Request]) -> None:
        """Admit k requests with ONE padded prefill (dense backend, dp=1).

        Prefill at serving prompt lengths is weight-streaming-bound, so k
        rows cost about the same device time as one — a burst of arrivals
        admits in one program instead of k serial prefills. B pads to a
        power-of-two bucket (bounded program set); the prefill cache is
        sized at the PROMPT bucket, not max_seq_len, so allocation and the
        per-row insert copies stay small."""
        k = len(reqs)
        Bb = 1 << (k - 1).bit_length()
        prompts = [list(r.prompt_ids) for r in reqs]
        prompts += [prompts[-1]] * (Bb - k)
        aidx = (jnp.asarray([self.engine.resolve_adapter(r.adapter)
                             for r in reqs] + [0] * (Bb - k), jnp.int32)
                if self.engine.has_lora else None)
        small = self.engine.new_cache(
            Bb, max_seq=self.engine.prefill_cache_len(
                max(len(p) for p in prompts)))
        logits, ck = self.engine.prefill(prompts, cache=small,
                                         adapter_idx=aidx)
        for i, (slot, req) in enumerate(zip(slots, reqs)):
            first = self._first_token_dispatch(slot, req,
                                               logits[i:i + 1])
            pos1 = jnp.asarray([len(req.prompt_ids)], jnp.int32)
            self.cache, self.token, self.pos = self._insert_jit(
                self.cache, ck, first.astype(jnp.int32), pos1,
                self.token, self.pos, jnp.int32(slot), jnp.int32(i))
            self.slot_req[slot] = req

    def _first_token_dispatch(self, slot: int, req: Request, logits):
        """Shared admission tail, dispatch half (dense AND paged): sample
        the first token with the request's knobs (async), program the
        slot's sampling state (host knobs + device-seeded penalty rows —
        zero fetches), and stash the result futures for
        `_finish_admissions`. Returns the sampled token's device array
        (the backend inserts it into the batch state)."""
        first, first_lp, ftv, fti = self._sample_first(logits, req)
        # first_token_t is stamped at FETCH time (_finish_admissions) —
        # that is when the client-visible stream callback fires; stamping
        # here (dispatch) under-reported TTFT by up to a chunk once the
        # fetch was deferred into the harvest's device_get
        self._set_slot_sampling(slot, req, first)
        self._admit_pend.append((slot, req, first, first_lp, ftv, fti))
        return first

    def _finish_admissions(self, fetched=None) -> None:
        """Fetch every pending admission's first token in ONE transfer
        (or consume `fetched`, pre-fetched by the merged harvest
        device_get) and run the host bookkeeping: logprobs, stop checks,
        instant-retire, guided DFA walk. The slot sampling knobs were
        already programmed at dispatch (`_set_slot_sampling`), so this may
        safely run AFTER the next chunk's dispatch — step() merges the
        fetch into the chunk harvest's to halve the per-step transport
        round trips, forcing an eager call only for guided admissions
        (their dstate DOES gate the next dispatch)."""
        pend, self._admit_pend = self._admit_pend, []
        if not pend:
            return
        if fetched is None:
            self.phase_n["syncs"] += 1
            fetched = jax.device_get([(p[2], p[3]) for p in pend])
        now = time.perf_counter()
        for (slot, req, _first, _flp, ftv, fti), (tok_np, lp_np) in zip(
                pend, fetched):
            req.first_token_t = now      # client-visible: token fetched
            tok = int(tok_np[0])
            stops = self._stops(req)
            req.output_ids.append(tok)
            req.output_logprobs.append(float(lp_np[0]))
            if req.top_logprobs:
                self.phase_n["syncs"] += 1
                tv, ti = jax.device_get((ftv, fti))
                req.output_top_logprobs.append(
                    [(int(i), float(v)) for i, v in
                     zip(ti[0][:req.top_logprobs], tv[0][:req.top_logprobs])])
            self._check_stop_strings(req, tok)
            if tok not in stops:
                self._emit(req)
            self.engine.metrics.observe("ttft_s", req.ttft_s)
            if (tok in stops or req.finished
                    or len(req.output_ids) >= req.max_new_tokens):
                req.finished = req.finished or tok in stops
                req.done_t = time.perf_counter()
                self.slot_req[slot] = None
                self._on_retire(slot)
            elif req.constraint is not None:
                # the DFA walk is host code and needs the fetched token
                # (the rest of the slot state was programmed at dispatch)
                self.dstate_host[slot] = req.constraint.walk(req.output_ids)

    def _harvest_pending(self, pend=None) -> None:
        """Fetch one stashed chunk's tokens (np.asarray blocks on the
        device result — under pipelining the readback overlaps the
        already-dispatched NEXT chunk) and distribute them. With no
        argument, drains self._pending."""
        if pend is None:
            pend, self._pending = self._pending, None
            if pend is None:
                return
        toks, lps, tvs, tis, snap = pend
        t1 = time.perf_counter()
        # ONE blocking fetch for the whole chunk AND any pending
        # admission first-tokens (separate np.asarray calls paid one
        # transport round trip EACH through the TPU relay; the admission
        # fetch used to be a second round trip per step)
        apend = self._admit_pend
        self.phase_n["syncs"] += 1
        (toks, lps, tvs, tis), afetched = jax.device_get(
            ((toks, lps, tvs, tis), [(p[2], p[3]) for p in apend]))
        if apend:
            # admissions first: an instant-retire (first token = stop)
            # must clear slot_req before the chunk rows are attributed
            self._finish_admissions(afetched)
        self._harvest(np.asarray(toks), np.asarray(lps),
                      None if tvs is None else np.asarray(tvs),
                      None if tis is None else np.asarray(tis),
                      snapshot=snap)
        self.phase_s["harvest"] += time.perf_counter() - t1

    def _harvest(self, toks_np: np.ndarray,
                 lps_np: Optional[np.ndarray] = None,
                 tvs_np: Optional[np.ndarray] = None,
                 tis_np: Optional[np.ndarray] = None,
                 snapshot: Optional[List[Optional[Request]]] = None) -> None:
        """Distribute a decode chunk's tokens [B, steps] to the requests.

        `snapshot` is the slot occupancy AT DISPATCH time: row b belongs
        to snapshot[b], and is dropped unless that request still occupies
        slot b (a preempted/retired slot's rows are garbage; a slot
        re-admitted between dispatch and harvest must not receive them)."""
        now = time.perf_counter()
        for b in range(self.B):
            req = self.slot_req[b] if snapshot is None else snapshot[b]
            if req is None or req is not self.slot_req[b]:
                continue
            stops = self._stops(req)
            for j, t in enumerate(toks_np[b]):
                t = int(t)
                if req.cancelled:
                    break
                req.output_ids.append(t)
                if lps_np is not None:
                    req.output_logprobs.append(float(lps_np[b, j]))
                if tvs_np is not None and req.top_logprobs:
                    n = req.top_logprobs
                    req.output_top_logprobs.append(
                        [(int(i), float(v)) for i, v in
                         zip(tis_np[b, j, :n], tvs_np[b, j, :n])])
                if t in stops:
                    req.finished = True
                else:
                    self._check_stop_strings(req, t)
                if req.finished or len(req.output_ids) >= req.max_new_tokens:
                    break
            self._emit(req)
            if (req.cancelled or req.finished
                    or len(req.output_ids) >= req.max_new_tokens):
                req.done_t = now
                self.slot_req[b] = None
                self.dstate_host[b] = -1     # constraint no longer active
                # bias_on_host stays True: it marks the device bias ROW as
                # dirty so the next occupant's admission zeroes it
                # (use_bias only scans live slots, so no cost meanwhile)
                self._on_retire(b)

    def _validate_capacity(self, prompt_len: int, max_new: int) -> None:
        """Hook: reject a request that could NEVER be served (the paged
        backend checks the page pool — without this, an oversized request
        would hot-spin forever between preemption and re-admission)."""

    def _on_retire(self, slot: int) -> None:
        """Hook: a slot's request finished (paged backend frees pages)."""

    def _before_chunk(self, steps: int) -> bool:
        """Hook: about to decode `steps` for the active slots; return False
        to skip the chunk (paged backend grows page tables here)."""
        return True

    def _stops(self, req: Request) -> set:
        return (self._eos if not req.stop_token_ids
                else self._eos | set(req.stop_token_ids))

    def _check_stop_strings(self, req: Request, tok: int) -> None:
        """Incremental stop-string matching: decode `tok`'s piece into the
        request's running text; when a stop string completes, finish the
        request, record the exact trimmed text (a match may span tokens and
        start mid-piece — char-exact in `final_text`) and halt the stream
        BEFORE the completing token."""
        if not req.stop:
            return
        piece = self.engine.tokenizer.decode_token(tok)
        prev = len(req._text)
        req._text += piece
        longest = max(len(s) for s in req.stop)
        start = max(0, prev - longest + 1)
        for s in req.stop:
            i = req._text.find(s, start)
            if i >= 0:
                req.finished = True
                req.stop_hit = s
                req.final_text = req._text[:i]
                req.halt_stream_at = len(req.output_ids) - 1
                return

    def _emit(self, req: Request) -> None:
        """Stream undelivered tokens (EOS excluded; a fired stop string
        halts the stream before its completing token). stream_pos survives
        a preemption's output reset, so a replayed request only streams
        what the client has not seen — all replays are byte-identical:
        greedy trivially, sampled because draws are keyed on
        (request seed, position), not on batch composition."""
        n = len(req.output_ids)
        limit = n if req.halt_stream_at is None else min(
            n, req.halt_stream_at)
        if req.stream:
            stops = self._stops(req)
            for i in range(req.stream_pos, limit):
                t = req.output_ids[i]
                if t not in stops:
                    req.stream(req.req_id, t)
        req.stream_pos = max(req.stream_pos, n)

    def _sample_first(self, logits, req: Request):
        """Sample a request's first token + its logprob with ITS sampling
        knobs — ONE jitted dispatch (eager per-op dispatch here costs a
        device round trip each on the TTFT-critical admission path).
        The draw is seeded: fold_in(PRNGKey(req.seed), prompt_len), the
        same convention as the decode chunk — replay-identical."""
        t, k, p, gr, minp, rep, pres, freq = self._resolve_sampling(req)
        fn = getattr(self, "_first_jit", None)
        if fn is None:
            mk = self.engine.engine_cfg.max_top_k

            cap = min(TOP_LOGPROBS_CAP, self.engine.cfg.vocab_size)

            def _first(logits, seeds, pos, t, k, p, gr, minp, counts,
                       seen, rep, pres, freq, bias):
                key = sampling.row_keys(seeds, pos)
                tok = sampling.sample_per_row(
                    logits, key, t, k, p, gr, mk, True, min_p=minp,
                    penalties=(counts, seen, rep, pres, freq), bias=bias)
                tv, ti = sampling.top_logprobs(logits, cap)
                return tok, sampling.chosen_logprob(logits, tok), tv, ti

            fn = self._first_jit = jax.jit(_first)
        B1 = logits.shape[0]
        V = self.engine.cfg.vocab_size
        seen_row = np.zeros((V,), bool)
        if rep != 1.0:
            seen_row[np.asarray(req.prompt_ids, np.int64) % V] = True
        # logit_bias + guided-constraint start mask, folded into one
        # additive row (disallowed tokens get -inf)
        bias_row = self.engine._bias_row_np(req.logit_bias)
        if req.constraint is not None:
            bias_row = bias_row + np.where(
                req.constraint.mask[req.constraint.start], 0.0,
                sampling.NEG_INF).astype(np.float32)
        return fn(logits,
                  jnp.full((B1,), self._resolve_seed(req), jnp.int32),
                  jnp.full((B1,), len(req.prompt_ids), jnp.int32),
                  jnp.full((B1,), t, jnp.float32),
                  jnp.full((B1,), k, jnp.int32),
                  jnp.full((B1,), p, jnp.float32),
                  jnp.full((B1,), gr, bool),
                  jnp.full((B1,), minp, jnp.float32),
                  jnp.zeros((B1, V), jnp.int32),
                  jnp.broadcast_to(jnp.asarray(seen_row), (B1, V)),
                  jnp.full((B1,), rep, jnp.float32),
                  jnp.full((B1,), pres, jnp.float32),
                  jnp.full((B1,), freq, jnp.float32),
                  jnp.broadcast_to(jnp.asarray(bias_row), (B1, V)))

    def step(self) -> bool:
        """One scheduling iteration: admit into free slots, then decode one
        chunk for all active slots. Returns False when fully idle."""
        t0 = time.perf_counter()
        # wave admission (one batched prefill per suffix chunk) when the
        # backend provides a batched admission path and the mesh has no
        # data axis; backends whose _admit_one has per-request device work
        # with no batched counterpart (draft-model prefill hooks) set
        # wave_admission=False and admit per-request
        wave = self.wave_admission and self.engine.data_parallel == 1
        if wave and self.queue:
            free = [b for b in range(self.B) if self.slot_req[b] is None]
            k = min(len(free), len(self.queue))
            if k == 1:
                self._admit_one(free[0], self.queue.popleft())
                self.phase_n["admit"] += 1
            elif k > 1:
                self._admit_batch(free[:k],
                                  [self.queue.popleft() for _ in range(k)])
                self.phase_n["admit"] += k
        elif not wave:
            for b in range(self.B):
                if self.slot_req[b] is None and self.queue:
                    if not self._admit_one(b, self.queue.popleft()):
                        break                # backend out of capacity
                    self.phase_n["admit"] += 1
        # the admission first-token fetch is DEFERRED into the chunk
        # harvest's device_get (one transport round trip per step instead
        # of two) — the slot knobs were programmed at dispatch, so only
        # guided admissions (host DFA walk gates the next chunk's masks)
        # force the fetch before dispatch
        if (not self.defer_admit_fetch
                or any(p[1].constraint is not None
                       for p in self._admit_pend)):
            self._finish_admissions()
        self.phase_s["admit"] += time.perf_counter() - t0
        active = [r for r in self.slot_req if r is not None]
        if not active:
            self._finish_admissions()
            if self._pending is not None:
                self._harvest_pending()      # drain the in-flight chunk
                return True
            return bool(self.queue)
        # ALWAYS dispatch a full decode_chunk: clamping the chunk to the
        # remaining-token budget compiles a separate program per distinct
        # residue (a 14-19 s warm-cache stall EACH, mid-trace), and once
        # one short chunk runs the budgets drift off the chunk grid so up
        # to decode_chunk distinct programs get built. Harvest truncates
        # each request at its own max_new; the overshoot rows are retired
        # slots whose writes clamp at the cache edge (kv_write clamps
        # offsets >= S to a last-slot write; the paged backend sinks them
        # on the reserved null page) — ≤ chunk-1 wasted rows per
        # retirement wave, all batched, zero marginal step cost.
        steps = self.engine.engine_cfg.decode_chunk
        if not self._before_chunk(steps):
            if self._pending is not None:
                self._harvest_pending()   # retiring slots may free pages
            self._finish_admissions()     # no chunk to merge with
            return True
        self._dispatch_decode(steps)
        # no pending chunk was available to merge with (first chunk after
        # idle under pipelining): fetch the admissions directly — every
        # step leaves _admit_pend drained, so drain_inflight/adopt between
        # steps never see half-finished admissions
        self._finish_admissions()
        return True

    def _dispatch_decode(self, steps: int) -> None:
        """Run one decode chunk for all active slots and harvest it (the
        caller has already run _before_chunk)."""
        t0 = time.perf_counter()
        self.key, sub = jax.random.split(self.key)
        live = [b for b, r in enumerate(self.slot_req) if r is not None]
        use_pen = any(self.rep_host[b] != 1.0 or self.pres_host[b] != 0.0
                      or self.freq_host[b] != 0.0 for b in live)
        top_used = any(self.slot_req[b].top_logprobs for b in live)
        use_bias = any(self.bias_on_host[b] for b in live)
        use_guided = any(self.dstate_host[b] >= 0 for b in live)
        if (all(self.greedy_host[b] for b in live) and not use_pen
                and not top_used and not use_bias and not use_guided):
            # all-greedy chunk: plain argmax program — no top-k/top-p work
            # on the hot path (retired slots' knobs are don't-cares; the
            # penalty fields are stripped — penalized rows take the rows
            # program above)
            fn = self.engine._get_decode_jit(
                steps, dataclasses.replace(self.gen, greedy=True,
                                           repetition_penalty=1.0,
                                           presence_penalty=0.0,
                                           frequency_penalty=0.0))
            aidx = (jnp.asarray(self.aidx_host.copy())
                    if self.engine.has_lora else None)
            toks, lps, self.cache, self.token, self.pos, *_ = fn(
                self.engine.params, self.cache, self.token, self.pos, sub,
                None, None, aidx)
            tvs = tis = None
        else:
            use_topk = any(self.topk_host[b] > 0 for b in live)
            use_topp = any(self.topp_host[b] < 1.0 for b in live)
            use_minp = any(self.minp_host[b] > 0.0 for b in live)
            fn = self.engine._get_decode_rows_jit(
                steps,
                self.engine.engine_cfg.max_top_k if use_topk else 0,
                use_top_p=use_topp, use_min_p=use_minp,
                use_penalties=use_pen, seeded=True,
                top_n=(min(TOP_LOGPROBS_CAP, self.engine.cfg.vocab_size)
                       if top_used else 0),
                use_bias=use_bias, guided=use_guided)
            if use_pen:
                self._ensure_penalty_state()
            # .copy() on every persistent per-slot host array: the device
            # transfer may zero-copy the numpy buffer, and these arrays
            # are mutated at admission/retire while dispatched chunks are
            # still in flight (see _table_snapshot)
            (toks, lps, self.cache, self.token, self.pos, _,
             self._counts, self._seen, tvs, tis, dstate) = fn(
                self.engine.params, self.cache, self.token, self.pos, sub,
                jnp.asarray(self.temp_host.copy()),
                jnp.asarray(self.topk_host.copy()),
                jnp.asarray(self.topp_host.copy()),
                jnp.asarray(self.greedy_host.copy()),
                jnp.asarray(self.minp_host.copy()),
                jnp.asarray(self.seed_host.copy()),
                self._counts if use_pen else None,
                self._seen if use_pen else None,
                jnp.asarray(self.rep_host.copy()),
                jnp.asarray(self.pres_host.copy()),
                jnp.asarray(self.freq_host.copy()),
                jnp.asarray(self.aidx_host.copy())
                if self.engine.has_lora else None,
                self._bias if use_bias else None,
                self._gmask_dev if use_guided else None,
                self._gtrans_dev if use_guided else None,
                jnp.asarray(self.cidx_host.copy()) if use_guided else None,
                jnp.asarray(self.dstate_host.copy()) if use_guided else None)
            if use_guided:
                # device→host DFA state round-trip: a per-chunk sync (the
                # guided path does not pipeline; constrained decoding is
                # not the throughput path)
                self.phase_n["syncs"] += 1
                self.dstate_host = np.array(dstate)   # writable copy
            if not top_used:
                tvs = tis = None
        self.phase_s["dispatch"] += time.perf_counter() - t0
        self.phase_n["chunks"] += 1
        prev, self._pending = self._pending, (toks, lps, tvs, tis,
                                              list(self.slot_req))
        if prev is not None:
            self._harvest_pending(prev)
        if not self.pipeline_harvest:
            self._harvest_pending()          # synchronous mode

    def cancel(self, req: Request) -> bool:
        """Abort a request: drop it from the queue, or flag it so the next
        harvest retires its slot (pages freed, stream stops). Safe to call
        from a stream callback (scheduler thread) or, with the backend's
        lock held, from a handler thread. Returns whether it was pending."""
        req.cancelled = True
        try:
            self.queue.remove(req)
            req.done_t = time.perf_counter()
            return True
        except ValueError:
            pass
        return any(r is req for r in self.slot_req)

    def adopt(self, requests: Sequence[Request]) -> None:
        """Elastic-recovery hand-off: enqueue Request objects taken from a
        FAILED worker's scheduler (drain_inflight + its remaining queue)
        into this one. Request identity — req_id, scheduler-assigned seed,
        sampling knobs, stream callback and stream_pos — is preserved, so
        the replay is byte-identical under seeded sampling and clients
        never see duplicate tokens. Guided-decoding DFAs re-register in
        THIS scheduler's table (the compiled constraint rides the Request).
        The host-loss drill: tests/test_elastic_recovery.py."""
        for req in requests:
            self._validate_capacity(len(req.prompt_ids), req.max_new_tokens)
            if req.constraint is not None:
                req._cidx = self._register_dfa(req.constraint)
            req.reset_generation()
            self.queue.append(req)

    def drain_inflight(self) -> List[Request]:
        """Failure/elastic-recovery hook (parallel/multihost.py): pull every
        in-flight request out of its slot and put it back at the FRONT of
        the queue with generation state reset, so a restarted worker (fresh
        cache) replays them from the prompt. Returns the drained requests."""
        self._pending = None    # in-flight chunk tokens are replayed anyway
        drained = []
        for b in range(self.B):
            req = self.slot_req[b]
            if req is None:
                continue
            self.slot_req[b] = None
            self.dstate_host[b] = -1
            self._on_retire(b)
            req.reset_generation()
            drained.append(req)
        for req in reversed(drained):
            self.queue.appendleft(req)
        return drained

    def run(self, requests: Sequence[Union[str, Sequence[int]]],
            max_new_tokens: Optional[int] = None) -> List[Request]:
        """Convenience: submit everything, run to completion, return in
        submission order."""
        reqs = [self.submit(p, max_new_tokens) for p in requests]
        t0 = time.perf_counter()
        n_steps = 0
        while self.step():
            n_steps += 1
        dt = time.perf_counter() - t0
        produced = sum(len(r.output_ids) for r in reqs)
        if dt > 0:
            self.engine.metrics.observe("batch_tokens_per_s", produced / dt)
        return reqs


class PagedScheduler(ContinuousBatchingScheduler):
    """Continuous batching over the PAGED KV cache (ops/paged_kvcache.py).

    Differences from the dense scheduler:
    - One global page pool instead of a per-slot dense cache; admission
      prefills STRAIGHT INTO the request's allocated pages (the model's
      paged branch writes them) — no prefill-insert copy at all.
    - Pages are allocated incrementally: prompt pages at admission, decode
      pages just before each chunk (_before_chunk), released at retirement.
      The pool may be sized well below slots × max_seq — admissions defer
      when the pool is exhausted (memory oversubscription, vLLM-style).
    - The page table lives host-side (numpy) and its device copy rides in
      the cache pytree, refreshed whenever it changes.
    """

    def __init__(self, engine: InferenceEngine,
                 gen: Optional[GenerationConfig] = None,
                 slots: Optional[int] = None,
                 num_pages: Optional[int] = None,
                 page_size: Optional[int] = None,
                 prefix_cache: bool = False,
                 interleave_prefill: bool = True):
        from llm_inference_tpu.ops import paged_kvcache as pk
        self._pk = pk
        self._paged_opts = (num_pages, page_size)
        self._prefix_opt = prefix_cache
        self._interleave = interleave_prefill
        super().__init__(engine, gen, slots)
        self._prefill_paged = jax.jit(engine.paged_forward(history=False),
                                      donate_argnums=(3,))
        self._prefill_hist = jax.jit(engine.paged_forward(history=True),
                                     donate_argnums=(3,))
        self._set_tok_pos = jax.jit(
            lambda t, q, t1, q1, s: (
                jax.lax.dynamic_update_slice(t, t1, (s,)),
                jax.lax.dynamic_update_slice(q, q1, (s,))),
            donate_argnums=(0, 1))

    def _make_cache(self):
        num_pages, page_size = self._paged_opts
        cfg = self.engine.cfg
        self.ps = page_size or self.engine.engine_cfg.page_size or 128
        if self.S % self.ps:
            raise ValueError(f"max_seq_len {self.S} not a multiple of "
                             f"page_size {self.ps}")
        self.nb = self.S // self.ps
        pool = num_pages or (self.B * self.nb + 1)
        self.alloc = self._pk.PageAllocator(pool, reserve=1)  # 0 = null page
        if self._prefix_opt:
            from llm_inference_tpu.engine.prefix_cache import PrefixStore
            self.store: Optional["PrefixStore"] = PrefixStore()
        else:
            self.store = None
        self.pt_host = np.zeros((self.B, self.nb), np.int32)
        self.slot_pages = [[] for _ in range(self.B)]
        self.pos_host = np.zeros((self.B,), np.int64)
        # families with non-standard pools (deepseek's MLA latent pages)
        # provide their own constructor — mirrors engine.new_cache
        model_pc = getattr(self.engine._model, "new_paged_cache", None)
        if model_pc is not None:
            cache = model_pc(cfg, pool, self.ps, self.B, self.nb,
                             self.engine.cache_dtype)
        else:
            cache = self._pk.init_paged_cache(
                cfg.num_layers, pool, cfg.num_kv_heads, self.ps,
                cfg.head_dim, self.B, self.nb, self.engine.cache_dtype)
        mesh = self.engine.mesh
        if mesh is not None and mesh.devices.size > 1:
            from llm_inference_tpu.parallel import sharding as _sh
            # family-consistent pool placement: MoE pools replicate kv
            # heads unless attention head-shards (engine decided once)
            kv_tensor = getattr(self.engine, "_kv_tensor", "tensor")
            if kv_tensor is None:
                from jax.sharding import (NamedSharding as _NS,
                                          PartitionSpec as _PS)
                cache = jax.device_put(cache, _NS(mesh, _PS()))
            else:
                cache = _sh.shard_paged_cache(cache, mesh,
                                              tensor_axis=kv_tensor)
        return cache

    def _alloc_pages(self, n: int) -> List[int]:
        """Allocate, reclaiming LRU unreferenced prefix-cache pages under
        pool pressure (cached prefixes use all free memory, opportunistically)."""
        if self.store is not None and n > self.alloc.free_pages:
            self.alloc.release(self.store.evict(n - self.alloc.free_pages))
        return self.alloc.allocate(n)

    def _ensure_blocks(self, slot: int, tokens_needed: int):
        """Grow `slot`'s page table to cover tokens_needed positions.
        Returns (ok, grew)."""
        need = (tokens_needed + self.ps - 1) // self.ps
        have = len(self.slot_pages[slot])
        if need <= have:
            return True, False
        try:
            new = self._alloc_pages(need - have)
        except MemoryError:
            return False, False
        self.slot_pages[slot].extend(new)
        self.pt_host[slot, have:need] = new
        return True, True

    def _preempt(self, slot: int) -> None:
        """Pool pressure: evict `slot`'s request back to the queue front
        (state reset → replayed from the prompt later) and free its pages —
        guarantees decode progress for the remaining slots instead of
        livelocking when only decoding could ever free pages."""
        req = self.slot_req[slot]
        self.slot_req[slot] = None
        self.dstate_host[slot] = -1
        # bias_on_host intentionally NOT cleared (dirty-row marker)
        # invalidate the slot's row in any unharvested pipelined chunk:
        # the snapshot identity check (snapshot[b] is slot_req[b]) cannot
        # tell a PREEMPTED request apart from its own REPLAY re-admitted
        # into the same slot — the stale chunk's rows would be appended
        # to the reset stream (caught by test_guided preemption replay)
        if self._pending is not None:
            self._pending[4][slot] = None
        self._on_retire(slot)
        req.reset_generation()       # replayed from the prompt — byte-
        self.queue.appendleft(req)   # identical under seeded sampling

    def _sync_table(self) -> None:
        self.cache = self.cache.replace(
            page_table=self._table_snapshot(self.pt_host))

    @staticmethod
    def _table_snapshot(table_np) -> jnp.ndarray:
        """Host page-table → device, from a SNAPSHOT copy.

        jnp.asarray on a persistent numpy buffer can hand PJRT's CPU
        client a zero-copy view of the host memory; the scheduler then
        MUTATES pt_host (interleave parking restores it, admissions grow
        it) while dispatched-but-unexecuted programs still hold the view.
        Under host load the executor lags far enough behind for a decode
        chunk to read the RESTORED table and write through an admitting
        slot's real pages — KV corruption that reproduced only on a busy
        box (tests/test_paged_scheduler.py interleaved). A fresh copy per
        sync makes the device view immutable; the table is [slots, nb]
        int32, so the copy is noise."""
        return jnp.asarray(np.array(table_np, copy=True))

    def _validate_capacity(self, prompt_len: int, max_new: int) -> None:
        need = (prompt_len + max_new + self.ps - 1) // self.ps
        usable = self.alloc.num_pages - 1          # page 0 is reserved
        if need > usable:
            raise ValueError(
                f"request needs {need} KV pages but the pool has {usable} "
                f"— it could never be admitted (raise num_pages or lower "
                f"max_new_tokens)")

    def _on_retire(self, slot: int) -> None:
        if self.store is not None:
            for p in self.slot_pages[slot]:
                if self.store.owns(p):
                    self.store.release(p)   # stays cached for reuse
                else:
                    self.alloc.release([p])
        else:
            self.alloc.release(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.pt_host[slot] = 0          # null page

    def _before_chunk(self, steps: int) -> bool:
        grew = False
        # grow page tables; under pool pressure, preempt the youngest slots
        # (fewest sunk tokens) until the rest fit — never stall all slots
        while True:
            starved = None
            for b, req in enumerate(self.slot_req):
                if req is None:
                    continue
                # clamp at S: full-chunk dispatch can overshoot a RETIRING
                # request's limit by < chunk (growing past the table width
                # would shape-error; the overshoot rows only touch the
                # retiring slot's own stale pages)
                ok, g = self._ensure_blocks(
                    b, min(int(self.pos_host[b]) + steps + 1, self.S))
                grew |= g
                if not ok:
                    starved = b
            if starved is None:
                break
            victims = [b for b, r in enumerate(self.slot_req)
                       if r is not None]
            if len(victims) <= 1:
                return False     # a single request can't fit: wait/raise
            # replay is byte-identical for EVERY request (greedy trivially;
            # sampled because draws are keyed on the request's stored seed
            # + position, not batch composition) — evict least sunk work
            self._preempt(min(victims, key=lambda b: self.pos_host[b]))
            grew = True
        if grew:
            self._sync_table()
        active = False
        for b, req in enumerate(self.slot_req):
            if req is not None:
                self.pos_host[b] += steps
                active = True
        return active

    def _admit_one(self, slot: int, req: Request) -> bool:
        plen = len(req.prompt_ids)
        # prefix cache: map the longest run of already-prefilled prompt
        # pages into this slot's table and prefill only the suffix
        hashes: list = []
        hit_pages: list = []
        if self.store is not None:
            from llm_inference_tpu.engine import prefix_cache
            # salt by adapter slot: LoRA changes K/V content, so identical
            # prompts under different adapters must not share pages
            hashes = prefix_cache.chunk_hashes(
                req.prompt_ids, self.ps,
                salt=self.engine.resolve_adapter(req.adapter))
            hit_pages = self.store.lookup(hashes, self.ps)
        hit_blocks = len(hit_pages)
        hit_len = hit_blocks * self.ps
        suffix = plen - hit_len
        if hit_blocks:
            self.slot_pages[slot] = list(hit_pages)
            self.pt_host[slot, :hit_blocks] = hit_pages
        # The suffix runs as a SEQUENCE of ps-aligned chunks through the
        # history-attending prefill: chunk c attends the pages chunks < c
        # (and the prefix hit) already wrote — the paged counterpart of the
        # dense engine's chunked prefill, so prompts beyond the largest
        # bucket stay within the bounded compile set.
        fitting = [b for b in self.engine.engine_cfg.prefill_buckets
                   if b <= self.S]
        chunk_max = max(fitting) if fitting else self.S
        chunk_max = (chunk_max // self.ps) * self.ps or self.ps
        done = 0
        logits = None
        while done < suffix:
            part = suffix - done
            bucket = self.engine._bucket(min(part, chunk_max))
            bucket = ((bucket + self.ps - 1) // self.ps) * self.ps
            bucket = min(bucket, chunk_max, self.S - hit_len - done)
            ok, _ = self._ensure_blocks(slot, hit_len + done + bucket)
            if not ok:
                self._on_retire(slot)        # undo prefix refs + chunks
                self._sync_table()           # earlier chunks PUBLISHED the
                # row to the device; without re-sync the idle slot's garbage
                # decode would write through it into shared prefix pages
                self.queue.appendleft(req)   # retry when pages free up
                return False
            self._sync_table()
            n_tok = min(part, bucket)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :n_tok] = req.prompt_ids[hit_len + done:
                                            hit_len + done + n_tok]
            pos = (hit_len + done
                   + np.arange(bucket, dtype=np.int32))[None]
            # trim the page-table view to a power-of-two block count
            # covering the sequence so far: the history-attending branch
            # gathers table-width × page_size slots per layer — the full
            # table would cost O(max_seq_len) per admission (pow2 widths
            # bound the compile set)
            needed = (hit_len + done + bucket) // self.ps
            W = 1
            while W < needed:
                W *= 2
            W = min(W, self.nb)
            cache1 = self.cache.replace(
                page_table=self._table_snapshot(self.pt_host[slot:slot + 1, :W]))
            use_hist = hit_blocks > 0 or done > 0
            prefill = self._prefill_hist if use_hist else self._prefill_paged
            # only pass the LoRA slot when adapters are loaded: the
            # sharded paged forward is a fixed-arity shard_map program
            # (no adapter support over a mesh yet)
            extra = ((jnp.full((1,),
                               self.engine.resolve_adapter(req.adapter),
                               jnp.int32),)
                     if self.engine.has_lora else ())
            logits, cache1 = prefill(
                self.engine.params, jnp.asarray(ids), jnp.asarray(pos),
                cache1, jnp.asarray([n_tok - 1], jnp.int32), *extra)
            self.cache = cache1.replace(
                page_table=self._table_snapshot(self.pt_host))
            done += bucket
            if (self._interleave and done < suffix
                    and any(r is not None for r in self.slot_req)):
                # chunked-prefill interleaving (vLLM-style): active
                # requests keep decoding between a long admission's
                # prefill chunks — bounded inter-token latency, and the
                # CONTENT of every stream is unchanged (sampling is
                # (seed, position)-keyed). The admitting slot's garbage
                # decode row is parked on the reserved null page so it
                # cannot write into the half-prefilled (possibly shared
                # prefix) pages.
                self._interleave_decode(slot)

        # register the freshly prefilled full-prefix pages for future reuse
        for j in range(hit_blocks, len(hashes)):
            self.store.insert(hashes[j], self.slot_pages[slot][j])
        first = self._first_token_dispatch(slot, req, logits)
        self.token, self.pos = self._set_tok_pos(
            self.token, self.pos, first.astype(jnp.int32),
            jnp.asarray([plen], jnp.int32), jnp.int32(slot))
        self.pos_host[slot] = plen
        self.slot_req[slot] = req
        return True

    def _admit_batch(self, slots: List[int], reqs: List[Request]) -> None:
        """Admit k requests with ONE padded suffix prefill per chunk wave.

        The host-side half stays per-request (prefix-cache lookup, page
        allocation, store registration); the device half — the ps-aligned
        chunked suffix prefills — batches across the admitting slots.
        Each row's page-table row routes its writes to its own pages (at
        its own hit_len+done offset via the positions array), rows whose
        suffix finished in an earlier chunk park on the null page for the
        rest of the wave, and the position masks isolate rows from each
        other exactly as in decode. A burst of k arrivals costs one
        program per chunk instead of k serial chunk chains — the paged
        counterpart of the dense backend's `_admit_batch`.

        On pool exhaustion a row is undone (`_on_retire`) and requeued,
        and the remaining rows continue — per-row failure, not
        whole-wave."""
        infos = []
        deferred: List[Request] = []
        seen_hashes: set = set()
        for slot, req in zip(slots, reqs):
            plen = len(req.prompt_ids)
            hashes: list = []
            hit_pages: list = []
            if self.store is not None:
                from llm_inference_tpu.engine import prefix_cache
                hashes = prefix_cache.chunk_hashes(
                    req.prompt_ids, self.ps,
                    salt=self.engine.resolve_adapter(req.adapter))
                # intra-wave prefix overlap: an earlier request in THIS
                # wave is about to prefill pages this one could share —
                # defer it one step so its lookup hits the freshly
                # registered pages instead of prefilling privately
                # (serial admission got this sharing for free; a burst of
                # identical system-prompt requests must not lose it)
                if hashes and hashes[0] in seen_hashes:
                    deferred.append(req)
                    continue
                seen_hashes.update(hashes)
                hit_pages = self.store.lookup(hashes, self.ps)
            hit_blocks = len(hit_pages)
            if hit_blocks:
                self.slot_pages[slot] = list(hit_pages)
                self.pt_host[slot, :hit_blocks] = hit_pages
            infos.append({"slot": slot, "req": req, "plen": plen,
                          "hashes": hashes, "hit_blocks": hit_blocks,
                          "hit_len": hit_blocks * self.ps,
                          "suffix": plen - hit_blocks * self.ps,
                          "alive": True, "logits": None})
        for req in reversed(deferred):
            self.queue.appendleft(req)
        k = len(infos)
        if not k:
            return
        fitting = [b for b in self.engine.engine_cfg.prefill_buckets
                   if b <= self.S]
        chunk_max = max(fitting) if fitting else self.S
        chunk_max = (chunk_max // self.ps) * self.ps or self.ps
        Bb = 1 << (k - 1).bit_length()
        failed: List[Request] = []
        done = 0
        while True:
            writing = [f for f in infos
                       if f["alive"] and f["suffix"] > done]
            if not writing:
                break
            part = max(f["suffix"] - done for f in writing)
            bucket = self.engine._bucket(min(part, chunk_max))
            bucket = ((bucket + self.ps - 1) // self.ps) * self.ps
            bucket = min([bucket, chunk_max]
                         + [self.S - f["hit_len"] - done for f in writing])
            still = []
            for f in writing:
                ok, _ = self._ensure_blocks(
                    f["slot"], f["hit_len"] + done + bucket)
                if ok:
                    still.append(f)
                else:
                    # undo prefix refs + earlier chunks' pages; the row
                    # retries when pages free up (order restored below)
                    self._on_retire(f["slot"])
                    f["alive"] = False
                    failed.append(f["req"])
            if not still:
                break
            self._sync_table()
            need_blocks = max((f["hit_len"] + done + bucket) // self.ps
                              for f in still)
            W = 1
            while W < need_blocks:
                W *= 2
            W = min(W, self.nb)
            ids = np.zeros((Bb, bucket), np.int32)
            pos = np.zeros((Bb, bucket), np.int32)
            last = np.zeros((Bb,), np.int32)
            table = np.zeros((Bb, W), np.int32)
            for i, f in enumerate(infos):
                if not (f["alive"] and f["suffix"] > done):
                    continue            # parked: null-page row, pos 0
                n_tok = min(f["suffix"] - done, bucket)
                o = f["hit_len"] + done
                ids[i, :n_tok] = f["req"].prompt_ids[o:o + n_tok]
                pos[i] = o + np.arange(bucket, dtype=np.int32)
                last[i] = n_tok - 1
                table[i] = self.pt_host[f["slot"], :W]
            use_hist = done > 0 or any(f["hit_blocks"] for f in still)
            prefill = self._prefill_hist if use_hist else self._prefill_paged
            extra = ((jnp.asarray(
                [self.engine.resolve_adapter(f["req"].adapter)
                 for f in infos] + [0] * (Bb - k), jnp.int32),)
                if self.engine.has_lora else ())
            cache1 = self.cache.replace(page_table=jnp.asarray(table))
            logits, cache1 = prefill(
                self.engine.params, jnp.asarray(ids), jnp.asarray(pos),
                cache1, jnp.asarray(last), *extra)
            self.cache = cache1.replace(
                page_table=self._table_snapshot(self.pt_host))
            for i, f in enumerate(infos):
                if f["alive"] and done < f["suffix"] <= done + bucket:
                    f["logits"] = logits[i:i + 1]   # async row slice
            done += bucket
            if (self._interleave
                    and any(f["alive"] and f["suffix"] > done
                            for f in infos)
                    and any(r is not None for r in self.slot_req)):
                self._interleave_decode(
                    [f["slot"] for f in infos if f["alive"]])
        for req in reversed(failed):
            self.queue.appendleft(req)
        for f in infos:
            if not f["alive"]:
                continue
            slot, req = f["slot"], f["req"]
            if self.store is not None:
                for j in range(f["hit_blocks"], len(f["hashes"])):
                    self.store.insert(f["hashes"][j],
                                      self.slot_pages[slot][j])
            first = self._first_token_dispatch(slot, req, f["logits"])
            self.token, self.pos = self._set_tok_pos(
                self.token, self.pos, first.astype(jnp.int32),
                jnp.asarray([f["plen"]], jnp.int32), jnp.int32(slot))
            self.pos_host[slot] = f["plen"]
            self.slot_req[slot] = req

    def _interleave_decode(self, admitting_slots) -> None:
        if isinstance(admitting_slots, int):
            admitting_slots = [admitting_slots]
        # flush deferred admissions first: an earlier admission this step
        # must have its sampling knobs set before its slot decodes here
        self._finish_admissions()
        steps = self.engine.engine_cfg.decode_chunk   # same program as step()
        saved = self.pt_host[admitting_slots].copy()
        self.pt_host[admitting_slots] = 0
        ok = self._before_chunk(steps)
        self._sync_table()
        if ok:
            self._dispatch_decode(steps)
        self.pt_host[admitting_slots] = saved
        self._sync_table()


