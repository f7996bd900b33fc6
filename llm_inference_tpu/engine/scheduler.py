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

Per-batch sampling parameters are shared (the decode program is specialized
on them); per-request `max_new_tokens` is enforced host-side.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import GenerationConfig
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.ops import kvcache, sampling


@dataclasses.dataclass
class Request:
    req_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    stream: Optional[Callable[[int, int], None]] = None  # (req_id, token)
    # -- filled by the scheduler --
    output_ids: List[int] = dataclasses.field(default_factory=list)
    submit_t: float = 0.0
    first_token_t: float = 0.0
    done_t: float = 0.0
    finished: bool = False          # EOS seen (vs budget exhausted)

    @property
    def ttft_s(self) -> float:
        return self.first_token_t - self.submit_t


class ContinuousBatchingScheduler:
    """Slot-based continuous batching over an InferenceEngine."""

    def __init__(self, engine: InferenceEngine,
                 gen: Optional[GenerationConfig] = None,
                 slots: Optional[int] = None):
        self.engine = engine
        self.gen = gen or GenerationConfig()
        self.B = slots or engine.engine_cfg.max_batch_size
        self.S = engine.engine_cfg.max_seq_len

        self.cache = engine.new_cache(self.B)
        self.token = jnp.zeros((self.B,), jnp.int32)
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.key = jax.random.PRNGKey(self.gen.seed)

        self.queue: deque[Request] = deque()
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self._ids = itertools.count()
        self._eos = set(self.gen.eos_token_ids)
        self._insert_jit = jax.jit(self._insert_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------

    @staticmethod
    def _insert_fn(batch_cache, one_cache, token1, pos1, token, pos, slot):
        def put(dst, src):
            if dst is None:
                return None
            zeros = (jnp.int32(0),) * (dst.ndim - 2)
            return jax.lax.dynamic_update_slice(
                dst, src, (jnp.int32(0), slot) + zeros)
        new = kvcache.KVCache(
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
               stream: Optional[Callable[[int, int], None]] = None) -> Request:
        ids = self.engine._encode_prompts([prompt])[0]
        if len(ids) + (max_new_tokens or self.gen.max_new_tokens) > self.S:
            raise ValueError(
                f"prompt({len(ids)}) + max_new_tokens exceeds max_seq_len "
                f"{self.S}")
        req = Request(req_id=next(self._ids), prompt_ids=ids,
                      max_new_tokens=max_new_tokens or self.gen.max_new_tokens,
                      stream=stream, submit_t=time.perf_counter())
        if len(self.queue) >= self.engine.engine_cfg.max_queued_requests:
            raise RuntimeError("request queue full")
        self.queue.append(req)
        return req

    # ------------------------------------------------------------------

    def _admit_one(self, slot: int, req: Request) -> None:
        """Prefill `req` alone and insert its pages into `slot`."""
        logits, one_cache = self.engine.prefill([req.prompt_ids],
                                                cache=self.engine.new_cache(1))
        self.key, sub = jax.random.split(self.key)
        first = sampling.sample(logits, sub, temperature=self.gen.temperature,
                                top_k=self.gen.top_k, top_p=self.gen.top_p,
                                greedy=self.gen.greedy)
        req.first_token_t = time.perf_counter()
        tok = int(np.asarray(first)[0])
        req.output_ids.append(tok)
        if req.stream:
            req.stream(req.req_id, tok)
        self.engine.metrics.observe("ttft_s", req.ttft_s)
        if tok in self._eos or len(req.output_ids) >= req.max_new_tokens:
            req.finished = tok in self._eos
            req.done_t = time.perf_counter()
            self.slot_req[slot] = None
            return
        pos1 = jnp.asarray([len(req.prompt_ids)], jnp.int32)
        self.cache, self.token, self.pos = self._insert_jit(
            self.cache, one_cache, first.astype(jnp.int32), pos1,
            self.token, self.pos, jnp.int32(slot))
        self.slot_req[slot] = req

    def _harvest(self, toks_np: np.ndarray) -> None:
        """Distribute a decode chunk's tokens [B, steps] to the requests."""
        now = time.perf_counter()
        for b in range(self.B):
            req = self.slot_req[b]
            if req is None:
                continue
            for t in toks_np[b]:
                t = int(t)
                req.output_ids.append(t)
                if t in self._eos:
                    req.finished = True
                elif req.stream:
                    req.stream(req.req_id, t)
                if req.finished or len(req.output_ids) >= req.max_new_tokens:
                    req.done_t = now
                    self.slot_req[b] = None
                    break

    def step(self) -> bool:
        """One scheduling iteration: admit into free slots, then decode one
        chunk for all active slots. Returns False when fully idle."""
        for b in range(self.B):
            if self.slot_req[b] is None and self.queue:
                self._admit_one(b, self.queue.popleft())
        active = [r for r in self.slot_req if r is not None]
        if not active:
            return bool(self.queue)
        budget = min(r.max_new_tokens - len(r.output_ids) for r in active)
        steps = max(1, min(self.engine.engine_cfg.decode_chunk, budget))
        fn = self.engine._get_decode_jit(steps, self.gen)
        self.key, sub = jax.random.split(self.key)
        toks, self.cache, self.token, self.pos, _ = fn(
            self.engine.params, self.cache, self.token, self.pos, sub)
        self._harvest(np.asarray(toks))
        return True

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
