"""InferenceEngine: jitted prefill/decode programs + generation loop.

Replaces the reference's per-token host loop `Llama<T>::Response`
(reference: src/models/llama/llama.cpp:363-449) with a TPU-native design:

- ONE forward function serves prefill and decode (vs the reference's
  firstTokenGen/continueTokenGen split, llama.cpp:273,318).
- Decode runs in jitted multi-step chunks (`lax.scan` over decode steps with
  on-device sampling feeding back), so sampled ids cross the host boundary
  once per chunk instead of twice per token (the reference's D2H+H2D round
  trip at llama.cpp:266,440-443 — its single biggest decode overhead).
- Prompt lengths are bucketed to bound jit recompiles (the reference
  sidesteps this with hard-coded 13-token buffers, llama.cpp:27).
- The KV cache is donated to each program, so XLA updates it in place —
  there is no allocator to manage (vs reference src/memory/allocator/).
- Multi-chip: the same engine code runs over a mesh via shard_map'd forward
  (parallel/sharding.py); the decode chunk jits the mapped function inside
  its scan.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      ModelConfig)
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache, sampling
from llm_inference_tpu.utils import metrics


@dataclasses.dataclass
class GenerationResult:
    token_ids: List[int]
    text: str
    ttft_s: float                 # time to first token (prefill + sample)
    decode_tokens_per_s: float
    finished: bool                # hit EOS (vs max_new_tokens)


class InferenceEngine:
    """Single-model serving engine (sync API; the continuous-batching
    scheduler in engine/scheduler.py layers on top)."""

    def __init__(self, cfg: ModelConfig, params, *,
                 engine_cfg: Optional[EngineConfig] = None,
                 tokenizer=None, mesh=None,
                 cache_dtype=jnp.bfloat16,
                 adapter_names: Optional[Sequence[str]] = None):
        # warm starts: reuse on-disk compiled executables (the 7B int4
        # N-pair decode program costs ~8 min to compile cold on a v5e)
        from llm_inference_tpu.utils import compile_cache
        compile_cache.enable()
        self.cfg = cfg
        self.engine_cfg = engine_cfg or EngineConfig()
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.cache_dtype = cache_dtype
        self.metrics = metrics.Metrics()
        if self.engine_cfg.max_seq_len % 128 and (
                self.engine_cfg.max_seq_len >= 512):
            # (tiny test configs below 512 use the jnp fallback anyway)
            # the flash/decode kernels require the cache extent to be a
            # lane multiple; a non-128-multiple silently falls back to the
            # score-materializing XLA path (measured 507 → 940 ms for a
            # T=4096 prefill when the cache was 4160) — warn loudly
            import warnings
            warnings.warn(
                f"max_seq_len={self.engine_cfg.max_seq_len} is not a "
                f"multiple of 128: prefill/decode fall off the Pallas "
                f"kernels to the materializing XLA path (~2x slower at "
                f"long contexts). Round up to "
                f"{-(-self.engine_cfg.max_seq_len // 128) * 128}.")

        kv_quantized = cache_dtype in (jnp.int8, "int8", "int4")
        self._kv_quantized = kv_quantized
        self._kv_bits = (8 if cache_dtype in (jnp.int8, "int8")
                         else 4 if cache_dtype == "int4" else 16)
        self._sharded = mesh is not None and mesh.devices.size > 1
        from llm_inference_tpu.models import registry as _registry
        self._model = _registry.get_model(cfg.name)
        if self._sharded:
            # llama/gemma2: Megatron TP over the tensor axis; mixtral: the
            # tensor axis is the EXPERT axis (sharding.is_moe dispatch)
            from llm_inference_tpu.parallel import sharding as _sh
            _sh.validate_tp(cfg, mesh.shape["tensor"])
            self.params = _sh.shard_params_for(cfg, params, mesh)
            raw = _sh.sharded_forward(cfg, mesh, self.params,
                                      logits_mode="last", jit=False,
                                      cache_bits=self._kv_bits)
            if isinstance(params, dict) and "lora" in params:
                self._fwd = self._with_default_adapter(raw)
            else:
                self._fwd = raw
            # MoE: KV replicates across the expert (tensor) axis — UNLESS
            # mixtral's dense attention head-shards (then the per-head
            # cache shards in lockstep; sharding.moe_attn_shards)
            if _sh.is_moe(cfg):
                kv_tensor = ("tensor" if _sh.moe_attn_shards(
                    cfg, params, mesh.shape["tensor"]) else None)
            else:
                kv_tensor = "tensor"
            self._kv_tensor = kv_tensor
            self._shard_cache = lambda c: _sh.shard_cache(
                c, mesh, tensor_axis=kv_tensor)
        else:
            self.params = params
            model = self._model

            def _fwd(params, ids, positions, cache, last_idx,
                     adapter_idx=None):
                kw = ({"adapter_idx": adapter_idx}
                      if adapter_idx is not None else {})
                return model.forward(cfg, params, ids, positions, cache,
                                     logits_mode="last", last_idx=last_idx,
                                     **kw)
            self._fwd = _fwd
            self._shard_cache = lambda c: c
        self._paged_fwds: Dict[bool, Callable] = {}
        # multi-LoRA serving: adapter stacks ride in params["lora"]
        # (models/lora.py); per-request slots resolve by name here
        self.has_lora = isinstance(params, dict) and "lora" in params
        self.adapter_slots: Dict[str, int] = {}
        if self.has_lora:
            any_stack = next(iter(params["lora"].values()))["a"]
            n_slots = any_stack.shape[1]
            names = adapter_names or []
            if len(names) > n_slots - 1:
                raise ValueError(f"{len(names)} adapter names but only "
                                 f"{n_slots - 1} live slots")
            self.adapter_slots = {n: i + 1 for i, n in enumerate(names)}
            self.num_adapters = n_slots - 1

        # jit caches (keyed by static sampling config; shapes are handled by
        # jit's own shape-keyed cache)
        self._prefill_jit = jax.jit(self._prefill_fn, donate_argnums=(3,))
        self._decode_jits: Dict[Any, Callable] = {}
        self._score_jit: Optional[Callable] = None
        self._embed_jit: Optional[Callable] = None

    @staticmethod
    def _with_default_adapter(raw: Callable) -> Callable:
        """Wrap a lora-aware sharded mapped fn (fixed 6-arity,
        parallel/sharding.sharded_forward) so 5-arg callers get the base
        model (adapter slot 0 for every row)."""
        def _sfwd(params, ids, positions, cache, last_idx,
                  adapter_idx=None):
            if adapter_idx is None:
                adapter_idx = jnp.zeros((ids.shape[0],), jnp.int32)
            return raw(params, ids, positions, cache, last_idx, adapter_idx)
        return _sfwd

    def paged_forward(self, history: bool = False) -> Callable:
        """Raw forward for a PAGED cache (mesh-mapped when sharded):
        f(params, ids, positions, cache, last_idx) -> (logits, cache).
        history=True selects the prefix-cache suffix-prefill branch."""
        fn = self._paged_fwds.get(history)
        if fn is None:
            if self._sharded:
                from llm_inference_tpu.parallel import sharding as _sh
                fn = _sh.sharded_forward(
                    self.cfg, self.mesh, self.params, logits_mode="last",
                    jit=False, cache_bits=self._kv_bits,
                    cache_kind="paged", paged_history=history)
                if self.has_lora:
                    fn = self._with_default_adapter(fn)
            else:
                cfg = self.cfg
                model = self._model

                def fn(params, ids, positions, cache, last_idx,
                       adapter_idx=None, _h=history):
                    kw = ({"adapter_idx": adapter_idx}
                          if adapter_idx is not None else {})
                    return model.forward(cfg, params, ids, positions, cache,
                                         logits_mode="last",
                                         last_idx=last_idx, paged_history=_h,
                                         **kw)
            self._paged_fwds[history] = fn
        return fn

    def resolve_adapter(self, adapter) -> int:
        """Adapter name/int → LoRA stack slot (0 = base model)."""
        if adapter is None:
            return 0
        if not self.has_lora:
            raise ValueError("engine has no LoRA stacks loaded")
        if isinstance(adapter, str):
            if adapter not in self.adapter_slots:
                raise ValueError(f"unknown adapter {adapter!r}; have "
                                 f"{sorted(self.adapter_slots)}")
            return self.adapter_slots[adapter]
        slot = int(adapter)
        if not 0 <= slot <= self.num_adapters:
            raise ValueError(f"adapter slot {slot} out of range "
                             f"[0, {self.num_adapters}]")
        return slot

    def _adapter_rows(self, adapter, batch: int):
        """`adapter` (None | name/slot | per-row sequence of them) →
        [B] int32 slot array, or None when every row is the base model."""
        if adapter is None:
            return None
        if isinstance(adapter, (list, tuple)):
            if len(adapter) != batch:
                raise ValueError(f"{len(adapter)} adapters for {batch} "
                                 f"prompts")
            slots = [self.resolve_adapter(a) for a in adapter]
        else:
            slots = [self.resolve_adapter(adapter)] * batch
        if not any(slots):
            return None
        return jnp.asarray(slots, jnp.int32)

    def _bias_row_np(self, logit_bias) -> np.ndarray:
        """{token_id: bias} → [V] f32 row (validated) — the ONE builder
        every logit_bias consumer uses (engine + scheduler paths)."""
        V = self.cfg.vocab_size
        row = np.zeros((V,), np.float32)
        for t, b in (logit_bias or {}).items():
            t = int(t)
            if not 0 <= t < V:
                raise ValueError(f"logit_bias token id {t} out of range "
                                 f"[0, {V})")
            row[t] = float(b)
        return row

    def _bias_rows(self, logit_bias, batch: int):
        """{token_id: bias} → [B, V] f32 bias array (same row broadcast),
        or None when unset. Out-of-range ids are rejected."""
        if not logit_bias:
            return None
        row = self._bias_row_np(logit_bias)
        return jnp.broadcast_to(jnp.asarray(row),
                                (batch, self.cfg.vocab_size))

    def _fwd_for(self, cache) -> Callable:
        from llm_inference_tpu.ops.paged_kvcache import PagedKVCache
        if isinstance(cache, PagedKVCache):
            return self.paged_forward()
        return self._fwd

    # ------------------------------------------------------------------
    # compiled programs
    # ------------------------------------------------------------------

    def _prefill_fn(self, params, ids, positions, cache, last_idx,
                    adapter_idx=None):
        fwd = self._fwd_for(cache)
        if adapter_idx is None:
            return fwd(params, ids, positions, cache, last_idx)
        return fwd(params, ids, positions, cache, last_idx, adapter_idx)

    @staticmethod
    def _gen_penalized(gen: GenerationConfig) -> bool:
        return (getattr(gen, "repetition_penalty", 1.0) != 1.0
                or getattr(gen, "presence_penalty", 0.0) != 0.0
                or getattr(gen, "frequency_penalty", 0.0) != 0.0)

    def _decode_chunk_fn(self, params, cache, token, pos, key,
                         counts=None, seen=None, aidx=None, bias=None, *,
                         steps: int, gen: GenerationConfig):
        """scan `steps` decode iterations on device; returns sampled tokens.
        When gen carries penalties, [B, V] output-count + seen state rides
        the scan as donated carry (see _decode_chunk_rows_fn); `aidx` is
        the per-row LoRA adapter slot (multi-LoRA serving); `bias` a
        [B, V] logit bias (gen.logit_bias) shaping selection but not the
        reported logprobs."""
        B = token.shape[0]
        zeros = jnp.zeros((B,), jnp.int32)
        rows = jnp.arange(B)
        use_pen = self._gen_penalized(gen)
        fwd = self._fwd_for(cache)

        def body(carry, _):
            cache, token, pos, key, counts, seen = carry
            key, sub = jax.random.split(key)
            fargs = (() if aidx is None else (aidx,))
            logits, cache = fwd(params, token[:, None], pos[:, None],
                                cache, zeros, *fargs)
            pl = logits if bias is None else logits + bias
            if use_pen:
                pl = sampling.apply_penalties(
                    pl, counts, seen,
                    jnp.full((B,), gen.repetition_penalty, jnp.float32),
                    jnp.full((B,), gen.presence_penalty, jnp.float32),
                    jnp.full((B,), gen.frequency_penalty, jnp.float32))
            nxt = sampling.sample(pl, sub,
                                  temperature=gen.temperature,
                                  top_k=gen.top_k, top_p=gen.top_p,
                                  greedy=gen.greedy,
                                  min_p=getattr(gen, "min_p", 0.0))
            lp = sampling.chosen_logprob(logits, nxt)
            if use_pen:
                counts = counts.at[rows, nxt].add(1)
                seen = seen.at[rows, nxt].set(True)
            return (cache, nxt, pos + 1, key, counts, seen), (nxt, lp)

        (cache, token, pos, key, counts, seen), (toks, lps) = jax.lax.scan(
            body, (cache, token, pos, key, counts, seen), None,
            length=steps)
        # toks/lps: [B, steps]
        return toks.T, lps.T, cache, token, pos, key, counts, seen

    def _get_decode_jit(self, steps: int, gen: GenerationConfig,
                        use_bias: bool = False):
        key = (steps, gen.temperature, gen.top_k, gen.top_p, gen.greedy,
               getattr(gen, "min_p", 0.0),
               getattr(gen, "repetition_penalty", 1.0),
               getattr(gen, "presence_penalty", 0.0),
               getattr(gen, "frequency_penalty", 0.0), use_bias)
        fn = self._decode_jits.get(key)
        if fn is None:
            donate = (1,) + ((5, 6) if self._gen_penalized(gen) else ())
            fn = jax.jit(
                functools.partial(self._decode_chunk_fn, steps=steps,
                                  gen=gen),
                donate_argnums=donate)
            self._decode_jits[key] = fn
        return fn

    def _decode_chunk_rows_fn(self, params, cache, token, pos, key,
                              temp, topk, topp, greedy, minp, seeds,
                              counts=None, seen=None, rep=None, pres=None,
                              freq=None, aidx=None, bias=None,
                              gmask=None, gtrans=None, cidx=None,
                              dstate=None, *,
                              steps: int, max_top_k: int,
                              use_top_p: bool = True,
                              use_min_p: bool = False,
                              use_penalties: bool = False,
                              seeded: bool = False,
                              top_n: int = 0):
        """Like _decode_chunk_fn, but sampling knobs are PER-ROW runtime
        arrays (continuous batching mixes per-request configs in one
        program — ops/sampling.sample_per_row).

        seeded=True derives each row's noise from fold_in(PRNGKey(seed),
        next position) instead of the shared chunk key — draws depend only
        on (request seed, position), so a request's continuation is
        reproducible regardless of batch-mates (and preemption replay is
        byte-identical — scheduler._preempt relies on it).
        use_penalties threads [B, V] output-token counts + prompt∪output
        seen masks through the scan as donated carry; sampled tokens
        update them on device.

        `bias` is a per-row [B, V] logit bias (OpenAI logit_bias).
        Guided decoding (engine/guided.py): `gmask`/`gtrans` are the
        stacked [C, S, V] DFA allow/transition tables, `cidx` each row's
        constraint index and `dstate` its DFA state (-1 = unconstrained);
        the state rides the scan carry and transitions ON DEVICE — no
        per-token host round trip."""
        B = token.shape[0]
        zeros = jnp.zeros((B,), jnp.int32)
        rows = jnp.arange(B)
        fwd = self._fwd_for(cache)

        def body(carry, _):
            cache, token, pos, key, counts, seen, dstate = carry
            if seeded:
                sub = sampling.row_keys(seeds, pos + 1)
            else:
                key, sub = jax.random.split(key)
            fargs = (() if aidx is None else (aidx,))
            logits, cache = fwd(params, token[:, None], pos[:, None],
                                cache, zeros, *fargs)
            pen = ((counts, seen, rep, pres, freq) if use_penalties
                   else None)
            allowed = None
            if gmask is not None:
                st = jnp.maximum(dstate, 0)
                allowed = gmask[cidx, st] | (dstate < 0)[:, None]
            nxt = sampling.sample_per_row(
                logits, sub, temp, topk, topp, greedy, max_top_k,
                use_top_p, min_p=(minp if use_min_p else None),
                penalties=pen, bias=bias, allowed=allowed)
            lp = sampling.chosen_logprob(logits, nxt)
            tv, ti = (sampling.top_logprobs(logits, top_n) if top_n > 0
                      else (None, None))
            if use_penalties:
                counts = counts.at[rows, nxt].add(1)
                seen = seen.at[rows, nxt].set(True)
            if gmask is not None:
                ns = gtrans[cidx, jnp.maximum(dstate, 0),
                            nxt].astype(jnp.int32)
                dstate = jnp.where(dstate >= 0, ns, dstate)
            return ((cache, nxt, pos + 1, key, counts, seen, dstate),
                    (nxt, lp, tv, ti))

        ((cache, token, pos, key, counts, seen, dstate),
         (toks, lps, tvs, tis)) = jax.lax.scan(
            body, (cache, token, pos, key, counts, seen, dstate), None,
            length=steps)
        # tvs/tis: [steps, B, n] -> [B, steps, n]
        if top_n > 0:
            tvs, tis = tvs.transpose(1, 0, 2), tis.transpose(1, 0, 2)
        return (toks.T, lps.T, cache, token, pos, key, counts, seen,
                tvs, tis, dstate)

    def _get_decode_rows_jit(self, steps: int, max_top_k: int = 64,
                             use_top_p: bool = True,
                             use_min_p: bool = False,
                             use_penalties: bool = False,
                             seeded: bool = False,
                             top_n: int = 0,
                             use_bias: bool = False,
                             guided: bool = False):
        key = ("rows", steps, max_top_k, use_top_p, use_min_p,
               use_penalties, seeded, top_n, use_bias, guided)
        fn = self._decode_jits.get(key)
        if fn is None:
            donate = (1,) + ((11, 12) if use_penalties else ())
            fn = jax.jit(
                functools.partial(self._decode_chunk_rows_fn, steps=steps,
                                  max_top_k=max_top_k,
                                  use_top_p=use_top_p,
                                  use_min_p=use_min_p,
                                  use_penalties=use_penalties,
                                  seeded=seeded, top_n=top_n),
                donate_argnums=donate)
            self._decode_jits[key] = fn
        return fn

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    @property
    def data_parallel(self) -> int:
        """Data-axis size of the mesh (1 when unsharded) — batch dimensions
        fed to this engine must be divisible by it."""
        if self.mesh is not None and "data" in self.mesh.shape:
            return self.mesh.shape["data"]
        return 1

    def new_cache(self, batch: int, max_seq: Optional[int] = None):
        # families with non-standard cache layouts (deepseek's MLA latent
        # cache) provide their own constructor
        model_nc = getattr(self._model, "new_cache", None)
        if model_nc is not None:
            cache = model_nc(self.cfg, batch,
                             max_seq or self.engine_cfg.max_seq_len,
                             self.cache_dtype)
        else:
            cache = kvcache.init_cache(
                self.cfg.num_layers, batch, self.cfg.num_kv_heads,
                max_seq or self.engine_cfg.max_seq_len, self.cfg.head_dim,
                self.cache_dtype)
        return self._shard_cache(cache)

    def _bucket(self, n: int) -> int:
        for b in self.engine_cfg.prefill_buckets:
            # a bucket wider than the cache would write past max_seq_len
            if n <= b <= self.engine_cfg.max_seq_len:
                return b
        return n  # beyond the largest (valid) bucket: compile exactly

    def prefill_cache_len(self, n: int) -> int:
        """Smallest cache extent that admits an n-token prompt through the
        chunked `prefill` path with every bucket-rounded write window in
        bounds. For prompts beyond the largest bucket, prefill runs
        largest-bucket chunks whose LAST window is bucket-rounded — a cache
        sized at `_bucket(n)` (= n exactly in that regime) is too short for
        that window, and the dynamic_update_slice start would clamp and
        overwrite committed KV. Used by scheduler admission to size its
        prompt-local prefill caches."""
        fitting = [b for b in self.engine_cfg.prefill_buckets
                   if b <= self.engine_cfg.max_seq_len]
        chunk = max(fitting) if fitting else self.engine_cfg.max_seq_len
        if n <= chunk:
            return min(self._bucket(n), self.engine_cfg.max_seq_len)
        last_o = ((n - 1) // chunk) * chunk
        return min(last_o + self._bucket(n - last_o),
                   self.engine_cfg.max_seq_len)

    def _encode_prompts(self, prompts) -> List[List[int]]:
        out = []
        for p in prompts:
            if isinstance(p, str):
                if self.tokenizer is None:
                    raise ValueError("string prompts need a tokenizer")
                out.append(list(self.tokenizer.encode(p)))
            else:
                out.append(list(p))
        return out

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def prefill(self, token_lists: List[List[int]], cache=None,
                start_positions: Optional[Sequence[int]] = None,
                adapter_idx: Optional[jnp.ndarray] = None):
        """Run prefill for a batch of prompts (optionally continuing an
        existing cache at per-sequence offsets). Returns (logits, cache)."""
        B = len(token_lists)
        starts = list(start_positions or [0] * B)
        longest = max(len(t) + s for t, s in zip(token_lists, starts))
        if longest > self.engine_cfg.max_seq_len:
            raise ValueError(
                f"prompt needs {longest} cache slots but max_seq_len is "
                f"{self.engine_cfg.max_seq_len} — raise EngineConfig."
                f"max_seq_len (a dynamic_update_slice would silently clamp "
                f"and corrupt the cache tail)")
        if cache is None:
            cache = self.new_cache(B)
        # a caller-provided cache may be smaller than max_seq_len (scheduler
        # admission sizes it at the prompt bucket) — every write window must
        # stay inside ITS extent, or the dynamic_update_slice start clamps
        # and overwrites committed KV
        extent = min(self.engine_cfg.max_seq_len,
                     getattr(cache, "max_seq_len", None)
                     or self.engine_cfg.max_seq_len)
        if longest > extent:
            raise ValueError(
                f"prompt needs {longest} cache slots but the provided cache "
                f"extent is {extent}")

        # prompts longer than the largest bucket run as a SEQUENCE of
        # largest-bucket chunks continuing the same cache (the forward's
        # absolute-position masks make history attendance automatic) — this
        # bounds both the jit-compile set and prefill peak memory for
        # arbitrarily long prompts (the reference has no such path at all:
        # its buffers are hard-sized, llama.cpp:27).
        fitting = [b for b in self.engine_cfg.prefill_buckets
                   if b <= self.engine_cfg.max_seq_len]
        # no bucket fits a small max_seq_len: chunk at max_seq_len itself
        chunk = max(fitting) if fitting else self.engine_cfg.max_seq_len
        n_chunks = (max(len(t) for t in token_lists) + chunk - 1) // chunk
        final_np = None                        # multi-chunk: per-row logits
        for c in range(n_chunks):
            o = c * chunk
            part = [t[o:o + chunk] for t in token_lists]
            need = max(max(len(p) for p in part), 1)
            # cap the bucketed width at the remaining cache: the write
            # window is shared across rows, and a window crossing the cache
            # extent would clamp its dynamic_update_slice start and
            # overwrite committed KV (the longest-fits check above bounds
            # the TOKENS, not the rounded-up bucket)
            T = min(self._bucket(need), extent - o - max(starts))
            if T < need:
                raise ValueError(
                    f"prefill chunk needs {need} slots but only {T} fit "
                    f"before max_seq_len for the largest start offset — "
                    f"heterogeneous start_positions too close to the "
                    f"cache end")
            ids = np.zeros((B, T), np.int32)
            pos = np.zeros((B, T), np.int32)
            last = np.zeros((B,), np.int32)
            for i, toks in enumerate(part):
                ids[i, :len(toks)] = toks
                pos[i] = starts[i] + o + np.arange(T)
                last[i] = max(len(toks) - 1, 0)
            logits, cache = self._prefill_jit(self.params, jnp.asarray(ids),
                                              jnp.asarray(pos), cache,
                                              jnp.asarray(last),
                                              adapter_idx)
            if n_chunks > 1:
                # capture logits for rows whose prompt ENDED in this chunk
                lg = np.asarray(logits)
                if final_np is None:
                    final_np = lg.copy()
                for i, t in enumerate(token_lists):
                    if o < len(t) <= o + chunk:
                        final_np[i] = lg[i]
        if final_np is not None:
            logits = jnp.asarray(final_np)
        return logits, cache

    def _score_fn(self, params, ids, positions, targets, cache):
        """One scoring chunk: log P(targets[b,t] | prefix) for every
        position, from a single logits_mode=\"all\" forward. Targets ride
        as an explicit array so chunk boundaries need no logit stitching
        (the prediction for a chunk's first token uses the previous
        chunk's cache, not its logits)."""
        logits, cache = self._model.forward(
            self.cfg, params, ids, positions, cache, logits_mode="all")
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.take_along_axis(
            lp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return out, cache

    def score(self, prompts: Sequence[Union[str, Sequence[int]]]
              ) -> List[List[Optional[float]]]:
        """Per-token PROMPT logprobs: result[i][t] = log P(token t | tokens
        <t) under the model; the first token has no prediction (None).
        The OpenAI `echo`/`max_tokens=0` scoring mode and vLLM
        `prompt_logprobs` — the reference has no scoring path at all (its
        only full-sequence logits ever computed are discarded,
        llama.cpp:219-225 takes the last token only). Long prompts run as
        bucketed chunks continuing one cache, like prefill. Over a mesh
        the forward is the shard_map program (rows padded to the data
        axis); the [B,T] logprob gather runs on the replicated logits."""
        token_lists = self._encode_prompts(prompts)
        n_rows = len(token_lists)
        dp = self.data_parallel
        if n_rows % dp:                      # pad batch to the data axis
            token_lists = token_lists + [token_lists[-1]] * (
                dp - n_rows % dp)
        B = len(token_lists)
        lengths = [len(t) for t in token_lists]
        longest = max(lengths)
        if longest > self.engine_cfg.max_seq_len:
            raise ValueError(
                f"prompt needs {longest} cache slots but max_seq_len is "
                f"{self.engine_cfg.max_seq_len}")
        if self._score_jit is None:
            if self._sharded:
                from llm_inference_tpu.parallel import sharding as _sh
                raw = _sh.sharded_forward(
                    self.cfg, self.mesh, self.params, logits_mode="all",
                    jit=False, cache_bits=self._kv_bits)
                if self.has_lora:
                    raw = self._with_default_adapter(raw)

                def _fn(params, ids, positions, targets, cache):
                    logits, cache = raw(
                        params, ids, positions, cache,
                        jnp.zeros((ids.shape[0],), jnp.int32))
                    lp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                            axis=-1)
                    out = jnp.take_along_axis(
                        lp, targets[..., None].astype(jnp.int32),
                        axis=-1)[..., 0]
                    return out, cache

                self._score_jit = jax.jit(_fn, donate_argnums=(4,))
            else:
                self._score_jit = jax.jit(self._score_fn,
                                          donate_argnums=(4,))
        cache = self.new_cache(B)
        fitting = [b for b in self.engine_cfg.prefill_buckets
                   if b <= self.engine_cfg.max_seq_len]
        chunk = max(fitting) if fitting else self.engine_cfg.max_seq_len
        n_chunks = (longest + chunk - 1) // chunk
        got = np.zeros((B, max(longest, 1)), np.float32)
        for c in range(n_chunks):
            o = c * chunk
            part = [t[o:o + chunk] for t in token_lists]
            # cap the bucket at the remaining cache: a window past
            # max_seq_len would CLAMP its dynamic_update_slice start and
            # overwrite committed KV (positions ≤ S is already checked,
            # but the bucket rounds the width UP)
            T = min(self._bucket(max(max(len(p) for p in part), 1)),
                    self.engine_cfg.max_seq_len - o)
            ids = np.zeros((B, T), np.int32)
            pos = np.zeros((B, T), np.int32)
            tgt = np.zeros((B, T), np.int32)
            for i, toks in enumerate(token_lists):
                p = part[i]
                ids[i, :len(p)] = p
                pos[i] = o + np.arange(T)
                nxt = toks[o + 1:o + T + 1]
                tgt[i, :len(nxt)] = nxt
            lpb, cache = self._score_jit(self.params, jnp.asarray(ids),
                                         jnp.asarray(pos), jnp.asarray(tgt),
                                         cache)
            lpb = np.asarray(lpb)
            w = min(T, longest - o)
            got[:, o:o + w] = lpb[:, :w]
        out: List[List[Optional[float]]] = []
        for i, L in enumerate(lengths[:n_rows]):   # drop dp padding rows
            # got[i, t] = log P(ids[t+1] | ids[..t]) → shift right by one
            if L == 0:
                out.append([])
            else:
                out.append([None] + [float(x) for x in got[i, :L - 1]])
        return out

    def embed(self, prompts: Sequence[Union[str, Sequence[int]]],
              pooling: str = "last") -> List[List[float]]:
        """Final-norm hidden-state embeddings per prompt ([hidden] each,
        L2-normalized): pooling "last" takes the final token's state (the
        decoder-LM convention), "mean" averages over the prompt. The
        OpenAI /v1/embeddings surface — no reference analogue (the
        reference exposes generation only)."""
        if pooling not in ("last", "mean"):
            raise ValueError(f"pooling must be last|mean, got {pooling!r}")
        token_lists = self._encode_prompts(prompts)
        n_rows = len(token_lists)
        dp = self.data_parallel
        if n_rows % dp:                      # pad batch to the data axis
            token_lists = token_lists + [token_lists[-1]] * (
                dp - n_rows % dp)
        B = len(token_lists)
        lengths = [len(t) for t in token_lists]
        if min(lengths[:n_rows]) == 0:
            raise ValueError("cannot embed an empty prompt")
        T = self._bucket(max(lengths))
        if T > self.engine_cfg.max_seq_len:
            raise ValueError(f"prompt needs {T} slots but max_seq_len is "
                             f"{self.engine_cfg.max_seq_len}")
        if self._embed_jit is None:
            if self._sharded:
                # hidden states come back replicated over the tensor axis
                # (sharded over data only); the pooling/normalization below
                # runs on the full [B, T, H] outside the shard_map
                from llm_inference_tpu.parallel import sharding as _sh
                raw = _sh.sharded_forward(
                    self.cfg, self.mesh, self.params, logits_mode="hidden",
                    jit=False, cache_bits=self._kv_bits)
                if self.has_lora:
                    raw = self._with_default_adapter(raw)

                def hidden_fn(params, ids, positions, cache, last_idx):
                    h, _ = raw(params, ids, positions, cache, last_idx)
                    return h
            else:
                def hidden_fn(params, ids, positions, cache, last_idx):
                    h, _ = self._model.forward(self.cfg, params, ids,
                                               positions, cache,
                                               logits_mode="hidden")
                    return h

            def _fn(params, ids, positions, mask, last_idx, cache,
                    mean: bool):
                h = hidden_fn(params, ids, positions, cache,
                              last_idx).astype(jnp.float32)
                if mean:
                    m = mask[..., None].astype(jnp.float32)
                    v = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
                else:
                    v = h[jnp.arange(h.shape[0]), last_idx]
                return v / jnp.maximum(
                    jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
            # no cache donation: the cache is not among the outputs, so
            # XLA can't alias it (it would only warn)
            self._embed_jit = jax.jit(_fn, static_argnames=("mean",))
        ids = np.zeros((B, T), np.int32)
        mask = np.zeros((B, T), bool)
        last = np.zeros((B,), np.int32)
        for i, toks in enumerate(token_lists):
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = True
            last[i] = len(toks) - 1
        pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
        cache = self.new_cache(B, max_seq=T)
        out = self._embed_jit(self.params, jnp.asarray(ids),
                              jnp.asarray(pos), jnp.asarray(mask),
                              jnp.asarray(last), cache,
                              mean=(pooling == "mean"))
        return [[float(x) for x in row]
                for row in np.asarray(out)[:n_rows]]   # drop dp padding

    def generate(self,
                 prompts: Sequence[Union[str, Sequence[int]]],
                 gen: Optional[GenerationConfig] = None,
                 stream: Optional[Callable[[int, int, str], None]] = None,
                 adapter=None,
                 ) -> List[GenerationResult]:
        """Batch generation. `stream(row, token_id, text_piece)` is called as
        tokens arrive (the reference's CallBack, basemodel.h:12).

        `adapter` selects a resident LoRA adapter (multi-LoRA serving):
        a name/slot applied to every row, or one name/slot per prompt."""
        gen = gen or GenerationConfig()
        token_lists = self._encode_prompts(prompts)
        B = len(token_lists)
        aidx = self._adapter_rows(adapter, B)
        bias = self._bias_rows(getattr(gen, "logit_bias", None), B)
        lengths = np.array([len(t) for t in token_lists], np.int32)
        need = int(lengths.max()) + gen.max_new_tokens
        if need > self.engine_cfg.max_seq_len:
            raise ValueError(
                f"prompt + max_new_tokens needs {need} cache slots but "
                f"max_seq_len is {self.engine_cfg.max_seq_len} — decode "
                f"writes past the end would silently clamp and corrupt")
        eos = set(gen.eos_token_ids)

        t0 = time.perf_counter()
        logits, cache = self.prefill(token_lists, adapter_idx=aidx)
        key = jax.random.PRNGKey(gen.seed)
        key, sub = jax.random.split(key)
        use_pen = self._gen_penalized(gen)
        counts = seen = None
        plogits = logits if bias is None else logits + bias
        if use_pen:
            V = self.cfg.vocab_size
            seen0 = np.zeros((B, V), bool)
            for i, toks in enumerate(token_lists):
                seen0[i, np.asarray(toks, np.int64) % V] = True
            counts = jnp.zeros((B, V), jnp.int32)
            seen = jnp.asarray(seen0)
            plogits = sampling.apply_penalties(
                plogits, counts, seen,
                jnp.full((B,), gen.repetition_penalty, jnp.float32),
                jnp.full((B,), gen.presence_penalty, jnp.float32),
                jnp.full((B,), gen.frequency_penalty, jnp.float32))
        first = sampling.sample(plogits, sub, temperature=gen.temperature,
                                top_k=gen.top_k, top_p=gen.top_p,
                                greedy=gen.greedy,
                                min_p=getattr(gen, "min_p", 0.0))
        if use_pen:
            rows = jnp.arange(B)
            counts = counts.at[rows, first].add(1)
            seen = seen.at[rows, first].set(True)
        first_np = np.asarray(first)
        ttft = time.perf_counter() - t0
        self.metrics.observe("ttft_s", ttft)

        results = [[int(first_np[i])] for i in range(B)]
        finished = np.array([int(first_np[i]) in eos for i in range(B)])
        if stream is not None:
            for i in range(B):
                if not finished[i]:
                    self._stream_one(stream, i, int(first_np[i]))

        token = first
        pos = jnp.asarray(lengths)            # next write position per row
        chunk = max(1, self.engine_cfg.decode_chunk)
        produced = 1
        t_dec = time.perf_counter()
        decoded = 0
        while produced < gen.max_new_tokens and not finished.all():
            steps = min(chunk, gen.max_new_tokens - produced)
            fn = self._get_decode_jit(steps, gen,
                                      use_bias=bias is not None)
            toks, _lps, cache, token, pos, key, counts, seen = fn(
                self.params, cache, token, pos, key, counts, seen, aidx,
                bias)
            toks_np = np.asarray(toks)        # [B, steps]
            for i in range(B):
                for j in range(steps):
                    if finished[i]:
                        break
                    t = int(toks_np[i, j])
                    results[i].append(t)
                    decoded += 1              # only DELIVERED tokens count
                    if t in eos:
                        finished[i] = True
                    elif stream is not None:
                        self._stream_one(stream, i, t)
            produced += steps
        dt = time.perf_counter() - t_dec
        tps = decoded / dt if dt > 0 else 0.0
        self.metrics.observe("decode_tokens_per_s", tps)

        out = []
        for i in range(B):
            ids = results[i]
            fin = any(t in eos for t in ids)
            if fin:
                ids = ids[:next(j for j, t in enumerate(ids) if t in eos)]
            text = self.tokenizer.decode(ids) if self.tokenizer else ""
            out.append(GenerationResult(token_ids=ids, text=text,
                                        ttft_s=ttft,
                                        decode_tokens_per_s=tps,
                                        finished=fin))
        return out

    def _stream_one(self, stream, row, token_id):
        piece = (self.tokenizer.decode_token(token_id)
                 if self.tokenizer else "")
        stream(row, token_id, piece)


class ChatSession:
    """Multi-round chat holding the KV cache across rounds — the reference
    re-tokenizes and re-prefills the whole history each round (MakeHistory,
    llama.cpp's MakeInput); here history stays resident in the cache and each
    round only prefills the new turn."""

    def __init__(self, engine: InferenceEngine,
                 template: Optional[Callable[[str, int], str]] = None,
                 adapter=None):
        self.engine = engine
        self.template = template or chat_template_for(engine.cfg.name)
        # one adapter per session: the resident KV was produced under it,
        # so switching adapters means starting a new session
        self._aidx = engine._adapter_rows(adapter, 1)
        self.cache = None
        self.pos = 0          # next unwritten cache slot / absolute position
        self.round = 0
        self._pending: List[int] = []   # sampled but never forwarded tokens
        self._seen_ids: set = set()     # full history (repetition scope)

    def ask(self, user_text: str, gen: Optional[GenerationConfig] = None,
            stream: Optional[Callable[[str], None]] = None) -> str:
        eng = self.engine
        gen = gen or GenerationConfig()
        prompt = self.template(user_text, self.round)
        toks = (self._pending
                + eng.tokenizer.encode(prompt, add_bos=(self.round == 0)))
        self._pending = []
        need = self.pos + len(toks) + gen.max_new_tokens
        if need > eng.engine_cfg.max_seq_len:
            raise ValueError(
                f"chat history + turn + max_new_tokens needs {need} cache "
                f"slots but max_seq_len is {eng.engine_cfg.max_seq_len} — "
                f"start a new session or raise max_seq_len")
        if self.cache is None:
            self.cache = eng.new_cache(1)

        logits, self.cache = eng.prefill([toks], cache=self.cache,
                                         start_positions=[self.pos],
                                         adapter_idx=self._aidx)
        self.pos += len(toks)
        key = jax.random.PRNGKey(gen.seed + self.round)
        key, sub = jax.random.split(key)
        use_pen = eng._gen_penalized(gen)
        bias = eng._bias_rows(getattr(gen, "logit_bias", None), 1)
        counts = seen = None
        if bias is not None:
            logits = logits + bias
        if use_pen:
            # repetition scope: the WHOLE resident chat history; presence/
            # frequency scope: this round's completion (fresh counts)
            self._seen_ids.update(toks)
            V = eng.cfg.vocab_size
            seen0 = np.zeros((1, V), bool)
            seen0[0, np.asarray(sorted(self._seen_ids), np.int64) % V] = True
            counts = jnp.zeros((1, V), jnp.int32)
            seen = jnp.asarray(seen0)
            rep1 = jnp.full((1,), gen.repetition_penalty, jnp.float32)
            pres1 = jnp.full((1,), gen.presence_penalty, jnp.float32)
            freq1 = jnp.full((1,), gen.frequency_penalty, jnp.float32)
            plogits = sampling.apply_penalties(logits, counts, seen,
                                               rep1, pres1, freq1)
        else:
            plogits = logits
        token = sampling.sample(plogits, sub, temperature=gen.temperature,
                                top_k=gen.top_k, top_p=gen.top_p,
                                greedy=gen.greedy,
                                min_p=getattr(gen, "min_p", 0.0))
        if use_pen:
            counts = counts.at[0, token[0]].add(1)
            seen = seen.at[0, token[0]].set(True)
        eos = set(gen.eos_token_ids)

        out_ids: List[int] = []
        cur = int(token[0])           # sampled, not yet forwarded
        pos = jnp.asarray([self.pos], jnp.int32)
        chunk = max(1, eng.engine_cfg.decode_chunk)
        ended_by_eos = cur in eos
        while not ended_by_eos and len(out_ids) + 1 < gen.max_new_tokens:
            out_ids.append(cur)       # about to be forwarded by the chunk
            if stream is not None:
                stream(eng.tokenizer.decode_token(cur))
            steps = min(chunk, gen.max_new_tokens - len(out_ids))
            fn = eng._get_decode_jit(steps, gen,
                                     use_bias=bias is not None)
            toks_d, _lps, self.cache, token, pos, key, counts, seen = fn(
                eng.params, self.cache, token, pos, key, counts, seen,
                self._aidx, bias)
            self.pos += 1             # `cur` is now in the cache...
            chunk_toks = np.asarray(toks_d)[0]
            # ...and all but the last sampled token of the chunk are too
            for j, t in enumerate(chunk_toks):
                cur = int(t)
                is_last = j == len(chunk_toks) - 1
                if cur in eos:
                    ended_by_eos = True
                    break
                if not is_last:
                    out_ids.append(cur)
                    self.pos += 1
                    if stream is not None:
                        stream(eng.tokenizer.decode_token(cur))
        if not ended_by_eos and cur not in eos:
            # last sampled token was never forwarded: emit it, but its KV is
            # not in the cache — carry it into the next round's prefill
            out_ids.append(cur)
            if stream is not None:
                stream(eng.tokenizer.decode_token(cur))
            self._pending = [cur]
        self.round += 1
        self._seen_ids.update(out_ids)
        return eng.tokenizer.decode(out_ids)


def llama2_chat_template(user_text: str, round_idx: int) -> str:
    """LLaMA-2-chat prompt format (equivalent of the reference's MakeInput
    history splicing, src/models/basemodel.h:24-33)."""
    return f"[INST] {user_text} [/INST]"


def gemma_chat_template(user_text: str, round_idx: int) -> str:
    """Gemma instruction format (<start_of_turn> markers)."""
    return (f"<start_of_turn>user\n{user_text}<end_of_turn>\n"
            f"<start_of_turn>model\n")


def llama3_chat_template(user_text: str, round_idx: int) -> str:
    """LLaMA-3-instruct header format (<|start_header_id|> markers)."""
    return ("<|start_header_id|>user<|end_header_id|>\n\n"
            f"{user_text}<|eot_id|>"
            "<|start_header_id|>assistant<|end_header_id|>\n\n")


def chatml_chat_template(user_text: str, round_idx: int) -> str:
    """ChatML (<|im_start|> markers) — the Qwen family's format."""
    return (f"<|im_start|>user\n{user_text}<|im_end|>\n"
            "<|im_start|>assistant\n")


def phi3_chat_template(user_text: str, round_idx: int) -> str:
    """Phi-3 instruct format (<|user|> / <|assistant|> with <|end|>)."""
    return f"<|user|>\n{user_text}<|end|>\n<|assistant|>\n"


def chat_template_for(model_name: str):
    """Per-family chat template (ChatSession default selection).
    Mistral/Mixtral instruct use the [INST] format like LLaMA-2."""
    head = model_name.split("-")[0].lower()
    if head.startswith("gemma"):
        return gemma_chat_template
    if head.startswith("llama3") or head.startswith("llama-3"):
        return llama3_chat_template
    if head.startswith("qwen"):
        return chatml_chat_template
    if head.startswith("phi3"):
        return phi3_chat_template
    return llama2_chat_template


def format_chat_messages(messages: Sequence[dict],
                         model_name: str = "") -> str:
    """Render an OpenAI-style message list as the target family's chat
    prompt — the stateless-endpoint counterpart of ChatSession's
    per-round template. LLaMA-2/Mistral: [INST]...[/INST] with the
    <<SYS>> block folded into the first user turn; LLaMA-3: header
    markers; Qwen: ChatML; Gemma: start_of_turn markers (system folded
    into the first user turn — gemma has no system role)."""
    head = (model_name or "").split("-")[0].lower()
    if head.startswith("llama3") or head.startswith("llama-3"):
        out = []
        for m in messages:
            out.append(f"<|start_header_id|>{m['role']}<|end_header_id|>"
                       f"\n\n{m['content']}<|eot_id|>")
        out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        return "".join(out)
    if head.startswith("qwen"):
        out = []
        for m in messages:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}"
                       f"<|im_end|>\n")
        out.append("<|im_start|>assistant\n")
        return "".join(out)
    if head.startswith("phi3"):
        out = []
        for m in messages:
            out.append(f"<|{m['role']}|>\n{m['content']}<|end|>\n")
        out.append("<|assistant|>\n")
        return "".join(out)
    if head.startswith("gemma"):
        out = []
        system = ""
        for m in messages:
            if m["role"] == "system":
                system = m["content"] + "\n\n"
                continue
            role = "model" if m["role"] == "assistant" else "user"
            body = (system + m["content"]) if role == "user" else \
                m["content"]
            system = ""
            out.append(f"<start_of_turn>{role}\n{body}<end_of_turn>\n")
        out.append("<start_of_turn>model\n")
        return "".join(out)
    system = ""
    turns: List[str] = []
    pending_user: Optional[str] = None
    for m in messages:
        role, content = m["role"], m["content"]
        if role == "system":
            system = content
        elif role == "user":
            pending_user = (content if pending_user is None
                            else pending_user + "\n" + content)
        elif role == "assistant":
            u = pending_user or ""
            turns.append(f"[INST] {u} [/INST] {content}")
            pending_user = None
    final_user = pending_user or ""
    if system:
        final_sys = f"<<SYS>>\n{system}\n<</SYS>>\n\n"
        if turns:
            turns[0] = ("[INST] " + final_sys
                        + turns[0][len("[INST] "):])
        else:
            final_user = final_sys + final_user
    turns.append(f"[INST] {final_user} [/INST]")
    return " ".join(turns)
