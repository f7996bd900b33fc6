"""Beam-search decoding.

The reference ships a dedicated two-round top-K reduction named
`launchTopKforBeamSearch` (reference: src/kernels/topK.cu:25-191) but
hard-wires beamwidth=1 (src/models/llama/llama.h:37), so its "beam search"
degenerates to top-K sampling. This is the real thing, TPU-native:

- Beams ride the BATCH axis of the existing decode program: one jitted step
  runs the forward for all W beams at once, takes top-W over the flattened
  [W·V] cumulative log-probs on device (`jax.lax.top_k` ≈ the reference's
  two-round cub reduction, which XLA implements for us), and reorders the
  KV cache rows by parent beam with a batch-axis gather.
- Finished beams (EOS) are frozen on device: their score stops accumulating
  and they keep competing in the top-W (standard "beam survives until
  outscored" semantics); host-side bookkeeping reconstructs sequences.
- The cache-row gather on reorder is a real HBM copy per step — inherent to
  beam search with a contiguous cache (vLLM pays a page-table copy instead);
  at W ≤ 8 it is small next to the weight stream.

Scoring: sum of token log-probs, with optional GNMT length normalization
score / ((5 + len) / 6)^alpha at finalization.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e30)


@dataclasses.dataclass
class BeamHypothesis:
    token_ids: List[int]          # generated tokens (EOS excluded)
    score: float                  # length-normalized cumulative log-prob
    log_prob: float               # raw cumulative log-prob
    finished: bool                # ended with EOS


class BeamSearchDecoder:
    """Greedy-deterministic beam search over an InferenceEngine.

    One prompt at a time (the W beams occupy the batch axis). Length
    generalization to batched beam search is a batch·W reshape away but the
    serving scheduler has no beam-quality requirement, so this stays the
    reference-parity surface.
    """

    def __init__(self, engine, beam_width: int = 4,
                 length_penalty: float = 0.0,
                 eos_token_ids: Optional[Sequence[int]] = None):
        if beam_width < 1:
            raise ValueError("beam_width must be >= 1")
        self.engine = engine
        self.W = beam_width
        self.length_penalty = length_penalty
        self.eos = tuple(eos_token_ids if eos_token_ids is not None
                         else (2,))
        self._step_jit = jax.jit(
            functools.partial(self._step, eos=self.eos),
            donate_argnums=(1,))
        self._expand_jit = jax.jit(
            lambda c: jax.tree.map(lambda a: jnp.repeat(a, self.W, axis=1),
                                   c))

    # ------------------------------------------------------------------

    def _step(self, params, cache, tokens, pos, scores, finished, *, eos):
        """One device step for all W beams.

        tokens/scores/finished: [W]; pos: [W] (all equal). Returns the
        reordered cache, the chosen tokens, their parent beams, and the
        updated scores/finished."""
        W = tokens.shape[0]
        logits, cache = self.engine._fwd(
            params, tokens[:, None], pos[:, None], cache,
            jnp.zeros((W,), jnp.int32))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        cand = scores[:, None] + logp                       # [W, V]
        # frozen beams contribute exactly ONE candidate (column 0, frozen
        # score) so they keep competing without fanning out
        cand = jnp.where(finished[:, None], _NEG, cand)
        cand = cand.at[:, 0].set(jnp.where(finished, scores, cand[:, 0]))
        top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), W)
        parents = top_idx // V                              # [W]
        toks = (top_idx % V).astype(jnp.int32)
        was_finished = finished[parents]
        eos_arr = jnp.asarray(eos, jnp.int32)
        now_eos = (toks[:, None] == eos_arr[None, :]).any(-1)
        new_finished = was_finished | now_eos
        # child inherits the parent's cache rows (incl. the kv row the
        # forward just wrote for the parent's input token)
        cache = jax.tree.map(lambda a: a[:, parents], cache)
        return (cache, toks, top_scores, new_finished, parents,
                was_finished)

    # ------------------------------------------------------------------

    def search(self, prompt: Sequence[int],
               max_new_tokens: int = 32) -> List[BeamHypothesis]:
        """Run beam search; returns hypotheses sorted best-first."""
        engine, W = self.engine, self.W
        prompt = engine._encode_prompts([prompt])[0]
        need = len(prompt) + max_new_tokens
        if need > engine.engine_cfg.max_seq_len:
            raise ValueError(
                f"prompt + max_new_tokens needs {need} cache slots but "
                f"max_seq_len is {engine.engine_cfg.max_seq_len}")

        logits, cache1 = engine.prefill([list(prompt)])
        cache = self._expand_jit(cache1)
        logp0 = jax.nn.log_softmax(
            jnp.asarray(logits[0], jnp.float32))            # [V]
        scores, first = jax.lax.top_k(logp0, W)              # seed beams
        tokens = first.astype(jnp.int32)
        eos_set = set(self.eos)
        first_np = np.asarray(tokens)
        finished = jnp.asarray([int(t) in eos_set for t in first_np])
        pos = jnp.full((W,), len(prompt), jnp.int32)

        # host-side sequences per beam (reordered along with the device rows)
        seqs: List[List[int]] = [[int(t)] for t in first_np]
        done: List[bool] = [int(t) in eos_set for t in first_np]

        for _ in range(max_new_tokens - 1):
            if all(done):
                break
            (cache, tokens, scores, finished, parents,
             was_finished) = self._step_jit(engine.params, cache, tokens,
                                            pos, scores, finished)
            pos = pos + 1
            t_np, p_np = np.asarray(tokens), np.asarray(parents)
            wf_np = np.asarray(was_finished)
            seqs = [list(seqs[p]) for p in p_np]
            done = [bool(wf_np[i]) for i in range(W)]
            for i in range(W):
                if not wf_np[i]:                # frozen beams emit padding
                    seqs[i].append(int(t_np[i]))
                    done[i] = int(t_np[i]) in eos_set

        s_np = np.asarray(scores, np.float64)
        hyps = []
        for i in range(W):
            toks = seqs[i]
            fin = bool(done[i])
            if fin and toks and toks[-1] in eos_set:
                toks = toks[:-1]
            lp = float(s_np[i])
            denom = (((5.0 + len(toks) + 1) / 6.0) ** self.length_penalty
                     if self.length_penalty > 0 else 1.0)
            hyps.append(BeamHypothesis(token_ids=toks, score=lp / denom,
                                       log_prob=lp, finished=fin))
        hyps.sort(key=lambda h: h.score, reverse=True)
        return hyps


def beam_search(engine, prompt, beam_width: int = 4,
                max_new_tokens: int = 32,
                eos_token_ids: Optional[Sequence[int]] = None,
                length_penalty: float = 0.0) -> List[BeamHypothesis]:
    """Convenience one-shot wrapper around BeamSearchDecoder."""
    dec = BeamSearchDecoder(engine, beam_width, length_penalty,
                            eos_token_ids)
    return dec.search(prompt, max_new_tokens)
