"""Host-loss drill: failure detection → drain → restart → byte-identical
replay (SURVEY §5 failure-detection/elastic-recovery row).

The recovery model (parallel/multihost.py docstring): jax.distributed's
health checking fails the process group on a lost host; serving weights are
immutable, so recovery = a fresh worker loading the SAME prepared
checkpoint and adopting the failed worker's requests. These tests drill
the full sequence on one process: interrupt a scheduler mid-generation,
drain it, rebuild an engine from a prepared-params checkpoint on disk
(utils/quant_checkpoint — the restart's weight load), adopt into a new
scheduler, and require byte-identical outputs vs an uninterrupted run.
"""

import numpy as np
import jax
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      QuantConfig, tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.scheduler import (ContinuousBatchingScheduler,
                                                PagedScheduler)
from llm_inference_tpu.models import llama
from llm_inference_tpu.utils import quant_checkpoint

CFG = tiny_llama(num_kv_heads=2)
ECFG = EngineConfig(max_seq_len=64, decode_chunk=4, max_batch_size=2,
                    prefill_buckets=(8, 16), page_size=8)
GEN = GenerationConfig(greedy=False, temperature=0.9, top_k=20,
                       max_new_tokens=24, eos_token_ids=())
PROMPTS = [[5, 6, 7], [20, 21, 22, 23], [100, 101], [7, 8, 9, 10, 11]]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """The immutable serving weights, on disk — what a restarted worker
    loads."""
    params = llama.prepare_params(
        llama.quantize_params(llama.init_params(CFG, jax.random.PRNGKey(0)),
                              QuantConfig(weights="int8")), donate=False)
    d = str(tmp_path_factory.mktemp("ckpt"))
    quant_checkpoint.save_prepared(d, CFG, params)
    return d


def _engine(ckpt_dir):
    cfg, params = quant_checkpoint.load_prepared(ckpt_dir)
    return InferenceEngine(cfg, params, engine_cfg=ECFG)


@pytest.mark.parametrize("sched_cls", [ContinuousBatchingScheduler,
                                       PagedScheduler])
def test_host_loss_drill_replays_identically(ckpt_dir, sched_cls):
    # golden: uninterrupted run on worker A
    golden_sched = sched_cls(_engine(ckpt_dir), GEN, slots=2)
    golden_reqs = [golden_sched.submit(list(p)) for p in PROMPTS]
    while golden_sched.step():
        pass
    golden = {r.req_id: list(r.output_ids) for r in golden_reqs}
    seeds = [r.seed for r in golden_reqs]

    # worker B dies mid-generation: some requests in flight (partial
    # output), some still queued
    dying = sched_cls(_engine(ckpt_dir), GEN, slots=2)
    reqs = [dying.submit(list(p), seed=seeds[i])
            for i, p in enumerate(PROMPTS)]
    for _ in range(3):
        dying.step()
    assert any(r.output_ids and not r.finished for r in reqs), \
        "drill needs an interrupted in-flight request"
    drained = dying.drain_inflight()
    assert drained
    leftovers = list(dying.queue)
    dying.queue.clear()

    # restarted worker: fresh engine from the prepared checkpoint adopts
    # everything (drained first — they were in flight)
    restarted = sched_cls(_engine(ckpt_dir), GEN, slots=2)
    restarted.adopt(drained + [r for r in leftovers if r not in drained])
    while restarted.step():
        pass
    for r in reqs:
        assert r.done_t > 0                 # retired (max_new or stop)
        assert list(r.output_ids) == golden[r.req_id], r.req_id
    if sched_cls is PagedScheduler:
        assert restarted.alloc.free_pages == restarted.alloc.num_pages - 1


def test_stream_never_duplicates_across_restart(ckpt_dir):
    """A streaming client of an interrupted request sees each token once:
    stream_pos survives the drain and the replay re-streams nothing."""
    streamed = []
    dying = ContinuousBatchingScheduler(_engine(ckpt_dir), GEN, slots=1)
    req = dying.submit([5, 6, 7], seed=123,
                       stream=lambda rid, tok: streamed.append(tok))
    for _ in range(3):
        dying.step()
    seen_before = list(streamed)
    assert seen_before, "drill needs streamed tokens before the failure"
    drained = dying.drain_inflight()

    restarted = ContinuousBatchingScheduler(_engine(ckpt_dir), GEN, slots=1)
    restarted.adopt(drained)
    while restarted.step():
        pass
    assert req.done_t > 0
    # total stream = final output, each token exactly once
    assert streamed == list(req.output_ids)


def test_guided_request_survives_restart(ckpt_dir):
    """Guided-decoding constraint state re-registers in the adopting
    scheduler's DFA tables and the replay still satisfies the grammar."""
    choices = [[7, 8, 9], [11, 12]]
    gen = GenerationConfig(greedy=False, temperature=0.9, top_k=20,
                           max_new_tokens=24, eos_token_ids=(1,))
    dying = ContinuousBatchingScheduler(_engine(ckpt_dir), gen, slots=1)
    req = dying.submit([5, 6], seed=7, guided_choice=choices)
    dying.step()
    drained = dying.drain_inflight() or [req]
    dying.queue.clear()
    restarted = ContinuousBatchingScheduler(_engine(ckpt_dir), gen, slots=1)
    restarted.adopt(drained)
    while restarted.step():
        pass
    assert req.done_t > 0
    out = list(req.output_ids)
    if out and out[-1] == 1:                # terminating EOS is emitted
        out = out[:-1]
    assert out in choices
