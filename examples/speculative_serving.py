"""Speculative decoding inside continuous batching — n-gram and
two-model draft variants, with acceptance stats.

    JAX_PLATFORMS=cpu python examples/speculative_serving.py
"""

import os
import sys

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.speculative import (
    DraftSpeculativeBatchingScheduler, SpeculativeBatchingScheduler)
from llm_inference_tpu.models import llama


def main():
    cfg = tiny_llama()
    ecfg = EngineConfig(max_seq_len=256, decode_chunk=4, max_batch_size=2,
                        prefill_buckets=(8, 16, 32))
    target = InferenceEngine(
        cfg, llama.init_params(cfg, jax.random.PRNGKey(0)),
        engine_cfg=ecfg)
    gen = GenerationConfig(greedy=True, max_new_tokens=32,
                           eos_token_ids=(1,))
    # a cyclic prompt makes the n-gram proposer productive
    prompt = [3, 4, 5, 6] * 6

    sched = SpeculativeBatchingScheduler(target, gen, slots=2, gamma=4)
    r = sched.submit(list(prompt))
    while sched.step():
        pass
    st = sched.spec_stats
    print(f"n-gram     : {len(r.output_ids)} tokens in {st['steps']} "
          f"verify steps ({st['produced'] / max(st['steps'], 1):.2f} "
          f"tokens/step, {st['accepted']} accepted)")

    draft = InferenceEngine(
        cfg, llama.init_params(cfg, jax.random.PRNGKey(0)),  # self-draft
        engine_cfg=ecfg)
    dsched = DraftSpeculativeBatchingScheduler(target, draft, gen,
                                               slots=2, gamma=4)
    r2 = dsched.submit(list(prompt))
    while dsched.step():
        pass
    st = dsched.spec_stats
    print(f"self-draft : {len(r2.output_ids)} tokens in {st['steps']} "
          f"verify steps ({st['produced'] / max(st['steps'], 1):.2f} "
          f"tokens/step)")
    assert r.output_ids == r2.output_ids   # greedy-exact regardless


if __name__ == "__main__":
    main()
