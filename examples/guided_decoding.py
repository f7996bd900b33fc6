"""Guided (grammar-constrained) decoding demo — choices, regex, and a
JSON schema, all compiled to on-device token DFAs (engine/guided.py).

Analogue of the reference's examples/cpp drivers (which only demo free
generation). Runs with dummy weights and a toy character tokenizer:

    JAX_PLATFORMS=cpu python examples/guided_decoding.py
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
from llm_inference_tpu.engine.scheduler import ContinuousBatchingScheduler
from llm_inference_tpu.models import llama


class CharTokenizer:
    """Toy id ↔ character tokenizer (ids 0-2 reserved)."""

    pieces = ["", "<bos>", "<eos>"] + [chr(c) for c in range(32, 127)]

    def encode(self, text, add_bos=True):
        return [self.pieces.index(c) for c in text]

    def decode(self, ids):
        return "".join(self.pieces[i] for i in ids
                       if 0 <= i < len(self.pieces))

    def decode_token(self, tid):
        return self.pieces[tid] if 0 <= tid < len(self.pieces) else ""


def main():
    cfg = tiny_llama()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(
        cfg, params, tokenizer=CharTokenizer(),
        engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=4,
                                max_batch_size=2, prefill_buckets=(8, 16)))
    gen = GenerationConfig(greedy=True, max_new_tokens=24,
                           eos_token_ids=(2,))
    sched = ContinuousBatchingScheduler(engine, gen, slots=2)

    demos = [
        ("choices", dict(guided_choice=["yes", "no", "maybe"])),
        ("regex", dict(guided_regex=r"-?\d{1,3}\.\d\d")),
        ("json schema", dict(guided_json={
            "type": "object",
            "properties": {"name": {"type": "string"},
                           "score": {"type": "integer"}}})),
    ]
    for label, kw in demos:
        r = sched.submit("q: ", **kw)
        while sched.step():
            pass
        ids = r.output_ids
        if ids and ids[-1] == 2:
            ids = ids[:-1]
        print(f"{label:12s} -> {engine.tokenizer.decode(ids)!r}")


if __name__ == "__main__":
    main()
