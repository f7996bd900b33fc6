"""Serving engine: tokenizer, generation loop, continuous batching.

Replaces the reference's Llama<T>::Response single-request loop
(reference: src/models/llama/llama.cpp:363-449) and its trie tokenizer
(reference: src/models/tokenizer.h:57-348).
"""

from llm_inference_tpu.engine.tokenizer import (  # noqa: F401
    BPETokenizer, HFTokenizer, load_tokenizer)
from llm_inference_tpu.engine.engine import (  # noqa: F401
    ChatSession, InferenceEngine)
from llm_inference_tpu.engine.beam_search import (  # noqa: F401
    BeamSearchDecoder, beam_search)
from llm_inference_tpu.engine.prefix_cache import PrefixStore  # noqa: F401
from llm_inference_tpu.engine.scheduler import (  # noqa: F401
    ContinuousBatchingScheduler, PagedScheduler, Request)
from llm_inference_tpu.engine.speculative import (  # noqa: F401
    DraftModelSpeculativeDecoder, SpeculativeDecoder)
