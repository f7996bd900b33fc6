"""Model zoo. Each model is a pure function over a weight pytree.

Replaces the reference's C++ class hierarchy (BaseModel → Llama<T>, reference:
src/models/basemodel.h:14-43, src/models/llama/llama.h:14-207) — there is no
object graph to manage because XLA owns memory planning and jit owns program
lifetimes.
"""

from llm_inference_tpu.models import llama  # noqa: F401
from llm_inference_tpu.models import deepseek  # noqa: F401
from llm_inference_tpu.models import gemma2  # noqa: F401
from llm_inference_tpu.models import mixtral  # noqa: F401
from llm_inference_tpu.models.registry import get_model, register_model  # noqa: F401
