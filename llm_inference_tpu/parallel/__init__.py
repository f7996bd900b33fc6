"""Distribution over TPU meshes: tensor parallelism over ICI, data
parallelism over ICI/DCN.

The reference has ZERO distributed components (SURVEY §2.12: no NCCL/MPI/
Gloo anywhere; the only multi-device awareness is per-device allocator pools,
reference: src/memory/allocator/cuda_allocator.h:43-46). Everything here is
new, TPU-first capability mandated by the north star: `jax.sharding.Mesh` +
`shard_map` with XLA collectives (psum / all_gather) instead of a NCCL-style
backend.
"""

from llm_inference_tpu.parallel.mesh import make_mesh  # noqa: F401
from llm_inference_tpu.parallel.multihost import (  # noqa: F401
    initialize as initialize_multihost,
    make_hybrid_mesh,
    process_local_batch,
)
from llm_inference_tpu.parallel.pipeline import (  # noqa: F401
    pipelined_forward,
)
from llm_inference_tpu.parallel.sharding import (  # noqa: F401
    cache_pspec,
    param_pspecs,
    shard_cache,
    shard_params,
    sharded_forward,
)
