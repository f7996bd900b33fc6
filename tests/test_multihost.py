"""Multi-host helpers (parallel/multihost.py) on the virtual-device mesh:
mesh construction falls back cleanly in a single process, batch splitting
validates, and the hybrid (data, pipe, tensor) shapes hold."""

import jax
import pytest

from llm_inference_tpu.config import ShardingConfig
from llm_inference_tpu.parallel.multihost import (make_hybrid_mesh,
                                                  process_local_batch)


class TestMultihostHelpers:
    def test_hybrid_mesh_single_process_fallback(self):
        mesh = make_hybrid_mesh(ShardingConfig(data=2, pipe=2, tensor=2))
        assert mesh.axis_names == ("data", "pipe", "tensor")
        assert mesh.shape == {"data": 2, "pipe": 2, "tensor": 2}

    def test_hybrid_mesh_rejects_oversized_local_group(self):
        n = jax.local_device_count()
        with pytest.raises(ValueError, match="exceeds"):
            make_hybrid_mesh(ShardingConfig(data=1, pipe=2, tensor=n))

    def test_process_local_batch(self):
        # single process: identity (the divisibility branch needs >1 procs)
        assert process_local_batch(8) == 8
