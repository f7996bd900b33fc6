"""Multi-host (DCN) execution helpers.

The reference has no multi-device code at all (SURVEY §2.12); this module is
the new-functionality layer that takes the single-host TP/DP mesh
(mesh.make_mesh) across hosts:

- `initialize()` wraps jax.distributed.initialize — after it, jax.devices()
  spans every host and the SAME engine/forward code runs SPMD on each
  process (shard_map is multi-host-transparent; each host feeds its own
  data-parallel slice of the batch).
- `make_hybrid_mesh()` builds a (data, tensor) mesh where the tensor axis is
  confined to intra-slice ICI and the data axis crosses DCN — the layout
  where the per-layer psum/all-gather collectives (which run once per layer
  per token) never touch the slow inter-host network, and only the
  independent per-request batch dimension spans hosts.

Failure handling follows the JAX model the SURVEY §5 table prescribes:
jax.distributed's health checking fails the process group on a lost host;
recovery is a restart from loaded weights (weights are immutable at serving
time, so there is no checkpoint-resume state beyond in-flight requests,
which the scheduler re-queues). The full host-loss sequence — interrupt →
scheduler.drain_inflight → fresh worker loads the prepared checkpoint →
scheduler.adopt → byte-identical seeded replay, streams deduplicated,
guided-decoding DFAs re-registered, pages reclaimed — is drilled in
tests/test_elastic_recovery.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from llm_inference_tpu.config import ShardingConfig


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX process group. On TPU pods with standard runtime
    env vars everything is auto-detected and all arguments may be None.
    Idempotent: safe to call when already initialized or single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def make_hybrid_mesh(cfg: ShardingConfig,
                     devices: Optional[Sequence] = None) -> Mesh:
    """(data, pipe, tensor) mesh with pipe/tensor within a slice (ICI) and
    data across slices/hosts (DCN). Requires cfg.pipe·cfg.tensor ≤
    devices-per-process so the per-layer TP collectives and the per-tick
    pipeline ppermute stay on ICI."""
    from jax.experimental import mesh_utils

    dp, pp, tp = cfg.mesh_shape
    n_local = jax.local_device_count()
    if pp * tp > n_local:
        raise ValueError(
            f"pipe={pp}·tensor={tp} exceeds {n_local} local devices — their "
            f"collectives would cross DCN; shard fewer ways or use more "
            f"data parallelism")
    try:
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // max(1, jax.process_count()) or 1, pp, tp),
            dcn_mesh_shape=(jax.process_count(), 1, 1),
            devices=devices)
    except Exception:
        # single-process / virtual devices: plain mesh
        devs = list(devices if devices is not None else jax.devices())
        dev_array = np.asarray(devs[: dp * pp * tp]).reshape(dp, pp, tp)
    return Mesh(dev_array, cfg.axis_names)


def process_local_batch(global_batch: int) -> int:
    """Per-host slice of a data-parallel batch (hosts feed disjoint rows)."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    return global_batch // pc
