"""Device-mesh construction.

Axes:
- "data":   batch (requests) — maps onto DCN across hosts / spare ICI.
- "pipe":   pipeline stages (decoder layers; parallel/pipeline.py) — its
  traffic is one activation ppermute per microbatch tick, the lightest of
  the three, so it sits between data and tensor.
- "tensor": attention heads + FFN columns — must stay on ICI.

`mesh_utils.create_device_mesh` orders physical devices so that the minor
mesh axis rides the fastest interconnect; putting "tensor" last keeps the
per-layer collectives (psum of o_proj/down_proj partials) on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from llm_inference_tpu.config import ShardingConfig


def make_mesh(cfg: Optional[ShardingConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, tensor) mesh. Defaults to all devices on the tensor
    axis when cfg is None (single-host TP, the common serving layout)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = ShardingConfig(data=1, tensor=n)
    dp, pp, tp = cfg.mesh_shape
    if dp * pp * tp > n:
        raise ValueError(f"mesh {dp}x{pp}x{tp} needs more than {n} devices")
    devices = devices[: dp * pp * tp]
    try:
        dev_array = mesh_utils.create_device_mesh((dp, pp, tp),
                                                  devices=devices)
    except Exception:
        # CPU/virtual devices have no topology metadata — plain reshape
        dev_array = np.asarray(devices).reshape(dp, pp, tp)
    return Mesh(dev_array, cfg.axis_names)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "pipe", "tensor"))
