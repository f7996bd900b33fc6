"""Serving-checkpoint save/load: persist PREPARED parameters (quantized,
fused, blocked) so a server restart skips quantize→fuse→re-layout entirely.

No reference analogue (its only persistence is one-way weight loading,
SURVEY §5); this is the runtime-state checkpointing slot of the north star.
Format: one .npz of all array leaves + a JSON manifest of the pytree
structure with QTensor static metadata (bits/group_size/block_n/...), so a
load reconstructs the exact pytree the engine was built with — including
the streaming layouts the Pallas kernels require.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.ops.quantization import QTensor

_QT_FIELDS = ("bits", "group_size", "orig_dtype", "block_rows", "block_n",
              "pack_axis")


def _describe(tree, prefix="") -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Flatten a params pytree into (manifest, name→array)."""
    manifest: Dict[str, Any] = {}
    arrays: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, QTensor):
            manifest[path] = {"kind": "qtensor",
                              "asym": node.zbias is not None,
                              **{f: getattr(node, f) for f in _QT_FIELDS}}
            arrays[path + ".q"] = np.asarray(node.q)
            arrays[path + ".scale"] = np.asarray(node.scale)
            if node.zbias is not None:
                arrays[path + ".zbias"] = np.asarray(node.zbias)
        elif isinstance(node, dict):
            manifest[path] = {"kind": "dict", "keys": sorted(node)}
            for k in node:
                walk(node[k], f"{path}/{k}" if path else k)
        else:
            arr = np.asarray(node)
            if arr.dtype == ml_dtypes.bfloat16:
                manifest[path] = {"kind": "array", "dtype": "bfloat16"}
                arrays[path] = arr.view(np.uint16)
            else:
                manifest[path] = {"kind": "array", "dtype": str(arr.dtype)}
                arrays[path] = arr

    walk(tree, prefix)
    return manifest, arrays


def save_prepared(path: str, cfg: ModelConfig, params) -> None:
    """Write cfg + prepared params to <path>/ (manifest.json, arrays.npz)."""
    os.makedirs(path, exist_ok=True)
    manifest, arrays = _describe(params)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"model": cfg.to_dict(), "tree": manifest}, f, indent=1)
    np.savez(os.path.join(path, "arrays.npz"), **arrays)


def load_prepared(path: str) -> Tuple[ModelConfig, Any]:
    """Inverse of save_prepared; returns (cfg, params) on the default device."""
    with open(os.path.join(path, "manifest.json")) as f:
        meta = json.load(f)
    cfg = ModelConfig.from_dict(meta["model"])
    blob = np.load(os.path.join(path, "arrays.npz"))
    tree = meta["tree"]

    def build(pathkey):
        desc = tree[pathkey]
        if desc["kind"] == "dict":
            return {k: build(f"{pathkey}/{k}" if pathkey else k)
                    for k in desc["keys"]}
        if desc["kind"] == "qtensor":
            return QTensor(q=jnp.asarray(blob[pathkey + ".q"]),
                           scale=jnp.asarray(blob[pathkey + ".scale"]),
                           zbias=(jnp.asarray(blob[pathkey + ".zbias"])
                                  if desc.get("asym") else None),
                           **{f: desc[f] for f in _QT_FIELDS
                              if f in desc})
        arr = blob[pathkey]
        if desc["dtype"] == "bfloat16":
            arr = arr.view(ml_dtypes.bfloat16)
        return jnp.asarray(arr)

    return cfg, build("")
