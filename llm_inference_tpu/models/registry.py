"""Model registry — TPU-native equivalent of the reference's string-keyed
factory `llm::CreateModelWithName` (reference: src/utils/model_utils.h:16-61),
minus the hard-coded hyperparameters (those live in config presets)."""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, object] = {}


def register_model(name: str, module) -> None:
    _REGISTRY[name] = module


def get_model(name: str):
    """Return the model module (init_params / forward / …) for a family name."""
    key = name.lower()
    for candidate in (key, key.split("-")[0], key.split("_")[0]):
        if candidate in _REGISTRY:
            return _REGISTRY[candidate]
    raise KeyError(f"unknown model family {name!r}; known: {sorted(_REGISTRY)}")
