"""Debug tensor dumps — the reference's SAVE_DATA workflow, runtime-gated.

The reference compiles with -DSAVE_DATA to write raw per-layer tensors to
/home/data/<layer>_<name>.bin for offline diffing against HuggingFace
activations (reference: src/utils/debug_utils.h:12-88, call sites
context_decoder.cpp:117-131, llama.cpp:310; gated to layer_id ≤ 2). Here the
same capability is a runtime context manager — no recompile of the
framework, only a re-trace:

    with debug.dump_activations("/tmp/acts", max_layer=2):
        llama.forward(cfg, params, ids, pos, cache)
    # → /tmp/acts/embed.npy, layer000_out.npy, layer001_out.npy, ...

Implementation: model code calls `debug.tap(name, x, layer=...)`, a no-op
unless a dump scope is active, in which case it inserts a
jax.debug.callback that saves the tensor as .npy at run time (works inside
jit and inside the layer scan — the layer index is a traced value and
becomes part of the file name via the callback argument).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

_state = threading.local()


class _Scope:
    def __init__(self, out_dir: str, max_layer: int):
        self.out_dir = out_dir
        self.max_layer = max_layer
        # set by __exit__: run-time callbacks baked into still-cached
        # compiled programs check this (NOT the thread-local — the
        # runtime executes callbacks on its own threads)
        self.closed = False


def dump_activations(out_dir: str, max_layer: int = 2):
    """Context manager enabling activation dumps (see module docstring).
    `max_layer` bounds per-layer taps like the reference's layer_id ≤ 2
    gate (debug_utils.h:29) — dumps get large fast."""

    class _Ctx:
        def __enter__(self):
            os.makedirs(out_dir, exist_ok=True)
            _state.scope = _Scope(out_dir, max_layer)
            return out_dir

        def __exit__(self, *exc):
            if _state.scope is not None:
                _state.scope.closed = True
            _state.scope = None

    return _Ctx()


def _active() -> Optional[_Scope]:
    return getattr(_state, "scope", None)


def tap(name: str, x, layer=None) -> None:
    """Dump `x` as <name>.npy (or layerNNN_<name>.npy) when a dump scope is
    active; otherwise free (no trace pollution).

    The gate is TRACE-time: a jitted program compiled OUTSIDE a scope has
    no callback baked in and will never dump even if later run inside one
    — use a fresh engine (or clear its jit caches) for dumping. The
    converse leak is handled at RUN time: a program compiled inside a
    scope re-checks the live scope in its callback, so dumps stop when
    the scope exits instead of continuing for the process lifetime."""
    scope = _active()
    if scope is None:
        return
    import jax
    import numpy as np

    if layer is None:
        def save(val, _s=scope):
            if _s.closed:
                return
            np.save(os.path.join(_s.out_dir, f"{name}.npy"),
                    np.asarray(val))
        jax.debug.callback(save, x)
        return

    def save_l(val, lyr, _s=scope):
        if _s.closed:
            return
        lyr = int(lyr)
        if lyr <= _s.max_layer:
            np.save(os.path.join(_s.out_dir, f"layer{lyr:03d}_{name}.npy"),
                    np.asarray(val))
    jax.debug.callback(save_l, x, layer)
