"""Multi-LoRA serving: batched low-rank adapters over the llama family.

No reference analogue (Mr-wang27/llm-inference serves exactly one set of
dense weights, src/weights/llama_weights.cc) — this is the vLLM-style
serving capability: N adapters resident at once, every batch row free to
use a different one, one compiled decode program.

TPU-native design: each target projection gets stacked adapter factors
  A: [L, N, d_in, r]     B: [L, N, r, d_out]
that ride the layer scan as xs (sliced to [N, d_in, r] per layer — they
are small, so scan slicing costs nothing, unlike the stacked QTensor base
weights which bypass the scan; see models/llama._layer docstring). Inside
the layer, each batch row GATHERS its adapter (jnp.take along N) and the
delta is two tiny einsums on top of the base matmul:

    delta = (x @ A[idx_b]) @ B[idx_b]          # [B,T,d] → [B,T,r] → [B,T,o]

Adapter slot 0 is the ZERO adapter (base model): no row-level branching,
a request without an adapter simply indexes 0. The peft alpha/rank
scaling is baked into B at load time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig

# target projections (HF peft naming → our param names)
TARGETS = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}
_DIMS = {
    "wq": lambda c: (c.hidden_size, c.num_heads * c.head_dim),
    "wk": lambda c: (c.hidden_size, c.num_kv_heads * c.head_dim),
    "wv": lambda c: (c.hidden_size, c.num_kv_heads * c.head_dim),
    "wo": lambda c: (c.num_heads * c.head_dim, c.hidden_size),
    "w_gate": lambda c: (c.hidden_size, c.intermediate_size),
    "w_up": lambda c: (c.hidden_size, c.intermediate_size),
    "w_down": lambda c: (c.intermediate_size, c.hidden_size),
}


def init_lora_stacks(cfg: ModelConfig, rank: int, n_adapters: int,
                     key, targets: Sequence[str] = ("wq", "wv"),
                     scale: float = 1.0) -> Dict:
    """Random adapter stacks for tests/benchmarks: n_adapters live
    adapters in slots 1..n (slot 0 is the zero adapter). Both factors are
    random (the usual B=0 init would make deltas vanish — useless as a
    test oracle)."""
    L, N = cfg.num_layers, n_adapters + 1
    stacks = {}
    for i, name in enumerate(targets):
        d_in, d_out = _DIMS[name](cfg)
        ka, kb = jax.random.split(jax.random.fold_in(key, i))
        a = jax.random.normal(ka, (L, N, d_in, rank), jnp.float32)
        a = a * (scale / np.sqrt(d_in))
        b = jax.random.normal(kb, (L, N, rank, d_out), jnp.float32)
        b = b * (scale / np.sqrt(rank))
        a = a.at[:, 0].set(0.0)          # slot 0 = base model
        b = b.at[:, 0].set(0.0)
        stacks[name] = {"a": a, "b": b}
    return stacks


def stack_adapters(cfg: ModelConfig,
                   adapters: List[Dict[str, Tuple[np.ndarray, np.ndarray]]],
                   scaling: Optional[List[float]] = None) -> Dict:
    """Stack per-adapter factor dicts {target: (A [d_in,r] per layer list |
    [L,d_in,r], B ...)} into serving stacks; slot 0 is the zero adapter.
    `scaling` (peft alpha/r per adapter) is baked into B."""
    names = sorted({n for ad in adapters for n in ad})
    L = cfg.num_layers
    stacks = {}
    for name in names:
        ranks = []
        for ad in adapters:
            if name in ad:
                ranks.append(np.asarray(ad[name][0]).shape[-1])
        r = max(ranks)
        d_in, d_out = _DIMS[name](cfg)
        N = len(adapters) + 1
        a = np.zeros((L, N, d_in, r), np.float32)
        b = np.zeros((L, N, r, d_out), np.float32)
        for j, ad in enumerate(adapters):
            if name not in ad:
                continue
            aj = np.asarray(ad[name][0], np.float32)   # [L, d_in, rj]
            bj = np.asarray(ad[name][1], np.float32)   # [L, rj, d_out]
            s = scaling[j] if scaling else 1.0
            rj = aj.shape[-1]
            a[:, j + 1, :, :rj] = aj
            b[:, j + 1, :rj, :] = bj * s
        stacks[name] = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    return stacks


def load_peft_adapter(cfg: ModelConfig, path: str) -> Tuple[Dict, float]:
    """Read one HF peft checkpoint dir (adapter_model.safetensors +
    adapter_config.json) into {target: (A [L,d_in,r], B [L,r,d_out])} and
    its alpha/r scaling. Keys look like
    base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
    with torch [out, in] orientation (A: [r, d_in], B: [d_out, r])."""
    import json
    import os
    from safetensors import safe_open
    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    scaling = acfg.get("lora_alpha", 1.0) / acfg.get("r", 1)
    raw: Dict[str, dict] = {}
    with safe_open(os.path.join(path, "adapter_model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            parts = k.split(".")
            # skip non-decoder-layer entries (modules_to_save like
            # lm_head/embed adapters) BEFORE indexing into the key
            proj = next((p for p in parts if p in TARGETS), None)
            if proj is None or "layers" not in parts:
                continue
            li = int(parts[parts.index("layers") + 1])
            which = "a" if "lora_A" in k else "b"
            raw.setdefault(TARGETS[proj],
                           {}).setdefault(li, {})[which] = f.get_tensor(k)
    out = {}
    for name, per_layer in raw.items():
        L = cfg.num_layers
        any_li = next(iter(per_layer))
        r_eff, d_in = np.asarray(per_layer[any_li]["a"]).shape
        d_out = np.asarray(per_layer[any_li]["b"]).shape[0]
        a_l, b_l = [], []
        for i in range(L):
            if i in per_layer:
                a_l.append(np.asarray(per_layer[i]["a"], np.float32).T)
                b_l.append(np.asarray(per_layer[i]["b"], np.float32).T)
            else:
                # layers_to_transform-style partial adapters: untouched
                # layers get zero factors (identity contribution)
                a_l.append(np.zeros((d_in, r_eff), np.float32))
                b_l.append(np.zeros((r_eff, d_out), np.float32))
        out[name] = (np.stack(a_l), np.stack(b_l))
    return out, scaling


def merge_into_params(cfg: ModelConfig, params, stacks: Dict,
                      adapter: int):
    """Golden-model oracle: dense params with W += A·B of `adapter` merged
    in (tests compare runtime batched-LoRA against this)."""
    merged = dict(params)
    layers = dict(merged["layers"])
    for name, st in stacks.items():
        w = layers[name]                       # [L, d_in, d_out] dense
        delta = jnp.einsum("ldr,lro->ldo", st["a"][:, adapter],
                           st["b"][:, adapter])
        layers[name] = w + delta.astype(w.dtype)
    merged["layers"] = layers
    return merged


def apply_delta(name: str, lora_lp: Optional[Dict],
                x: jnp.ndarray, base_out: jnp.ndarray,
                adapter_idx: Optional[jnp.ndarray]) -> jnp.ndarray:
    """base_out + per-row LoRA delta. `lora_lp` is the scan-sliced per-layer
    view {name: {"a": [N, d_in, r], "b": [N, r, d_out]}}; rows gather their
    adapter by `adapter_idx` [B]."""
    if lora_lp is None or name not in lora_lp or adapter_idx is None:
        return base_out
    a = jnp.take(lora_lp[name]["a"], adapter_idx, axis=0)  # [B, d_in, r]
    b = jnp.take(lora_lp[name]["b"], adapter_idx, axis=0)  # [B, r, d_out]
    xr = jnp.einsum("btd,bdr->btr", x.astype(jnp.float32),
                    a.astype(jnp.float32))
    delta = jnp.einsum("btr,bro->bto", xr, b.astype(jnp.float32))
    return base_out + delta.astype(base_out.dtype)
