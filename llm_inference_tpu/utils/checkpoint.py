"""Checkpoint loading: HuggingFace safetensors / torch state dicts and the
reference's raw per-tensor .bin directory format.

Replaces the reference's weight loader (reference:
src/utils/weight_utils.cu:90-182 — fread into host vector, H2D memcpy, with a
CUDA type-conversion kernel when file dtype ≠ model dtype) and its per-layer
HF-key file naming (reference: src/weights/llama/layer_weights.cc:48-66,
llama_weights.cc:42-53). Here dtype conversion is a jnp astype and sharding
happens at device_put time via NamedSharding (see parallel/).

Weight-layout conventions (see models/llama.py docstring):
- all matmul weights stored [in, out] (HF stores [out, in] ⇒ transpose);
- qkv fused along out-dim, gate∥up fused along out-dim — same offline-fusion
  convention the reference uses (reference: src/kernels/linear.cu:24-35).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig, QuantConfig

Params = Dict[str, Any]


def _as_jnp(arr: np.ndarray, dtype) -> jnp.ndarray:
    """np array → jnp array of `dtype`, using the native parallel converter
    for the (dominant) f32/f16 → bf16 case when the library is available."""
    if jnp.dtype(dtype) == jnp.bfloat16 and arr.dtype in (np.float32,
                                                          np.float16):
        try:
            from llm_inference_tpu import native
            out = native.convert_to_bf16(arr)
            if out is not None:
                return jnp.asarray(out)
        except Exception:
            pass
    return jnp.asarray(arr, dtype)


# ---------------------------------------------------------------------------
# HF config → ModelConfig
# ---------------------------------------------------------------------------

def _gemma3_layer_types(g):
    """Gemma-3 per-layer attention kinds. Newer HF configs carry
    `layer_types` explicitly; older ones (original Hub uploads /
    transformers <4.54) only carry `sliding_window_pattern`: N, meaning
    every Nth layer is full attention. Falling back matters: treating a
    pattern-only config as all-sliding would silently cap every layer's
    context at the sliding window with the local RoPE theta."""
    lt = g("layer_types")
    if lt:
        return tuple(lt)
    pat = g("sliding_window_pattern")
    if pat:
        L = g("num_hidden_layers")
        return tuple("full_attention" if (i + 1) % int(pat) == 0
                     else "sliding_attention" for i in range(L))
    raise ValueError(
        "gemma3 config carries neither layer_types nor "
        "sliding_window_pattern — cannot derive the sliding/full layout")


def model_config_from_hf(hf_cfg) -> ModelConfig:
    """Build a ModelConfig from a transformers config object or dict."""
    g = (lambda k, d=None: hf_cfg.get(k, d)) if isinstance(hf_cfg, dict) \
        else (lambda k, d=None: getattr(hf_cfg, k, d))
    num_heads = g("num_attention_heads")
    hidden = g("hidden_size")
    head_dim = g("head_dim") or hidden // num_heads
    rope_scaling = g("rope_scaling")
    if rope_scaling is not None and not isinstance(rope_scaling, dict):
        rope_scaling = dict(rope_scaling)
    if rope_scaling and (rope_scaling.get("type")
                         or rope_scaling.get("rope_type")) == "longrope":
        # phi3 keeps the longrope magnitude inputs at the TOP level of the
        # config — fold them into the scaling dict ops/rope.py consumes
        rope_scaling = dict(rope_scaling)
        rope_scaling.setdefault("max_position_embeddings",
                                g("max_position_embeddings", 4096))
        rope_scaling.setdefault(
            "original_max_position_embeddings",
            g("original_max_position_embeddings", 4096))
    family = g("model_type", "llama")
    gemma3 = str(family) in ("gemma3", "gemma3_text")
    if str(family).startswith("gemma") and family != "gemma2" and not gemma3:
        raise NotImplementedError(
            f"model_type {family!r}: gemma2/gemma3 are wired (gemma-1 "
            f"lacks the sandwich norms)")
    gemma = family == "gemma2" or gemma3
    moe_kw = {}
    if family == "mixtral":
        moe_kw = dict(num_experts=g("num_local_experts", 8),
                      experts_per_token=g("num_experts_per_tok", 2))
    if str(family).startswith("deepseek"):
        # DeepSeek V3/R1 MLA + MoE (models/deepseek.py). V2 has a
        # DIFFERENT router (softmax, no e_score_correction_bias) and the
        # VL variants aren't text decoders — refuse rather than convert
        # them with V3 semantics.
        if str(family) != "deepseek_v3":
            raise NotImplementedError(
                f"model_type {family!r}: only deepseek_v3 is wired "
                f"(V2's softmax router / VL variants differ)")
        moe_kw = dict(
            num_experts=g("n_routed_experts", 0) or 0,
            experts_per_token=g("num_experts_per_tok", 8) or 8,
            q_lora_rank=g("q_lora_rank") or 0,
            kv_lora_rank=g("kv_lora_rank"),
            qk_nope_head_dim=g("qk_nope_head_dim"),
            qk_rope_head_dim=g("qk_rope_head_dim"),
            v_head_dim=g("v_head_dim"),
            rope_interleave=bool(g("rope_interleave", False)),
            n_shared_experts=g("n_shared_experts", 0) or 0,
            moe_intermediate_size=g("moe_intermediate_size", 0) or 0,
            n_group=g("n_group", 1) or 1,
            topk_group=g("topk_group", 1) or 1,
            routed_scaling_factor=g("routed_scaling_factor", 1.0) or 1.0,
            norm_topk_prob=bool(g("norm_topk_prob", True)),
            first_k_dense=g("first_k_dense_replace", 0) or 0)
        if rope_scaling and (rope_scaling.get("rope_type")
                             or rope_scaling.get("type")) == "yarn":
            # HF yarn falls back to max_position_embeddings when the
            # original length is absent — bake the resolved value in
            rope_scaling = dict(rope_scaling)
            rope_scaling.setdefault(
                "original_max_position_embeddings",
                g("max_position_embeddings", 4096))
    return ModelConfig(
        name=family,
        vocab_size=g("vocab_size"),
        hidden_size=hidden,
        intermediate_size=g("intermediate_size"),
        num_layers=g("num_hidden_layers"),
        num_heads=num_heads,
        num_kv_heads=g("num_key_value_heads") or num_heads,
        head_dim=head_dim,
        rope_theta=g("rope_theta", 10000.0),
        max_position_embeddings=g("max_position_embeddings", 4096),
        rms_norm_eps=g("rms_norm_eps", 1e-5),
        tie_word_embeddings=bool(g("tie_word_embeddings", gemma)),
        rope_scaling=rope_scaling,
        # qwen2-style configs carry a sliding_window value but gate it
        # behind use_sliding_window (default False in HF) — honoring the
        # value alone would wrongly mask tokens beyond the window
        sliding_window=(g("sliding_window") or 0)
        if g("use_sliding_window", True) else 0,
        sliding_pattern="alternating" if (gemma and not gemma3) else "all",
        layer_types=_gemma3_layer_types(g) if gemma3 else None,
        rope_local_theta=(g("rope_local_base_freq") or 0.0) if gemma3
        else 0.0,
        # HF Qwen2 hardcodes q/k/v biases (no attention_bias config key),
        # so the key's absence must not drop trained biases (Qwen3 DOES
        # carry the key, default False)
        qkv_bias=bool(g("attention_bias",
                        str(family).startswith("qwen2"))),
        qk_norm=str(family) == "qwen3" or gemma3,
        attn_logit_softcap=g("attn_logit_softcapping") or 0.0,
        final_logit_softcap=g("final_logit_softcapping") or 0.0,
        query_pre_attn_scalar=g("query_pre_attn_scalar") or 0.0,
        scale_embeddings=gemma,
        **moe_kw,
    )


# ---------------------------------------------------------------------------
# HF state dict → params pytree
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    """torch tensor / np array → np array (no torch import required)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu()
        if str(x.dtype) == "torch.bfloat16":
            x = x.float()
        return x.numpy()
    return np.asarray(x)


def convert_hf_state_dict(cfg: ModelConfig, sd: Dict[str, Any],
                          dtype=None) -> Params:
    """Convert an HF LLaMA-family state dict (name → tensor) to our pytree.

    Accepts torch tensors or numpy arrays. Keys may carry a leading "model."
    or not (both appear in the wild).
    """
    from llm_inference_tpu.models import deepseek
    if deepseek.is_deepseek(cfg):     # MLA family → two-stack layout
        return deepseek.convert_hf_state_dict(cfg, sd, dtype)
    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = { (k[6:] if k.startswith("model.") else k): v for k, v in sd.items() }

    def get(name):
        if name not in sd:
            raise KeyError(f"missing weight {name!r}; have e.g. "
                           f"{sorted(sd)[:5]}")
        a = _np(sd[name])
        # keep f16 as-is: upcasting every tensor to f32 doubles peak host
        # memory on the dominant checkpoint format, and _as_jnp's native
        # f16→bf16 fast path (weight_io.cc) only runs on f16 input
        if a.dtype in (np.float16, np.float32):
            return a
        return a.astype(np.float32)

    L = cfg.num_layers
    gemma = cfg.name.split("-")[0].startswith("gemma")  # sandwich norms
    moe = cfg.num_experts > 0
    acc = {k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo", "ffn_norm",
                           "w_gate", "w_up", "w_down", "bq", "bk", "bv",
                           "q_norm", "k_norm",
                           "post_attn_norm", "post_ffn_norm",
                           "router", "e_gate", "e_up", "e_down")}
    phi3 = cfg.name.split("-")[0] == "phi3"
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    for i in range(L):
        p = f"layers.{i}."
        acc["attn_norm"].append(get(p + "input_layernorm.weight"))
        if phi3:
            # phi3 checkpoints store FUSED projections — split them into
            # the canonical layout (fuse_params re-fuses at load, with
            # TP-interleaved columns)
            qkv = get(p + "self_attn.qkv_proj.weight")   # [(Hq+2Hkv)D, H]
            acc["wq"].append(qkv[:nq].T)
            acc["wk"].append(qkv[nq:nq + nkv].T)
            acc["wv"].append(qkv[nq + nkv:].T)
        else:
            acc["wq"].append(get(p + "self_attn.q_proj.weight").T)
            acc["wk"].append(get(p + "self_attn.k_proj.weight").T)
            acc["wv"].append(get(p + "self_attn.v_proj.weight").T)
        if cfg.qkv_bias:
            acc["bq"].append(get(p + "self_attn.q_proj.bias"))
            acc["bk"].append(get(p + "self_attn.k_proj.bias"))
            acc["bv"].append(get(p + "self_attn.v_proj.bias"))
        if cfg.qk_norm:
            acc["q_norm"].append(get(p + "self_attn.q_norm.weight"))
            acc["k_norm"].append(get(p + "self_attn.k_norm.weight"))
        acc["wo"].append(get(p + "self_attn.o_proj.weight").T)
        if gemma:
            # gemma2's sandwich norms: post_attention is a POST norm and
            # the pre-FFN norm has its own key (models/gemma2.py layout)
            acc["post_attn_norm"].append(
                get(p + "post_attention_layernorm.weight"))
            acc["ffn_norm"].append(
                get(p + "pre_feedforward_layernorm.weight"))
            acc["post_ffn_norm"].append(
                get(p + "post_feedforward_layernorm.weight"))
        else:
            acc["ffn_norm"].append(
                get(p + "post_attention_layernorm.weight"))
        if moe:
            # mixtral sparse MoE block: router gate + per-expert w1/w3/w2
            acc["router"].append(
                get(p + "block_sparse_moe.gate.weight").T)   # [H, E]
            acc["e_gate"].append(np.stack(
                [get(p + f"block_sparse_moe.experts.{e}.w1.weight").T
                 for e in range(cfg.num_experts)]))
            acc["e_up"].append(np.stack(
                [get(p + f"block_sparse_moe.experts.{e}.w3.weight").T
                 for e in range(cfg.num_experts)]))
            acc["e_down"].append(np.stack(
                [get(p + f"block_sparse_moe.experts.{e}.w2.weight").T
                 for e in range(cfg.num_experts)]))
        elif phi3:
            gu = get(p + "mlp.gate_up_proj.weight")          # [2I, H]
            half = gu.shape[0] // 2
            acc["w_gate"].append(gu[:half].T)
            acc["w_up"].append(gu[half:].T)
            acc["w_down"].append(get(p + "mlp.down_proj.weight").T)
        else:
            acc["w_gate"].append(get(p + "mlp.gate_proj.weight").T)  # [H, I]
            acc["w_up"].append(get(p + "mlp.up_proj.weight").T)
            acc["w_down"].append(get(p + "mlp.down_proj.weight").T)

    layers = {k: _as_jnp(np.stack(v), dtype)
              for k, v in acc.items() if v}

    params: Params = {
        "embed": _as_jnp(get("embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": _as_jnp(get("norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _as_jnp(
            np.ascontiguousarray(get("lm_head.weight").T), dtype)
    return params


# ---------------------------------------------------------------------------
# safetensors checkpoint directory
# ---------------------------------------------------------------------------

def load_hf_checkpoint(path: str, dtype=None) -> Tuple[ModelConfig, Params]:
    """Load config.json + *.safetensors from an HF model directory."""
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = model_config_from_hf(hf_cfg)

    if dtype is not None:
        # an explicit load dtype is the activation policy too — otherwise
        # f32-loaded params run under the config's default bf16 activations
        import dataclasses as _dc
        cfg = _dc.replace(cfg, dtype=str(jnp.dtype(dtype)))

    from safetensors.numpy import load_file
    sd: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for fn in files:
        sd.update(load_file(os.path.join(path, fn)))
    return cfg, convert_hf_state_dict(cfg, sd, dtype)


# ---------------------------------------------------------------------------
# Reference-style raw .bin directory (one row-major f32/f16 file per tensor)
# ---------------------------------------------------------------------------

_REF_DTYPES = {"fp32": np.float32, "fp16": np.float16}


def load_reference_bin_dir(cfg: ModelConfig, path: str, dtype=None,
                           file_dtype: str = "fp32") -> Params:
    """Load the reference engine's exported weight directory: raw row-major
    binaries named by HF key with pre-fused qkv / gate_up (reference:
    src/weights/llama/layer_weights.cc:48-66 reads
    model.layers.N.{...}.weight.bin with exactly these fusions).

    Shapes follow the reference's [out, in] convention, so every matmul
    weight is transposed on load.
    """
    np_dt = _REF_DTYPES[file_dtype]
    dtype = jnp.dtype(dtype or cfg.dtype)
    H, L, I = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    qkv_out = cfg.qkv_out_dim
    o_in = cfg.num_heads * cfg.head_dim

    def rd(name, shape):
        fn = os.path.join(path, name + ".bin")
        arr = np.fromfile(fn, dtype=np_dt)
        expect = int(np.prod(shape))
        if arr.size != expect:
            raise ValueError(f"{fn}: got {arr.size} elems, want {shape}")
        return arr.reshape(shape).astype(np.float32)

    hq = cfg.num_heads * cfg.head_dim
    hkv = cfg.num_kv_heads * cfg.head_dim
    layers = {"attn_norm": [], "wq": [], "wk": [], "wv": [], "wo": [],
              "ffn_norm": [], "w_gate": [], "w_up": [], "w_down": []}
    for i in range(L):
        p = f"model.layers.{i}."
        layers["attn_norm"].append(rd(p + "input_layernorm.weight", (H,)))
        # the reference stores qkv fused [(q+2kv)·hs, hidden] and gate∥up
        # fused [2·inter, hidden] (layer_weights.cc:5-45) — split on load
        qkv = rd(p + "self_attn.qkv.weight", (qkv_out, H)).T   # [H, qkv_out]
        layers["wq"].append(qkv[:, :hq])
        layers["wk"].append(qkv[:, hq:hq + hkv])
        layers["wv"].append(qkv[:, hq + hkv:])
        layers["wo"].append(rd(p + "self_attn.o_proj.weight", (o_in, H)).T)
        layers["ffn_norm"].append(
            rd(p + "post_attention_layernorm.weight", (H,)))
        gate_up = rd(p + "mlp.gate_up_proj.weight", (2 * I, H)).T  # [H, 2I]
        layers["w_gate"].append(gate_up[:, :I])
        layers["w_up"].append(gate_up[:, I:])
        layers["w_down"].append(rd(p + "mlp.down_proj.weight", (H, I)).T)

    params: Params = {
        "embed": _as_jnp(
            rd("model.embed_tokens.weight", (cfg.vocab_size, H)), dtype),
        "layers": {k: _as_jnp(np.stack(v), dtype)
                   for k, v in layers.items()},
        "final_norm": _as_jnp(rd("model.norm.weight", (H,)), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            rd("lm_head.weight", (cfg.vocab_size, H)).T, dtype)
    return params


def save_reference_bin_dir(cfg: ModelConfig, params: Params, path: str,
                           file_dtype: str = "fp32") -> None:
    """Export params in the reference's .bin directory format (round-trip of
    load_reference_bin_dir) — lets the reference engine consume checkpoints
    we produce, and gives the loader a self-test."""
    np_dt = _REF_DTYPES[file_dtype]
    os.makedirs(path, exist_ok=True)

    def wr(name, arr):
        np.asarray(arr, dtype=np.float32).astype(np_dt).tofile(
            os.path.join(path, name + ".bin"))

    lay = params["layers"]
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        wr(p + "input_layernorm.weight", lay["attn_norm"][i])
        qkv = np.concatenate([np.asarray(lay["wq"][i]),
                              np.asarray(lay["wk"][i]),
                              np.asarray(lay["wv"][i])], axis=1)
        wr(p + "self_attn.qkv.weight", qkv.T)
        wr(p + "self_attn.o_proj.weight", np.asarray(lay["wo"][i]).T)
        wr(p + "post_attention_layernorm.weight", lay["ffn_norm"][i])
        gate_up = np.concatenate([np.asarray(lay["w_gate"][i]),
                                  np.asarray(lay["w_up"][i])], axis=1)
        wr(p + "mlp.gate_up_proj.weight", gate_up.T)
        wr(p + "mlp.down_proj.weight", np.asarray(lay["w_down"][i]).T)
    wr("model.embed_tokens.weight", params["embed"])
    wr("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        wr("lm_head.weight", np.asarray(params["lm_head"]).T)
