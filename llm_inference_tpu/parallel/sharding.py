"""PartitionSpecs and the shard_map-wrapped forward.

Megatron-style tensor parallelism, expressed the TPU way:
- column-shard wq/wk/wv (heads) and w_gate/w_up (FFN columns);
- row-shard wo and w_down, with an explicit psum of the partial sums
  (models/llama.py applies it when tp_axis is set);
- vocab-shard embed and lm_head (masked gather + psum / logits all-gather);
- shard the KV cache over (data=batch, tensor=kv_heads);
- norms replicated.

The whole forward runs under `jax.shard_map` rather than jit+NamedSharding
annotations so the Pallas kernels (quant matmul, decode attention) execute
shard-locally — custom kernels don't carry SPMD partitioning rules, and
shard_map is the supported way to compose them with a mesh.

(Reference analogue: none — SURVEY §2.12, the reference is strictly
single-GPU.)
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_inference_tpu.config import ModelConfig
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache

_COL_SHARDED = {"wq", "wk", "wv", "w_gate", "w_up", "wqkv", "w_gateup"}
_ROW_SHARDED = {"wo", "w_down"}
_BIASES = {"bq", "bk", "bv", "bqkv"}


def _path_keys(path) -> list:
    keys = []
    for entry in path:
        if hasattr(entry, "key"):
            keys.append(str(entry.key))
        elif hasattr(entry, "name"):
            keys.append(str(entry.name))
        else:
            keys.append(str(entry))
    return keys


def _spec_for(path, leaf, tp: str, tp_size: int,
              pipe: Optional[str] = None) -> P:
    spec = _spec_for_tp(path, leaf, tp, tp_size)
    keys = _path_keys(path)
    if pipe and "layers" in keys:
        # stacked per-layer leaves [L, ...]: the leading L axis is the
        # pipeline-stage axis (parallel/pipeline.py); everything that is not
        # layer-stacked (embed / final_norm / lm_head) replicates over pipe
        assert spec[0] is None, (path, spec)
        spec = P(pipe, *spec[1:])
    return spec


def _spec_for_tp(path, leaf, tp: str, tp_size: int) -> P:
    keys = _path_keys(path)
    names = set(keys)
    # zbias (asymmetric zero-point, ops/quantization.QTensor) is
    # scale-shaped and shards identically
    is_scale = keys[-1] in ("scale", "zbias")

    if "lora" in names:
        # adapter stacks a [L, N, d_in, r] / b [L, N, r, d_out]
        # (models/lora.py). The delta must land on the SAME shard-local
        # columns/rows as the base matmul: column-sharded targets shard
        # b's d_out (a replicated — d_in is the replicated activation);
        # row-sharded targets shard a's d_in (the shard-local input slice;
        # partial deltas complete inside the layer's existing psum).
        # fuse_params' interleaved fusion keeps each shard's q/k/v columns
        # contiguous slices of the ORIGINAL projections, so a plain last-
        # axis shard of b lines up with the fused shard-local output.
        if names & _ROW_SHARDED:
            if keys[-1] == "a":
                return P(None, None, tp, None)
            return P(None, None, None, None)
        if names & _COL_SHARDED:
            if keys[-1] == "b":
                return P(None, None, None, tp)
            return P(None, None, None, None)
        return P(*([None] * leaf.ndim))

    # blocked streaming layout (QTensor.block_n): layer weights are
    # [L, NB, K', bn] (q) / [L, NB, G, bn] (scale); lm_head drops the L.
    # The column dim is the NB axis, the contraction rows stay axis -2.
    blocked = leaf.ndim == 4 or ("lm_head" in names and leaf.ndim == 3)

    if "embed" in names:
        return P(tp, None)                       # vocab-sharded
    if "lm_head" in names:
        if blocked:
            return P(tp, None, None)             # NB axis carries the vocab
        return P(*([None] * (leaf.ndim - 1) + [tp]))   # vocab-sharded cols
    if names & _COL_SHARDED:
        if blocked:
            return P(None, tp, None, None)       # [L, NB, K', bn] → NB
        return P(*([None] * (leaf.ndim - 1) + [tp]))   # [L, K, N] → cols
    if names & _BIASES:
        return P(None, tp)
    if names & _ROW_SHARDED:
        if is_scale:
            # group scales follow the contraction rows; per-channel scales
            # (one group) replicate
            g = leaf.shape[-2]
            if g > 1 and g % tp_size == 0:
                return P(*([None] * (leaf.ndim - 2) + [tp, None]))
            if g > 1:
                # replicating would silently corrupt the shard-local
                # matmul: qmatmul derives gsize = K_local // G, so the
                # replicated rows map to WRONG group boundaries
                raise ValueError(
                    f"{'/'.join(keys)}: {g} quant groups do not divide "
                    f"tp={tp_size} for a row-sharded weight — pick a "
                    f"group_size giving a tp-divisible group count")
            return P(*([None] * leaf.ndim))
        return P(*([None] * (leaf.ndim - 2) + [tp, None]))  # rows = axis -2
    # norms and anything unrecognized: replicate
    return P(*([None] * leaf.ndim))


def param_pspecs(params: Dict[str, Any], mesh: Mesh,
                 tensor_axis: str = "tensor",
                 pipe_axis: Optional[str] = None):
    """PartitionSpec pytree matching `params` (dense or quantized).
    With pipe_axis set, layer-stacked leaves additionally shard their
    leading L axis over the pipeline stages."""
    tp_size = mesh.shape[tensor_axis]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _spec_for(p, x, tensor_axis, tp_size, pipe_axis),
        params)


def deepseek_param_pspecs(params, expert_axis: str = "expert",
                          attn_shards: int = 1, num_heads: int = 0):
    """Expert-parallel PartitionSpecs for the deepseek two-stack pytree:
    expert stacks shard their expert axis (dense [Lm, E, K, N] → axis 1;
    flattened expert-block-major QTensors → axis 0); shared experts,
    router, norms, embeddings replicate (models/deepseek._v3_moe completes
    the routed mixture with one psum per MoE layer; the shared expert
    stays outside the psum).

    MLA attention additionally HEAD-shards over the SAME axis (round 3)
    when `attn_shards` divides `num_heads` and the attention projections
    are dense: wq/wq_b shard their head-major output columns, w_uk/w_uv
    their head axis, wo its head-major contraction rows — the per-layer
    psum completes attention exactly like the MoE mixture (deepseek.
    _mla_attention detects locality from w_uk's leading dim). Quantized
    attention stacks (QTensors) keep replicating — the blocked-layout
    head slicing is not wired."""
    from llm_inference_tpu.ops.quantization import QTensor

    attn_dense = not any(
        isinstance(v, QTensor)
        for sk in ("dense_layers", "moe_layers")
        for kk, v in params.get(sk, {}).items()
        if kk in ("wq", "wq_b", "wo"))
    shard_attn = (attn_shards > 1 and num_heads
                  and num_heads % attn_shards == 0 and attn_dense)
    attn_specs = {
        "wq": P(None, None, expert_axis),       # [L, H, Hh·qkdim] cols
        "wq_b": P(None, None, expert_axis),     # [L, q_lora, Hh·qkdim]
        "w_uk": P(None, expert_axis, None, None),   # [L, Hh, nope, kvr]
        "w_uv": P(None, expert_axis, None, None),   # [L, Hh, kvr, vd]
        "wo": P(None, expert_axis, None),       # [L, Hh·vd, H] rows
    }

    def espec_for(name, v):
        if name in ("e_gate", "e_up", "e_down"):
            if isinstance(v, QTensor):
                return jax.tree.map(
                    lambda leaf: P(expert_axis,
                                   *([None] * (leaf.ndim - 1))), v)
            return P(None, expert_axis, None, None)
        if isinstance(v, QTensor):
            return jax.tree.map(lambda leaf: P(), v)
        if shard_attn and name in attn_specs:
            return attn_specs[name]
        return P()

    espec = {}
    for k, v in params.items():
        if k in ("dense_layers", "moe_layers"):
            espec[k] = {kk: espec_for(kk, vv) for kk, vv in v.items()}
        else:
            espec[k] = P()
    return espec


def moe_attn_shards(cfg, params, n: int) -> bool:
    """Whether a mixtral-family forward head-shards its attention over the
    expert axis: needs n > 1, head counts divisible, DENSE attention
    projections (quantized attention stacks replicate — blocked-QTensor
    head slicing is not wired), and a per-head KV cache (deepseek's latent
    cache is head-free and replicates; its attention shards separately in
    deepseek_param_pspecs). Callers use this to pick the KV-cache specs in
    lockstep with the param specs."""
    from llm_inference_tpu.ops.quantization import QTensor
    if not is_moe(cfg) or cfg.kv_lora_rank > 0 or n <= 1:
        return False
    if cfg.num_heads % n or cfg.num_kv_heads % n:
        return False
    layers = params.get("layers", {})
    return not any(isinstance(layers.get(k), QTensor)
                   for k in ("wq", "wk", "wv", "wo"))


def moe_param_pspecs(params, expert_axis: str = "expert",
                     attn_shards: bool = False):
    """PartitionSpecs for expert parallelism over a mixtral params pytree:
    stacked expert weights shard their EXPERT axis; router, norms, and
    embeddings replicate (models/mixtral.moe_ffn completes the mixture
    with one psum per layer).

    Dense expert weights are [L, E, H, I] (shard axis 1). Quantized ones
    are flattened [L·E, ...] QTensors in mixtral.quantize_params'
    ep_shards (expert-block-major) order, so axis 0 chunks ARE the
    shard-local per-expert stacks — q and scale both shard axis 0.

    attn_shards=True (gate with moe_attn_shards — the KV-cache specs must
    agree) head-shards dense attention over the SAME axis: wq/wk/wv
    output columns, wo contraction rows; mixtral._layer psums the wo
    partials."""
    from llm_inference_tpu.ops.quantization import QTensor
    attn_specs = {
        "wq": P(None, None, expert_axis),
        "wk": P(None, None, expert_axis),
        "wv": P(None, None, expert_axis),
        "wo": P(None, expert_axis, None),
    }

    def espec_for(name, v):
        if name in ("e_gate", "e_up", "e_down"):
            if isinstance(v, QTensor):
                return jax.tree.map(
                    lambda leaf: P(expert_axis,
                                   *([None] * (leaf.ndim - 1))), v)
            return P(None, expert_axis, None, None)
        if isinstance(v, QTensor):        # quantized attention: replicate
            return jax.tree.map(lambda leaf: P(), v)
        if attn_shards and name in attn_specs:
            return attn_specs[name]
        return P()

    espec = {"layers": {k: espec_for(k, v)
                        for k, v in params["layers"].items()}}
    for k in params:
        if k != "layers":
            espec[k] = P()
    return espec


def paged_cache_pspec(tensor_axis: str = "tensor", bits: int = 16):
    """Paged pool [L, P, Hkv, ps, D]: kv heads over tensor, the page pool
    itself replicated across data (the pool is request-global — per-page
    batch sharding would couple the host allocator to the mesh); the page
    table [B, nb] is host-managed and replicated."""
    from llm_inference_tpu.ops import paged_kvcache as _pk
    spec = P(None, None, tensor_axis, None, None)
    # slot-major scale pools [L, P, ps, Hkv]: heads on the LAST axis.
    # `bits` must MATCH the cache being sharded: it is a static (aux-data)
    # field of the flax struct, so a spec tree built with the default
    # bits=16 is structurally incompatible with a quantized cache and
    # device_put rejects it.
    sspec = P(None, None, None, tensor_axis) if bits != 16 else None
    return _pk.PagedKVCache(k_pages=spec, v_pages=spec,
                            page_table=P(None, None),
                            k_scale=sspec, v_scale=sspec, bits=bits)


def shard_paged_cache(cache, mesh: Mesh, tensor_axis: str = "tensor"):
    spec = paged_cache_pspec(tensor_axis, bits=cache.bits)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(cache, shardings)


def cache_pspec(data_axis: str = "data", tensor_axis: str = "tensor",
                bits: int = 16, pipe_axis: Optional[str] = None):
    """[L, B, Hkv, ...] → layers over pipe (when set), batch over data, kv
    heads over tensor; the int8 cache's slot-major scales [L, B, S, Hkv]
    shard kv-heads on their LAST axis."""
    spec = P(pipe_axis, data_axis, tensor_axis, None, None)
    sspec = (P(pipe_axis, data_axis, None, tensor_axis) if bits != 16
             else None)
    # bits must match the cache's static field (see paged_cache_pspec)
    return kvcache.KVCache(k=spec, v=spec, k_scale=sspec, v_scale=sspec,
                           bits=bits)


def shard_params(params, mesh: Mesh, tensor_axis: str = "tensor",
                 pipe_axis: Optional[str] = None):
    """device_put the pytree with its canonical shardings."""
    specs = param_pspecs(params, mesh, tensor_axis, pipe_axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def shard_cache(cache: kvcache.KVCache, mesh: Mesh,
                data_axis: str = "data", tensor_axis: str = "tensor",
                pipe_axis: Optional[str] = None):
    spec = cache_pspec(data_axis, tensor_axis, bits=cache.bits,
                       pipe_axis=pipe_axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(cache, shardings)


def validate_tp(cfg: ModelConfig, tp_size: int) -> None:
    """TP divisibility requirements (mirrors what the spec rules assume).
    MoE models use the tensor axis as the EXPERT axis instead (see
    sharded_forward), so the check there is expert-count divisibility."""
    if is_moe(cfg):
        if cfg.num_experts % tp_size != 0:
            raise ValueError(f"num_experts={cfg.num_experts} not divisible "
                             f"by ep={tp_size}")
        return
    checks = {
        "num_heads": cfg.num_heads,
        "num_kv_heads": cfg.num_kv_heads,
        "vocab_size": cfg.vocab_size,
        "intermediate_size": cfg.intermediate_size,
    }
    for name, v in checks.items():
        if v % tp_size != 0:
            raise ValueError(f"{name}={v} not divisible by tp={tp_size}")


def is_moe(cfg: ModelConfig) -> bool:
    return getattr(cfg, "num_experts", 0) > 0


def shard_params_for(cfg: ModelConfig, params, mesh: Mesh,
                     tensor_axis: str = "tensor",
                     pipe_axis: Optional[str] = None):
    """Family-aware device_put: MoE params get expert-parallel specs over
    the tensor axis (moe_param_pspecs / deepseek_param_pspecs); everything
    else Megatron TP."""
    if is_moe(cfg):
        specs = (deepseek_param_pspecs(params, tensor_axis,
                                       attn_shards=mesh.shape[tensor_axis],
                                       num_heads=cfg.num_heads)
                 if cfg.kv_lora_rank > 0
                 else moe_param_pspecs(
                     params, tensor_axis,
                     attn_shards=moe_attn_shards(
                         cfg, params, mesh.shape[tensor_axis])))
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, P))
        return jax.device_put(params, shardings)
    return shard_params(params, mesh, tensor_axis, pipe_axis)


def sharded_forward(cfg: ModelConfig, mesh: Mesh, params,
                    *, logits_mode: str = "last",
                    data_axis: str = "data", tensor_axis: str = "tensor",
                    donate_cache: bool = True, jit: bool = True,
                    cache_bits: int = 16,
                    cache_kind: str = "dense",
                    paged_history: bool = False):
    """Build a shard_map'd forward:
        f(params, ids, positions, cache, last_idx) -> (logits, cache)

    ids/positions/last_idx are sharded over the data axis; logits come back
    replicated across the tensor axis. With jit=True the cache buffer is
    donated so XLA updates it in place; jit=False returns the raw mapped
    function for composition into larger jitted programs (e.g. the engine's
    multi-step decode scan).

    cache_kind="paged" maps a PagedKVCache (kv heads over tensor, pool
    replicated over data — requires the data axis to be size 1, since the
    page pool/table are request-global host-managed state); paged_history
    selects the prefix-cache suffix-prefill branch (models/llama.forward).
    """
    tp_size = mesh.shape[tensor_axis]
    validate_tp(cfg, tp_size)
    moe = is_moe(cfg)
    # MoE: the tensor axis is the EXPERT axis — expert stacks shard on it,
    # attention weights/KV replicate across it (one psum/layer completes
    # the mixture; models/mixtral.moe_ffn)
    if moe and cfg.kv_lora_rank > 0:
        pspecs = deepseek_param_pspecs(params, tensor_axis,
                                       attn_shards=tp_size,
                                       num_heads=cfg.num_heads)
        kv_tensor_axis = None       # latent cache is head-free: replicate
    elif moe:
        attn_sh = moe_attn_shards(cfg, params, tp_size)
        pspecs = moe_param_pspecs(params, tensor_axis, attn_shards=attn_sh)
        # dense-attention mixtral head-shards attention AND its per-head
        # KV cache over the expert axis; quantized attention replicates
        # both (moe_attn_shards)
        kv_tensor_axis = tensor_axis if attn_sh else None
    else:
        pspecs = param_pspecs(params, mesh, tensor_axis)
        kv_tensor_axis = tensor_axis
    if cache_kind == "paged":
        if mesh.shape[data_axis] != 1:
            raise ValueError(
                "paged cache over a mesh requires data axis == 1 (the page "
                "pool is request-global); use tensor parallelism")
        cspec = paged_cache_pspec(kv_tensor_axis, bits=cache_bits)
    else:
        cspec = cache_pspec(data_axis, kv_tensor_axis, bits=cache_bits)
    dspec = P(data_axis)
    tp_axis = tensor_axis if tp_size > 1 else None

    from llm_inference_tpu.models import registry as _registry
    model = _registry.get_model(cfg.name)

    # LoRA adapter stacks in the params pytree add a per-row adapter-slot
    # operand (sharded over data like ids); the factors themselves shard
    # per the lora rules in _spec_for_tp
    has_lora = isinstance(params, dict) and "lora" in params
    if has_lora:
        def fn(params, ids, positions, cache, last_idx, adapter_idx):
            return model.forward(cfg, params, ids, positions, cache,
                                 logits_mode=logits_mode, last_idx=last_idx,
                                 tp_axis=tp_axis,
                                 paged_history=paged_history,
                                 adapter_idx=adapter_idx)
        in_specs = (pspecs, P(data_axis, None), P(data_axis, None), cspec,
                    dspec, dspec)
    else:
        def fn(params, ids, positions, cache, last_idx):
            return model.forward(cfg, params, ids, positions, cache,
                                 logits_mode=logits_mode, last_idx=last_idx,
                                 tp_axis=tp_axis,
                                 paged_history=paged_history)
        in_specs = (pspecs, P(data_axis, None), P(data_axis, None), cspec,
                    dspec)

    logits_spec = (None if logits_mode == "none"
                   else P(data_axis, *([None] * (1 if logits_mode == "last" else 2))))
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=(logits_spec, cspec),
        check_vma=False,
    )
    if not jit:
        return mapped
    donate = (3,) if donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)
