"""LLaMA-family decoder as a pure JAX function.

Covers the reference's entire model layer in one module:
- LlamaContextDecoder (prefill) + LlamaSelfDecoder (decode) stacks
  (reference: src/layers/decoder/context_decoder.cpp:47-143,
  self_decoder.cpp:23-89) — here ONE `forward` handles both: prefill is
  T>1 tokens, decode is T=1, same code path, same cache discipline.
- LLaMAContextAttentionLayer / LLaMASelfAttentionLayer / LLaMAFFNLayer
  (reference: src/layers/attention/, src/layers/ffn/) — inlined into the
  scanned layer body; XLA fuses what the reference hand-fused.
- Llama<T>::firstTokenGen / continueTokenGen orchestration (reference:
  src/models/llama/llama.cpp:273-361) — the engine jits `forward` directly.

TPU-first choices:
- Layers are STACKED along a leading axis and iterated with `lax.scan`, so
  compile time and HLO size are O(1) in depth.
- Projection weights are kept SEPARATE (wq/wk/wv, w_gate/w_up) rather than
  fused as the reference does offline (reference: src/weights/llama/
  layer_weights.cc:5-45). Fusion is a kernel-launch economy that XLA makes
  irrelevant; separate weights keep every tensor-parallel shard boundary
  clean (a fused qkv axis would interleave q/k/v across shards and force
  reshards at the split points).
- Tensor parallelism is explicit: `forward(..., tp_axis="tensor")` runs the
  SAME code inside `shard_map` with manual collectives (psum after the
  row-sharded o_proj/down_proj, masked-gather+psum for the vocab-sharded
  embedding, all-gather for vocab-sharded logits). This keeps Pallas kernels
  shard-local — the supported way to combine custom kernels with SPMD.
- The KV cache is functional state threaded through scan; in the jitted
  engine programs the buffers are donated so updates are in-place.

Weight pytree layout (dense arrays or QTensor for the 7 matmul weights):
  embed:      [V, H]                 (vocab-sharded under TP)
  layers/attn_norm:  [L, H]
  layers/wq:         [L, H, Hq·D]    (+ optional bq [L, Hq·D], qwen2)
  layers/wk:         [L, H, Hkv·D]   (+ bk)
  layers/wv:         [L, H, Hkv·D]   (+ bv)
  layers/wo:         [L, Hq·D, H]
  layers/ffn_norm:   [L, H]
  layers/w_gate:     [L, H, I]
  layers/w_up:       [L, H, I]
  layers/w_down:     [L, I, H]
  final_norm: [H]
  lm_head:    [H, V]                 (absent if tied; vocab-sharded under TP)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_tpu.config import ModelConfig, QuantConfig
from llm_inference_tpu.models import lora
from llm_inference_tpu.ops import (activations, attention, embedding,
                                   kvcache, norms, paged_kvcache, rope)
from llm_inference_tpu.utils import debug
from llm_inference_tpu.ops.linear import matmul, norm_matmul
from llm_inference_tpu.ops.pallas import decode_attention as pallas_decode
from llm_inference_tpu.ops.pallas import flash_attention as pallas_flash
from llm_inference_tpu.ops.pallas import paged_attention as pallas_paged
from llm_inference_tpu.ops.pallas import paged_flash as pallas_paged_flash
from llm_inference_tpu.ops.quantization import (QTensor, choose_block_n,
                                                quantize, to_blocked,
                                                to_blocked_npair)

Params = Dict[str, Any]


def _act_dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


# ---------------------------------------------------------------------------
# Parameter init / quantization
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> Params:
    """Random dummy weights — the perf-testing path, equivalent of the
    reference's dummy loaders (reference: src/weights/llama/
    llama_weights.cc:56-88, layer_weights.cc:70-146)."""
    dtype = dtype or _act_dtype(cfg)
    H, L = cfg.hidden_size, cfg.num_layers
    I, V = cfg.intermediate_size, cfg.vocab_size
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 16)
    std = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "wq": rnd(ks[0], (L, H, Hq * D)),
        "wk": rnd(ks[1], (L, H, Hkv * D)),
        "wv": rnd(ks[2], (L, H, Hkv * D)),
        "wo": rnd(ks[3], (L, Hq * D, H)),
        "ffn_norm": jnp.ones((L, H), dtype),
        "w_gate": rnd(ks[4], (L, H, I)),
        "w_up": rnd(ks[5], (L, H, I)),
        "w_down": rnd(ks[6], (L, I, H)),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, Hq * D), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * D), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * D), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype)
    params: Params = {
        "embed": rnd(ks[7], (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rnd(ks[8], (H, V))
    return params


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def _interleave_cols(arrs, tp_size: int):
    """Concat along the last (output/column) axis, shard-locally: result
    column block s is [a0_s | a1_s | ... ] so a contiguous 1/tp_size column
    slice of the fused weight is exactly the fusion of each input's shard-s
    slice. tp_size=1 degenerates to a plain concat."""
    if tp_size == 1:
        return jnp.concatenate(arrs, axis=-1)
    parts = []
    for s in range(tp_size):
        for a in arrs:
            n = a.shape[-1] // tp_size
            parts.append(jax.lax.slice_in_dim(a, s * n, (s + 1) * n,
                                              axis=a.ndim - 1))
    return jnp.concatenate(parts, axis=-1)


def fuse_params(params: Params, tp_size: int = 1) -> Params:
    """Fuse wq/wk/wv → wqkv and w_gate/w_up → w_gateup (column concat).

    The decode GEMVs are HBM-bound with a fixed per-kernel cost, so 7
    matmuls/layer → 4 cuts overhead nearly in half. This mirrors what the
    reference does OFFLINE to its checkpoints (reference: src/weights/llama/
    layer_weights.cc:48-66 loads pre-fused qkv / gate_up files) but is done
    at load time and stays tensor-parallel-sliceable: columns are interleaved
    per TP shard (see _interleave_cols), so the sharding rules still apply
    P(..., tp) to the fused axis and each shard sees [q_s | k_s | v_s].
    Works for dense arrays and QTensors (scales concat along N as well;
    INT4 row packing is untouched by a column concat)."""
    layers = dict(params["layers"])

    def fuse(keys, out_key):
        ws = [layers.pop(k) for k in keys]
        if isinstance(ws[0], QTensor):
            layers[out_key] = QTensor(
                q=_interleave_cols([w.q for w in ws], tp_size),
                scale=_interleave_cols([w.scale for w in ws], tp_size),
                bits=ws[0].bits, group_size=ws[0].group_size,
                orig_dtype=ws[0].orig_dtype, block_rows=ws[0].block_rows,
                zbias=(None if ws[0].zbias is None else _interleave_cols(
                    [w.zbias for w in ws], tp_size)))
        else:
            layers[out_key] = _interleave_cols(ws, tp_size)

    if "wq" in layers:
        fuse(("wq", "wk", "wv"), "wqkv")
        if "bq" in layers:
            fuse(("bq", "bk", "bv"), "bqkv")
    if "w_gate" in layers:
        fuse(("w_gate", "w_up"), "w_gateup")
    out = dict(params)
    out["layers"] = layers
    return out


# Output-column-sharded vs contraction-row-sharded weight names under TP
# (must stay in sync with parallel/sharding.py's spec rules).
_COL_KEYS = ("wqkv", "wq", "wk", "wv", "w_gate", "w_up", "w_gateup")
_ROW_KEYS = ("wo", "w_down")


def block_params(params: Params, tp_size: int = 1,
                 target_bytes: int = 3 << 20,
                 int4_npair: bool = True,
                 dense_stream: bool = False) -> Params:
    """Re-lay every QTensor into the column-blocked streaming layout
    (quantization.to_blocked) so the Pallas decode GEMV DMAs contiguous
    chunks. The block width divides the TP-shard-local output dim so the
    blocked leading axis shards cleanly; the chunk-size budget is computed
    on the shard-local contraction rows.

    int4_npair (DEFAULT): re-lay INT4 weights with N-PAIR nibble packing
    (quantization.to_blocked_npair) enabling the difference-of-dots unpack
    in the Pallas kernel — chip A/B'd at 7B decode: 170.9 vs 155.4 tok/s
    (81.2% vs 73.9% of the HBM roofline), the lo-nibble AND plus two dots
    replace the VPU floor/mul hi extraction. TP-compatible: the paired
    columns (j, j + bn/2) live inside one output block, bn divides the
    shard-local output dim (choose_block_n runs on n_local), so an NB-axis
    column shard keeps every pair intact; a row shard slices the UNPACKED
    K rows (pack_axis "n" bytes are row-self-contained), which is strictly
    simpler than the split-half layout's block_rows discipline. Sharded
    parity: tests/test_sharding.py::test_tp_int4_npair_parity."""
    layers = dict(params["layers"])
    npair_ok = int4_npair

    def budget(w):
        # int4 split-half chunks unpack to 2× rows of i32/f32 intermediates
        # in VMEM — keep the packed streaming block smaller so the whole
        # working set stays within scoped vmem
        return target_bytes if w.bits == 8 else target_bytes // 2

    def blk(w, k_local, n_local):
        if w.bits == 4 and npair_ok:
            # halved budget ON PURPOSE (chip-measured, round 3): smaller
            # blocks = more grid steps = better DMA pipelining — qkv
            # bn768 beats 1536 (33.5 vs 37.9 µs), down bn256 beats 512
            # (20.7 vs 31.8), wo bn512 beats 1024 (5.6 vs 6.3). A full-
            # budget 13B w_down fallback is avoided by the 128-quantum
            # retry below, and the once-per-step lm_head gets its wide
            # block via the vocab pad instead (scripts/proto_npair_dots).
            bn = choose_block_n(k_local, n_local, budget(w), quantum=256)
            if bn:
                return to_blocked_npair(w, bn)
            # no 256-quantum block fits the halved budget (13B's w_down,
            # Kp=6912): take the FULL budget rather than fall off npair
            bn = choose_block_n(k_local, n_local, target_bytes,
                                quantum=256)
            if bn:
                return to_blocked_npair(w, bn)
        bn = choose_block_n(k_local, n_local, budget(w))
        return to_blocked(w, bn) if bn else w

    for name, w in layers.items():
        if (dense_stream and not isinstance(w, QTensor)
                and name in _COL_KEYS + _ROW_KEYS):
            # DENSE bf16 → bits-16 streaming QTensor (to_blocked_dense).
            # NOTE: re-laying a full 7B bf16 stack doubles HBM transiently
            # — on a 16 GB chip generate weights directly in the blocked
            # layout instead (quantization.dense_blocked_qtensor,
            # scripts/bench_dense.py); this path serves checkpoint loads
            # (host-side) and small models.
            from llm_inference_tpu.ops.quantization import to_blocked_dense
            K, N = w.shape[-2], w.shape[-1]
            n_local = N // tp_size if name in _COL_KEYS else N
            k_local = K // tp_size if name in _ROW_KEYS else K
            bn = choose_block_n(k_local, n_local, target_bytes, itemsize=2)
            if bn:
                layers[name] = to_blocked_dense(w, bn)
            continue
        if not isinstance(w, QTensor) or w.block_n:
            continue
        Kp, N = w.q.shape[-2], w.q.shape[-1]
        n_local = N // tp_size if name in _COL_KEYS else N
        k_local = Kp // tp_size if name in _ROW_KEYS else Kp
        layers[name] = blk(w, k_local, n_local)
    out = dict(params)
    out["layers"] = layers
    lm = out.get("lm_head")
    if isinstance(lm, QTensor) and not lm.block_n:
        if npair_ok and lm.bits == 4 and tp_size == 1:
            # vocab rarely admits wide 256-quantum blocks (32000 → bn=256,
            # 0.5 MB chunks); pad the columns to the next 512 multiple so
            # a mid-size block engages (32000→32256: bn=768 under the
            # halved budget — the chip-measured lm_head sweet spot, 81.4
            # µs vs 118 at bn=256 and 91.3 at bn=1536). Padded columns
            # are EXACT zeros through the N-pair kernel (zero codes →
            # lo_u=8, hi=0; d2 − 8·xsum cancels) and forward slices
            # logits back to cfg.vocab_size.
            Kp, N = lm.q.shape[-2], lm.q.shape[-1]
            n_pad = _round_up(N, 512)
            if (n_pad != N
                    and choose_block_n(Kp, n_pad, budget(lm), quantum=256)
                    > (choose_block_n(Kp, N, budget(lm), quantum=256)
                       or 0)):
                lm = _pad_qtensor_cols(lm, n_pad)
            import os
            force_bn = int(os.environ.get("LLMI_LMHEAD_BN", "0"))
            if force_bn and lm.q.shape[-1] % force_bn == 0:
                # perf-experiment knob: force the lm_head streaming width
                return dict(out, lm_head=to_blocked_npair(lm, force_bn))
        out["lm_head"] = blk(lm, lm.q.shape[-2], lm.q.shape[-1] // tp_size)
    return out


def _pad_qtensor_cols(qt: QTensor, n_pad: int) -> QTensor:
    """Zero-pad a row-major QTensor's output columns (q codes 0, scale 1,
    zbias 0 — all dequantize to exactly 0)."""
    N = qt.q.shape[-1]
    widths = [(0, 0)] * (qt.q.ndim - 1) + [(0, n_pad - N)]
    return QTensor(
        q=jnp.pad(qt.q, widths),
        scale=jnp.pad(qt.scale, widths, constant_values=1.0),
        bits=qt.bits, group_size=qt.group_size, orig_dtype=qt.orig_dtype,
        block_rows=qt.block_rows, block_n=qt.block_n,
        zbias=None if qt.zbias is None else jnp.pad(qt.zbias, widths))


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def pad_params_for_tp(params: Params, cfg: ModelConfig,
                      tp_size: int) -> Params:
    """Zero-pad the FFN intermediate and vocab dims so every TP shard is a
    multiple of 128 lanes — the condition for the blocked streaming kernels
    (and clean XLA tiling) on each shard. Exact: padded gate/up columns
    produce silu(0)·0 = 0 through the padded down rows; padded vocab rows
    are unreachable ids, and `forward` slices logits back to
    cfg.vocab_size. Call on DENSE params before quantization."""
    if tp_size <= 1:
        return params
    quantum = 128 * tp_size
    I = cfg.intermediate_size
    V = cfg.vocab_size
    I_pad, V_pad = _round_up(I, quantum), _round_up(V, quantum)
    if I_pad == I and V_pad == V:
        return params

    def pad_axis(a, axis, new):
        if a.shape[axis] == new:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, new - a.shape[axis])
        return jnp.pad(a, widths)

    layers = dict(params["layers"])
    if I_pad != I:
        for k in ("w_gate", "w_up"):
            layers[k] = pad_axis(layers[k], 2, I_pad)      # [L, H, I]
        layers["w_down"] = pad_axis(layers["w_down"], 1, I_pad)  # [L, I, H]
    out = dict(params)
    out["layers"] = layers
    if V_pad != V:
        out["embed"] = pad_axis(params["embed"], 0, V_pad)
        if "lm_head" in params:
            out["lm_head"] = pad_axis(params["lm_head"], 1, V_pad)
    return out


def prepare_params(params: Params, tp_size: int = 1, *, fuse: bool = True,
                   block: bool = True, donate: bool = True,
                   int4_npair: bool = True,
                   dense_stream: bool = False) -> Params:
    """Post-quantization layout passes: fuse qkv/gate-up, then re-lay
    QTensors for streaming. Call after quantize_params / checkpoint load.

    donate=True (default) runs the re-layout as one jitted program with the
    input pytree donated, so the old layout never coexists with the new one
    in HBM (a 7B model would otherwise briefly need ~2× weight memory).
    The caller's `params` buffers are invalidated — rebind the variable.
    """
    def _transform(p):
        if fuse:
            p = fuse_params(p, tp_size)
        if block:
            p = block_params(p, tp_size, int4_npair=int4_npair,
                             dense_stream=dense_stream)
        return p

    if donate:
        # The donation is for LIFETIME (the old layout's buffers free at
        # program end, not after the caller drops its pytree), not for
        # aliasing: a blocked re-layout changes shapes, so XLA usually
        # cannot reuse the donated buffers in place and warns "donated
        # buffers were not usable". That is expected — silence it so real
        # donation bugs in the serving programs stay visible.
        import warnings
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message="Some donated buffers were not usable")
            return jax.jit(_transform, donate_argnums=0)(params)
    return _transform(params)


def quantize_params(params: Params, qcfg: QuantConfig,
                    row_shards: int = 1) -> Params:
    """Quantize the per-layer matmul weights to QTensors (stacked over L).

    lm_head/embed stay dense unless qcfg.quantize_embedding — the gather and
    the final logits matmul are accuracy-sensitive.

    `row_shards`: tensor-parallel degree. Row-sharded weights (wo, w_down)
    get INT4 pack blocks aligned to shard boundaries so each TP shard's
    slice is a self-contained packed matrix (see ops/quantization.QTensor).
    """
    if not qcfg.enabled:
        return params
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    out = dict(params)
    layers = dict(params["layers"])
    asym = getattr(qcfg, "asymmetric", False)
    for name in _QUANT_KEYS:
        w = layers[name]  # [L, K, N]
        blocks = row_shards if name in ("wo", "w_down") else 1
        layers[name] = jax.vmap(
            lambda m: quantize(m, bits, qcfg.group_size, pack_blocks=blocks,
                               asymmetric=asym))(w)
    out["layers"] = layers
    if qcfg.quantize_embedding and "lm_head" in params:
        out["lm_head"] = quantize(params["lm_head"], bits, qcfg.group_size,
                                  asymmetric=asym)
    elif qcfg.quantize_embedding and "lm_head" not in params:
        # TIED embeddings (gemma2/3, qwen small): derive a quantized
        # lm_head QTensor from the table so the once-per-step logits
        # matmul streams codes instead of the full bf16 table (gemma2-2b:
        # 1.18 GB/token → 0.59 — the tied 256k-vocab head dominates its
        # decode). The bf16 table stays for the input GATHER (reads one
        # row — traffic-free); forward prefers "lm_head" when present.
        # Chunked along the vocab: a whole-table f32 transpose transient
        # next to the layer-quantization transients OOM'd a 16 GB chip
        # (the failure surfaces LATER via async dispatch — at the first
        # use of the poisoned arrays). Column chunks are exact: scales
        # are per-(group, column).
        emb = params["embed"]
        V = emb.shape[0]
        step = 32768
        qs, ss, zs = [], [], []
        for c in range(0, V, step):
            part = quantize(emb[c:c + step].T.astype(jnp.float32), bits,
                            qcfg.group_size, asymmetric=asym)
            qs.append(part.q)
            ss.append(part.scale)
            if asym:
                zs.append(part.zbias)
        out["lm_head"] = QTensor(
            q=jnp.concatenate(qs, axis=-1),
            scale=jnp.concatenate(ss, axis=-1),
            bits=bits, group_size=qcfg.group_size,
            orig_dtype=str(emb.dtype),
            block_rows=(emb.shape[1] // 2 if bits == 4 else 0),
            zbias=jnp.concatenate(zs, axis=-1) if asym else None)
    return out


def init_params_quantized(cfg: ModelConfig, key: jax.Array,
                          qcfg: QuantConfig, dtype=None,
                          row_shards: int = 1) -> Params:
    """Random quantized dummy weights, built directly as QTensors — the
    perf-bench path for big models (never materializes the dense weights,
    so a 7B INT8 model needs ~7 GB instead of ~20 GB peak)."""
    if not qcfg.enabled:
        return init_params(cfg, key, dtype)
    dtype = dtype or _act_dtype(cfg)
    bits = {"int8": 8, "int4": 4}[qcfg.weights]
    H, L = cfg.hidden_size, cfg.num_layers
    I, V = cfg.intermediate_size, cfg.vocab_size
    D, Hq, Hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = iter(jax.random.split(key, 16))
    qmax = 2 ** (bits - 1) - 1
    # scale chosen so dequantized weights look like N(0, 0.02)-ish
    scale_val = 0.02 / qmax

    def qrnd(k, K, N, blocks=1):
        rows = K // 2 if bits == 4 else K
        q = jax.random.randint(k, (L, rows, N), -128, 128, jnp.int32
                               ).astype(jnp.int8)
        gs = qcfg.group_size
        groups = K // gs if (0 < gs < K) else 1
        scale = jnp.full((L, groups, N), scale_val, jnp.float32)
        zb = (jnp.full((L, groups, N), scale_val * 0.5, jnp.float32)
              if getattr(qcfg, "asymmetric", False) else None)
        return QTensor(q=q, scale=scale, bits=bits,
                       group_size=qcfg.group_size, orig_dtype=str(dtype),
                       block_rows=(K // 2 // blocks if bits == 4 else 0),
                       zbias=zb)

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, H), dtype),
        "wq": qrnd(next(ks), H, Hq * D),
        "wk": qrnd(next(ks), H, Hkv * D),
        "wv": qrnd(next(ks), H, Hkv * D),
        "wo": qrnd(next(ks), Hq * D, H, blocks=row_shards),
        "ffn_norm": jnp.ones((L, H), dtype),
        "w_gate": qrnd(next(ks), H, I),
        "w_up": qrnd(next(ks), H, I),
        "w_down": qrnd(next(ks), I, H, blocks=row_shards),
    }
    params: Params = {
        "embed": rnd(next(ks), (V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        if qcfg.quantize_embedding:
            # match the REAL checkpoint path (quantize_params quantizes
            # lm_head at the CONFIG bits) — the dummy used to pin int8,
            # so the bench streamed 131 MB of lm_head where a real int4
            # deployment streams 66 MB
            rows = H // 2 if bits == 4 else H
            gs = qcfg.group_size
            lm_groups = H // gs if (0 < gs < H) else 1
            params["lm_head"] = QTensor(
                q=jax.random.randint(next(ks), (rows, V), -128, 128,
                                     jnp.int32).astype(jnp.int8),
                scale=jnp.full((lm_groups, V), scale_val, jnp.float32),
                bits=bits, group_size=qcfg.group_size,
                orig_dtype=str(dtype),
                block_rows=(rows if bits == 4 else 0))
        else:
            params["lm_head"] = rnd(next(ks), (H, V))
    return params


def param_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# TP collectives (no-ops when tp_axis is None / outside shard_map)
# ---------------------------------------------------------------------------

def _psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _sharded_embedding_lookup(table, ids, tp_axis):
    """Vocab-sharded gather: local rows cover [lo, lo + V_local); out-of-shard
    ids contribute zero and the psum restores the full row."""
    if not tp_axis:
        return embedding.embedding_lookup(table, ids)
    v_local = table.shape[0]
    lo = jax.lax.axis_index(tp_axis) * v_local
    local = ids - lo
    in_shard = (local >= 0) & (local < v_local)
    rows = jnp.take(table, jnp.clip(local, 0, v_local - 1), axis=0)
    rows = jnp.where(in_shard[..., None], rows, 0)
    return jax.lax.psum(rows, tp_axis)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _gather_paged(cache, layer_idx, B):
    """Materialize every sequence's pages densely: [B, Hkv, NB·ps(, D)].
    Used by the paged fallbacks (unsupported head_dim decode; prefix-cache
    suffix prefill, where fresh tokens attend over shared history pages)."""
    nb_, ps_ = cache.max_blocks, cache.page_size

    def gather(pages):
        # [B, NB, Hkv, ps, D] → [B, Hkv, NB·ps, D]
        g = pages[layer_idx][cache.page_table].transpose(0, 2, 1, 3, 4)
        return g.reshape(B, g.shape[1], nb_ * ps_, g.shape[4])

    def gather_scales(s):
        # slot-major pool scales [L, P, ps, Hkv] → [B, NB·ps, Hkv]
        # (ops.attention.attend's scale convention) — a pure gather+merge
        g = s[layer_idx][cache.page_table]
        return g.reshape(B, nb_ * ps_, g.shape[3])

    kd, vd = gather(cache.k_pages), gather(cache.v_pages)
    ksd = vsd = None
    if cache.quantized:
        ksd = gather_scales(cache.k_scale)
        vsd = gather_scales(cache.v_scale)
    return kd, vd, ksd, vsd


def write_kv_and_views(cache, layer_idx, k, v, positions, write_offsets,
                       B, T):
    """Shared cache-dispatch for the jnp attention path (gemma2/mixtral):
    write this layer's K/V into a dense OR paged cache and return dense
    views + scales + the slot count. Paged prefill writes at per-sequence
    start blocks (positions need not start at 0), so chunked admission and
    prefix-cache suffix prefill work for every family."""
    if isinstance(cache, paged_kvcache.PagedKVCache):
        if T == 1:
            cache = paged_kvcache.write_token(cache, layer_idx, k, v,
                                              positions[:, 0])
        else:
            start_blocks = write_offsets // cache.page_size
            cache = paged_kvcache.write_prompt_batch(
                cache, layer_idx, k, v, T // cache.page_size, start_blocks)
        kd, vd, ksd, vsd = _gather_paged(cache, layer_idx, B)
        S = cache.max_blocks * cache.page_size
        return cache, kd, vd, ksd, vsd, S

    cache = kvcache.update_cache_layer(cache, layer_idx, k, v,
                                       write_offsets)

    def at_layer(x):
        return (None if x is None else
                jax.lax.dynamic_index_in_dim(x, layer_idx, 0,
                                             keepdims=False))
    return (cache, at_layer(cache.k), at_layer(cache.v),
            at_layer(cache.k_scale), at_layer(cache.v_scale),
            cache.max_seq_len)


def cached_attention(cfg: ModelConfig, q, k, v, cache, layer_idx,
                     positions, write_offsets, mask,
                     paged_history: bool = False):
    """Write this layer's K/V into the (dense or paged) cache and attend —
    with the full Pallas kernel dispatch (decode / flash / paged kernels,
    jnp fallbacks). Shared by llama and mixtral; the static
    cfg.sliding_window (mistral) flows into every path, including the
    decode kernels. gemma2's per-layer TRACED window takes the same
    kernels through its own dispatch (models/gemma2._layer).

    q/k/v: [B, T, H*, D] (post-rope). Returns (attn [B, T, Hq, D], cache).
    """
    B, T = q.shape[:2]
    if isinstance(cache, paged_kvcache.PagedKVCache):
        # ---- paged path (vLLM-style pool; see ops/paged_kvcache.py) ----
        if T == 1:
            cache = paged_kvcache.write_token(cache, layer_idx, k, v,
                                              positions[:, 0])
            if pallas_paged.supports(q.shape, cache.page_size):
                attn = pallas_paged.paged_decode_attention(
                    q, cache.k_pages, cache.v_pages, cache.page_table,
                    layer_idx, positions[:, -1],
                    logit_softcap=cfg.attn_logit_softcap,
                    k_scale=cache.k_scale, v_scale=cache.v_scale,
                    window=cfg.sliding_window)
            else:
                # gather-based fallback (unsupported head_dim): materialize
                # the sequences' pages densely, then the XLA path
                kd, vd, ksd, vsd = _gather_paged(cache, layer_idx, B)
                dmask = attention.make_attention_mask(
                    positions, cache.max_blocks * cache.page_size,
                    cfg.sliding_window)
                attn = attention.attend(q, kd, vd, dmask,
                                        logit_softcap=cfg.attn_logit_softcap,
                                        k_scale=ksd, v_scale=vsd)
        elif paged_history:
            # prefix-cache suffix prefill (engine/prefix_cache.py): the
            # sequence's first blocks are SHARED pages holding an already-
            # prefilled prefix. Write the fresh tokens at their block offset
            # and attend over the full page table, position-masked.
            cache = paged_kvcache.write_prompt_batch(
                cache, layer_idx, k, v, T // cache.page_size,
                start_blocks=write_offsets // cache.page_size)
            if pallas_paged_flash.supports(q.shape, cache.page_size):
                # read pages once, straight from the pool — the gather
                # fallback materializes every sequence's pages densely
                # EVERY LAYER (3x the attention-side HBM traffic)
                attn = pallas_paged_flash.paged_flash_attention(
                    q, cache.k_pages, cache.v_pages, cache.page_table,
                    layer_idx, positions,
                    logit_softcap=cfg.attn_logit_softcap,
                    sliding_window=cfg.sliding_window,
                    k_scale=cache.k_scale, v_scale=cache.v_scale)
            else:
                kd, vd, ksd, vsd = _gather_paged(cache, layer_idx, B)
                dmask = attention.make_attention_mask(
                    positions, cache.max_blocks * cache.page_size,
                    cfg.sliding_window)
                attn = attention.attend(
                    q, kd, vd, dmask,
                    logit_softcap=cfg.attn_logit_softcap,
                    k_scale=ksd, v_scale=vsd)
        else:
            # prefill: sequences start at position 0 (scheduler invariant),
            # so attention is causal over the fresh tokens only
            cache = paged_kvcache.write_prompt_batch(
                cache, layer_idx, k, v, T // cache.page_size)
            attn = attention.attend(q, k.transpose(0, 2, 1, 3),
                                    v.transpose(0, 2, 1, 3), mask,
                                    logit_softcap=cfg.attn_logit_softcap)
        return attn, cache

    cache = kvcache.update_cache_layer(cache, layer_idx, k, v, write_offsets)
    S = cache.max_seq_len
    if T == 1 and pallas_decode.supports(q.shape, S):
        attn = pallas_decode.decode_attention(
            q, cache.k, cache.v, layer_idx, positions[:, -1],
            logit_softcap=cfg.attn_logit_softcap,
            k_scale=cache.k_scale, v_scale=cache.v_scale,
            window=cfg.sliding_window)
    elif pallas_flash.supports(q.shape, S, cache.quantized):
        attn = pallas_flash.flash_attention(
            q, cache.k, cache.v, layer_idx, positions,
            logit_softcap=cfg.attn_logit_softcap,
            sliding_window=cfg.sliding_window,
            k_scale=cache.k_scale, v_scale=cache.v_scale)
    else:
        def at_layer(x):
            return (None if x is None else
                    jax.lax.dynamic_index_in_dim(x, layer_idx, 0,
                                                 keepdims=False))
        attn = attention.attend(q, at_layer(cache.k), at_layer(cache.v),
                                mask, logit_softcap=cfg.attn_logit_softcap,
                                k_scale=at_layer(cache.k_scale),
                                v_scale=at_layer(cache.v_scale))
    return attn, cache


def _layer(cfg: ModelConfig, h, lp, qw, cache, layer_idx, positions,
           write_offsets, mask, cos, sin, tp_axis: Optional[str],
           paged_history: bool = False, lora_lp=None, adapter_idx=None,
           stacked_norms=None, residual_in=None, want_pair: bool = False,
           mega_norms=None):
    """One decoder layer. h: [B, T, H] (replicated across TP).

    Layer-varying state is split three ways:
    - `lp`: small per-layer tensors (norms, biases, dense weights) — scanned
      xs, sliced by the scan itself.
    - `qw`: stacked QTensor weights, passed WHOLE and indexed by `layer_idx`
      inside the matmul kernel (a scan-sliced operand to an opaque Pallas
      call would be materialized — an HBM→HBM copy of every weight every
      step; see ops/pallas/quant_matmul._quant_matmul_blocked).
    - the FULL stacked cache (k_all [L, B, Hkv_local, D, S], v_all
      [L, B, Hkv_local, S, D]) — scan CARRY, updated in place via while-loop
      carry aliasing, pages addressed by `layer_idx` (kvcache.
      update_kv_cache_layer)."""
    B, T, H = h.shape
    D = cfg.head_dim
    eps = cfg.rms_norm_eps

    # whole-layer decode megakernel (qkv+rope+KV-write+attention+tail in
    # ONE pallas call — ops/pallas/layer_fused.py). bs=1 single-chip npair
    # decode only; every other case falls through to the split kernels.
    import os as _os
    if (B * T == 1 and tp_axis is None and want_pair
            and residual_in is not None and lora_lp is None
            and "wqkv" in qw and "wo" in qw and "w_gateup" in qw
            and "w_down" in qw
            and _os.environ.get("LLMI_LAYER_MEGA", "0") == "1"):
        from llm_inference_tpu.ops.pallas import layer_fused
        mega = layer_fused.layer_decode_fused(
            cfg, h, residual_in, lp, qw, cache, layer_idx, positions,
            cos, sin, stacked_norms=mega_norms)
        if mega is not None:
            h2, down_out, cache = mega
            return h2, cache, down_out

    def mm(name, x, bias=None):
        if name in qw:
            return matmul(x, qw[name], bias=bias, layer=layer_idx)
        return matmul(x, lp[name], bias=bias)

    def ld(name, x, out):
        # per-row LoRA delta on top of the (possibly fused/quantized) base
        # matmul (models/lora.py — no-op when no adapter stacks ride)
        return lora.apply_delta(name, lora_lp, x, out, adapter_idx)

    # fused layer-entry path: the RMSNorm (and the attention residual add)
    # run INSIDE the quantized GEMV kernels (ops/linear.norm_matmul) —
    # drops ~6 small XLA ops per layer from the decode step. Requires the
    # fused quantized projections and no LoRA (adapter deltas consume the
    # materialized `normed`). Stacked norms (when provided) index by the
    # prefetched layer INSIDE the kernels — no per-layer gamma slice ops.
    fused_entry = ("wqkv" in qw and "w_gateup" in qw and lora_lp is None)
    sn = stacked_norms or {}
    attn_gamma = sn.get("attn_norm", lp["attn_norm"])
    ffn_gamma = sn.get("ffn_norm", lp["ffn_norm"])

    # --- attention block ---
    if fused_entry:
        if residual_in is not None:
            # pair-carry protocol (forward's fused scan): the previous
            # layer's down-projection delta folds into THIS kernel's
            # prologue — the per-layer h2 + down XLA add disappears
            qkv, h = norm_matmul(h, qw["wqkv"], attn_gamma, eps,
                                 bias=lp.get("bqkv"), layer=layer_idx,
                                 residual=residual_in, want_x_out=True)
        else:
            qkv = norm_matmul(h, qw["wqkv"], attn_gamma, eps,
                              bias=lp.get("bqkv"), layer=layer_idx)
        normed = None
    else:
        if residual_in is not None:
            h = h + residual_in
        normed = norms.rms_norm(h, lp["attn_norm"], eps)
    if "wqkv" in qw or "wqkv" in lp:
        # load-time fused projection (fuse_params); split is shard-local
        if not fused_entry:
            qkv = mm("wqkv", normed, bias=lp.get("bqkv"))
        n_local = qkv.shape[-1]
        nq = n_local * cfg.num_heads // (cfg.num_heads + 2 * cfg.num_kv_heads)
        nkv = (n_local - nq) // 2
        q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nkv], qkv[..., nq + nkv:])
    else:
        q = mm("wq", normed, bias=lp.get("bq"))
        k = mm("wk", normed, bias=lp.get("bk"))
        v = mm("wv", normed, bias=lp.get("bv"))
    if not fused_entry:
        q = ld("wq", normed, q)
        k = ld("wk", normed, k)
        v = ld("wv", normed, v)
    q = q.reshape(B, T, -1, D)       # [B, T, Hq_local, D]
    k = k.reshape(B, T, -1, D)
    v = v.reshape(B, T, -1, D)
    if cfg.qk_norm:
        # qwen3: per-head RMSNorm over head_dim, before RoPE (HF
        # Qwen3Attention applies q_norm/k_norm to the reshaped heads)
        q = norms.rms_norm(q, lp["q_norm"], eps)
        k = norms.rms_norm(k, lp["k_norm"], eps)
    q = rope.apply_rope(q, positions, cos, sin)
    k = rope.apply_rope(k, positions, cos, sin)

    attn, cache = cached_attention(cfg, q, k, v, cache, layer_idx,
                                   positions, write_offsets, mask,
                                   paged_history)
    attn2d = attn.reshape(B, T, -1)
    if fused_entry:
        # single-chip: the whole layer tail (wo → +h/norm → gate-up →
        # SwiGLU → down) is ONE pallas call — three kernel boundaries
        # removed per layer. Under TP the wo partials must psum before
        # the residual, so the tail splits after wo (ffn_fused).
        if tp_axis is None and "wo" in qw and "w_down" in qw:
            from llm_inference_tpu.ops.pallas import quant_matmul as _qm
            tail = _qm.layer_tail_fused(h, attn2d, qw["wo"],
                                        qw["w_gateup"], qw["w_down"],
                                        ffn_gamma, eps, layer_idx)
            if tail is not None:
                down_out, h2 = tail
                if want_pair:
                    return h2, cache, down_out
                return h2 + down_out, cache
        attn_out = _psum(mm("wo", attn2d), tp_axis)
        # FFN megakernel: norm(h + attn_out) → gate-up → SwiGLU → down in
        # ONE pallas call (ops/pallas/quant_matmul.ffn_fused) — Mosaic
        # prefetches down blocks behind the gate-up tail instead of
        # paying a fresh DMA ramp per GEMV
        if "w_down" in qw:
            from llm_inference_tpu.ops.pallas import quant_matmul as _qm
            ffn = _qm.ffn_fused(h, attn_out, ffn_gamma, eps,
                                qw["w_gateup"], qw["w_down"], layer_idx)
            if ffn is not None:
                down_out, h2 = ffn
                down_out = _psum(down_out, tp_axis)
                if want_pair:
                    return h2, cache, down_out
                return h2 + down_out, cache
        # fallback: norm(h + attn_out) fused into the gate-up GEMV; the
        # kernel also returns h2 = h + attn_out (the residual stream)
        gateup, h2 = norm_matmul(h, qw["w_gateup"], ffn_gamma, eps,
                                 residual=attn_out, layer=layer_idx,
                                 want_x_out=True)
        gate, up = jnp.split(gateup, 2, axis=-1)
        act = activations.swiglu_split(gate, up)
        down_out = _psum(mm("w_down", act), tp_axis)
        if want_pair:
            return h2, cache, down_out
        return h2 + down_out, cache

    attn_out = ld("wo", attn2d, mm("wo", attn2d))
    h = h + _psum(attn_out, tp_axis)

    # --- FFN block ---
    normed = norms.rms_norm(h, lp["ffn_norm"], eps)
    if "w_gateup" in qw or "w_gateup" in lp:
        gate, up = jnp.split(mm("w_gateup", normed), 2, axis=-1)
        act = activations.swiglu_split(ld("w_gate", normed, gate),
                                       ld("w_up", normed, up))
    else:
        act = activations.swiglu_split(
            ld("w_gate", normed, mm("w_gate", normed)),
            ld("w_up", normed, mm("w_up", normed)))
    down_out = _psum(ld("w_down", act, mm("w_down", act)), tp_axis)
    if want_pair:
        return h, cache, down_out
    return h + down_out, cache


def forward(
    cfg: ModelConfig,
    params: Params,
    ids: jnp.ndarray,            # [B, T] int32
    positions: jnp.ndarray,      # [B, T] int32 absolute positions
    cache: kvcache.KVCache,
    *,
    logits_mode: str = "last",   # "last" | "all" | "none"
    last_idx: Optional[jnp.ndarray] = None,  # [B] index of last valid token
    tp_axis: Optional[str] = None,           # shard_map axis name for TP
    paged_history: bool = False,  # paged prefill atop shared prefix pages
    adapter_idx: Optional[jnp.ndarray] = None,  # [B] LoRA slot per row
) -> Tuple[Optional[jnp.ndarray], kvcache.KVCache]:
    """Run the decoder over T tokens per sequence, updating the cache.

    Prefill = T>1 (reference firstTokenGen), decode = T=1 (continueTokenGen).
    Returns (logits, new_cache); logits is [B, V] for "last", [B, T, V] for
    "all" (perplexity scoring), None for "none" (cache warm-up).
    """
    B, T = ids.shape
    paged = isinstance(cache, paged_kvcache.PagedKVCache)
    # paged prefill attends over the fresh tokens only (sequences start at
    # position 0 there — scheduler invariant); dense attends over cache slots
    S = T if paged else cache.max_seq_len
    dtype = _act_dtype(cfg)

    h = _sharded_embedding_lookup(params["embed"], ids, tp_axis).astype(dtype)
    mask = attention.make_attention_mask(positions, S, cfg.sliding_window)
    write_offsets = positions[:, 0]
    # positions are bounded by the cache (masks/writes clamp there), so
    # the cos/sin tables need never exceed it — a 131k-context preset
    # otherwise bakes ~134 MB of f32 tables into every compiled program
    pos_limit = (cache.max_blocks * cache.page_size if paged
                 else cache.max_seq_len)
    cos, sin = rope.make_rope_table(
        min(cfg.max_position_embeddings, pos_limit), cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling)

    # stacked QTensor weights bypass the scan (indexed inside the kernels);
    # everything small rides as scan xs — including the LoRA adapter
    # stacks params["lora"] [L, N, ...] (models/lora.py), sliced per layer
    qw = {k: v for k, v in params["layers"].items() if isinstance(v, QTensor)}
    xs = {k: v for k, v in params["layers"].items()
          if not isinstance(v, QTensor)}
    lora_stacks = params.get("lora")
    if lora_stacks is not None and adapter_idx is None:
        adapter_idx = jnp.zeros((B,), jnp.int32)       # slot 0 = base
    # under TP the adapter factors arrive shard-local (parallel/sharding
    # lora spec rules): col-target b shards d_out, row-target a shards
    # d_in — the deltas land on shard-local outputs and the row-target
    # partials complete inside the layer's existing psum

    debug.tap("embed", h)

    # Scan-sliced gammas are the measured DEFAULT: feeding the kernels
    # the STACKED [L, 1, K] norms (indexed by the prefetched layer) costs
    # ~0.1 ms/step MORE at 7B — the unit sublane dim pads to a full tile
    # so every per-call gamma DMA reads ~16x the row (A/B'd 2x2
    # interleaved: 5.44 vs 5.34 ms/step). LLMI_STACKED_GAMMA=1 re-runs
    # that A/B.
    import os as _os
    stacked_norms = None
    if (lora_stacks is None and "wqkv" in qw and "w_gateup" in qw
            and _os.environ.get("LLMI_STACKED_GAMMA") == "1"):
        stacked_norms = {"attn_norm": params["layers"]["attn_norm"],
                         "ffn_norm": params["layers"]["ffn_norm"]}

    use_pair = lora_stacks is None and "wqkv" in qw and "w_gateup" in qw
    if use_pair:
        # pair carry (h2, delta): each layer's down-projection delta folds
        # into the NEXT layer's fused qkv prologue instead of a standalone
        # XLA add per layer; the pair closes once after the scan
        # the megakernel indexes these stacked gammas in-kernel (no scan
        # slice); the split path keeps its measured-default scan-sliced lp
        mega_norms = {"attn_norm": params["layers"]["attn_norm"],
                      "ffn_norm": params["layers"]["ffn_norm"]}

        def body(carry, lp):
            h2, d, cache, idx = carry
            h2, cache, d2 = _layer(cfg, h2, lp, qw, cache, idx, positions,
                                   write_offsets, mask, cos, sin, tp_axis,
                                   paged_history=paged_history,
                                   stacked_norms=stacked_norms,
                                   residual_in=d, want_pair=True,
                                   mega_norms=mega_norms)
            debug.tap("out", h2 + d2, layer=idx)
            return (h2, d2, cache, idx + 1), None

        (h, d, new_cache, _), _ = jax.lax.scan(
            body, (h, jnp.zeros_like(h), cache, jnp.int32(0)), xs)
        h = h + d
    else:
        def body(carry, xs_t):
            lp, lora_lp = xs_t
            h, cache, idx = carry
            h, cache = _layer(cfg, h, lp, qw, cache, idx, positions,
                              write_offsets, mask, cos, sin, tp_axis,
                              paged_history=paged_history, lora_lp=lora_lp,
                              adapter_idx=adapter_idx,
                              stacked_norms=stacked_norms)
            debug.tap("out", h, layer=idx)   # SAVE_DATA per-layer dump
            return (h, cache, idx + 1), None

        (h, new_cache, _), _ = jax.lax.scan(
            body, (h, cache, jnp.int32(0)), (xs, lora_stacks))

    if logits_mode == "none":
        return None, new_cache

    h = norms.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if logits_mode == "hidden":
        # final-norm hidden states [B, T, H] — the embeddings surface
        # (engine.embed / /v1/embeddings); no lm_head projection
        return h, new_cache
    if logits_mode == "last":
        if last_idx is None:
            last_idx = jnp.full((B,), T - 1, jnp.int32)
        h = h[jnp.arange(B), last_idx]          # [B, H]

    lm_head = params.get("lm_head")
    if lm_head is None:
        # tied embeddings: embed is vocab-sharded under TP, so the local dot
        # yields the local vocab slice — same layout as the lm_head branch.
        logits = jnp.dot(h.astype(jnp.float32),
                         params["embed"].T.astype(jnp.float32))
    else:
        logits = matmul(h, lm_head).astype(jnp.float32)
    if tp_axis:
        # vocab-sharded logits → full logits on every shard (B is small)
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    if logits.shape[-1] > cfg.vocab_size:
        # vocab was padded for TP lane alignment (pad_params_for_tp)
        logits = logits[..., :cfg.vocab_size]
    if cfg.final_logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    debug.tap("logits", logits)
    return logits, new_cache


# register with the factory
from llm_inference_tpu.models import registry as _registry  # noqa: E402
import sys as _sys  # noqa: E402
_registry.register_model("llama", _sys.modules[__name__])
_registry.register_model("llama2", _sys.modules[__name__])
_registry.register_model("llama3", _sys.modules[__name__])
# same decoder family, differing only by config (sliding window / qkv bias)
_registry.register_model("mistral", _sys.modules[__name__])
_registry.register_model("qwen2", _sys.modules[__name__])
_registry.register_model("qwen3", _sys.modules[__name__])
_registry.register_model("phi3", _sys.modules[__name__])
_registry.register_model("tiny", _sys.modules[__name__])
