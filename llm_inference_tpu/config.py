"""Configuration dataclasses.

Replaces the reference's hard-coded hyperparameters in its model factory
(reference: src/utils/model_utils.h:16-33, where LLaMA-2-7B's head_num=32,
head_size=128, inter_size=11008, vocab=32000 are burned into C++) and its
compile-time CMake feature flags (reference: CMakeLists.txt:130-155) with
runtime dataclass configs, JSON-loadable.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


def _from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for a decoder-only transformer.

    Mirrors the parameter set the reference plumbs through
    LLaMAAttentionStaticParams / ctor args (reference: src/models/llama/
    llama_params.h:3-8, src/models/llama/llama.h:90-123).
    """

    name: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    # Activation dtype policy ("bfloat16" or "float32").
    dtype: str = "bfloat16"
    # Attention logit soft-capping (Gemma-2 style); 0 disables.
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    # RoPE scaling: None, or {"type": "linear"|"ntk", "factor": float}
    rope_scaling: Optional[dict] = None
    # Sliding-window attention size; 0 = full attention (mistral support).
    sliding_window: int = 0
    # Which layers use the sliding window: "all" (mistral) or
    # "alternating" (gemma2: even layers windowed, odd global).
    sliding_pattern: str = "all"
    # Bias terms on qkv projection (qwen2 uses them).
    qkv_bias: bool = False
    # per-head RMSNorm on q and k after the projections, before RoPE
    # (qwen3: llama-convention norm; gemma3: (1+w)-convention norm —
    # weight shape [head_dim] per layer)
    qk_norm: bool = False
    # gemma3 dual RoPE: sliding-attention layers use this LOCAL theta
    # while full-attention layers use rope_theta (0 = single rope)
    rope_local_theta: float = 0.0
    # explicit per-layer attention kinds ("sliding_attention" /
    # "full_attention") — gemma3's 5:1 pattern; None = sliding_pattern
    layer_types: Optional[Tuple[str, ...]] = None
    # Gemma-2 specifics: attention scale uses this instead of head_dim
    # (0 → head_dim), embeddings scaled by sqrt(hidden_size).
    query_pre_attn_scalar: float = 0.0
    scale_embeddings: bool = False
    # Mixture-of-experts (mixtral): 0 = dense FFN.
    num_experts: int = 0
    experts_per_token: int = 2
    # --- DeepSeek V2/V3 (MLA + fine-grained MoE); kv_lora_rank > 0 turns
    # the family on ---
    # Multi-head latent attention: q low-rank (0 = full q_proj, V2-lite),
    # shared compressed-KV rank, decoupled nope/rope head dims, v width.
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # interleaved rope pairing in the checkpoint (config.rope_interleave)
    rope_interleave: bool = False
    # MoE block: shared experts (always-on MLP of n·moe_inter width),
    # expert intermediate width, group-limited routing (n_group groups,
    # top `topk_group` kept, sigmoid+bias V3 scoring),
    # routed weight normalization + scaling, first k layers dense.
    n_shared_experts: int = 0
    moe_intermediate_size: int = 0
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True
    first_k_dense: int = 0

    @property
    def q_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads

    @property
    def qkv_out_dim(self) -> int:
        return (self.num_heads + 2 * self.num_kv_heads) * self.head_dim

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return _from_dict(cls, d)

    @classmethod
    def from_json(cls, path: str) -> "ModelConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Presets. llama2_7b matches the reference factory's real-model hyperparams
# (reference: src/utils/model_utils.h:18-33) with the true num_layers=32
# instead of the reference's debugging value of 3.
# ---------------------------------------------------------------------------

def llama2_7b(**kw) -> ModelConfig:
    return ModelConfig(name="llama2-7b", vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_layers=32, num_heads=32,
                       num_kv_heads=32, head_dim=128, rms_norm_eps=1e-5,
                       max_position_embeddings=4096, **kw)


def llama2_13b(**kw) -> ModelConfig:
    return ModelConfig(name="llama2-13b", vocab_size=32000, hidden_size=5120,
                       intermediate_size=13824, num_layers=40, num_heads=40,
                       num_kv_heads=40, head_dim=128, rms_norm_eps=1e-5,
                       max_position_embeddings=4096, **kw)


def llama2_70b(**kw) -> ModelConfig:
    return ModelConfig(name="llama2-70b", vocab_size=32000, hidden_size=8192,
                       intermediate_size=28672, num_layers=80, num_heads=64,
                       num_kv_heads=8, head_dim=128, rms_norm_eps=1e-5,
                       max_position_embeddings=4096, **kw)


def llama3_8b(**kw) -> ModelConfig:
    return ModelConfig(name="llama3-8b", vocab_size=128256, hidden_size=4096,
                       intermediate_size=14336, num_layers=32, num_heads=32,
                       num_kv_heads=8, head_dim=128, rms_norm_eps=1e-5,
                       rope_theta=500000.0, max_position_embeddings=8192, **kw)


_LLAMA31_SCALING = {"type": "llama3", "factor": 8.0,
                    "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                    "original_max_position_embeddings": 8192}


def llama3_1_8b(**kw) -> ModelConfig:
    """Llama-3.1-8B: llama3-8b + 128k context via piecewise RoPE scaling."""
    return ModelConfig(name="llama3.1-8b", vocab_size=128256,
                       hidden_size=4096, intermediate_size=14336,
                       num_layers=32, num_heads=32, num_kv_heads=8,
                       head_dim=128, rms_norm_eps=1e-5, rope_theta=500000.0,
                       max_position_embeddings=131072,
                       rope_scaling=dict(_LLAMA31_SCALING), **kw)


def llama3_1_70b(**kw) -> ModelConfig:
    return ModelConfig(name="llama3.1-70b", vocab_size=128256,
                       hidden_size=8192, intermediate_size=28672,
                       num_layers=80, num_heads=64, num_kv_heads=8,
                       head_dim=128, rms_norm_eps=1e-5, rope_theta=500000.0,
                       max_position_embeddings=131072,
                       rope_scaling=dict(_LLAMA31_SCALING), **kw)


def mistral_7b(**kw) -> ModelConfig:
    """Mistral-7B-v0.1: llama architecture + sliding-window attention."""
    return ModelConfig(name="mistral-7b", vocab_size=32000, hidden_size=4096,
                       intermediate_size=14336, num_layers=32, num_heads=32,
                       num_kv_heads=8, head_dim=128, rms_norm_eps=1e-5,
                       max_position_embeddings=32768, sliding_window=4096,
                       **kw)


def qwen2_7b(**kw) -> ModelConfig:
    """Qwen2-7B: llama architecture + qkv biases + large vocab."""
    return ModelConfig(name="qwen2-7b", vocab_size=152064, hidden_size=3584,
                       intermediate_size=18944, num_layers=28, num_heads=28,
                       num_kv_heads=4, head_dim=128, rms_norm_eps=1e-6,
                       rope_theta=1000000.0, max_position_embeddings=32768,
                       qkv_bias=True, tie_word_embeddings=False, **kw)


def qwen3_8b(**kw) -> ModelConfig:
    """Qwen3-8B: llama architecture + per-head QK-norm (no qkv biases)."""
    return ModelConfig(name="qwen3-8b", vocab_size=151936, hidden_size=4096,
                       intermediate_size=12288, num_layers=36, num_heads=32,
                       num_kv_heads=8, head_dim=128, rms_norm_eps=1e-6,
                       rope_theta=1000000.0, max_position_embeddings=40960,
                       qk_norm=True, tie_word_embeddings=False, **kw)


def gemma3_4b(**kw) -> ModelConfig:
    """Gemma-3-4B (text): gemma2 sandwich norms + QK-norm, NO softcaps,
    5:1 sliding:full layer pattern with dual RoPE (local theta 10k)."""
    L = 34
    lt = tuple("full_attention" if (i + 1) % 6 == 0 else "sliding_attention"
               for i in range(L))
    return ModelConfig(name="gemma3-4b", vocab_size=262208,
                       hidden_size=2560, intermediate_size=10240,
                       num_layers=L, num_heads=8, num_kv_heads=4,
                       head_dim=256, rms_norm_eps=1e-6,
                       rope_theta=1000000.0, rope_local_theta=10000.0,
                       max_position_embeddings=131072,
                       # linear position interpolation on the GLOBAL rope
                       # only (the local table takes no scaling — HF
                       # Gemma3TextConfig rope_scaling {linear, 8.0})
                       rope_scaling={"type": "linear", "factor": 8.0},
                       sliding_window=1024, layer_types=lt,
                       qk_norm=True, query_pre_attn_scalar=256.0,
                       scale_embeddings=True, tie_word_embeddings=True,
                       **kw)


def phi3_mini(**kw) -> ModelConfig:
    """Phi-3-mini-4k: llama architecture (MHA, fused checkpoint keys)."""
    return ModelConfig(name="phi3-mini", vocab_size=32064, hidden_size=3072,
                       intermediate_size=8192, num_layers=32, num_heads=32,
                       num_kv_heads=32, head_dim=96, rms_norm_eps=1e-5,
                       rope_theta=10000.0, max_position_embeddings=4096,
                       tie_word_embeddings=False, **kw)


def mixtral_8x7b(**kw) -> ModelConfig:
    """Mixtral-8x7B: llama attention + top-2 of 8 experts per token."""
    return ModelConfig(name="mixtral-8x7b", vocab_size=32000,
                       hidden_size=4096, intermediate_size=14336,
                       num_layers=32, num_heads=32, num_kv_heads=8,
                       head_dim=128, rms_norm_eps=1e-5,
                       rope_theta=1000000.0, max_position_embeddings=32768,
                       num_experts=8, experts_per_token=2, **kw)


def gemma2_2b(**kw) -> ModelConfig:
    """Gemma-2-2B: sandwich norms, GeGLU, logit softcaps, alternating
    sliding-window attention, tied + scaled embeddings."""
    return ModelConfig(name="gemma2-2b", vocab_size=256000,
                       hidden_size=2304, intermediate_size=9216,
                       num_layers=26, num_heads=8, num_kv_heads=4,
                       head_dim=256, rms_norm_eps=1e-6,
                       rope_theta=10000.0, max_position_embeddings=8192,
                       tie_word_embeddings=True, attn_logit_softcap=50.0,
                       final_logit_softcap=30.0, sliding_window=4096,
                       sliding_pattern="alternating",
                       query_pre_attn_scalar=256.0, scale_embeddings=True,
                       **kw)


def gemma2_9b(**kw) -> ModelConfig:
    return ModelConfig(name="gemma2-9b", vocab_size=256000,
                       hidden_size=3584, intermediate_size=14336,
                       num_layers=42, num_heads=16, num_kv_heads=8,
                       head_dim=256, rms_norm_eps=1e-6,
                       rope_theta=10000.0, max_position_embeddings=8192,
                       tie_word_embeddings=True, attn_logit_softcap=50.0,
                       final_logit_softcap=30.0, sliding_window=4096,
                       sliding_pattern="alternating",
                       query_pre_attn_scalar=256.0, scale_embeddings=True,
                       **kw)


def deepseek_v3(**kw) -> ModelConfig:
    """DeepSeek-V3/R1 (671B total, 37B active): MLA (kv_lora 512, q_lora
    1536, 128+64 nope/rope split) + 256-expert sigmoid-routed MoE with one
    shared expert, group-limited routing, first 3 layers dense, yarn rope
    to 128k."""
    defaults = dict(
        name="deepseek-v3", vocab_size=129280, hidden_size=7168,
        intermediate_size=18432, num_layers=61, num_heads=128,
        num_kv_heads=128, head_dim=192,           # qk_head_dim (nope+rope)
        rope_theta=10000.0, max_position_embeddings=163840,
        rms_norm_eps=1e-6,
        rope_scaling={"type": "yarn", "factor": 40.0,
                      "original_max_position_embeddings": 4096,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "mscale": 1.0, "mscale_all_dim": 1.0},
        q_lora_rank=1536, kv_lora_rank=512, qk_nope_head_dim=128,
        qk_rope_head_dim=64, v_head_dim=128, rope_interleave=True,
        num_experts=256, experts_per_token=8, n_shared_experts=1,
        moe_intermediate_size=2048, n_group=8, topk_group=4,
        routed_scaling_factor=2.5, norm_topk_prob=True, first_k_dense=3)
    defaults.update(kw)
    return ModelConfig(**defaults)


def tiny_deepseek(**kw) -> ModelConfig:
    """Small MLA+MoE config for tests (V3 semantics, toy sizes)."""
    defaults = dict(
        name="tiny-deepseek", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_layers=3, num_heads=4, num_kv_heads=4,
        head_dim=48, rms_norm_eps=1e-6, max_position_embeddings=256,
        dtype="float32",
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32,
        num_experts=8, experts_per_token=2, n_shared_experts=1,
        moe_intermediate_size=48, n_group=2, topk_group=1,
        routed_scaling_factor=2.5, norm_topk_prob=True, first_k_dense=1)
    defaults.update(kw)
    return ModelConfig(**defaults)


def tiny_llama(**kw) -> ModelConfig:
    """Small config for tests — analogous to the reference's tiny example
    configs (reference: examples/cpp/attention/context_attn_example.cpp:7-20)."""
    defaults = dict(name="tiny-llama", vocab_size=256, hidden_size=128,
                    intermediate_size=256, num_layers=2, num_heads=4,
                    num_kv_heads=2, head_dim=32, rms_norm_eps=1e-5,
                    max_position_embeddings=512, dtype="float32")
    defaults.update(kw)
    return ModelConfig(**defaults)


PRESETS = {
    "llama2-7b": llama2_7b,
    "llama2-13b": llama2_13b,
    "llama2-70b": llama2_70b,
    "llama3-8b": llama3_8b,
    "llama3.1-8b": llama3_1_8b,
    "llama3.1-70b": llama3_1_70b,
    "mistral-7b": mistral_7b,
    "qwen2-7b": qwen2_7b,
    "qwen3-8b": qwen3_8b,
    "phi3-mini": phi3_mini,
    "mixtral-8x7b": mixtral_8x7b,
    "gemma2-2b": gemma2_2b,
    "gemma2-9b": gemma2_9b,
    "gemma3-4b": gemma3_4b,
    "deepseek-v3": deepseek_v3,
    "tiny-llama": tiny_llama,
    "tiny-deepseek": tiny_deepseek,
}


@dataclass(frozen=True)
class QuantConfig:
    """Weight / KV-cache quantization. New capability vs the reference
    (which is FP32/FP16 only — reference: src/utils/tensor.h:20 lists INT8
    in the enum but no kernel ever uses it)."""

    # "none" | "int8" | "int4"  (weight-only)
    weights: str = "none"
    # Sub-channel group size along the contraction dim; 0 = per-channel.
    group_size: int = 0
    # Asymmetric (min/max) quantization with per-group zero-points —
    # halves the effective step for skewed weight groups (the usual INT4
    # Δppl win); dequant w = q·scale + zbias, folded into the kernels as
    # an output-side rowsum(x)·zbias FMA. False = symmetric (absmax).
    asymmetric: bool = False
    # "none" | "int8" — per-head-scale quantized KV cache.
    kv_cache: str = "none"
    # Skip quantizing embedding / lm_head (they are gather/peak-sensitive).
    quantize_embedding: bool = False

    @property
    def enabled(self) -> bool:
        return self.weights != "none"

    @classmethod
    def from_dict(cls, d: dict) -> "QuantConfig":
        return _from_dict(cls, d)


@dataclass(frozen=True)
class ShardingConfig:
    """Mesh axes for distribution. The reference has zero distributed code
    (SURVEY §2.12); this is new, TPU-first functionality: tensor parallelism
    over ICI, data/sequence parallelism over DCN."""

    # Mesh shape by axis; product must equal jax.device_count().
    data: int = 1
    pipe: int = 1      # pipeline stages (layer-sharded; parallel/pipeline.py)
    tensor: int = 1
    # Axis names used in PartitionSpecs throughout the codebase.
    data_axis: str = "data"
    pipe_axis: str = "pipe"
    tensor_axis: str = "tensor"

    @property
    def mesh_shape(self) -> Tuple[int, int, int]:
        return (self.data, self.pipe, self.tensor)

    @property
    def axis_names(self) -> Tuple[str, str, str]:
        return (self.data_axis, self.pipe_axis, self.tensor_axis)

    @classmethod
    def from_dict(cls, d: dict) -> "ShardingConfig":
        return _from_dict(cls, d)


@dataclass(frozen=True)
class EngineConfig:
    """Serving-engine knobs. Replaces the reference's magic numbers
    (output_token_limit=256 at src/models/llama/llama.h:29, batch_size=1 at
    llama.h:36, num_tokens=13 buffer sizing at llama.cpp:27)."""

    max_seq_len: int = 2048
    max_batch_size: int = 8
    # Prefill length buckets (token counts) to bound jit recompiles.
    prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)
    # Tokens generated per jitted decode chunk before host sync (streaming
    # granularity); eliminates the reference's per-token D2H round trip
    # (reference: llama.cpp:266,440-443).
    decode_chunk: int = 8
    # Paged KV cache page size in tokens; 0 = dense contiguous cache.
    page_size: int = 0
    # Continuous batching scheduler limits.
    max_queued_requests: int = 256
    # Static sort width bounding per-request top-k in the batched decode
    # program (ops/sampling.sample_per_row); requests may use any k ≤ this.
    max_top_k: int = 64
    # One-chunk-deep harvest pipelining in the batched schedulers: chunk
    # k+1 is dispatched BEFORE chunk k's tokens are fetched, so the
    # device-to-host readback (and any dispatch latency) overlaps the next
    # chunk's execution instead of serializing the decode loop. Costs one
    # chunk of slot-retirement lag (a finished request's slot frees one
    # chunk later). The speculative scheduler ignores this (its accept
    # loop is inherently synchronous).
    pipeline_harvest: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        return _from_dict(cls, d)


@dataclass(frozen=True)
class GenerationConfig:
    """Per-request sampling parameters. The reference supports top-K=5
    weighted sampling only (reference: src/kernels/topK.cu:159,
    src/kernels/sampling.cu:28-115); we add greedy/temperature/top-p."""

    max_new_tokens: int = 256
    temperature: float = 1.0
    top_k: int = 0          # 0 = disabled
    top_p: float = 1.0      # 1.0 = disabled
    min_p: float = 0.0      # 0.0 = disabled (drop tokens < min_p·P(max))
    repetition_penalty: float = 1.0   # 1.0 = disabled (CTRL-style)
    presence_penalty: float = 0.0     # OpenAI semantics, output tokens
    frequency_penalty: float = 0.0    # OpenAI semantics, per count
    greedy: bool = False
    eos_token_ids: Sequence[int] = (2,)
    seed: int = 0
    # OpenAI logit_bias: {token_id: bias} added to the logits before
    # sampling (None = off). Shapes selection (greedy argmax included);
    # reported logprobs stay the model's raw distribution.
    logit_bias: Optional[dict] = None

    @classmethod
    def from_dict(cls, d: dict) -> "GenerationConfig":
        return _from_dict(cls, d)


@dataclass(frozen=True)
class RuntimeConfig:
    """Top-level bundle, JSON-loadable (replaces reference compile-time
    configuration entirely)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)

    @classmethod
    def from_json(cls, path: str) -> "RuntimeConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(
            model=ModelConfig.from_dict(d.get("model", {})),
            quant=QuantConfig.from_dict(d.get("quant", {})),
            sharding=ShardingConfig.from_dict(d.get("sharding", {})),
            engine=EngineConfig.from_dict(d.get("engine", {})),
            generation=GenerationConfig.from_dict(d.get("generation", {})),
        )
