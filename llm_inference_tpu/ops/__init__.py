"""Op inventory — TPU-native equivalents of the reference CUDA kernels.

Mapping from the reference's 18 launch functions (SURVEY §2.5; reference
src/kernels/*.cu) to this package:

| reference kernel                         | here                                  |
|------------------------------------------|---------------------------------------|
| launchInputEmbedding                     | embedding.embedding_lookup            |
| launchCalPaddingoffset                   | (not needed: per-seq lengths + masks) |
| launchBuildCausalMasks                   | attention.make_attention_mask         |
| launchRMSNorm                            | norms.rms_norm                        |
| launchLinearGemm / StridedBatchGemm      | linear.matmul / quantized variants    |
| launchAddFusedQKVBiasTransposeAndRoPE    | rope.apply_rope (+ reshape in model)  |
| launchRoPE                               | rope.apply_rope                       |
| launchConcatKVCache                      | kvcache.update_kv_cache               |
| launchRepeatKVCache                      | (GQA handled inside attention einsum) |
| launchScaleMaskAndSoftmax                | attention.attend (fused by XLA)       |
| launchTransposeOutRemovePadding          | (not needed: no padding machinery)    |
| launchFusedAddBiasResidualRMSNorm        | norms.add_residual_rms_norm           |
| launchAct (SwiGLU)                       | activations.swiglu                    |
| launchAddResidual                        | (plain + in the model function)       |
| launchDecoderMaskedMHA                   | attention.decode_attend /             |
|                                          |   pallas.decode_attention             |
| launchTopKforBeamSearch                  | sampling (jax.lax.top_k)              |
| launchSampling                           | sampling.sample                       |

The padding-offset / remove-padding machinery (reference kernels #2, #12 and
the padded-batch buffers in src/layers/attention/context_attention.cpp) has no
TPU equivalent by design: static-shape batches with per-sequence length masks
replace it, and XLA fuses the masking into attention.
"""

from llm_inference_tpu.ops import (  # noqa: F401
    activations,
    attention,
    embedding,
    kvcache,
    linear,
    norms,
    quantization,
    rope,
    sampling,
)
