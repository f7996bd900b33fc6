"""Token embedding lookup.

TPU-native equivalent of the reference's grid-stride gather kernel
`launchInputEmbedding` (reference: src/kernels/input_embedding.cu:5-52): a
plain `jnp.take` that XLA lowers to a dynamic-gather; no hand-written kernel
is needed because the gather is bandwidth-bound and XLA's codegen is already
at roofline for it.
"""

from __future__ import annotations

import jax.numpy as jnp


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of the embedding table.

    Args:
      table: [vocab_size, hidden] embedding matrix.
      ids:   [...] int32 token ids.

    Returns:
      [..., hidden] embeddings in `table.dtype`.
    """
    return jnp.take(table, ids, axis=0)
