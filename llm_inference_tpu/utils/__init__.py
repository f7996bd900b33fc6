"""Host-side utilities: checkpoint IO, debugging, logging.

The reference's equivalent layer is src/utils/ (Tensor/TensorMap, error
macros, weight loading) — most of it has no TPU analogue because jnp arrays +
pytrees replace the type-erased Tensor system and XLA replaces manual H2D
plumbing. What remains host-side (checkpoint IO, debug dumps, metrics) lives
here.
"""
