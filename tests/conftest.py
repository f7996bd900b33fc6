"""Test harness config.

Tests run on CPU with 8 virtual devices so sharding/collective code paths are
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; benches run on the real chip).

Note: the environment's TPU plugin force-registers itself and overrides
JAX_PLATFORMS from the environment, so we must ALSO override via
jax.config.update after import — env vars alone are not enough here.
"""

import os
import sys

import re as _re

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in _flags:
    # the suite REQUIRES 8 virtual devices (mesh tests assume it) — replace
    # a conflicting pre-set count instead of asserting the session to death
    _flags = _re.sub(r"--xla_force_host_platform_device_count=\d+",
                     "--xla_force_host_platform_device_count=8", _flags)
    os.environ["XLA_FLAGS"] = _flags
else:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
