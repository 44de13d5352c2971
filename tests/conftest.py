"""Test config: force an 8-device virtual CPU mesh before tests run.

Multi-device sharding paths are exercised the JAX-native way
(xla_force_host_platform_device_count) — no cluster needed.  The axon TPU
tunnel in this environment registers itself via sitecustomize and overrides
``jax_platforms``, so we override it back to CPU here (tests must be fast
and hermetic; the TPU is reserved for bench runs).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Allow float64 in tests (oracle comparisons, finite differences); framework
# code requests its dtypes explicitly, so this only affects test inputs.
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
