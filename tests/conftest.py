"""Test configuration: run JAX on CPU with 8 virtual devices (sharding
tests) and float64 enabled, before any jax import happens."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("MIMI_TPU_X64", "1")

# the hosted axon platform plugin overrides JAX_PLATFORMS at import time;
# jax.config wins over both.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
