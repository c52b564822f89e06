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

# persistent compilation cache: reruns of the suite skip the (dominant)
# XLA compile cost
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full golden/pallas sweeps)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test, excluded unless --runslow"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
