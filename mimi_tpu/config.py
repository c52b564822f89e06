"""Global configuration for mimi_tpu.

Precision: the reference solver is float64 throughout (MFEM). For numerical
parity the default dtype is float64 (requires jax_enable_x64, which we turn
on at import unless MIMI_TPU_X64=0).  Benchmark paths may run float32 with a
matched residual tolerance via `set_dtype`.
"""

from __future__ import annotations

import os

import jax

if os.environ.get("MIMI_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# The hosted axon TPU plugin ignores JAX_PLATFORMS set after launch;
# MIMI_TPU_PLATFORM provides a reliable override (e.g. "cpu").
_platform = os.environ.get("MIMI_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

# TPU matmuls/einsums on f32 inputs default to bf16-grade passes; measured
# on the fused residual this costs ~4 digits (3.0e-2 vs 2.6e-6 abs error
# against f64 truth).  MIMI_TPU_MATMUL_PRECISION={default,float32,highest}
# trades MXU throughput for true-f32 contractions when f32 accuracy
# matters (x64 paths are unaffected).
_matmul_precision = os.environ.get("MIMI_TPU_MATMUL_PRECISION")
if _matmul_precision:
    jax.config.update("jax_default_matmul_precision", _matmul_precision)

import jax.numpy as jnp  # noqa: E402

_DTYPE = jnp.float64 if os.environ.get("MIMI_TPU_X64", "1") != "0" else jnp.float32


def set_dtype(dtype) -> None:
    global _DTYPE
    _DTYPE = dtype


def dtype():
    return _DTYPE
