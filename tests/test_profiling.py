"""Profiler hooks write a TensorBoard-format trace (utils/profiling.py)."""

import os

import jax.numpy as jnp

from mimi_tpu.utils import profiling


def test_trace_and_annotate(tmp_path):
    d = str(tmp_path)
    with profiling.trace(d):
        with profiling.span("mm"):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()

    @profiling.annotate("f")
    def f(x):
        return x + 1

    assert int(f(jnp.array(1))) == 2
    files = [f for _, _, fs in os.walk(d) for f in fs]
    assert files, "no trace output written"
