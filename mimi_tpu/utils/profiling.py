"""Profiling hooks: thin wrappers over jax.profiler.

The reference has no profiler integration (timings are printed ad hoc);
here the step loop can be bracketed with a TensorBoard-compatible trace
and individual phases named so they show up in the trace viewer / Perfetto.

Usage:
    with mimi_tpu.utils.profiling.trace("/tmp/mimi-trace"):
        for _ in range(5):
            solid.step_time2(...)

    @mimi_tpu.utils.profiling.annotate("newton-assemble")
    def assemble(...): ...
"""

from __future__ import annotations

import contextlib
import functools

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host trace to `log_dir` (TensorBoard format)."""
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a named TraceAnnotation so its host
    span (and any device work dispatched inside) is labeled in traces."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco


@contextlib.contextmanager
def span(name: str):
    """Context-manager form of `annotate`."""
    with jax.profiler.TraceAnnotation(name):
        yield
