"""Tracing / profiling (SURVEY.md §5).

The reference had at most tf.RunMetadata timelines; here profiling is
first-class: ``profile_trace`` wraps ``jax.profiler.trace`` so any N steps
of training or inference dump an xprof/tensorboard-viewable trace
(tensorboard --logdir <dir>; xprof is installed on this machine). The train
CLI exposes it as --profile-steps.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Context manager: traces device + host activity when logdir is set."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in the trace viewer."""
    with jax.profiler.TraceAnnotation(name):
        yield
