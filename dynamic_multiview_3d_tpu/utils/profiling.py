"""Tracing / profiling (SURVEY.md §5).

The reference had at most tf.RunMetadata timelines; here profiling is
first-class: ``TraceWindow`` captures an xprof/tensorboard-viewable trace of
a step window inside the training loop (tensorboard --logdir <dir>; xprof is
installed on this machine). The train CLI exposes it as
``--profile-dir`` + ``--profile-steps``; benchmarks use the same class.
"""

from __future__ import annotations

import jax


class TraceWindow:
    """Windowed device+host trace over a step loop.

    Captures steps [start, stop) of a loop that may advance several
    optimizer steps per host dispatch (train.steps_per_dispatch > 1): the
    window snaps outward to dispatch boundaries, since a dispatch is the
    smallest traceable unit.

        tw = TraceWindow(logdir, (10, 15))
        for step in range(0, n, spd):
            tw.maybe_start(step, step + spd)
            out = dispatch(...)
            tw.maybe_stop(step + spd, block_on=out)
    """

    def __init__(self, logdir: str | None, window: tuple[int, int] = (10, 15)):
        self.logdir = logdir
        self.start, self.stop = window
        self.active = False

    def maybe_start(self, step: int, end: int) -> None:
        """Start tracing if [step, end) covers the window's first step."""
        if self.logdir and not self.active and step <= self.start < end:
            jax.profiler.start_trace(self.logdir)
            self.active = True

    def maybe_stop(self, end: int, block_on=None) -> None:
        """Stop once ``end`` completed steps reach the window's stop.

        block_on: device values to block on first, so the trace contains
        the full async dispatch rather than just its enqueue."""
        if self.active and end >= self.stop:
            if block_on is not None:
                jax.block_until_ready(block_on)
            jax.profiler.stop_trace()
            self.active = False

    def close(self) -> None:
        """Abandon an open trace (loop exited inside the window)."""
        if self.active:
            jax.profiler.stop_trace()
            self.active = False
