"""Debug-mode switches (SURVEY.md §5 "race detection / sanitizers" analog).

TPU has no user-level threads to race; the debugging tools that matter in
this stack are numerical: NaN propagation and silent shape broadcasting.
``debug_mode`` turns on jax_debug_nans + disable_jit-free NaN checking for a
scoped block; chex assertions cover shapes throughout the codebase.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Scoped numerical debugging: raises on the op that produced a NaN."""
    prev = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", bool(nans))
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
