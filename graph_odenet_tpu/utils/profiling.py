"""Tracing / profiling hooks (SURVEY.md §5: reference has only
``time.time()`` prints).

``trace(logdir)``     — context manager around ``jax.profiler`` producing
                        xprof traces viewable in tensorboard.
``annotate(name)``    — ``jax.named_scope`` wrapper so SpMM / solver stages
                        show up as named regions in the trace.
``debug_nans(on)``    — toggle jax_debug_nans (the race-detector analogue:
                        XLA is data-race-free by construction; numeric
                        corruption is the failure mode worth trapping).
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate", "debug_nans"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.named_scope(name)


def debug_nans(on: bool = True):
    jax.config.update("jax_debug_nans", on)
