"""Profiling hooks (SURVEY.md §5: the reference has none; we expose JAX's).

Set METEOR_DEMOD_PROFILE=<dir> to capture a jax.profiler trace of a CLI run
(view with TensorBoard / xprof). Library users can wrap any region:

    with maybe_trace():            # env-gated
        demod.process(samples)

    with trace("/tmp/trace"):      # explicit
        ...
"""

from __future__ import annotations

import contextlib
import os

PROFILE_ENV = "METEOR_DEMOD_PROFILE"


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def maybe_trace():
    log_dir = os.environ.get(PROFILE_ENV)
    if not log_dir:
        yield
        return
    with trace(log_dir):
        yield
