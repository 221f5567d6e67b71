"""Profiling / debugging hooks (SURVEY.md §5 tracing row).

Environment switches (all opt-in, zero overhead otherwise):
  QTTS_PROFILE_DIR=<dir>   capture a jax.profiler trace of each generation
                           (view with TensorBoard / xprof)
  QTTS_DEBUG_NANS=1        enable jax debug_nans (fail fast on NaNs)
  QTTS_CHECKS=1            enable jax_enable_checks
"""

from __future__ import annotations

import contextlib
import os


def apply_debug_flags() -> None:
    import jax
    if os.environ.get("QTTS_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    if os.environ.get("QTTS_CHECKS"):
        jax.config.update("jax_enable_checks", True)


@contextlib.contextmanager
def maybe_profile(tag: str):
    """Trace the enclosed block when QTTS_PROFILE_DIR is set."""
    profile_dir = os.environ.get("QTTS_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax
    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(tag):
            yield
