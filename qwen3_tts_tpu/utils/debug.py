"""Debug/probe gating.

Structural kernel ablations (QTTS_TALKER_ABLATE / QTTS_PRED_ABLATE) are
timing probes whose OUTPUT IS WRONG by construction — they exist only to
attribute the step floor (docs/DESIGN.md §11).  Reading them unconditionally
in the production call path means a leftover exported variable silently
corrupts every synthesis, and since the value bakes into the traced program
as a static arg, it can persist confusingly across env changes.

ablate_mode() therefore honors an ablation variable ONLY when
QTTS_DEBUG_PROBES=1 is also set, and prints a loud stderr banner once per
(var, mode) so a probe run is never mistaken for a production run.
"""
from __future__ import annotations

import os
import sys

_announced: set = set()


def ablate_mode(var: str) -> str | None:
    """Return the active ablation mode for env var `var`, or None.

    Requires QTTS_DEBUG_PROBES=1; otherwise a set ablation variable is
    ignored with a one-time warning (fail safe: production output stays
    correct).
    """
    mode = os.environ.get(var) or None
    if mode is None:
        return None
    key = (var, mode)
    if os.environ.get("QTTS_DEBUG_PROBES") != "1":
        if key not in _announced:
            _announced.add(key)
            print(f"[qtts] {var}={mode} ignored: ablation probes corrupt "
                  f"output and require QTTS_DEBUG_PROBES=1", file=sys.stderr)
        return None
    if key not in _announced:
        _announced.add(key)
        print(f"[qtts] *** ABLATION PROBE ACTIVE: {var}={mode} — synthesis "
              f"output is WRONG by design (timing attribution only) ***",
              file=sys.stderr)
    return mode
