"""Opt-in barrier profiling: set WWX_PROFILE=1 to print the wall time
between successive executor barriers in the flagship pipeline. Zero cost
when unset. Used to attribute the per-job fixed floor (VERDICT r2 #3) to
specific streaming-executor launches."""

from __future__ import annotations

import os
import time

_last: list[float] = []


def prof_mark(label: str) -> None:
    if not os.environ.get("WWX_PROFILE"):
        return
    now = time.time()
    if _last:
        print(f"[prof] {label}: {now - _last[0]:.3f}s", flush=True)
    _last[:] = [now]


def prof_reset() -> None:
    _last[:] = [time.time()]
