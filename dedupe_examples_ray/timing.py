"""Opt-in wall-clock observability for the materialization points of a
pipeline run.

The Dataset graph is lazy, so per-*stage* timing is only meaningful at the
points where the driver forces execution (materialize / count / pull).
``stage_timer`` wraps exactly those points.  Enable with
``GRAFT_STAGE_TIMING=1`` (logs one line per point and accumulates into
``TIMINGS`` for programmatic reads — ``bench.py``/profilers drain it with
``drain()``).  Off by default: a disabled timer is two ``monotonic()``
calls, nothing else.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

TIMINGS: list[tuple[str, float]] = []

_log = logging.getLogger("dedupe_examples_ray.timing")


def enabled() -> bool:
    return os.environ.get("GRAFT_STAGE_TIMING") == "1"


@contextmanager
def stage_timer(name: str):
    if not enabled():
        yield
        return
    t0 = time.monotonic()
    try:
        yield
    finally:
        dt = time.monotonic() - t0
        TIMINGS.append((name, dt))
        _log.info("stage %-24s %7.2f s", name, dt)


def drain() -> list[tuple[str, float]]:
    out = list(TIMINGS)
    TIMINGS.clear()
    return out
