"""Logging and timing utilities.

Mirrors the reference's xlog/xtimer/AutoMaxRssRecorder trio
(src/utils.h:48-128): file:line-prefixed stderr logging, wall-clock stage
timers, and a process-resource reporter emitted at the end of each pipeline
stage.
"""

from __future__ import annotations

import inspect
import os
import resource
import sys
import time
from contextlib import contextmanager

__all__ = ["log", "warn", "err", "StageTimer", "report_rusage"]

_VERBOSITY = int(os.environ.get("MEGAGTA_TPU_VERBOSE", "1"))


def _prefix() -> str:
    frame = inspect.stack()[2]
    return f"[{os.path.basename(frame.filename)}:{frame.lineno}]"


def log(msg: str, level: int = 1) -> None:
    if _VERBOSITY >= level:
        print(f"{_prefix()} {msg}", file=sys.stderr)


def warn(msg: str) -> None:
    print(f"{_prefix()} [WARNING] {msg}", file=sys.stderr)


def err(msg: str) -> None:
    print(f"{_prefix()} [ERROR] {msg}", file=sys.stderr)


class StageTimer:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.laps: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str):
        t = time.perf_counter()
        yield
        self.laps[name] = self.laps.get(name, 0.0) + time.perf_counter() - t

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0


def report_rusage(tag: str = "") -> dict:
    ru = resource.getrusage(resource.RUSAGE_SELF)
    stats = {
        "user_s": ru.ru_utime,
        "sys_s": ru.ru_stime,
        "maxrss_mb": ru.ru_maxrss / 1024.0,
    }
    print(
        f"[rusage]{(' ' + tag) if tag else ''} user {ru.ru_utime:.2f}s "
        f"sys {ru.ru_stime:.2f}s maxrss {stats['maxrss_mb']:.1f}MB",
        file=sys.stderr,
    )
    return stats
