"""Wall-clock phase timing (the reference's scattered timers, centralized)."""

from __future__ import annotations

import time
from typing import Dict


class Timer:
    def __init__(self):
        self.spans: Dict[str, float] = {}
        self._starts: Dict[str, float] = {}

    def start(self, name: str):
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self.spans[name] = self.spans.get(name, 0.0) + dt
        return dt

    def __enter__(self):
        self.start("__total__")
        return self

    def __exit__(self, *exc):
        self.stop("__total__")
        return False
