"""Monotonic clock producing unique, strictly-increasing millisecond timestamps.

Reference semantics: files/src/main/scala/dev/chronicles/files/MonotonicClock.scala:12-28
— used to build commit filenames that sort in commit order even when the
wall clock ticks twice within the same millisecond (guard: max(now, last+1)).
"""

from __future__ import annotations

import threading
import time


class MonotonicClock:
    def __init__(self) -> None:
        self._last_ms = 0
        self._lock = threading.Lock()

    def next_timestamp_ms(self) -> int:
        with self._lock:
            now = int(time.time() * 1000)
            self._last_ms = max(now, self._last_ms + 1)
            return self._last_ms
