"""Global named wall-clock timers with inclusion/exclusion decorators.

Equivalent of the reference ``Timer`` (``/root/reference/stemseg/utils/timer.py:4-114``):
``log_duration(name)`` accumulates a function's wall time under ``name``;
``exclude_duration(*names)`` subtracts the wrapped call's wall time from the
given timers (used so image I/O and output writing don't count against the
model/clustering fps report).
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict
from typing import Dict


class Timer:
    _durations: Dict[str, float] = defaultdict(float)
    _exclusions: Dict[str, float] = defaultdict(float)
    _starts: Dict[str, float] = {}
    enabled: bool = True

    @classmethod
    def reset(cls):
        cls._durations = defaultdict(float)
        cls._exclusions = defaultdict(float)
        cls._starts = {}

    @classmethod
    def start(cls, name: str):
        cls._starts[name] = time.perf_counter()

    @classmethod
    def stop(cls, name: str):
        if name not in cls._starts:
            raise KeyError(f"Timer {name!r} was never started")
        cls._durations[name] += time.perf_counter() - cls._starts.pop(name)

    @classmethod
    def log_duration(cls, name: str):
        def decorator(fn):
            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                if not cls.enabled:
                    return fn(*args, **kwargs)
                t0 = time.perf_counter()
                try:
                    return fn(*args, **kwargs)
                finally:
                    cls._durations[name] += time.perf_counter() - t0
            return wrapper
        return decorator

    @classmethod
    def exclude_duration(cls, *names: str):
        def decorator(fn):
            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                if not cls.enabled:
                    return fn(*args, **kwargs)
                t0 = time.perf_counter()
                try:
                    return fn(*args, **kwargs)
                finally:
                    dt = time.perf_counter() - t0
                    for name in names:
                        cls._exclusions[name] += dt
            return wrapper
        return decorator

    @classmethod
    def get_duration(cls, name: str) -> float:
        return max(cls._durations[name] - cls._exclusions[name], 0.0)

    @classmethod
    def get_durations_sum(cls) -> float:
        total = sum(cls._durations.values()) - sum(cls._exclusions.values())
        return max(total, 0.0)
