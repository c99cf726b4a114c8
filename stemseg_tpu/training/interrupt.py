"""Cooperative interrupt handling: SIGINT/SIGTERM -> polled flag.

Behavioral reference:
``/root/reference/stemseg/training/interrupt_detector.py:11-22`` (flag
installed on start, polled each iteration at ``training/main.py:191-193``,
triggering checkpoint-then-exit).
"""

from __future__ import annotations

import signal


class InterruptException(RuntimeError):
    pass


class InterruptDetector:
    def __init__(self):
        self._interrupted = False
        self._installed = False

    def start(self):
        if self._installed:
            return
        signal.signal(signal.SIGINT, self._handler)
        signal.signal(signal.SIGTERM, self._handler)
        self._installed = True

    def _handler(self, signum, frame):
        self._interrupted = True

    @property
    def is_interrupted(self) -> bool:
        return self._interrupted

    def raise_if_interrupted(self):
        if self._interrupted:
            raise InterruptException("training interrupted by signal")
