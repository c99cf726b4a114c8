"""Training metrics logging + wall-clock ETA bookkeeping.

Behavioral reference: ``/root/reference/stemseg/training/training_logger.py``
(tensorboardX scalars + pause-aware ETA) and the console loss line
(``training/main.py:218-238``, abbreviations ``training/utils.py:22-39``).
Scalars go to a JSONL file (always) and tensorboardX when importable; the
ETA logic survives checkpoint/restore by persisting total elapsed time.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

# console abbreviations for loss names (training/utils.py:22-39)
ABBREVIATIONS = {
    "total_embedding": "E",
    "lovasz": "L",
    "var_smoothness": "VS",
    "seediness": "S",
    "semseg": "CE",
    "fg": "FG",
    "total": "T",
    "grad_norm": "GN",
    "lr": "LR",
}


class TrainingLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")

        self._tb_writer = None
        try:
            from tensorboardX import SummaryWriter

            self._tb_writer = SummaryWriter(log_dir)
        except Exception:
            pass

        self._start_time = time.time()
        self._elapsed_before_start = 0.0  # accumulated across restores

    # -- scalars ------------------------------------------------------------

    def add_scalars(self, scalars: Dict[str, float], step: int):
        record = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        with open(self.jsonl_path, "a") as fh:
            fh.write(json.dumps(record) + "\n")
        if self._tb_writer is not None:
            for k, v in scalars.items():
                self._tb_writer.add_scalar(k, float(v), step)

    @staticmethod
    def format_console_line(step: int, total: int, scalars: Dict[str, float],
                            sec_per_iter: float, eta_seconds: float) -> str:
        parts = [f"it {step}/{total}"]
        for k, v in scalars.items():
            parts.append(f"{ABBREVIATIONS.get(k, k)}: {float(v):.4f}")
        parts.append(f"{sec_per_iter:.3f}s/it")
        hours, rem = divmod(int(eta_seconds), 3600)
        minutes, seconds = divmod(rem, 60)
        parts.append(f"ETA {hours:02d}:{minutes:02d}:{seconds:02d}")
        return " | ".join(parts)

    # -- ETA ------------------------------------------------------------------

    def total_elapsed(self) -> float:
        return self._elapsed_before_start + (time.time() - self._start_time)

    def compute_eta(self, elapsed_iterations: int, total_iterations: int) -> float:
        """Pause-aware: uses total tracked wall-clock across session restores
        (reference ``training_logger.py:41-50``)."""
        if elapsed_iterations == 0:
            return 0.0
        sec_per_iter = self.total_elapsed() / elapsed_iterations
        return sec_per_iter * (total_iterations - elapsed_iterations)

    # -- checkpoint state ------------------------------------------------------

    def state_dict(self) -> Dict:
        return {"elapsed": self.total_elapsed()}

    def load_state_dict(self, state: Dict):
        self._elapsed_before_start = float(state.get("elapsed", 0.0))
        self._start_time = time.time()
