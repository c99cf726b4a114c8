"""Full-session checkpointing: save / restore / auto-resume / retention.

Behavioral reference: ``/root/reference/stemseg/training/main.py:97-131``
(``backup_session`` / ``restore_session``) and the auto-resume scan
(``:313-319``). Checkpoints hold the complete session — params, constants,
optimizer state, step, logger state — serialized with flax msgpack into
``{iter:06d}.ckpt`` files under the model dir.

The reference's keep-last-N cleanup glob uses a literal ``'%06d.pth'``
pattern and therefore never deletes anything (``training/main.py:243`` —
documented parity trap); ours actually enforces ``ckpts_to_keep``.
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

CKPT_PATTERN = re.compile(r"^(\d{6})\.ckpt$")


def save_checkpoint(model_dir: str, step: int, state, extra: Optional[Dict[str, Any]] = None) -> str:
    """:param state: TrainState (or any pytree)
    :param extra: small JSON-safe dict (logger state etc.)"""
    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(jax.tree.map(np.asarray, state)),
        "extra": extra or {},
        "step": int(step),
    }
    path = os.path.join(model_dir, f"{step:06d}.ckpt")
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(payload))
    return path


def restore_checkpoint(path: str, state_template) -> Tuple[Any, Dict[str, Any], int]:
    """:param state_template: a TrainState with the right tree structure
    (e.g. freshly initialized) whose leaves define shapes/dtypes.
    :return: (state, extra, step)"""
    with open(path, "rb") as fh:
        payload = serialization.msgpack_restore(fh.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, payload["extra"], int(payload["step"])


def find_latest_checkpoint(model_dir: str) -> Optional[str]:
    """Newest checkpoint by iteration number (auto-resume,
    ``training/main.py:313-319``)."""
    if not os.path.isdir(model_dir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(model_dir):
        m = CKPT_PATTERN.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(model_dir, name)
    return best


def cleanup_old_checkpoints(model_dir: str, keep: int):
    """Keep the newest ``keep`` checkpoints (reference intent at
    ``training/main.py:240-248``; its glob never matched — fixed here)."""
    ckpts = sorted(glob(os.path.join(model_dir, "??????.ckpt")))
    for path in ckpts[:-keep] if keep > 0 else []:
        os.remove(path)
