"""Checkpoint / pretrained-weight directory resolution.

Behavioral reference: ``/root/reference/stemseg/utils/model_paths.py:13-22``:
everything roots at ``$STEMSEG_MODELS_DIR``.
"""

from __future__ import annotations

import os


class ModelPaths:
    @staticmethod
    def models_dir() -> str:
        d = os.environ.get("STEMSEG_MODELS_DIR")
        assert d is not None, "Environment variable STEMSEG_MODELS_DIR is not set"
        return d

    @staticmethod
    def checkpoint_base_dir() -> str:
        return os.path.join(ModelPaths.models_dir(), "checkpoints")

    @staticmethod
    def pretrained_backbones_dir() -> str:
        return os.path.join(ModelPaths.models_dir(), "pretrained")
