"""Loss / model-output key constants and repo paths.

Mirrors ``/root/reference/stemseg/utils/constants.py:18-59``.
"""

import os


class LossConsts:
    EMBEDDING = "total_embedding"
    LOVASZ_LOSS = "lovasz"
    VARIANCE_SMOOTHNESS = "var_smoothness"
    SEEDINESS_LOSS = "seediness"
    SEMSEG = "semseg"
    FOREGROUND = "fg"


class ModelOutputConsts:
    OPTIMIZATION_LOSSES = "optimization_losses"
    OTHERS = "others"
    INFERENCE = "inference"

    EMBEDDINGS = "embeddings"
    SEMSEG_MASKS = "semseg_masks"


class RepoPaths:
    @staticmethod
    def package_dir():
        return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    @staticmethod
    def configs_dir():
        return os.path.join(RepoPaths.package_dir(), "config", "presets")

    @staticmethod
    def dataset_meta_info_dir():
        return os.path.join(RepoPaths.package_dir(), "data", "metainfo")


class ModelPaths:
    """$STEMSEG_MODELS_DIR-rooted checkpoint and pretrained-backbone dirs
    (ref ``stemseg/utils/model_paths.py:13-22``)."""

    @staticmethod
    def models_dir():
        return os.environ.get("STEMSEG_MODELS_DIR", os.path.expanduser("~/stemseg_models"))

    @staticmethod
    def checkpoint_base_dir():
        return os.path.join(ModelPaths.models_dir(), "checkpoints")

    @staticmethod
    def pretrained_backbones_dir():
        return os.path.join(ModelPaths.models_dir(), "pretrained_backbones")
