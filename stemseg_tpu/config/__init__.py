import os

from stemseg_tpu.config.config import (
    ClusteringConfig,
    Config,
    ConfigError,
    DataConfig,
    EmbeddingLossConfig,
    EmbeddingsHeadConfig,
    InputConfig,
    ModelConfig,
    SemsegHeadConfig,
    SeedinessHeadConfig,
    TrainingConfig,
    default_config,
    load_config,
    merge,
    resolve_max_instances,
    save_config,
    to_dict,
)

PRESETS_DIR = os.path.join(os.path.dirname(__file__), "presets")


def load_preset(name: str) -> Config:
    """Load a named run preset (e.g. 'davis_1', 'youtube_vis')."""
    path = os.path.join(PRESETS_DIR, name + ".yaml" if not name.endswith(".yaml") else name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"No preset named {name!r} in {PRESETS_DIR}")
    return load_config(path)


__all__ = [
    "Config", "ConfigError", "default_config", "load_config", "load_preset",
    "merge", "resolve_max_instances", "save_config", "to_dict", "PRESETS_DIR",
    "InputConfig", "TrainingConfig", "ModelConfig", "DataConfig",
    "ClusteringConfig", "EmbeddingLossConfig", "EmbeddingsHeadConfig",
    "SemsegHeadConfig", "SeedinessHeadConfig",
]
