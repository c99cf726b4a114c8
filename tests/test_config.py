import pytest

from stemseg_tpu.config import (
    Config,
    ConfigError,
    default_config,
    load_preset,
    merge,
    to_dict,
)


def test_defaults_match_reference_values():
    cfg = default_config()
    # spot values from reference defaults.yaml
    assert cfg.input.image_mean == (102.9801, 115.9465, 122.7717)
    assert cfg.input.num_frames == 8
    assert cfg.input.min_dim == 800 and cfg.input.max_dim == 1333
    assert cfg.model.backbone.type == "R-101-FPN"
    assert cfg.model.embeddings.inter_channels == (256, 256, 128, 128)
    assert cfg.model.embeddings.scale == (32, 16, 8, 4)
    assert cfg.training.losses.embedding.weight_variance_smoothness == 10.0
    assert cfg.clustering.min_seediness_prob == 0.8
    assert cfg.data.davis.inference_frame_overlap == 6


def test_strict_merge_rejects_unknown_keys():
    cfg = default_config()
    with pytest.raises(ConfigError):
        merge(cfg, {"input": {"BOGUS_KEY": 1}})
    with pytest.raises(ConfigError):
        merge(cfg, {"TOP_LEVEL_BOGUS": {}})


def test_merge_is_functional_and_case_insensitive():
    cfg = default_config()
    cfg2 = merge(cfg, {"INPUT": {"NUM_FRAMES": 16}, "training": {"mode": "davis"}})
    assert cfg.input.num_frames == 8  # original untouched
    assert cfg2.input.num_frames == 16
    assert cfg2.training.mode == "davis"


def test_merge_leaf_vs_nested_mismatch():
    cfg = default_config()
    with pytest.raises(ConfigError):
        merge(cfg, {"input": {"num_frames": {"oops": 1}}})
    with pytest.raises(ConfigError):
        merge(cfg, {"input": 5})


@pytest.mark.parametrize("name,num_frames,dim_mode,seediness,semseg,n_classes", [
    ("davis_1", 8, "xyff", True, False, 2),
    ("davis_2", 16, "xyff", True, False, 2),
    ("youtube_vis", 8, "xyff", False, True, 41),
    ("kitti_mots_1", 8, "xyt", False, True, 3),
    ("kitti_mots_2", 8, "xyt", False, True, 3),
])
def test_presets(name, num_frames, dim_mode, seediness, semseg, n_classes):
    cfg = load_preset(name)
    assert cfg.input.num_frames == num_frames
    assert cfg.model.embedding_dim_mode == dim_mode
    assert cfg.model.use_seediness_head == seediness
    assert cfg.model.use_semseg_head == semseg
    assert cfg.input.num_classes == n_classes


def test_preset_specifics():
    d2 = load_preset("davis_2")
    assert d2.training.freeze_backbone is True
    assert d2.data.youtube_vis.frame_gap_lower == 16
    ytvis = load_preset("youtube_vis")
    assert ytvis.model.semseg.inter_channels == (256, 256, 256, 256)
    assert ytvis.training.losses.embedding.free_dim_stds == (0.3, 0.3)
    km1 = load_preset("kitti_mots_1")
    assert km1.clustering.min_seediness_prob == 0.95
    assert km1.data.kitti_mots.mapillary_weight == 1.0


def test_to_dict_roundtrip():
    cfg = load_preset("davis_1")
    d = to_dict(cfg)
    cfg2 = merge(Config(), d)
    assert cfg2 == cfg
