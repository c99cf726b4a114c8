"""Per-mode training dataset factories.

Behavioral reference: ``/root/reference/stemseg/training/utils.py:65-192``.
DAVIS mode mixes COCO(.25) + YT-VIS(.35) + DAVIS(.3) + PascalVOC(.1);
YT-VIS mode mixes COCO(.3) + VOC(.1) + YT-VIS(.6); KITTI-MOTS mode mixes
Mapillary and/or KITTI-MOTS per config weights. Dataset roots resolve via
env vars (``data/paths.py``).
"""

from __future__ import annotations

from stemseg_tpu.config import Config
from stemseg_tpu.data import (
    CocoDataLoader,
    ConcatDataset,
    DavisDataLoader,
    MapillaryDataLoader,
    MOTSDataLoader,
    PascalVOCDataLoader,
    YoutubeVISDataLoader,
)
from stemseg_tpu.data.paths import (
    CocoPaths,
    DavisUnsupervisedPaths,
    KITTIMOTSPaths,
    MapillaryPaths,
    PascalVOCPaths,
    YoutubeVISPaths,
)


def _davis_dataset(cfg: Config, total_samples: int, print_fn):
    print_fn("Creating training dataset for Davis...")
    assert cfg.input.num_classes == 2
    dcfg = cfg.data.davis

    datasets = [
        CocoDataLoader(CocoPaths.images_dir(), CocoPaths.ids_file(),
                       cfg.input, category_agnostic=True),
        YoutubeVISDataLoader(
            YoutubeVISPaths.training_base_dir(), YoutubeVISPaths.train_vds_file(),
            cfg.input, int(round(total_samples * dcfg.youtube_vis_weight)),
            frame_gap_lower=cfg.data.youtube_vis.frame_gap_lower,
            frame_gap_upper=cfg.data.youtube_vis.frame_gap_upper,
            category_agnostic=True,
            single_instance_duplication=cfg.data.youtube_vis.single_instance_duplication),
        DavisDataLoader(
            DavisUnsupervisedPaths.trainval_base_dir(),
            DavisUnsupervisedPaths.train_vds_file(), cfg.input,
            int(round(cfg.training.max_iterations * cfg.training.batch_size
                      * dcfg.davis_weight)),
            frame_gap_lower=dcfg.frame_gap_lower,
            frame_gap_upper=dcfg.frame_gap_upper,
            single_instance_duplication=True,
            background_as_ignore_region=True),
        PascalVOCDataLoader(PascalVOCPaths.images_dir(), PascalVOCPaths.ids_file(),
                            cfg.input, category_agnostic=True),
    ]
    weights = [dcfg.coco_weight, dcfg.youtube_vis_weight, dcfg.davis_weight,
               dcfg.pascal_voc_weight]
    print_fn("Training datasets: Coco, YouTubeVIS, Davis, PascalVOC")
    return ConcatDataset(datasets, total_samples, weights)


def _youtube_vis_dataset(cfg: Config, total_samples: int, print_fn):
    print_fn("Creating training dataset for YouTube-VIS...")
    assert cfg.input.num_classes == 41
    ycfg = cfg.data.youtube_vis

    datasets = [
        CocoDataLoader(CocoPaths.images_dir(), CocoPaths.ids_file(),
                       cfg.input, category_agnostic=False),
        PascalVOCDataLoader(PascalVOCPaths.images_dir(), PascalVOCPaths.ids_file(),
                            cfg.input, category_agnostic=False),
        YoutubeVISDataLoader(
            YoutubeVISPaths.training_base_dir(), YoutubeVISPaths.train_vds_file(),
            cfg.input, int(round(total_samples * ycfg.youtube_vis_weight)),
            frame_gap_lower=ycfg.frame_gap_lower,
            frame_gap_upper=ycfg.frame_gap_upper,
            category_agnostic=False,
            single_instance_duplication=ycfg.single_instance_duplication),
    ]
    weights = [ycfg.coco_weight, ycfg.pascal_voc_weight, ycfg.youtube_vis_weight]
    print_fn("Training datasets: Coco, PascalVOC, YouTubeVIS")
    return ConcatDataset(datasets, total_samples, weights)


def _kitti_mots_dataset(cfg: Config, total_samples: int, print_fn):
    print_fn("Creating training dataset for KITTI-MOTS...")
    assert cfg.input.num_classes == 3
    kcfg = cfg.data.kitti_mots

    datasets, weights, names = [], [], []
    if kcfg.mapillary_weight > 0.0:
        datasets.append(MapillaryDataLoader(
            MapillaryPaths.images_dir(), MapillaryPaths.ids_file(), cfg.input))
        weights.append(kcfg.mapillary_weight)
        names.append("Mapillary")
    if kcfg.kitti_mots_weight > 0.0:
        datasets.append(MOTSDataLoader(
            KITTIMOTSPaths.train_images_dir(), KITTIMOTSPaths.train_vds_file(),
            cfg.input, int(round(total_samples * kcfg.kitti_mots_weight)),
            frame_gap_lower=kcfg.frame_gap_lower,
            frame_gap_upper=kcfg.frame_gap_upper))
        weights.append(kcfg.kitti_mots_weight)
        names.append("KITTI-MOTS")

    print_fn(f"Training datasets: {', '.join(names)}")
    return ConcatDataset(datasets, total_samples, weights)


def _synthetic_dataset(cfg: Config, total_samples: int, print_fn):
    """Hardware-validation mode (no reference analogue): deterministic
    learnable moving-blob clips, so the full Trainer loop can be driven on
    real TPU hardware without datasets on disk (``data/synthetic.py``)."""
    from stemseg_tpu.data.synthetic import SyntheticBlobDataset

    print_fn("Creating SYNTHETIC training dataset (hardware validation)...")
    scfg = cfg.data.synthetic
    return SyntheticBlobDataset(cfg.input, total_samples,
                                height=scfg.height or None,
                                width=scfg.width or None,
                                max_instances=scfg.max_instances,
                                seed=scfg.seed)


def create_training_dataset(cfg: Config, total_samples: int, print_fn=print):
    factories = {
        "davis": _davis_dataset,
        "youtube_vis": _youtube_vis_dataset,
        "kitti_mots": _kitti_mots_dataset,
        "synthetic": _synthetic_dataset,
    }
    mode = cfg.training.mode
    if mode not in factories:
        raise ValueError(f"Invalid training mode: {mode!r}")
    return factories[mode](cfg, total_samples, print_fn)
