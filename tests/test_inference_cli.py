"""End-to-end inference CLI: fake dataset + random tiny model -> DAVIS PNGs
and the fps report, through the real ``stemseg_tpu.inference.main``."""

import json
import os

import cv2
import numpy as np
import pytest

from stemseg_tpu.utils import rle as rle_codec


def _make_dataset(tmp_path, n_frames=6, h=48, w=64):
    rng = np.random.RandomState(0)
    base_dir = str(tmp_path / "davis")
    os.makedirs(os.path.join(base_dir, "seqA"), exist_ok=True)
    image_paths, segmentations = [], []
    for t in range(n_frames):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        rel = f"seqA/{t:05d}.jpg"
        cv2.imwrite(os.path.join(base_dir, rel), img)
        image_paths.append(rel)
        m = np.zeros((h, w), np.uint8)
        m[10:30, 10 + t:30 + t] = 1
        segmentations.append({"1": rle_codec.encode(m)["counts"].decode("utf-8")})

    ds = {"meta": {"category_labels": {"1": "object"}},
          "sequences": [{"id": "seqA", "height": h, "width": w,
                         "image_paths": image_paths,
                         "categories": {"1": 1},
                         "segmentations": segmentations}]}
    ann_dir = str(tmp_path / "ann")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "davis_val.json"), "w") as fh:
        json.dump(ds, fh)
    return base_dir, ann_dir


def _make_checkpoint(tmp_path):
    """Tiny random model + config.yaml + .ckpt in one model dir."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_config, save_config
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training import create_train_state
    from stemseg_tpu.training.checkpoint import save_checkpoint

    cfg = load_config({
        "input": {"num_frames": 4, "num_classes": 2, "min_dim": 32, "max_dim": 48},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"lr_decay_type": "none"},
        "clustering": {"min_seediness_prob": 0.0},  # random weights: force clusters
    })
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir, exist_ok=True)
    save_config(cfg, os.path.join(model_dir, "config.yaml"))

    model = build_model(cfg, for_training=False)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 4, 32, 32, 3)))
    path = save_checkpoint(model_dir, 7, state)
    return path


@pytest.mark.slow
def test_inference_cli_davis(tmp_path, monkeypatch):
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.utils.timer import Timer

    Timer.reset()
    base_dir, ann_dir = _make_dataset(tmp_path)
    ckpt = _make_checkpoint(tmp_path)

    monkeypatch.setenv("DAVIS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)

    out_dir = str(tmp_path / "out")
    trace_dir = str(tmp_path / "trace")
    inference_main.main([ckpt, "-o", out_dir, "--dataset", "davis",
                         "--max_tracks", "5", "--frame_overlap", "2",
                         "--profile", trace_dir])

    result_dir = os.path.join(out_dir, "results", "seqA")
    files = sorted(os.listdir(result_dir))
    assert files == [f"{t:05d}.png" for t in range(6)]

    # --profile wrote a jax.profiler trace (xplane protobuf)
    traces = [f for _, _, fs in os.walk(trace_dir) for f in fs
              if f.endswith(".xplane.pb")]
    assert traces, "expected an .xplane.pb trace under --profile DIR"

    from PIL import Image

    img = Image.open(os.path.join(result_dir, "00000.png"))
    assert img.mode == "P"
    assert np.array(img).shape == (48, 64)

    # the fused one-jit path folds clustering into the model graph, so all
    # time lands in the 'inference' timer (see TrackGenerator.do_fused)
    assert Timer.get_duration("inference") > 0


def test_inference_cli_ytvis_resize_embeddings(tmp_path, monkeypatch):
    """YT-VIS branch with --resize_embeddings: per-window semseg logits and
    embeddings are upscaled 4x before clustering (upscaled_inputs outputs)."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_config, save_config
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training import create_train_state
    from stemseg_tpu.training.checkpoint import save_checkpoint
    from stemseg_tpu.utils.timer import Timer

    Timer.reset()
    rng = np.random.RandomState(1)
    n_frames, h, w = 5, 48, 64
    base_dir = str(tmp_path / "ytvis" / "valid")
    os.makedirs(os.path.join(base_dir, "seqB"), exist_ok=True)
    image_paths, segmentations = [], []
    for t in range(n_frames):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        rel = f"seqB/{t:05d}.jpg"
        cv2.imwrite(os.path.join(base_dir, rel), img)
        image_paths.append(rel)
        m = np.zeros((h, w), np.uint8)
        m[8:24, 8 + t:24 + t] = 1
        segmentations.append({"1": rle_codec.encode(m)["counts"].decode("utf-8")})
    ds = {"meta": {"category_labels": {str(i): f"cat{i}" for i in range(1, 4)}},
          "sequences": [{"id": 11, "height": h, "width": w,
                         "image_paths": image_paths,
                         "categories": {"1": 1},
                         "segmentations": segmentations}]}
    ann_dir = str(tmp_path / "ann")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "youtube_vis_val.json"), "w") as fh:
        json.dump(ds, fh)

    cfg = load_config({
        "input": {"num_frames": 4, "num_classes": 4, "min_dim": 32, "max_dim": 48},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"lr_decay_type": "none"},
        "clustering": {"min_seediness_prob": 0.0},
    })
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir, exist_ok=True)
    save_config(cfg, os.path.join(model_dir, "config.yaml"))
    model = build_model(cfg, for_training=False)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 4, 32, 32, 3)))
    ckpt = save_checkpoint(model_dir, 3, state)

    monkeypatch.setenv("YOUTUBE_VIS_BASE_DIR", str(tmp_path / "ytvis"))
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)

    out_dir = str(tmp_path / "out")
    inference_main.main([ckpt, "-o", out_dir, "--dataset", "ytvis",
                         "--resize_embeddings", "--frame_overlap", "2",
                         "--max_tracks", "5"])

    with open(os.path.join(out_dir, "results.json")) as fh:
        results = json.load(fh)
    assert results, "expected at least one track"
    for r in results:
        assert r["video_id"] == 11
        assert 1 <= r["category_id"] <= 3
        assert len(r["segmentations"]) == n_frames
        dec = rle_codec.decode({"size": r["segmentations"][0]["size"],
                                "counts": r["segmentations"][0]["counts"]})
        assert dec.shape == (h, w)


def test_inference_cli_kittimots(tmp_path, monkeypatch):
    """KITTI-MOTS branch: argmax semseg classes, MOTS txt output + NMS."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_config, save_config
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training import create_train_state
    from stemseg_tpu.training.checkpoint import save_checkpoint
    from stemseg_tpu.utils.timer import Timer

    Timer.reset()
    rng = np.random.RandomState(2)
    n_frames, h, w = 5, 48, 64
    base_dir = str(tmp_path / "kitti")
    os.makedirs(os.path.join(base_dir, "0002"), exist_ok=True)
    image_paths, segmentations = [], []
    for t in range(n_frames):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        rel = f"0002/{t:06d}.png"
        cv2.imwrite(os.path.join(base_dir, rel), img)
        image_paths.append(rel)
        m = np.zeros((h, w), np.uint8)
        m[8:24, 8 + t:24 + t] = 1
        segmentations.append({"1": rle_codec.encode(m)["counts"].decode("utf-8")})
    ds = {"meta": {"category_labels": {"1": "car", "2": "pedestrian"}},
          "sequences": [{"id": "0002", "height": h, "width": w,
                         "image_paths": image_paths,
                         "categories": {"1": 1},
                         "segmentations": segmentations}]}
    ann_dir = str(tmp_path / "ann")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "kittimots_val.json"), "w") as fh:
        json.dump(ds, fh)

    cfg = load_config({
        "input": {"num_frames": 4, "num_classes": 3, "min_dim": 32, "max_dim": 48},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"lr_decay_type": "none"},
        "clustering": {"min_seediness_prob": 0.0},
    })
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir, exist_ok=True)
    save_config(cfg, os.path.join(model_dir, "config.yaml"))
    model = build_model(cfg, for_training=False)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 4, 32, 32, 3)))
    ckpt = save_checkpoint(model_dir, 1, state)

    monkeypatch.setenv("KITTIMOTS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)

    out_dir = str(tmp_path / "out")
    inference_main.main([ckpt, "-o", out_dir, "--dataset", "kittimots",
                         "--frame_overlap", "2"])

    from stemseg_tpu.inference.output_utils.kitti_mots_postprocessing import Detection

    txt_path = os.path.join(out_dir, "results", "0002.txt")
    with open(txt_path) as fh:
        dets = [Detection.from_txt(l) for l in fh]
    assert dets, "expected detections"
    for d in dets:
        assert d.class_id in (1, 2)
        assert d.track_id // 1000 == d.class_id
        assert d._mask["size"] == (h, w)
    # NMS output dir written by save()
    assert os.path.isdir(os.path.join(out_dir, "results_nms"))


@pytest.mark.slow
def test_inference_cli_davis_data_parallel(tmp_path, monkeypatch):
    """--data_parallel (one sequence per device over the 8-device CPU mesh)
    must produce byte-identical PNGs to the serial run, including the
    short-sequence fallback to the per-sequence path."""
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.utils.timer import Timer

    rng = np.random.RandomState(1)
    h, w = 48, 64
    base_dir = str(tmp_path / "davis")
    sequences = []
    for si, (sid, n_frames) in enumerate([("seqA", 6), ("seqB", 7),
                                          ("seqC", 3)]):  # seqC < T=4: short
        os.makedirs(os.path.join(base_dir, sid), exist_ok=True)
        image_paths, segmentations = [], []
        for t in range(n_frames):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            rel = f"{sid}/{t:05d}.jpg"
            cv2.imwrite(os.path.join(base_dir, rel), img)
            image_paths.append(rel)
            m = np.zeros((h, w), np.uint8)
            m[8 + si:28 + si, 10 + t:30 + t] = 1
            segmentations.append(
                {"1": rle_codec.encode(m)["counts"].decode("utf-8")})
        sequences.append({"id": sid, "height": h, "width": w,
                          "image_paths": image_paths, "categories": {"1": 1},
                          "segmentations": segmentations})
    ds = {"meta": {"category_labels": {"1": "object"}},
          "sequences": sequences}
    ann_dir = str(tmp_path / "ann")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "davis_val.json"), "w") as fh:
        json.dump(ds, fh)

    ckpt = _make_checkpoint(tmp_path)
    monkeypatch.setenv("DAVIS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)

    def run(out_name, extra):
        Timer.reset()
        out_dir = str(tmp_path / out_name)
        inference_main.main([ckpt, "-o", out_dir, "--dataset", "davis",
                             "--max_tracks", "5", "--frame_overlap", "2"]
                            + extra)
        return out_dir

    serial = run("out_serial", [])
    parallel = run("out_parallel", ["--data_parallel"])

    for sid, n_frames in [("seqA", 6), ("seqB", 7), ("seqC", 3)]:
        for t in range(n_frames):
            fn = os.path.join("results", sid, f"{t:05d}.png")
            with open(os.path.join(serial, fn), "rb") as f1, \
                    open(os.path.join(parallel, fn), "rb") as f2:
                assert f1.read() == f2.read(), f"{fn} differs"
