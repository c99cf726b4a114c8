"""Smoke test for the one-command accuracy runbook (``scripts/eval_all.py``):
convert -> infer -> score on the synthetic composed-e2e mini-dataset with a
structured random reference checkpoint, asserting the chain runs end to end
and writes the RESULTS.md report."""

import os
import sys

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not available")]

sys.path.insert(0, os.path.dirname(__file__))


def test_eval_all_davis_smoke(tmp_path, monkeypatch):
    from test_composed_e2e import (DAVIS_CFG, _make_shared_checkpoint,
                                   _write_dataset)

    base_dir = str(tmp_path / "davis_data")
    ann_dir = str(tmp_path / "ann")
    seqs = [("seqA", 6, 120, 180), ("seqB", 5, 144, 90)]
    _write_dataset(base_dir, os.path.join(ann_dir, "davis_val.json"), seqs)

    env = dict(os.environ, DAVIS_BASE_DIR=base_dir,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, DAVIS_CFG, env)
    models_dir = str(tmp_path / "models")
    os.makedirs(models_dir)
    os.rename(model_pth, os.path.join(models_dir, "davis.pth"))
    # config.yaml must travel WITH the checkpoint: the inference CLI reads
    # the config next to the .pth, else silently falls back to the davis_2
    # preset (R-101/16-frame) — wrong model for this checkpoint and ~10x
    # slower on CPU
    import shutil

    shutil.copy(os.path.join(os.path.dirname(model_pth), "config.yaml"),
                os.path.join(models_dir, "config.yaml"))

    monkeypatch.setenv("DAVIS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import eval_all

    out_dir = str(tmp_path / "out")
    # frame_overlap 2 < the test config's NUM_FRAMES=4 (the davis default
    # overlap of 6 only fits production window lengths)
    per_dataset = eval_all.main(["--models_dir", models_dir,
                                 "--output_dir", out_dir,
                                 "--datasets", "davis",
                                 "--frame_overlap", "2"])

    assert "davis" in per_dataset
    metrics = per_dataset["davis"]["metrics"]
    # full J&F metric family from the in-repo scorer
    for key in ("J&F", "J_mean", "F_mean", "J_recall", "F_decay"):
        assert key in metrics, f"missing metric {key}"
    results_md = os.path.join(out_dir, "RESULTS.md")
    assert os.path.exists(results_md)
    text = open(results_md).read()
    assert "davis" in text and "J&F" in text
    # the writer actually produced sequence outputs the scorer consumed
    assert os.path.isdir(os.path.join(out_dir, "davis", "results", "seqA"))
