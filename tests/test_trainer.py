"""Trainer shell: checkpoint round-trip, auto-resume, end-to-end tiny run."""

import json
import os

import numpy as np
import pytest


def _fake_dataset(n, t=2, h=64, w=96, n_inst=2):
    class FakeDataset:
        def __len__(self):
            return n

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            images = (rng.randn(t, h, w, 3) * 10).astype(np.float32)
            masks = np.zeros((n_inst, t, h, w), np.uint8)
            masks[0, :, 10:30, 20:50] = 1
            masks[1, :, 35:55, 55:85] = 1
            return {
                "images": images,
                "masks": masks,
                "ignore_masks": np.zeros((t, h, w), np.uint8),
                "category_ids": np.ones(n_inst, np.int32),
                "orig_dims": (w, h),
                "meta": {},
            }

    return FakeDataset()


@pytest.fixture()
def tiny_cfg_file(tmp_path):
    import yaml

    cfg = {
        "input": {"num_frames": 2, "num_classes": 2, "min_dim": 32, "max_dim": 64},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"mode": "davis", "max_iterations": 4, "batch_size": 1,
                     "max_samples_per_chip": 1, "initial_lr": 0.01,
                     "lr_decay_type": "none"},
    }
    path = str(tmp_path / "tiny.yaml")
    with open(path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    return path


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_config
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training import create_train_state
    from stemseg_tpu.training.checkpoint import (
        cleanup_old_checkpoints,
        find_latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = load_config({"input": {"num_frames": 2},
                       "model": {"backbone": {"type": "R-50-FPN"}},
                       "training": {"lr_decay_type": "none"}})
    model = build_model(cfg, for_training=True)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 2, 64, 96, 3)))

    d = str(tmp_path / "ckpts")
    save_checkpoint(d, 100, state, extra={"logger": {"elapsed": 12.5}})
    save_checkpoint(d, 200, state, extra={})
    save_checkpoint(d, 300, state, extra={})

    assert find_latest_checkpoint(d).endswith("000300.ckpt")

    restored, extra, step = restore_checkpoint(os.path.join(d, "000100.ckpt"), state)
    assert step == 100
    assert extra["logger"]["elapsed"] == 12.5
    np.testing.assert_array_equal(
        np.asarray(restored.params["body"]["stem"]["conv1"]["conv"]["kernel"]),
        np.asarray(state.params["body"]["stem"]["conv1"]["conv"]["kernel"]))

    cleanup_old_checkpoints(d, keep=2)
    remaining = sorted(os.listdir(d))
    assert remaining == ["000200.ckpt", "000300.ckpt"]


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, tiny_cfg_file, monkeypatch):
    """Four optimizer iterations on a fake dataset; checkpoint written;
    metrics logged; resume picks up the step counter."""
    from stemseg_tpu.training import datasets as datasets_mod
    from stemseg_tpu.training.main import Trainer, make_parser

    monkeypatch.setattr(datasets_mod, "create_training_dataset",
                        lambda cfg, n, print_fn=print: _fake_dataset(n))
    # main.py imports it lazily from the module, so patch there too
    import stemseg_tpu.training.main as train_main

    model_dir = str(tmp_path / "run")
    trace_dir = str(tmp_path / "trace")
    args = make_parser().parse_args([
        "--model_dir", model_dir, "--cfg", tiny_cfg_file,
        "--display_interval", "2", "--summary_interval", "2",
        "--save_interval", "10", "--num_cpu_workers", "2",
        "--profile", trace_dir, "--profile_steps", "2",
    ])

    from stemseg_tpu.config import load_config

    cfg = load_config(tiny_cfg_file)
    trainer = Trainer(cfg, model_dir, args)
    trainer.start()

    assert trainer.elapsed_iterations == 4
    assert os.path.exists(os.path.join(model_dir, "000004.ckpt"))
    assert os.path.exists(os.path.join(model_dir, "config.yaml"))
    metrics_path = os.path.join(model_dir, "logs", "metrics.jsonl")
    assert os.path.exists(metrics_path)
    with open(metrics_path) as fh:
        records = [json.loads(l) for l in fh]
    assert records and "total" in records[0]

    # --profile captured a bounded jax.profiler trace (xplane protobuf)
    traces = [f for _, _, fs in os.walk(trace_dir) for f in fs
              if f.endswith(".xplane.pb")]
    assert traces, "expected an .xplane.pb trace under --profile DIR"

    # auto-resume: a new trainer in the same dir starts at iteration 4
    trainer2 = Trainer(cfg, model_dir, args)
    assert trainer2.elapsed_iterations == 4


def test_initial_ckpt_warm_start(tmp_path, tiny_cfg_file):
    """--initial_ckpt loads weights only; training starts at iteration 0
    (reference training/main.py:86-88, stage-2 warm starts)."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_config
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training import create_train_state
    from stemseg_tpu.training.checkpoint import save_checkpoint
    from stemseg_tpu.training.main import Trainer, make_parser

    cfg = load_config(tiny_cfg_file)
    model = build_model(cfg, for_training=True)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(7),
                                  jnp.zeros((1, 2, 64, 96, 3)))
    donor_dir = str(tmp_path / "donor")
    ckpt = save_checkpoint(donor_dir, 500, state)

    model_dir = str(tmp_path / "warm")
    args = make_parser().parse_args([
        "--model_dir", model_dir, "--cfg", tiny_cfg_file,
        "--initial_ckpt", ckpt, "--no_resume",
    ])
    trainer = Trainer(cfg, model_dir, args)
    assert trainer.elapsed_iterations == 0  # weights only, not session state
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["body"]["stem"]["conv1"]["conv"]["kernel"]),
        np.asarray(state.params["body"]["stem"]["conv1"]["conv"]["kernel"]))
