"""Train step: loss decreases, frozen params stay frozen, sharded path runs
on an 8-virtual-device mesh (the DP substitute for the reference's missing
distributed tests — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemseg_tpu.config import default_config, load_config
from stemseg_tpu.models import build_model
from stemseg_tpu.training import TrainState, create_train_state, make_train_step
from stemseg_tpu.training.optim import param_freeze_labels


def _tiny_cfg(**training_overrides):
    overrides = {
        "input": {"num_frames": 2, "num_classes": 2, "min_dim": 32, "max_dim": 64},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"initial_lr": 0.01, "lr_decay_type": "none", **training_overrides},
    }
    return load_config(overrides)


def _batch(rng, n=1, i=2, t=2, h=64, w=96):
    images = rng.randn(n, t, h, w, 3).astype(np.float32) * 10
    masks = np.zeros((n, i, t, h, w), np.float32)
    for s in range(n):
        masks[s, 0, :, 10:30, 20:50] = 1.0
        if i > 1:
            masks[s, 1, :, 35:55, 55:85] = 1.0
    return {
        "images": images,
        "masks": masks,
        "ignore_masks": np.zeros((n, t, h, w), np.float32),
        "category_ids": np.tile(np.array([[1, 1] + [0] * (i - 2)], np.int32), (n, 1)),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model = build_model(cfg, for_training=True)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.asarray(batch["images"]))
    return cfg, model, batch, state, tx


@pytest.mark.slow
def test_loss_decreases(setup):
    cfg, model, batch, state, tx = setup
    step = make_train_step(model, cfg, tx, donate=False)
    batch = jax.tree.map(jnp.asarray, batch)
    _, first = step(state, batch)
    s = state
    for _ in range(5):
        s, metrics = step(s, batch)
    assert float(metrics["total"]) < float(first["total"])
    assert np.isfinite(float(metrics["total"]))


def test_frozen_params_unchanged(setup):
    cfg, model, batch, state, tx = setup
    step = make_train_step(model, cfg, tx, donate=False)
    new_state, _ = step(state, jax.tree.map(jnp.asarray, batch))

    # stem and layer1 are frozen at FREEZE_AT_STAGE=2 (resnet.py:94-103)
    before = state.params["body"]["stem"]["conv1"]["conv"]["kernel"]
    after = new_state.params["body"]["stem"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

    b1 = state.params["body"]["layer1_0"]["conv1"]["conv"]["kernel"]
    a1 = new_state.params["body"]["layer1_0"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(a1))

    # layer2+ must train
    b2 = state.params["body"]["layer2_0"]["conv1"]["conv"]["kernel"]
    a2 = new_state.params["body"]["layer2_0"]["conv1"]["conv"]["kernel"]
    assert not np.array_equal(np.asarray(b2), np.asarray(a2))


@pytest.mark.slow
def test_frozen_stage_grads_pruned(setup):
    """The backward never computes frozen-stage weight grads: the module's
    stop_gradient at the freeze_at_stage boundary (resnet.py) yields exact
    zeros — the FLOP equivalent of torch's requires_grad=False pruning
    (reference resnet.py:94-103) — while trainable grads are nonzero."""
    from stemseg_tpu.training.step import make_loss_fn

    cfg, model, batch, state, tx = setup
    loss_fn = make_loss_fn(model, cfg)
    grads = jax.grad(lambda p, c, b: loss_fn(p, c, b)[0])(
        state.params, state.constants, jax.tree.map(jnp.asarray, batch))
    body = grads["body"]
    for name, sub in body.items():
        leaves = np.concatenate([np.abs(np.asarray(l)).ravel()
                                 for l in jax.tree.leaves(sub)])
        if name == "stem" or name.startswith("layer1_"):
            assert leaves.max() == 0.0, f"frozen grad nonzero in body/{name}"
        else:
            assert leaves.max() > 0.0, f"trainable grad all-zero in body/{name}"


def test_freeze_labels_full_backbone():
    cfg = _tiny_cfg(freeze_backbone=True)
    model = build_model(cfg, for_training=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 96, 3)))
    labels = param_freeze_labels(v["params"], freeze_at_stage=2, freeze_backbone=True)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    for path, lab in flat:
        top = path[0].key
        if top in ("body", "fpn"):
            assert lab == "frozen", path
        else:
            assert lab == "trainable", path


@pytest.mark.slow
def test_sharded_train_step_8dev():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    from stemseg_tpu.parallel import create_mesh, shard_batch

    cfg = _tiny_cfg()
    model = build_model(cfg, for_training=True)
    rng = np.random.RandomState(1)
    batch = _batch(rng, n=8)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.asarray(batch["images"][:1]))

    mesh = create_mesh(8)
    step = make_train_step(model, cfg, tx, mesh=mesh, donate=False)
    sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
    from stemseg_tpu.parallel.mesh import replicated_sharding

    state = jax.device_put(state, replicated_sharding(mesh))
    new_state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1

    # sharded-loss == single-device loss on the same global batch
    single = make_train_step(model, cfg, tx, donate=False)
    _, m_single = single(jax.device_put(state, jax.devices()[0]),
                         jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(float(metrics["total"]), float(m_single["total"]),
                               rtol=1e-5)


@pytest.mark.slow
def test_loss_at_full_res_path():
    """LOSS_AT_FULL_RES: outputs upscaled 4x, targets stay full-res
    (model_builder.py:197-206 / resize_masks :139-151)."""
    cfg = load_config({
        "input": {"num_frames": 2, "num_classes": 2, "min_dim": 32, "max_dim": 64},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "training": {"initial_lr": 0.01, "lr_decay_type": "none",
                     "loss_at_full_res": True},
    })
    model = build_model(cfg, for_training=True)
    assert model.output_resize_scale == 4.0
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.asarray(batch["images"]))

    # the forward emits full-res maps
    out = model.apply({"params": state.params, "constants": state.constants},
                      jnp.asarray(batch["images"]))
    n, t, h, w, _ = batch["images"].shape
    assert out["embeddings"].shape[1:4] == (t, h, w)
    assert out["semseg_masks"].shape[1:4] == (t, h, w)

    step = make_train_step(model, cfg, tx, donate=False)
    _, metrics = step(state, jax.tree.map(jnp.asarray, batch))
    assert np.isfinite(float(metrics["total"]))
