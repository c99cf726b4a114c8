"""Training-side parity vs the reference: per-tensor GRADIENTS and a K-step
SGD+nesterov optimizer TRAJECTORY on identical weights and batches.

Loss-value parity (test_losses.py) cannot catch a wrong-but-finite
gradient — e.g. through the Lovász sort rewrite (``losses/lovasz.py``), the
frozen-backbone stop-gradient boundary, or the coupled weight-decay /
nesterov momentum composition (``training/optim.py``). These tests run the
reference's actual training machinery (``TrainingModel.forward`` with
losses composed inside, ``ModelOutputManager``, ``create_optimizer``'s SGD
— ``ref_train_runner.py``) in a torch subprocess on a shared structured
random checkpoint and shared batches, then compare:

* d(total loss)/d(param) for every trainable tensor (through the weight
  converter's layout mapping, which is linear and so maps gradients too);
* the total loss of every sub-iteration;
* the parameters after K optimizer steps (trajectory divergence bounded
  relative to how far the reference actually moved);
* gradient-accumulation: ``optax.MultiSteps`` every-2 vs the reference's
  ``optimizer_step_interval=2`` loss-division semantics
  (``training/main.py:140-157``, ``model_output_manager.py:27-33``).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not available")]

_E2E_RUNNER = os.path.join(os.path.dirname(__file__), "ref_e2e_runner.py")
_TRAIN_RUNNER = os.path.join(os.path.dirname(__file__), "ref_train_runner.py")

N, T, H, W = 2, 4, 96, 128
I_MAX = 3

KITTI_STYLE_CFG = """\
INPUT:
  MIN_DIM: 96
  MAX_DIM: 160
  NUM_CLASSES: 3
  NUM_FRAMES: 4
MODEL:
  BACKBONE:
    TYPE: "R-50-FPN"
  EMBEDDING_DIM_MODE: "xyt"
  USE_SEEDINESS_HEAD: false
  USE_SEMSEG_HEAD: true
TRAINING:
  INITIAL_LR: 0.01
  LR_DECAY_TYPE: "none"
  WEIGHT_DECAY: 0.0001
"""

DAVIS_STYLE_CFG = """\
INPUT:
  MIN_DIM: 96
  MAX_DIM: 160
  NUM_CLASSES: 2
  NUM_FRAMES: 4
MODEL:
  BACKBONE:
    TYPE: "R-50-FPN"
  EMBEDDING_DIM_MODE: "xyff"
  USE_SEEDINESS_HEAD: true
  USE_SEMSEG_HEAD: false
  EMBEDDINGS:
    EMBEDDING_SIZE: 4
TRAINING:
  FREEZE_BACKBONE: true
  INITIAL_LR: 0.01
  LR_DECAY_TYPE: "none"
  WEIGHT_DECAY: 0.0001
  LOSSES:
    EMBEDDING:
      FREE_DIM_STDS: [0.3, 0.3]
"""


def _make_batches(n_steps, n_categories, seed=0):
    """Shared synthetic batches: structured images, moving-rectangle
    instance masks (2 and 3 instances -> exercises instance padding), a
    stripe of ignore pixels."""
    rng = np.random.RandomState(seed)
    batches = []
    for k in range(n_steps):
        images = rng.randn(N, T, H, W, 3).astype(np.float32) * 40.0
        yy, xx = np.mgrid[0:H, 0:W]
        images += (xx / W * 60 + yy / H * 30)[None, None, :, :, None]
        seqs = []
        for i in range(N):
            n_inst = 2 if i == 0 else 3
            masks = np.zeros((n_inst, T, H, W), np.uint8)
            for j in range(n_inst):
                y0 = 8 + 24 * j + 2 * k
                x0 = 10 + 30 * j
                for t in range(T):
                    masks[j, t, y0:y0 + 20, x0 + 3 * t:x0 + 3 * t + 24] = 1
            ignore = np.zeros((T, H, W), np.uint8)
            ignore[:, :, W - 12:] = 1
            catids = (1 + rng.randint(0, n_categories, n_inst)).astype(np.int64)
            seqs.append((masks, ignore, catids))
        batches.append((images, seqs))
    return batches


def _save_batches_npz(path, batches, step_interval=1):
    arrays = {"meta": json.dumps({"n_steps": len(batches), "n_seqs": N,
                                  "step_interval": step_interval})}
    for k, (images, seqs) in enumerate(batches):
        arrays[f"images_{k}"] = images
        for i, (masks, ignore, catids) in enumerate(seqs):
            arrays[f"masks_{k}_{i}"] = masks
            arrays[f"ignore_{k}_{i}"] = ignore
            arrays[f"catids_{k}_{i}"] = catids
    np.savez(path, **arrays)


def _our_batch(images, seqs):
    """Pad to the fixed-shape batch contract of ``training/step.py``."""
    masks = np.zeros((N, I_MAX, T, H, W), np.uint8)
    ignore = np.zeros((N, T, H, W), np.uint8)
    catids = np.zeros((N, I_MAX), np.int32)
    for i, (m, ig, c) in enumerate(seqs):
        masks[i, :m.shape[0]] = m
        ignore[i] = ig
        catids[i, :len(c)] = c
    return {"images": images, "masks": masks, "ignore_masks": ignore,
            "category_ids": catids}


def _setup(tmp_path, cfg_text, batches, step_interval=1):
    """Make the shared checkpoint, run the reference trainer subprocess,
    and return (ref out-npz dict, our cfg, our initial variables)."""
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.yaml"), "w") as fh:
        fh.write(cfg_text)
    res = subprocess.run(
        [sys.executable, _E2E_RUNNER, "make_ckpt", model_dir, "0"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, f"make_ckpt failed:\n{res.stderr[-3000:]}"

    in_npz = str(tmp_path / "batches.npz")
    out_npz = str(tmp_path / "ref_out.npz")
    _save_batches_npz(in_npz, batches, step_interval)
    res = subprocess.run(
        [sys.executable, _TRAIN_RUNNER, model_dir, in_npz, out_npz],
        capture_output=True, text=True, timeout=3600)
    assert res.returncode == 0, f"ref train runner failed:\n{res.stderr[-4000:]}"
    ref = np.load(out_npz)

    from stemseg_tpu.config import load_config
    from stemseg_tpu.models import build_model
    from stemseg_tpu.models.converter import (convert_state_dict,
                                              load_torch_state_dict,
                                              merge_variables)

    import jax
    import jax.numpy as jnp

    cfg = load_config(os.path.join(model_dir, "config.yaml"))
    model = build_model(cfg, for_training=True)
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, T, 64, 96, 3), jnp.float32))
    state_dict = load_torch_state_dict(os.path.join(model_dir, "model.pth"))
    variables = merge_variables(init_vars, convert_state_dict(state_dict))
    return ref, cfg, model, variables, state_dict


def _compare_tree_against_converted(our_tree, converted_params, what,
                                    rtol, atol_scale):
    """Walk the converted torch tree (trainable tensors only) and compare
    each leaf against the same path in our tree by relative L2 error."""
    import jax

    flat_conv = jax.tree_util.tree_flatten_with_path(converted_params)[0]
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(our_tree)[0])
    assert flat_conv, "empty converted tree"
    worst = ("", 0.0)
    for path, ref_leaf in flat_conv:
        ours = np.asarray(flat_ours[path])
        ref_leaf = np.asarray(ref_leaf)
        err = float(np.linalg.norm(ours - ref_leaf))
        denom = float(np.linalg.norm(ref_leaf)) + atol_scale
        rel = err / denom
        if rel > worst[1]:
            worst = (jax.tree_util.keystr(path), rel)
        assert rel <= rtol, (
            f"{what} mismatch at {jax.tree_util.keystr(path)}: "
            f"rel L2 {rel:.2e} (|ref|={np.linalg.norm(ref_leaf):.3e})")
    return worst


def _grad_tree(model, cfg, variables, batch):
    import jax

    from stemseg_tpu.training.step import make_loss_fn

    loss_fn = make_loss_fn(model, cfg)
    grad_fn = jax.jit(jax.grad(
        lambda p, c, b: loss_fn(p, c, b)[0]))
    return grad_fn(variables["params"], variables["constants"], batch)


@pytest.mark.parametrize("cfg_text,cfg_id", [
    (KITTI_STYLE_CFG, "semseg_xyt"),
    (DAVIS_STYLE_CFG, "seediness_xyff_frozen_backbone"),
], ids=["semseg_xyt", "seediness_xyff_frozen_backbone"])
def test_gradient_parity(tmp_path, cfg_text, cfg_id):
    """d(total)/d(param) for every trainable tensor matches torch autograd
    through the layout converter (transposes are linear => the converter
    maps gradients exactly like weights)."""
    from stemseg_tpu.models.converter import convert_state_dict

    n_cats = 2 if "semseg" in cfg_id else 1
    batches = _make_batches(1, n_categories=n_cats)
    ref, cfg, model, variables, _ = _setup(tmp_path, cfg_text, batches)

    grads = _grad_tree(model, cfg, variables,
                       _our_batch(*batches[0]))

    ref_grads = {k[len("grad/"):]: ref[k] for k in ref.files
                 if k.startswith("grad/")}
    assert ref_grads, "reference returned no gradients"
    converted = convert_state_dict(ref_grads)
    # frozen params (torch requires_grad=False -> None grad) are absent
    # from the converted tree and therefore skipped — updates are zeroed
    # on both sides (optax.set_to_zero / optimizer skip)
    worst = _compare_tree_against_converted(
        grads, converted["params"], f"grad[{cfg_id}]",
        rtol=2e-3, atol_scale=1e-6)
    print(f"[{cfg_id}] worst grad rel-L2: {worst}")


def test_trajectory_parity(tmp_path):
    """Params after 4 SGD+nesterov steps (coupled weight decay, LR 0.01)
    track torch per-tensor; per-step losses and update norms match."""
    import jax.numpy as jnp

    from stemseg_tpu.models.converter import convert_state_dict
    from stemseg_tpu.training.step import (TrainState, create_train_state,
                                           make_train_step)

    n_steps = 4
    batches = _make_batches(n_steps, n_categories=2)
    ref, cfg, model, variables, state_dict = _setup(
        tmp_path, KITTI_STYLE_CFG, batches)

    state, tx = create_train_state(
        model, cfg, __import__("jax").random.PRNGKey(0),
        jnp.zeros((1, T, 64, 96, 3), jnp.float32))
    state = state.replace(params=variables["params"],
                          constants=variables["constants"],
                          opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(model, cfg, tx, donate=False)

    import jax

    prev = state.params
    for k in range(n_steps):
        state, metrics = step_fn(state, _our_batch(*batches[k]))
        our_loss = float(metrics["total"])
        ref_loss = float(ref[f"loss_{k}"])
        assert abs(our_loss - ref_loss) <= 2e-4 * max(1.0, abs(ref_loss)), \
            f"step {k}: loss {our_loss} vs ref {ref_loss}"
        our_norm = float(jnp.sqrt(sum(
            jnp.sum((a - b) ** 2) for a, b in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(prev)))))
        ref_norm = float(ref[f"stepnorm_{k}"])
        assert abs(our_norm - ref_norm) <= 2e-2 * max(ref_norm, 1e-6), \
            f"step {k}: update norm {our_norm} vs ref {ref_norm}"
        prev = state.params

    ref_final = {k[len("final/"):]: ref[k] for k in ref.files
                 if k.startswith("final/")}
    converted = convert_state_dict(ref_final)
    # trajectory error relative to how far each tensor actually moved
    init_conv = convert_state_dict(state_dict)
    flat_init = dict(jax.tree_util.tree_flatten_with_path(
        init_conv["params"])[0])
    flat_final = jax.tree_util.tree_flatten_with_path(
        converted["params"])[0]
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    tot_err = tot_disp = 0.0
    for path, ref_leaf in flat_final:
        ours = np.asarray(flat_ours[path])
        ref_leaf = np.asarray(ref_leaf)
        disp = float(np.linalg.norm(ref_leaf - np.asarray(flat_init[path])))
        err = float(np.linalg.norm(ours - ref_leaf))
        tot_err += err ** 2
        tot_disp += disp ** 2
        assert err <= max(0.02 * disp, 1e-5), (
            f"trajectory diverged at {jax.tree_util.keystr(path)}: "
            f"err {err:.3e} vs ref displacement {disp:.3e}")
    ratio = np.sqrt(tot_err) / max(np.sqrt(tot_disp), 1e-12)
    print(f"trajectory global err/disp = {ratio:.2e}")
    assert ratio <= 0.01


def test_accumulation_parity(tmp_path):
    """optax.MultiSteps(every_k=2) == reference optimizer_step_interval=2:
    4 sub-iterations -> 2 optimizer steps; final params match."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.models.converter import convert_state_dict
    from stemseg_tpu.training.step import create_train_state, make_train_step

    n_sub = 4
    batches = _make_batches(n_sub, n_categories=2, seed=3)
    ref, cfg, model, variables, state_dict = _setup(
        tmp_path, KITTI_STYLE_CFG, batches, step_interval=2)

    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jnp.zeros((1, T, 64, 96, 3), jnp.float32), accumulate_steps=2)
    state = state.replace(params=variables["params"],
                          constants=variables["constants"],
                          opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(model, cfg, tx, donate=False)

    for k in range(n_sub):
        state, metrics = step_fn(state, _our_batch(*batches[k]))
        # reference reports loss/interval per sub-iteration
        our_loss = float(metrics["total"]) / 2.0
        ref_loss = float(ref[f"loss_{k}"])
        assert abs(our_loss - ref_loss) <= 2e-4 * max(1.0, abs(ref_loss))

    ref_final = {k[len("final/"):]: ref[k] for k in ref.files
                 if k.startswith("final/")}
    converted = convert_state_dict(ref_final)
    init_conv = convert_state_dict(state_dict)
    flat_init = dict(jax.tree_util.tree_flatten_with_path(
        init_conv["params"])[0])
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    for path, ref_leaf in jax.tree_util.tree_flatten_with_path(
            converted["params"])[0]:
        ours = np.asarray(flat_ours[path])
        ref_leaf = np.asarray(ref_leaf)
        disp = float(np.linalg.norm(ref_leaf - np.asarray(flat_init[path])))
        err = float(np.linalg.norm(ours - ref_leaf))
        assert err <= max(0.02 * disp, 1e-5), (
            f"accumulation diverged at {jax.tree_util.keystr(path)}: "
            f"err {err:.3e} vs displacement {disp:.3e}")
