"""Loss parity vs the reference implementations + standalone properties."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


def _make_case(rng, n=2, i_max=3, t=2, h=16, w=24, e=3, n_free=0, free_stds=(),
               empty_seq=False):
    v = e - n_free
    c = e + v + 1
    emb_map = rng.randn(n, c, t, h, w).astype(np.float32)
    # keep seediness channel in a sane range pre-loss (reference applies
    # sigmoid in the decoder, the loss sees [0, 1] values)
    emb_map[:, -1] = 1.0 / (1.0 + np.exp(-emb_map[:, -1]))

    case = {"embedding_map": emb_map,
            "meta": json.dumps({"embedding_size": e, "n_free_dims": n_free,
                                "free_dim_stds": list(free_stds)})}
    masks, ignores, sem_labels = [], [], []
    for s in range(n):
        n_inst = 0 if (empty_seq and s == 0) else rng.randint(1, i_max + 1)
        m = np.zeros((n_inst, t, h, w), np.uint8)
        for k in range(n_inst):
            # random blobs, possibly overlapping
            cy, cx = rng.randint(2, h - 2), rng.randint(2, w - 2)
            ry, rx = rng.randint(2, 6), rng.randint(2, 8)
            yy, xx = np.mgrid[0:h, 0:w]
            blob = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
            m[k, :, :, :] = blob[None]
        ig = (rng.rand(t, h, w) < 0.05).astype(np.uint8)
        lab = np.zeros((t, h, w), np.int64)
        for k in range(n_inst):
            lab[m[k] > 0] = (k % 2) + 1 if True else 1
        masks.append(m)
        ignores.append(ig)
        sem_labels.append(lab)
        case[f"masks_{s}"] = m
        case[f"ignore_{s}"] = ig
        case[f"semseg_labels_{s}"] = lab

    num_classes = 3
    case["semseg_logits"] = rng.randn(n, t, num_classes, h, w).astype(np.float32)
    case["fg_logits"] = rng.randn(n, t, h, w).astype(np.float32)
    return case


def _run_reference(case, tmp_path):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    in_npz = str(tmp_path / "in.npz")
    out_npz = str(tmp_path / "out.npz")
    np.savez(in_npz, **case)
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "ref_loss_runner.py"), in_npz, out_npz],
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        pytest.fail(f"ref_loss_runner failed:\n{proc.stdout}\n{proc.stderr}")
    return np.load(out_npz)


def _ours(case, i_pad=4):
    import jax.numpy as jnp

    from stemseg_tpu.losses import (EmbeddingLossParams, embedding_loss,
                                    foreground_bce, semseg_cross_entropy)

    meta = json.loads(str(case["meta"]))
    emb_map = np.transpose(case["embedding_map"], (0, 2, 3, 4, 1))  # NTHWC
    n, t, h, w, _ = emb_map.shape

    masks = np.zeros((n, i_pad, t, h, w), np.float32)
    ignores = np.zeros((n, t, h, w), np.float32)
    for s in range(n):
        m = case[f"masks_{s}"]
        masks[s, :m.shape[0]] = m
        ignores[s] = case[f"ignore_{s}"]

    params = EmbeddingLossParams(
        embedding_size=meta["embedding_size"],
        n_free_dims=meta["n_free_dims"],
        free_dim_stds=tuple(meta["free_dim_stds"]),
    )
    total, terms = embedding_loss(jnp.asarray(emb_map), jnp.asarray(masks),
                                  jnp.asarray(ignores), params)

    semseg_logits = np.transpose(case["semseg_logits"], (0, 1, 3, 4, 2))  # NTHWC
    labels = np.stack([case[f"semseg_labels_{s}"] for s in range(n)])
    ce = semseg_cross_entropy(jnp.asarray(semseg_logits), jnp.asarray(labels),
                              jnp.asarray(ignores))
    fg = foreground_bce(jnp.asarray(case["fg_logits"]),
                        jnp.asarray((labels > 0).astype(np.float32)),
                        jnp.asarray(ignores))
    return total, terms, float(ce), float(fg)


@pytest.mark.parametrize("kwargs", [
    dict(),                                              # xyt-like, no free dims
    dict(e=4, n_free=2, free_stds=(0.3, 0.3)),           # xyff-like
    dict(empty_seq=True),                                # zero-instance sequence
])
def test_embedding_loss_parity(kwargs, tmp_path):
    rng = np.random.RandomState(7)
    case = _make_case(rng, **kwargs)
    ref = _run_reference(case, tmp_path)
    total, terms, ce, fg = _ours(case)

    from stemseg_tpu.utils.constants import LossConsts

    np.testing.assert_allclose(float(terms[LossConsts.LOVASZ_LOSS]),
                               float(ref["lovasz"]), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(terms[LossConsts.VARIANCE_SMOOTHNESS]),
                               float(ref["smoothness"]), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(terms[LossConsts.SEEDINESS_LOSS]),
                               float(ref["seediness"]), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(total), float(ref["embedding_total"]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(ce, float(ref["semseg_ce"]), rtol=2e-4)
    np.testing.assert_allclose(fg, float(ref["fg_bce"]), rtol=2e-4)


def test_lovasz_basic_properties():
    import jax.numpy as jnp

    from stemseg_tpu.losses import lovasz_hinge

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(100).astype(np.float32))
    labels = jnp.asarray((rng.rand(100) > 0.5).astype(np.float32))
    loss = float(lovasz_hinge(logits, labels))
    assert loss > 0
    # perfect separation with large margin -> ~0 loss
    perfect = jnp.where(labels > 0, 10.0, -10.0)
    assert float(lovasz_hinge(perfect, labels)) < 1e-6


def test_lovasz_custom_vjp_matches_autodiff():
    """The hand-written backward (inverse-permute the Jaccard weights with a
    second sort — ``lovasz.py`` module docstring) must be BIT-IDENTICAL to
    autodiffing through the sort, including under heavy error ties where the
    stable-sort order decides ranks."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.losses import lovasz_hinge
    from stemseg_tpu.losses.lovasz import lovasz_grad_from_sorted

    def lovasz_autodiff(logits, labels):
        # the pre-round-4 implementation: differentiate through lax.sort
        labels = labels.astype(logits.dtype)
        signs = 2.0 * labels - 1.0
        errors = 1.0 - logits * signs
        neg_sorted, gt_sorted = jax.lax.sort((-errors, labels), num_keys=1)
        grad = lovasz_grad_from_sorted(jax.lax.stop_gradient(gt_sorted))
        return jnp.dot(jax.nn.relu(-neg_sorted), grad)

    rng = np.random.RandomState(11)
    cases = []
    logits = rng.randn(4, 997).astype(np.float32)
    labels = (rng.rand(4, 997) < 0.3).astype(np.float32)
    cases.append((logits, labels))
    # tie-heavy: quantized logits -> many exactly-equal errors
    cases.append((np.round(logits * 2.0) / 2.0, labels))
    # all-positive / all-negative instances
    cases.append((logits, np.stack([np.ones(997), np.zeros(997),
                                    labels[0], labels[1]]).astype(np.float32)))

    for lg, lb in cases:
        lg, lb = jnp.asarray(lg), jnp.asarray(lb)
        v_new, g_new = jax.vmap(jax.value_and_grad(lovasz_hinge))(lg, lb)
        v_old, g_old = jax.vmap(jax.value_and_grad(lovasz_autodiff))(lg, lb)
        np.testing.assert_array_equal(np.asarray(v_new), np.asarray(v_old))
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_old))


def test_embedding_loss_is_differentiable():
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.losses import EmbeddingLossParams, embedding_loss

    rng = np.random.RandomState(3)
    case = _make_case(rng)
    emb_map = jnp.asarray(np.transpose(case["embedding_map"], (0, 2, 3, 4, 1)))
    n, t, h, w, _ = emb_map.shape
    masks = np.zeros((n, 4, t, h, w), np.float32)
    for s in range(n):
        m = case[f"masks_{s}"]
        masks[s, :m.shape[0]] = m
    ignores = jnp.zeros((n, t, h, w), jnp.float32)

    grad = jax.grad(lambda em: embedding_loss(
        em, jnp.asarray(masks), ignores, EmbeddingLossParams())[0])(emb_map)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0
