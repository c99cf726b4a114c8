"""Lovász hinge loss (Berman 2018), TPU-native.

Behavioral reference: ``/root/reference/stemseg/modeling/losses/_lovasz.py``
(``lovasz_grad`` :50-62, ``lovasz_hinge_flat`` :130-147). Instead of the
reference's per-instance Python calls we expose a single flat function that
``vmap``s cleanly over an instance axis; the descending sort is one
``jax.lax.sort`` key-value sort (well-mapped to TPU), and the Jaccard-gradient
is two cumulative sums.

Gradient flow matches torch: the permutation is treated as constant (sort is
piecewise-constant in its inputs), errors carry the gradient, the Jaccard
weights are a function of labels only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lovasz_grad_from_sorted(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors.
    ``gt_sorted``: [P] float (0/1) labels ordered by descending error."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    # first element kept, rest differenced (reference _lovasz.py:60-61)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary Lovász hinge over a flat pixel set.

    :param logits: [P] float logits
    :param labels: [P] float or int binary ground truth
    :return: scalar loss
    """
    labels = labels.astype(logits.dtype)
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    # descending sort carrying labels: sort ascending on -errors
    neg_sorted, gt_sorted = jax.lax.sort((-errors, labels), num_keys=1)
    errors_sorted = -neg_sorted
    grad = lovasz_grad_from_sorted(jax.lax.stop_gradient(gt_sorted))
    return jnp.dot(jax.nn.relu(errors_sorted), grad)
