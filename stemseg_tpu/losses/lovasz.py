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

The backward is a hand-written ``custom_vjp``: autodiff through ``lax.sort``
transposes the sorted-domain cotangent back with a SCATTER, which on TPU is
a serialized loop — measured 24 ms per train step at the davis_1 loss
geometry ([8, 459264]), dominating the loss subgraph. ``d loss / d errors_i``
is just ``1[errors_i > 0] * w[rank(i)]``, and ``w[rank(i)]`` for all ``i`` is
the inverse permutation of ``w`` — computable with a SECOND sort keyed on the
forward permutation (TPU-friendly bulk op, ~7 ms) instead of a scatter. The
permutation rides through the forward sort packed into the label operand's
int32 bits (labels are 0/1: one bit), so the forward stays a single
two-operand sort. Net: loss fwd+bwd 36.1 -> 17.9 ms on-chip, gradients
BIT-IDENTICAL to the autodiff version (the weights w are exact in both).
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


def _forward(logits: jnp.ndarray, labels: jnp.ndarray):
    labels = labels.astype(logits.dtype)
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    p = errors.shape[-1]
    # descending sort carrying (label bit | original index) as one int32
    # value operand; stable sort => identical tie behavior to sorting the
    # raw label array (ties keep original order either way)
    iota = jax.lax.iota(jnp.int32, p)
    packed = (iota << 1) | labels.astype(jnp.int32)
    neg_sorted, packed_sorted = jax.lax.sort((-errors, packed), num_keys=1)
    errors_sorted = -neg_sorted
    gt_sorted = (packed_sorted & 1).astype(logits.dtype)
    perm = packed_sorted >> 1
    grad = lovasz_grad_from_sorted(gt_sorted)
    value = jnp.dot(jax.nn.relu(errors_sorted), grad)
    return value, (signs, errors, perm, grad)


@jax.custom_vjp
def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary Lovász hinge over a flat pixel set.

    :param logits: [P] float logits
    :param labels: [P] float or int binary ground truth
    :return: scalar loss
    """
    return _forward(logits, labels)[0]


def _fwd(logits, labels):
    value, res = _forward(logits, labels)
    return value, res + (labels,)


def _bwd(res, g):
    signs, errors, perm, grad, labels = res
    # inverse-permute the Jaccard weights with a second sort (not a scatter)
    _, w = jax.lax.sort((perm, grad), num_keys=1)
    # relu' at exactly 0 is 0, matching torch
    d_logits = g * jnp.where(errors > 0, w, 0.0) * (-signs)
    return d_logits, jnp.zeros_like(labels)


lovasz_hinge.defvjp(_fwd, _bwd)
