"""Semantic-segmentation losses: multi-class CE and foreground BCE.

Behavioral reference: ``/root/reference/stemseg/modeling/losses/cross_entropy.py``
and ``TrainingModel.compute_fg_loss`` (``model_builder.py:210-244``).

PARITY TRAP (SURVEY.md §7): the reference CE reduces ``F.cross_entropy`` to a
scalar *before* multiplying by the non-ignore mask, then renormalizes by the
mask sum — arithmetically ``scalar * Σm / Σm``, i.e. the ignore mask is a
no-op (``cross_entropy.py:35-41``). We replicate that by default
(``respect_ignore_mask=False``) and offer the fixed per-pixel-masked variant
behind the flag.

The fg BCE masks properly in the reference (``model_builder.py:236-241``) and
here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def semseg_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         ignore_masks: jnp.ndarray,
                         respect_ignore_mask: bool = False) -> jnp.ndarray:
    """Mean per-sequence cross entropy, averaged over the batch.

    :param logits: [N, T, H, W, num_classes]
    :param labels: [N, T, H, W] int class ids
    :param ignore_masks: [N, T, H, W] (1 = ignore)
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]  # [N, T, H, W]
    if respect_ignore_mask:
        keep = 1.0 - ignore_masks.astype(nll.dtype)
        per_seq = jnp.sum(nll * keep, axis=(1, 2, 3)) / jnp.maximum(
            jnp.sum(keep, axis=(1, 2, 3)), 1.0)
    else:
        # reference-effective behavior: plain mean per sequence
        per_seq = jnp.mean(nll, axis=(1, 2, 3))
    return jnp.mean(per_seq)


def foreground_bce(fg_logits: jnp.ndarray, fg_masks: jnp.ndarray,
                   ignore_masks: jnp.ndarray) -> jnp.ndarray:
    """BCE-with-logits on the foreground channel vs (semseg > 0), ignore
    pixels excluded (numerator zeroed AND denominator shrunk — the reference
    does this one properly, ``model_builder.py:236-241``).

    :param fg_logits: [N, T, H, W]
    :param fg_masks: [N, T, H, W] float targets in {0, 1}
    :param ignore_masks: [N, T, H, W]
    """
    bce = optax.sigmoid_binary_cross_entropy(fg_logits, fg_masks)
    keep = 1.0 - ignore_masks.astype(bce.dtype)
    per_seq = jnp.sum(bce * keep, axis=(1, 2, 3)) / jnp.maximum(
        jnp.sum(keep, axis=(1, 2, 3)), 1.0)
    return jnp.mean(per_seq)
