"""Spatio-temporal embedding loss, vectorized over a padded instance axis.

Behavioral reference: ``/root/reference/stemseg/modeling/losses/embedding_loss.py``
(the hottest training code — see SURVEY.md §3.5). The reference loops in
Python over sequences (:61) and instances (:122), gathering ragged fg-pixel
sets. Here every instance-level quantity is a masked reduction over the dense
[T, H, W] grid with instances padded to a fixed ``I`` axis — one ``vmap``
over instances, one over the batch; XLA fuses the masked means and the
Gaussian prob maps, and the Lovász sorts batch over instances.

Semantics preserved exactly:

* instance centers = masked mean of raw embeddings (:87-100, :159-166);
* bandwidth activation ``exp(b) * 10`` applied per-pixel *before* the
  per-instance mean (:117-120, :168);
* free dims get fixed bandwidths ``1/std²`` appended (:26-29, :170-172);
* prob map ``exp(-0.5 Σ (e-c)²·bw)`` over the full grid (:175-177);
* Lovász hinge on ``2p - 1`` over all T·H·W pixels (:122-129);
* seediness: fg MSE against detached probs per instance (:130-131); bg MSE
  against 0 with ignore pixels zeroed but still counted in the mean
  (:104-111);
* bandwidth smoothness = masked variance of *pre-activation* bandwidths,
  averaged over instances present (:113-114, :180-185);
* normalizers: lovasz ÷ total instances, smoothness ÷ batch, seediness ÷
  (total instances + 1) (:138-142); all-zero escape hatch (:133-137);
* a sequence whose mask tensor is empty contributes nothing at all —
  including no bg seediness term (:64-66) — replicated via ``has_instances``
  gating.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stemseg_tpu.losses.lovasz import lovasz_hinge
from stemseg_tpu.utils.constants import LossConsts


class EmbeddingLossParams(NamedTuple):
    embedding_size: int = 3
    n_free_dims: int = 0
    free_dim_stds: Tuple[float, ...] = ()
    weight_lovasz: float = 1.0
    weight_variance_smoothness: float = 10.0
    weight_seediness: float = 1.0
    weight_regularization: float = 0.001  # parsed but unused, as in reference
    weight: float = 1.0


def _per_sequence(emb, bw, seed, masks, ignore, free_bandwidths):
    """Loss terms for one sequence.

    :param emb: [T, H, W, E] embeddings (grid offset already added)
    :param bw: [T, H, W, V] raw (pre-activation) bandwidths
    :param seed: [T, H, W] seediness
    :param masks: [I, T, H, W] float instance masks (padded instance axis;
        all-zero rows are padding or empty instances — both are skipped, as
        in the reference where instances enter via ``masks.nonzero()``)
    :param ignore: [T, H, W] float ignore mask
    :param free_bandwidths: [F] fixed bandwidths for the free dims
    :return: (lovasz_sum, seediness_sum, smoothness_mean, n_instances)
    """
    eps = 1e-12
    counts = jnp.sum(masks, axis=(1, 2, 3))  # [I]
    valid = counts > 0
    n_inst = jnp.sum(valid.astype(jnp.float32))
    safe_counts = jnp.maximum(counts, 1.0)

    # masked means over fg pixels
    centers = jnp.einsum("ithw,thwe->ie", masks, emb) / safe_counts[:, None]  # [I, E]
    bw_act = jnp.exp(bw) * 10.0  # per-pixel activation BEFORE the mean
    bw_mean_act = jnp.einsum("ithw,thwv->iv", masks, bw_act) / safe_counts[:, None]  # [I, V]
    bw_mean_raw = jnp.einsum("ithw,thwv->iv", masks, bw) / safe_counts[:, None]

    # bandwidth smoothness: masked variance of raw bandwidths, mean over
    # (fg pixels × V) per instance, then mean over present instances
    sq_dev = (bw[None] - bw_mean_raw[:, None, None, None, :]) ** 2  # [I,T,H,W,V]
    smooth_i = jnp.sum(masks[..., None] * sq_dev, axis=(1, 2, 3, 4)) / (
        safe_counts * bw.shape[-1])
    smoothness = jnp.sum(jnp.where(valid, smooth_i, 0.0)) / jnp.maximum(n_inst, 1.0)

    # per-instance Gaussian prob maps over the full grid
    full_bw = jnp.concatenate(
        [bw_mean_act, jnp.broadcast_to(free_bandwidths, (masks.shape[0], free_bandwidths.shape[0]))],
        axis=-1) if free_bandwidths.shape[0] else bw_mean_act  # [I, E]

    def prob_map(center, bwi):
        d2 = (emb - center) ** 2  # [T,H,W,E]
        return jnp.exp(-0.5 * jnp.sum(d2 * bwi, axis=-1))  # [T,H,W]

    probs = jax.vmap(prob_map)(centers, full_bw)  # [I, T, H, W]

    # Lovász hinge per instance on (2p - 1)
    flat_logits = (probs * 2.0 - 1.0).reshape(masks.shape[0], -1)
    flat_labels = masks.reshape(masks.shape[0], -1)
    lovasz_i = jax.vmap(lovasz_hinge)(flat_logits, flat_labels)  # [I]
    lovasz_sum = jnp.sum(jnp.where(valid, lovasz_i, 0.0))

    # seediness: fg towards detached probs, bg towards 0 (ignore zeroed but
    # counted in the bg mean denominator)
    probs_sg = jax.lax.stop_gradient(probs)
    fg_mse_i = jnp.sum(masks * (seed[None] - probs_sg) ** 2, axis=(1, 2, 3)) / safe_counts
    fg_mse = jnp.sum(jnp.where(valid, fg_mse_i, 0.0))

    bg = 1.0 - jnp.max(masks, axis=0)  # [T,H,W] — pixels in no instance
    bg_sq = jnp.where(ignore > 0, 0.0, seed ** 2)
    bg_count = jnp.maximum(jnp.sum(bg), 1.0)
    bg_mse = jnp.sum(bg * bg_sq) / bg_count

    has_instances = (n_inst > 0).astype(jnp.float32)
    seediness_sum = has_instances * (fg_mse + bg_mse)
    return (lovasz_sum, seediness_sum, has_instances * smoothness, n_inst)


def embedding_loss(embedding_map: jnp.ndarray, masks: jnp.ndarray,
                   ignore_masks: jnp.ndarray, params: EmbeddingLossParams):
    """Batch embedding loss.

    :param embedding_map: [N, T, H, W, C] with C = E + V + 1 — channel order
        (emb | var | seed), reference ``embedding_loss.py:44-52``
    :param masks: [N, I, T, H, W] float instance masks (padded I axis)
    :param ignore_masks: [N, T, H, W] float
    :return: (total_weighted_loss, dict of logging terms)
    """
    e = params.embedding_size
    v = e - params.n_free_dims
    assert embedding_map.shape[-1] == e + v + 1, (
        f"Expected {e + v + 1} channels, got {embedding_map.shape[-1]}")

    emb = embedding_map[..., :e]
    bw = embedding_map[..., e:e + v]
    seed = embedding_map[..., e + v]

    free_bw = jnp.asarray([1.0 / (s ** 2) for s in params.free_dim_stds], jnp.float32)

    lovasz_sum, seed_sum, smooth, n_inst = jax.vmap(
        _per_sequence, in_axes=(0, 0, 0, 0, 0, None))(
        emb, bw, seed, masks, ignore_masks, free_bw)

    total_instances = jnp.sum(n_inst)
    any_inst = total_instances > 0
    denom = jnp.maximum(total_instances, 1.0)

    lovasz = jnp.where(any_inst, jnp.sum(lovasz_sum) / denom, 0.0)
    smoothness = jnp.where(any_inst, jnp.sum(smooth) / masks.shape[0], 0.0)
    seediness = jnp.where(any_inst, jnp.sum(seed_sum) / (denom + 1.0), 0.0)

    total = (lovasz * params.weight_lovasz
             + smoothness * params.weight_variance_smoothness
             + seediness * params.weight_seediness) * params.weight

    return total, {
        LossConsts.LOVASZ_LOSS: lovasz,
        LossConsts.VARIANCE_SMOOTHNESS: smoothness,
        LossConsts.SEEDINESS_LOSS: seediness,
    }
