"""The jitted train step: forward + losses + grad + optimizer update.

Behavioral reference: ``TrainingModel.forward``
(``/root/reference/stemseg/modeling/model_builder.py:101-244``) for the loss
composition and target preparation, ``training/main.py:133-255`` for the
optimization loop semantics. TPU-native design:

* one pure function ``(state, batch) -> (state, metrics)``, jitted once over
  a device mesh — the DDP gradient all-reduce is a compiled ``psum`` over ICI;
* target downscaling (masks ÷4 with torch's byte() truncation semantics,
  ``model_builder.py:128-152``) happens on device inside the step — the host
  ships full-res uint8 masks once;
* gradient accumulation (reference ``training/main.py:140-157,203-211``) via
  ``optax.MultiSteps`` when ``batch_size > n_devices * max_samples_per_chip``;
* the batch dict is fully static-shaped: instances padded to ``I``.

Batch contract (all fixed shapes):
  ``images``       [N, T, H, W, 3]  float32, normalized, padded to /32
  ``masks``        [N, I, T, H, W]  float32 in {0,1}, padded instance axis
  ``ignore_masks`` [N, T, H, W]     float32 in {0,1}
  ``category_ids`` [N, I]           int32 (0 for padding)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stemseg_tpu.config import Config
from stemseg_tpu.losses import (EmbeddingLossParams, embedding_loss,
                                foreground_bce, semseg_cross_entropy)
from stemseg_tpu.models.builder import STEmSegModel
from stemseg_tpu.models.embedding_utils import get_nb_free_dims
from stemseg_tpu.utils.constants import LossConsts


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    constants: Any = struct.field(pytree_node=True)
    opt_state: Any = struct.field(pytree_node=True)


def _downscale_binary(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear ÷scale then torch ``.byte()`` truncation (values < 1 -> 0).
    Matches ``F.interpolate(...).byte()`` at ``model_builder.py:139-151``."""
    *lead, h, w = x.shape
    out_shape = (*lead, h // scale, w // scale)
    resized = jax.image.resize(x, out_shape, method="linear", antialias=False)
    return (resized >= 1.0 - 1e-5).astype(x.dtype)


def prepare_targets(masks: jnp.ndarray, ignore_masks: jnp.ndarray,
                    category_ids: jnp.ndarray, scale: int = 4):
    """Device-side target prep: downscale masks and ignore masks, synthesize
    the semseg label map (per-pixel max of category id over covering
    instances, ``data/common.py:194-210``)."""
    masks_ds = _downscale_binary(masks, scale)  # [N, I, t, h, w]
    ignore_ds = _downscale_binary(ignore_masks, scale)  # [N, t, h, w]
    semseg_labels = jnp.max(
        masks_ds * category_ids[:, :, None, None, None].astype(masks_ds.dtype),
        axis=1).astype(jnp.int32)  # [N, t, h, w]
    return masks_ds, ignore_ds, semseg_labels


def make_output_loss_fn(model: STEmSegModel, cfg: Config) -> Callable:
    """The loss composition AFTER the network forward: ``(out, batch) ->
    (total, metrics)``. Split out from :func:`make_loss_fn` so tooling
    (``bench_train_phases.py``) can time/FLOP-count the loss math in
    isolation on precomputed outputs."""
    lcfg = cfg.training.losses
    emb_params = EmbeddingLossParams(
        embedding_size=cfg.model.embeddings.embedding_size,
        n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
        free_dim_stds=tuple(lcfg.embedding.free_dim_stds),
        weight_lovasz=lcfg.embedding.weight_lovasz,
        weight_variance_smoothness=lcfg.embedding.weight_variance_smoothness,
        weight_seediness=lcfg.embedding.weight_seediness,
        weight=lcfg.embedding.weight,
    )
    # LOSS_AT_FULL_RES upscales outputs 4x => targets stay at full res
    target_scale = 1 if cfg.training.loss_at_full_res else 4

    def output_loss_fn(out, batch):
        # masks ship uint8 (4x smaller H2D); all loss math is float32
        masks_f = batch["masks"].astype(jnp.float32)
        ignore_f = batch["ignore_masks"].astype(jnp.float32)
        masks_ds, ignore_ds, semseg_labels = prepare_targets(
            masks_f, ignore_f, batch["category_ids"],
            scale=target_scale) if target_scale > 1 else (
            masks_f,
            ignore_f,
            jnp.max(masks_f * batch["category_ids"][:, :, None, None, None]
                    .astype(jnp.float32), axis=1).astype(jnp.int32))

        emb_total, emb_terms = embedding_loss(
            out["embeddings"].astype(jnp.float32), masks_ds, ignore_ds, emb_params)
        metrics = dict(emb_terms)
        total = emb_total
        metrics[LossConsts.EMBEDDING] = emb_total

        if model.use_semseg_head:
            logits = out["semseg_masks"].astype(jnp.float32)
            if model.semseg_foreground_channel:
                logits, fg_logits = logits[..., :-1], logits[..., -1]
                fg = foreground_bce(fg_logits, (semseg_labels > 0).astype(jnp.float32),
                                    ignore_ds)
                total = total + fg
                metrics[LossConsts.FOREGROUND] = fg
            ce = semseg_cross_entropy(logits, semseg_labels, ignore_ds)
            total = total + ce * lcfg.weight_semseg
            metrics[LossConsts.SEMSEG] = ce

        metrics["total"] = total
        return total, metrics

    return output_loss_fn


def make_loss_fn(model: STEmSegModel, cfg: Config) -> Callable:
    output_loss_fn = make_output_loss_fn(model, cfg)

    def loss_fn(params, constants, batch):
        out = model.apply({"params": params, "constants": constants},
                          batch["images"])
        return output_loss_fn(out, batch)

    return loss_fn


def make_train_step(model: STEmSegModel, cfg: Config,
                    tx: optax.GradientTransformation,
                    mesh=None, donate: bool = True):
    """Build the jitted train step. ``tx`` must be the final transformation
    (already MultiSteps-wrapped if accumulating — ``create_train_state`` does
    this). With ``mesh`` given, inputs/outputs carry NamedShardings: batch
    sharded over the data axis, state replicated."""
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.constants, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stemseg_tpu.parallel.mesh import DATA_AXIS

    replicated = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_shard),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def create_train_state(model: STEmSegModel, cfg: Config, rng,
                       sample_images: jnp.ndarray,
                       tx: Optional[optax.GradientTransformation] = None,
                       accumulate_steps: int = 1) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize params (+ optimizer) for a model. Returns (state, tx)."""
    from stemseg_tpu.training.optim import make_optimizer

    variables = model.init(rng, sample_images)
    params, constants = variables["params"], variables["constants"]
    if tx is None:
        tx = make_optimizer(cfg.training, params,
                            freeze_at_stage=cfg.model.backbone.freeze_at_stage)
    if accumulate_steps > 1:
        # reference emulates large batches by summing grads over
        # ``optimizer_step_interval`` sub-iterations (training/main.py:140-157)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      constants=constants, opt_state=opt_state), tx
