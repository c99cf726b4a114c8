"""Optimizer + LR schedule factories (torch-semantics, optax-built).

Behavioral reference: ``/root/reference/stemseg/training/utils.py:195-232``
(SGD-nesterov / Adam factories, step / exponential / none LR decay) and
``training/exponential_lr.py:5-26``.

torch semantics preserved:

* weight decay is *coupled* (added to the gradient before momentum), applied
  to every parameter including norms and biases — ``optax.add_decayed_weights``
  placed before the momentum trace;
* SGD nesterov: ``buf = μ·buf + g; update = g + μ·buf`` — ``optax.trace`` with
  ``nesterov=True``;
* frozen parameters receive no updates at all (reference: ``requires_grad=False``
  → ``p.grad is None`` → optimizer skips them) — ``optax.multi_transform``
  with ``set_to_zero`` over the frozen label subtree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import optax

from stemseg_tpu.config import TrainingConfig


def make_lr_schedule(tcfg: TrainingConfig) -> Callable:
    base = tcfg.initial_lr
    if tcfg.lr_decay_type == "step":
        boundaries = {int(s): tcfg.lr_decay_factor for s in tcfg.lr_decay_steps}
        return optax.piecewise_constant_schedule(base, boundaries)
    if tcfg.lr_decay_type == "exponential":
        # gamma = exp(ln(factor)/steps), applied per step from start_at
        # (exponential_lr.py:18-26)
        import math

        gamma = math.exp(math.log(tcfg.lr_exp_decay_factor) / float(tcfg.lr_exp_decay_steps))

        def schedule(step):
            import jax.numpy as jnp

            effective = jnp.maximum(step - tcfg.lr_exp_decay_start, 0)
            return base * gamma ** effective

        return schedule
    if tcfg.lr_decay_type == "none":
        return optax.constant_schedule(base)
    raise ValueError(f"Invalid LR decay type {tcfg.lr_decay_type!r}")


def param_freeze_labels(params: Dict[str, Any], freeze_at_stage: int = 2,
                        freeze_backbone: bool = False) -> Dict[str, Any]:
    """Label pytree: 'frozen' for the backbone stem + stages below
    ``freeze_at_stage`` (reference ``resnet.py:94-103``) and, when
    ``freeze_backbone``, the whole body+FPN (``training/main.py:60-64`` uses
    DDP find_unused_parameters for this)."""
    import jax

    frozen_stages = {f"layer{i}" for i in range(1, max(freeze_at_stage, 0))}
    include_stem = freeze_at_stage >= 1

    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        top = keys[0] if keys else None
        if freeze_backbone and top in ("body", "fpn"):
            return "frozen"
        if top == "body" and len(keys) > 1:
            sub = keys[1]
            if include_stem and sub == "stem":
                return "frozen"
            if any(sub.startswith(st + "_") for st in frozen_stages):
                return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(tcfg: TrainingConfig, params: Dict[str, Any],
                   freeze_at_stage: int = 2) -> optax.GradientTransformation:
    lr_schedule = make_lr_schedule(tcfg)

    if tcfg.optimizer.lower() == "sgd":
        inner = optax.chain(
            optax.add_decayed_weights(tcfg.weight_decay),
            optax.trace(decay=tcfg.momentum, nesterov=tcfg.nesterov),
            optax.scale_by_learning_rate(lr_schedule),
        )
    elif tcfg.optimizer.lower() == "adam":
        inner = optax.chain(
            optax.add_decayed_weights(tcfg.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(lr_schedule),
        )
    else:
        raise ValueError(f"Invalid optimizer choice {tcfg.optimizer!r}")

    if tcfg.clip_gradients:
        inner = optax.chain(optax.clip_by_global_norm(1.0), inner)

    labels = param_freeze_labels(params, freeze_at_stage=freeze_at_stage,
                                 freeze_backbone=tcfg.freeze_backbone)
    return optax.multi_transform(
        {"trainable": inner, "frozen": optax.set_to_zero()}, labels)
