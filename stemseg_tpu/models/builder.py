"""Model assembly: backbone + FPN + 3D heads as one flax module.

Behavioral reference: ``/root/reference/stemseg/modeling/model_builder.py``
(``TrainingModel.forward``, ``:101-208``; ``build_model``, ``:247-369``).
TPU-first differences:

* the model is a pure function of ``(params, constants, images)`` — no
  training/inference mode flags, no loss computation inside the module
  (losses live in ``stemseg_tpu/losses`` and are composed by the train step);
* clips enter as channels-last ``[N, T, H, W, 3]``; the 2D backbone runs on
  the folded ``[N*T, H, W, 3]`` view (one big batched conv — MXU-friendly),
  heads run on the lifted ``[N, T, h, w, C]`` views;
* backbone freezing = ``jax.lax.stop_gradient`` on its features (full
  freeze; reference wraps in ``torch.no_grad``, ``model_builder.py:162-166``)
  plus an optax param mask for partial stage freezing (reference
  ``resnet.py:94-103``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stemseg_tpu.config import Config
from stemseg_tpu.models.decoders import EmbeddingDecoder, SeedinessDecoder, SemsegDecoder
from stemseg_tpu.models.fpn import FPN
from stemseg_tpu.models.layers import upsample_trilinear
from stemseg_tpu.models.resnet import STAGE_SPECS, ResNet
from stemseg_tpu.utils.constants import ModelOutputConsts as ModelOutput


class STEmSegModel(nn.Module):
    """Flagship model. ``__call__(images)`` with ``images`` [N, T, H, W, 3]
    (already resized / normalized / padded to /32) returns a dict:

    * ``embeddings``: [N, T, H/4, W/4, E + V (+1 seediness)] — channel order
      (emb | var | seed), seediness present either fused (non-DAVIS configs)
      or from the separate head (DAVIS configs), matching
      ``model_builder.py:190-200`` / ``inference_model.py:140-159``.
    * ``semseg_logits``: [N, T, H/4, W/4, num_classes (+1 fg)] or None.

    When ``output_resize_scale != 1`` both maps are trilinearly upscaled
    (``LOSS_AT_FULL_RES``, ``model_builder.py:197-206``).
    """

    backbone_type: str = "R-101-FPN"
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    fpn_out_channels: int = 256

    num_frames: int = 8
    num_classes: int = 2
    embedding_size: int = 3
    embedding_dim_mode: str = "xyt"
    tanh_activation: bool = True
    use_semseg_head: bool = True
    use_seediness_head: bool = False
    embedding_inter_channels: Sequence[int] = (256, 256, 128, 128)
    semseg_inter_channels: Sequence[int] = (256, 256, 128, 128)
    seediness_inter_channels: Sequence[int] = (256, 256, 128, 128)
    embedding_norm: str = "gn"
    semseg_norm: str = "gn"
    seediness_norm: str = "gn"
    gn_groups: int = 32
    pool_type: str = "avg"
    semseg_foreground_channel: bool = True
    output_resize_scale: float = 1.0
    freeze_backbone: bool = False
    # backward pruning of the frozen stem/stages (ResNet.freeze_at_stage);
    # 0 for inference models — forward graphs are unaffected either way
    freeze_at_stage: int = 0
    remat_backbone: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, Any]:
        n, t, h, w, c = images.shape
        flat = images.reshape(n * t, h, w, c)

        backbone_cls = nn.remat(ResNet) if self.remat_backbone else ResNet
        backbone = backbone_cls(
            stage_specs=STAGE_SPECS[self.backbone_type],
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            stride_in_1x1=self.stride_in_1x1,
            freeze_at_stage=self.freeze_at_stage,
            dtype=self.dtype,
            name="body",
        )
        fpn = FPN(out_channels=self.fpn_out_channels, dtype=self.dtype, name="fpn")

        feats = fpn(backbone(flat))  # 4 maps, finest (4x) first
        if self.freeze_backbone:
            feats = tuple(jax.lax.stop_gradient(f) for f in feats)

        # lift to [N, T, h, w, C]; heads take coarsest-first
        video_feats = [f.reshape(n, t, *f.shape[1:]) for f in feats]
        coarsest_first = video_feats[::-1]

        embeddings = EmbeddingDecoder(
            inter_channels=tuple(self.embedding_inter_channels),
            embedding_size=self.embedding_size,
            embedding_dim_mode=self.embedding_dim_mode,
            tanh_activation=self.tanh_activation,
            seediness_output=not self.use_seediness_head,
            num_frames=self.num_frames,
            norm_type=self.embedding_norm,
            gn_groups=self.gn_groups,
            pool_type=self.pool_type,
            dtype=self.dtype,
            name="embedding_head",
        )(coarsest_first)

        if self.use_seediness_head:
            seediness = SeedinessDecoder(
                inter_channels=tuple(self.seediness_inter_channels),
                num_frames=self.num_frames,
                norm_type=self.seediness_norm,
                gn_groups=self.gn_groups,
                pool_type=self.pool_type,
                dtype=self.dtype,
                name="seediness_head",
            )(coarsest_first)
            embeddings = jnp.concatenate([embeddings, seediness], axis=-1)

        semseg_logits = None
        if self.use_semseg_head:
            semseg_logits = SemsegDecoder(
                num_classes=self.num_classes,
                inter_channels=tuple(self.semseg_inter_channels),
                foreground_channel=self.semseg_foreground_channel,
                num_frames=self.num_frames,
                norm_type=self.semseg_norm,
                gn_groups=self.gn_groups,
                pool_type=self.pool_type,
                dtype=self.dtype,
                name="semseg_head",
            )(coarsest_first)

        if self.output_resize_scale != 1.0:
            s = self.output_resize_scale
            embeddings = upsample_trilinear(embeddings, (1.0, s, s))
            if semseg_logits is not None:
                semseg_logits = upsample_trilinear(semseg_logits, (1.0, s, s))

        return {
            ModelOutput.EMBEDDINGS: embeddings,
            ModelOutput.SEMSEG_MASKS: semseg_logits,
        }


def build_model(cfg: Config, for_training: bool = True, dtype=None,
                remat_backbone: bool = False) -> STEmSegModel:
    """Construct the flax module from a config tree (reference
    ``build_model``, ``model_builder.py:247-369``). Pure construction — no
    RNG, no weight loading; init/restore is the caller's job.

    ``cfg.training.mixed_precision`` (the reference's apex AMP opt-in,
    ``training/main.py:53-58``) maps to bfloat16 compute with fp32 params;
    ``remat_backbone`` enables ``jax.checkpoint`` on the backbone to trade
    recompute for HBM (useful for 16-frame full-res training)."""
    if dtype is None and for_training and cfg.training.mixed_precision:
        dtype = jnp.bfloat16
    m = cfg.model
    return STEmSegModel(
        backbone_type=m.backbone.type,
        num_groups=m.resnets.num_groups,
        width_per_group=m.resnets.width_per_group,
        stem_out_channels=m.resnets.stem_out_channels,
        res2_out_channels=m.resnets.res2_out_channels,
        stride_in_1x1=m.resnets.stride_in_1x1,
        fpn_out_channels=m.resnets.backbone_out_channels,
        num_frames=cfg.input.num_frames,
        num_classes=cfg.input.num_classes,
        embedding_size=m.embeddings.embedding_size,
        embedding_dim_mode=m.embedding_dim_mode,
        tanh_activation=m.embeddings.tanh_activation,
        use_semseg_head=m.use_semseg_head,
        use_seediness_head=m.use_seediness_head,
        embedding_inter_channels=m.embeddings.inter_channels,
        semseg_inter_channels=m.semseg.inter_channels,
        seediness_inter_channels=m.seediness.inter_channels,
        embedding_norm=m.embeddings.normalization_layer,
        semseg_norm=m.semseg.normalization_layer,
        seediness_norm=m.seediness.normalization_layer,
        gn_groups=m.embeddings.gn_num_groups,
        pool_type=m.embeddings.pool_type,
        semseg_foreground_channel=m.semseg.foreground_channel,
        output_resize_scale=4.0 if (for_training and cfg.training.loss_at_full_res) else 1.0,
        freeze_backbone=for_training and cfg.training.freeze_backbone,
        freeze_at_stage=m.backbone.freeze_at_stage if for_training else 0,
        remat_backbone=remat_backbone,
        dtype=dtype,
    )
