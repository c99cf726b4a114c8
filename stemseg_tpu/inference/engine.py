"""Sliding-window inference engine: per-frame backbone, per-window 3D heads.

Behavioral reference: ``/root/reference/stemseg/modeling/inference_model.py``
(the streaming wrapper) and ``inference/main.py:52-123`` (TrackGenerator
plumbing). TPU-native redesign:

* the backbone runs as ONE jitted graph per frame batch — new frames of each
  window are batched together ([K, H, W, 3], K = window stride) instead of
  the reference's one-frame-at-a-time DataLoader loop, keeping the MXU fed;
* FPN features stay in HBM in a frame-keyed cache with the same
  window-dependency refcounting as the reference (:83-98, :164-173) — no
  recompute, no D2H;
* the heads run as one jitted graph per window; the embedding output is
  split (emb | bw·exp·10 | seed) on device (:140-148) and KEPT ON DEVICE for
  the clustering stage — the reference round-trips every window through
  ``.cpu()``;
* overlapping-window semseg logits are accumulated per frame on device and
  averaged at the end (:121-128, :196-231);
* duplicate frame indices inside a window (short-sequence front padding) are
  deduplicated exactly like the reference's dict-keyed stacking (:93-98,
  :139-148): heads run on the full window, outputs keep the LAST occurrence
  of each frame id, sorted by frame id.

All shapes are static per (H, W) bucket: one backbone compile per bucket, one
heads compile per (T_unique, h, w).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stemseg_tpu.config import Config
from stemseg_tpu.models.decoders import EmbeddingDecoder, SeedinessDecoder, SemsegDecoder
from stemseg_tpu.models.fpn import FPN
from stemseg_tpu.models.resnet import STAGE_SPECS, ResNet


class InferenceEngine:
    def __init__(self, cfg: Config, variables: Dict, dtype=None,
                 semseg_resize_scale: float = 1.0):
        """:param semseg_resize_scale: per-window trilinear upscale of the
        semseg logits before accumulation (the reference's ``resize_output``
        path used with --resize_embeddings, ``inference_model.py:56-62``)."""
        self.cfg = cfg
        self.semseg_resize_scale = semseg_resize_scale
        m = cfg.model
        self.params = variables["params"]
        self.constants = variables["constants"]

        self.body = ResNet(
            stage_specs=STAGE_SPECS[m.backbone.type],
            num_groups=m.resnets.num_groups,
            width_per_group=m.resnets.width_per_group,
            stem_out_channels=m.resnets.stem_out_channels,
            res2_out_channels=m.resnets.res2_out_channels,
            stride_in_1x1=m.resnets.stride_in_1x1,
            dtype=dtype)
        self.fpn = FPN(out_channels=m.resnets.backbone_out_channels, dtype=dtype)
        self.embedding_head = EmbeddingDecoder(
            inter_channels=tuple(m.embeddings.inter_channels),
            embedding_size=m.embeddings.embedding_size,
            embedding_dim_mode=m.embedding_dim_mode,
            tanh_activation=m.embeddings.tanh_activation,
            seediness_output=not m.use_seediness_head,
            num_frames=cfg.input.num_frames,
            norm_type=m.embeddings.normalization_layer,
            gn_groups=m.embeddings.gn_num_groups,
            pool_type=m.embeddings.pool_type,
            dtype=dtype)
        self.seediness_head = SeedinessDecoder(
            inter_channels=tuple(m.seediness.inter_channels),
            num_frames=cfg.input.num_frames,
            norm_type=m.seediness.normalization_layer,
            gn_groups=m.seediness.gn_num_groups,
            pool_type=m.seediness.pool_type,
            dtype=dtype) if m.use_seediness_head else None
        self.semseg_head = SemsegDecoder(
            num_classes=cfg.input.num_classes,
            inter_channels=tuple(m.semseg.inter_channels),
            foreground_channel=m.semseg.foreground_channel,
            num_frames=cfg.input.num_frames,
            norm_type=m.semseg.normalization_layer,
            gn_groups=m.semseg.gn_num_groups,
            pool_type=m.semseg.pool_type,
            dtype=dtype) if m.use_semseg_head else None

        self.embedding_size = m.embeddings.embedding_size
        from stemseg_tpu.models.embedding_utils import get_nb_free_dims

        self.variance_channels = self.embedding_size - get_nb_free_dims(m.embedding_dim_mode)

        self._backbone_fn = jax.jit(self._backbone_forward)
        self._heads_fn = jax.jit(self._heads_forward)

    # ------------------------------------------------------------------
    # jitted pieces
    # ------------------------------------------------------------------

    def _backbone_forward(self, frames: jnp.ndarray):
        """[K, H, W, 3] -> tuple of 4 FPN maps, finest first."""
        feats = self.body.apply(
            {"params": self.params["body"], "constants": self.constants["body"]},
            frames)
        return self.fpn.apply({"params": self.params["fpn"]}, feats)

    def _heads_forward(self, feats: Tuple[jnp.ndarray, ...]):
        """feats: 4 stacked maps [T, h_s, w_s, C], finest first (with a
        leading batch dim of 1 added here). Returns per-window outputs."""
        coarsest_first = [f[None] for f in feats[::-1]]

        emb_out = self.embedding_head.apply(
            {"params": self.params["embedding_head"],
             "constants": self.constants["embedding_head"]},
            coarsest_first)[0]  # [T, h, w, C]

        e, v = self.embedding_size, self.variance_channels
        embeddings = emb_out[..., :e]
        bandwidths = jnp.exp(emb_out[..., e:e + v]) * 10.0
        if self.seediness_head is None:
            seediness = emb_out[..., e + v]
        else:
            seediness = self.seediness_head.apply(
                {"params": self.params["seediness_head"]}, coarsest_first)[0][..., 0]

        semseg_logits = None
        if self.semseg_head is not None:
            semseg_logits = self.semseg_head.apply(
                {"params": self.params["semseg_head"]}, coarsest_first)[0]
            if self.semseg_resize_scale != 1.0:
                from stemseg_tpu.models.layers import upsample_trilinear

                s = self.semseg_resize_scale
                semseg_logits = upsample_trilinear(semseg_logits[None], (1.0, s, s))[0]

        return embeddings, bandwidths, seediness, semseg_logits

    # ------------------------------------------------------------------
    # streaming driver
    # ------------------------------------------------------------------

    def infer_sequence(self, frames: np.ndarray, windows: List[List[int]],
                       seediness_fg_threshold: float = 0.25,
                       semseg_output_type: str = "probs"):
        """Run the full sliding-window inference for one sequence.

        :param frames: [T_total, H, W, 3] normalized, /32-padded frames
            (host array; frames are shipped to device in window-stride
            batches)
        :param windows: window schedule (frame indices, duplicates allowed)
        :param semseg_output_type: 'probs' | 'logits' | 'argmax'
        :return: dict with
            ``fg_masks`` [T, h, w] bool (device),
            ``multiclass_masks`` (per semseg_output_type) or None,
            ``windows`` list of dicts (frames, embeddings, bandwidths,
            seediness — all device arrays at 4x scale)
        """
        t_total = frames.shape[0]
        cache: Dict[int, Tuple[jnp.ndarray, ...]] = {}

        # frame -> set of windows needing it (refcount, inference_model.py:89-92)
        deps: Dict[int, set] = {}
        for wi, win in enumerate(windows):
            for t in win:
                deps.setdefault(t, set()).add(wi)

        semseg_sum: List = [None] * t_total
        semseg_cnt = np.zeros(t_total, np.int32)
        seed_sum: List = [None] * t_total
        seed_cnt = np.zeros(t_total, np.int32)
        out_windows = []

        for wi, win in enumerate(windows):
            new_frames = sorted({t for t in win if t not in cache})
            if new_frames:
                batch = jnp.asarray(frames[np.asarray(new_frames)])
                feats = self._backbone_fn(batch)  # 4 maps [K, h, w, C]
                for k, t in enumerate(new_frames):
                    cache[t] = tuple(f[k] for f in feats)

            stacked = tuple(
                jnp.stack([cache[t][s] for t in win], axis=0) for s in range(4))
            embeddings, bandwidths, seediness, semseg_logits = self._heads_fn(stacked)

            # dedupe to unique frames, keeping the LAST occurrence
            unique_frames = sorted(set(win))
            if len(unique_frames) != len(win):
                last_idx = {t: i for i, t in enumerate(win)}
                sel = jnp.asarray([last_idx[t] for t in unique_frames])
                embeddings = embeddings[sel]
                bandwidths = bandwidths[sel]
                seediness = seediness[sel]
                if semseg_logits is not None:
                    semseg_logits = semseg_logits[sel]

            for i, t in enumerate(unique_frames):
                if semseg_logits is not None:
                    semseg_sum[t] = semseg_logits[i] if semseg_sum[t] is None \
                        else semseg_sum[t] + semseg_logits[i]
                    semseg_cnt[t] += 1
                seed_sum[t] = seediness[i] if seed_sum[t] is None \
                    else seed_sum[t] + seediness[i]
                seed_cnt[t] += 1

            out_windows.append({
                "frames": unique_frames,
                "embeddings": embeddings,
                "bandwidths": bandwidths,
                "seediness": seediness,
            })

            # evict frames no further window needs (inference_model.py:164-173)
            for t in list(cache.keys()):
                deps[t].discard(wi)
                if not deps[t]:
                    del cache[t]
                    del deps[t]

        # ---- semseg averaging & fg masks (inference_model.py:196-231) ----
        multiclass_masks = None
        if self.semseg_head is not None:
            logits = jnp.stack([semseg_sum[t] / float(semseg_cnt[t])
                                for t in range(t_total)], axis=0)  # [T, h, w, C]
            n_ch = logits.shape[-1]
            if n_ch > 2:
                mc_logits, fg_logits = logits[..., :-1], logits[..., -1]
                if semseg_output_type == "logits":
                    multiclass_masks = mc_logits
                elif semseg_output_type == "probs":
                    multiclass_masks = jax.nn.softmax(mc_logits, axis=-1)
                elif semseg_output_type == "argmax":
                    multiclass_masks = jnp.argmax(mc_logits, axis=-1)
                fg_probs = jax.nn.sigmoid(fg_logits)
            else:
                fg_probs = jax.nn.softmax(logits, axis=-1)[..., 1]
            fg_masks = fg_probs > 0.5
        else:
            # fg from window-averaged seediness (inference/main.py:95-103)
            seed_avg = jnp.stack([seed_sum[t] / float(seed_cnt[t])
                                  for t in range(t_total)], axis=0)
            fg_masks = seed_avg > seediness_fg_threshold

        return {
            "fg_masks": fg_masks,
            "multiclass_masks": multiclass_masks,
            "windows": out_windows,
        }
