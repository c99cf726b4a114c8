"""Convert reference PyTorch checkpoints into our flax variable tree.

Handles both checkpoint flavors the reference uses:

* full ``TrainingModel`` state dicts (``training/main.py:97-111`` store them
  under ``ckpt['model']``) with keys like ``backbone.0.stem.conv1.weight``;
* backbone-only pretrained weights (``mask_rcnn_R_101_FPN_backbone.pth``,
  loaded at ``model_builder.py:265-273``) with keys like ``0.stem.conv1.weight``.

Weight layout conversion: torch conv ``[O, I, (T,) H, W]`` → flax
``[(T,) H, W, I, O]``. GroupNorm ``weight/bias`` → ``scale/bias``.
FrozenBatchNorm buffers and the embedding head's ``time_scale`` buffer go to
the ``constants`` collection verbatim.

This module is pure numpy — torch is only needed by the caller to read the
``.pth`` file (see ``load_torch_state_dict``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# Sequential-index → (kind, slot) inside each squeeze block. Blocks are
# nn.Sequential(Conv3d, Norm, ReLU[, Pool] * k) — see embedding_decoder.py:20-62.
_BLOCK_SLOTS = {
    "block_32x": {0: 0, 1: 0, 4: 1, 5: 1, 8: 2, 9: 2},
    "block_16x": {0: 0, 1: 0, 4: 1, 5: 1},
    "block_8x": {0: 0, 1: 0},
    "block_4x": {0: 0, 1: 0},
}

_BN_KEYS = ("weight", "bias", "running_mean", "running_var")


def _convert_conv_weight(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:  # [O, I, H, W] -> [H, W, I, O]
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:  # [O, I, T, H, W] -> [T, H, W, I, O]
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"Unexpected conv weight ndim {w.ndim}")


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_backbone_key(rest: str):
    """Map a body/FPN torch key (already stripped of its '0.'/'1.'/'backbone.'
    prefix ambiguity resolved by caller) to (collection, path, is_conv)."""
    m = re.match(r"stem\.conv1\.weight$", rest)
    if m:
        return "params", ("body", "stem", "conv1", "conv", "kernel"), True
    m = re.match(r"stem\.bn1\.(\w+)$", rest)
    if m:
        return "constants", ("body", "stem", "bn1", m.group(1)), False

    m = re.match(r"layer(\d+)\.(\d+)\.conv(\d)\.weight$", rest)
    if m:
        i, j, k = m.groups()
        return "params", ("body", f"layer{i}_{j}", f"conv{k}", "conv", "kernel"), True
    m = re.match(r"layer(\d+)\.(\d+)\.bn(\d)\.(\w+)$", rest)
    if m:
        i, j, k, b = m.groups()
        return "constants", ("body", f"layer{i}_{j}", f"bn{k}", b), False
    m = re.match(r"layer(\d+)\.(\d+)\.downsample\.0\.weight$", rest)
    if m:
        i, j = m.groups()
        return "params", ("body", f"layer{i}_{j}", "downsample_conv", "conv", "kernel"), True
    m = re.match(r"layer(\d+)\.(\d+)\.downsample\.1\.(\w+)$", rest)
    if m:
        i, j, b = m.groups()
        return "constants", ("body", f"layer{i}_{j}", "downsample_bn", b), False

    m = re.match(r"fpn_(inner|layer)(\d)\.(weight|bias)$", rest)
    if m:
        kind, k, wb = m.groups()
        leaf = "kernel" if wb == "weight" else "bias"
        return "params", ("fpn", f"fpn_{kind}{k}", "conv", leaf), wb == "weight"

    raise KeyError(f"Unmapped backbone key: {rest!r}")


def _map_head_key(head: str, rest: str):
    """Map a decoder torch key to (collection, path, is_conv)."""
    m = re.match(r"(block_\d+x)\.(\d+)\.(weight|bias)$", rest)
    if m:
        block, idx, wb = m.group(1), int(m.group(2)), m.group(3)
        slots = _BLOCK_SLOTS[block]
        if idx not in slots:
            raise KeyError(f"Unmapped block index {idx} in {head}.{rest}")
        slot = slots[idx]
        is_conv = idx % 4 == 0  # convs at 0,4,8; norms at 1,5,9
        if is_conv:
            leaf = "kernel" if wb == "weight" else "bias"
            return "params", (head, "trunk", f"{block}_conv{slot}", "conv", leaf), wb == "weight"
        leaf = "scale" if wb == "weight" else "bias"
        return "params", (head, "trunk", f"{block}_norm{slot}", "gn", leaf), False

    m = re.match(r"conv_(16|8|4)\.weight$", rest)
    if m:
        return "params", (head, "trunk", f"conv_{m.group(1)}", "conv", "kernel"), True

    m = re.match(r"(conv_embedding|conv_variance|conv_seediness|conv_out)\.(weight|bias)$", rest)
    if m:
        name, wb = m.groups()
        leaf = "kernel" if wb == "weight" else "bias"
        return "params", (head, name, "conv", leaf), wb == "weight"

    if rest == "time_scale":
        return "constants", (head, "time_scale"), False

    raise KeyError(f"Unmapped head key: {head}.{rest!r}")


def convert_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference state dict (numpy values) to flax ``variables``
    ``{'params': ..., 'constants': ...}``. Unknown keys raise."""
    variables: Dict[str, Any] = {"params": {}, "constants": {}}

    for key, value in state_dict.items():
        value = np.asarray(value)
        k = key
        if k.startswith("module."):  # DDP-wrapped checkpoints
            k = k[len("module."):]

        # loss-criterion buffers (e.g. embedding_loss_criterion.
        # free_dim_bandwidths) are config-derived, not weights — skip
        if "loss_criterion" in k:
            continue

        if k.startswith("backbone."):
            k = k[len("backbone."):]
        # Sequential(OrderedDict(body=..., fpn=...)) (backbone.py:22) names
        # or bare index prefixes — either way the key names
        # (stem/layer*/fpn_*) disambiguate, so drop the prefix.
        for prefix in ("body.", "fpn.", "0.", "1."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break

        if k.startswith(("stem.", "layer", "fpn_")):
            coll, path, is_conv = _map_backbone_key(k)
        elif k.startswith(("embedding_head.", "seediness_head.", "semseg_head.")):
            head, rest = k.split(".", 1)
            coll, path, is_conv = _map_head_key(head, rest)
        else:
            raise KeyError(f"Unmapped checkpoint key: {key!r}")

        if is_conv:
            value = _convert_conv_weight(value)
        _set(variables[coll], path, value.astype(np.float32))

    return variables


def merge_variables(init_variables, converted) -> Dict[str, Any]:
    """Overlay converted weights onto an ``init`` variable tree, verifying
    shapes. Leaves missing from ``converted`` keep their init values (e.g.
    the fused-seediness conv when converting a separate-head checkpoint)."""
    import jax

    def overlay(init_node, conv_node, path):
        if not isinstance(init_node, Mapping):
            if conv_node is None:
                return init_node
            if tuple(np.shape(conv_node)) != tuple(np.shape(init_node)):
                raise ValueError(
                    f"Shape mismatch at {'/'.join(path)}: checkpoint "
                    f"{np.shape(conv_node)} vs model {np.shape(init_node)}")
            return np.asarray(conv_node)
        out = {}
        for name, child in init_node.items():
            out[name] = overlay(child, None if conv_node is None else conv_node.get(name), path + (name,))
        return out

    merged = {coll: overlay(tree, converted.get(coll), (coll,))
              for coll, tree in init_variables.items()}

    # any converted leaf not consumed by the model is an error
    def check_consumed(conv_node, init_node, path):
        if not isinstance(conv_node, Mapping):
            if init_node is None:
                raise ValueError(f"Checkpoint leaf {'/'.join(path)} has no model slot")
            return
        for name, child in conv_node.items():
            check_consumed(child, None if not isinstance(init_node, Mapping) else init_node.get(name), path + (name,))

    for coll, tree in converted.items():
        check_consumed(tree, merged.get(coll), (coll,))

    return jax.tree.map(np.asarray, merged)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth`` checkpoint into numpy (host-side; torch CPU).
    Full session checkpoints store the model under ``'model'``
    (``training/main.py:97-111``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    return {k: v.detach().numpy() for k, v in ckpt.items() if hasattr(v, "detach")}
