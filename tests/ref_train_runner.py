"""Subprocess helper: reference TRAINING-side parity — per-tensor gradients
and a K-step SGD+nesterov optimizer trajectory.

``python tests/ref_train_runner.py <model_dir> <in.npz> <out.npz>``

``<model_dir>`` holds ``config.yaml`` (yacs format) and ``model.pth``
(made by ``ref_e2e_runner.py make_ckpt`` — the same structured random
checkpoint our side loads through the weight converter).

``in.npz`` keys::

    meta                 json: {n_steps, n_seqs, step_interval}
    images_<k>           [N, T, H, W, 3] float32 (channels-last; transposed
                         here to the reference's [N, T, C, H, W])
    masks_<k>_<i>        [I_i, T, H, W] uint8
    ignore_<k>_<i>       [T, H, W] uint8
    catids_<k>_<i>       [I_i] int64

Per sub-iteration ``k`` the reference machinery runs verbatim:
``TrainingModel.forward`` (``modeling/model_builder.py:100-125`` — losses
composed inside the model), ``ModelOutputManager`` loss division
(``training/model_output_manager.py:27-33``), ``loss.backward()`` and the
``optimizer.step()`` every ``step_interval`` sub-iterations with
``create_optimizer``'s SGD (momentum, nesterov, coupled weight decay —
``training/utils.py:195-210``) and ``create_lr_scheduler``
(``training/main.py:188-228`` loop semantics).

``out.npz``::

    loss_<k>             scalar total optimization loss of sub-iteration k
    grad/<torch key>     d(total loss)/d(param) recorded BEFORE the first
                         optimizer.step (params with None grad omitted)
    final/<torch key>    full state dict after all steps
    stepnorm_<k>         global L2 norm of (params_after_step - params_before)
"""

import json
import sys
import types


from _ref_stubs import install_stubs


def _install_stubs(*a, **k):
    install_stubs(rle_codec=False)


def main(model_dir, in_npz, out_npz, reference_root="/root/reference"):
    import os

    import numpy as np

    sys.path.insert(0, reference_root)
    _install_stubs()

    import torch

    torch.set_num_threads(2)

    from stemseg.config import cfg

    cfg.merge_from_file(os.path.join(model_dir, "config.yaml"))

    from stemseg.modeling.model_builder import build_model
    from stemseg.structures.image_list import ImageList
    from stemseg.training.model_output_manager import ModelOutputManager
    from stemseg.training.utils import create_lr_scheduler, create_optimizer

    model = build_model(restore_pretrained_backbone_wts=False)
    model.load_state_dict(
        torch.load(os.path.join(model_dir, "model.pth"))["model"])
    model.train()

    optimizer = create_optimizer(model, cfg.TRAINING)
    lr_scheduler = create_lr_scheduler(optimizer, cfg.TRAINING)

    data = np.load(in_npz)
    meta = json.loads(str(data["meta"]))
    n_steps, n_seqs = meta["n_steps"], meta["n_seqs"]
    step_interval = meta.get("step_interval", 1)

    out = {}
    output_manager = ModelOutputManager(step_interval)
    sub_iter = 0
    for k in range(n_steps):
        x = torch.from_numpy(data[f"images_{k}"]).permute(0, 1, 4, 2, 3)
        x = x.contiguous()
        h, w = x.shape[-2:]
        image_seqs = ImageList(x, (h, w))
        targets = []
        for i in range(n_seqs):
            targets.append({
                "masks": torch.from_numpy(data[f"masks_{k}_{i}"]),
                "ignore_masks": torch.from_numpy(data[f"ignore_{k}_{i}"]),
                "category_ids": torch.from_numpy(data[f"catids_{k}_{i}"]),
            })

        model_output = model(image_seqs, targets)
        loss = output_manager(model_output)
        out[f"loss_{k}"] = np.float64(loss.item())
        loss.backward()

        sub_iter += 1
        if sub_iter < step_interval:
            continue
        sub_iter = 0

        if not any(key.startswith("grad/") for key in out):
            for name, p in model.named_parameters():
                if p.grad is not None:
                    out[f"grad/{name}"] = p.grad.detach().numpy().copy()

        before = {n: p.detach().clone() for n, p in model.named_parameters()}
        optimizer.step()
        lr_scheduler.step()
        optimizer.zero_grad()
        output_manager.reset()
        sq = 0.0
        for n, p in model.named_parameters():
            sq += float(((p.detach() - before[n]) ** 2).sum())
        out[f"stepnorm_{k}"] = np.float64(np.sqrt(sq))

    for key, val in model.state_dict().items():
        out[f"final/{key}"] = val.detach().numpy()

    np.savez(out_npz, **out)


if __name__ == "__main__":
    main(*sys.argv[1:])
