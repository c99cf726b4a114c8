"""Subprocess helper: the reference's COMPOSED inference stack, end to end.

Two modes::

    python tests/ref_e2e_runner.py make_ckpt <model_dir> [seed]
    python tests/ref_e2e_runner.py infer <model_pth> <dataset> <out_dir> \
        [max_tracks] [frame_overlap] [min_seediness_prob] [dump_dir]

When ``dump_dir`` is given, the PRE-WRITER per-sequence state — the dense
stitched label volume (reconstructed from the chainer's framewise coord
lists + label vectors, ``online_chainer.py:94-117``) and the counts /
lifetimes dicts in insertion order — is saved to ``<dump_dir>/<seq>.npz``.
The composed-e2e test uses it to assert the label volumes agree EXACTLY
(modulo track-id relabeling) before the writer stage, so any final-artifact
mismatch can be pinned to the writer's resize and proven knife-edge.

``make_ckpt`` builds the reference ``TrainingModel`` on the config at
``<model_dir>/config.yaml`` (yacs merge, no pretrained backbone download)
with ``torch.manual_seed(seed)`` and saves a reference-format checkpoint
``{'model': state_dict}`` to ``<model_dir>/model.pth`` — structured random
weights that both frameworks then load from the same file.

``infer`` runs the reference's ACTUAL composed pipeline — the argparse
``main`` of ``/root/reference/stemseg/inference/main.py`` driving
``InferenceModel`` (:64-231 of ``modeling/inference_model.py``),
``OnlineChainer`` + ``SequentialClustering``, and the dataset writers —
on whatever dataset the ``*_BASE_DIR`` / ``STEMSEG_JSON_ANNOTATIONS_DIR``
env vars point at. No stage is stubbed or reimplemented; the only
adaptations are CPU shims for the hardcoded ``.cuda()`` / ``cuda:0``
devices and the shared RLE codec standing in for the absent pycocotools
(as in ``ref_writer_runner.py``).
"""

import os
import sys
import types


from _ref_stubs import install_stubs


def _install_stubs(*a, **k):
    install_stubs(rle_codec=True)


def _patch_cuda_to_cpu():
    """The reference hardcodes ``.cuda()`` / ``device="cuda:0"`` throughout
    its inference stack (``inference/main.py:67``, ``inference_model.py:102,
    206-207``, ``online_chainer.py:174-176,299-302``). Reroute all of it to
    CPU without touching the reference code."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False

    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple(
            "cpu" if (isinstance(a, (str, torch.device)) and "cuda" in str(a))
            else a for a in args)
        if "device" in kwargs and kwargs["device"] is not None \
                and "cuda" in str(kwargs["device"]):
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to


def make_ckpt(model_dir, seed=0, reference_root="/root/reference"):
    sys.path.insert(0, reference_root)
    _install_stubs()

    import torch

    torch.set_num_threads(2)

    from stemseg.config import cfg

    cfg.merge_from_file(os.path.join(model_dir, "config.yaml"))

    from stemseg.modeling.model_builder import build_model

    torch.manual_seed(int(seed))
    model = build_model(restore_pretrained_backbone_wts=False)
    torch.save({"model": model.state_dict()},
               os.path.join(model_dir, "model.pth"))
    print("saved", os.path.join(model_dir, "model.pth"))


def _install_label_dump(dump_dir):
    """Wrap ``TrackGenerator.do_clustering`` to capture the chainer's output
    (per-frame fg coord lists + stitched label vectors + counts/lifetimes,
    ``inference/main.py:153-176``) and save the reconstructed DENSE label
    volume per sequence. The wrapped original still runs unmodified — the
    writers consume exactly what they would without the dump."""
    import numpy as np

    import stemseg.inference.main as ref_main_mod

    os.makedirs(dump_dir, exist_ok=True)
    orig_dc = ref_main_mod.TrackGenerator.do_clustering

    def do_clustering(self, sequence, all_embeddings, fg_masks,
                      multiclass_masks, max_tracks):
        orig_proc = self.chainer.process
        box = {}

        def proc(masks, subseqs, *a, **k):
            out = orig_proc(masks, subseqs, *a, **k)
            box["out"] = out
            box["shape"] = tuple(masks.shape[-2:])
            return out

        self.chainer.process = proc
        try:
            orig_dc(self, sequence, all_embeddings, fg_masks,
                    multiclass_masks, max_tracks)
        finally:
            self.chainer.process = orig_proc

        (track_labels, counts, lifetimes), fw_idxes = box["out"][:2]
        h, w = box["shape"]
        dense = np.full((len(fw_idxes), h, w), -1, np.int64)
        for t, ((ys, xs), lab) in enumerate(zip(fw_idxes, track_labels)):
            dense[t, ys.cpu().numpy(), xs.cpu().numpy()] = lab.cpu().numpy()
        np.savez(
            os.path.join(dump_dir, f"{sequence.id}.npz"),
            labels=dense,
            counts=np.asarray([[int(k), int(v)] for k, v in counts.items()],
                              np.int64).reshape(-1, 2),
            lifetimes=np.asarray([[int(k), int(v)]
                                  for k, v in lifetimes.items()],
                                 np.int64).reshape(-1, 2))

    ref_main_mod.TrackGenerator.do_clustering = do_clustering


def infer(model_pth, dataset, out_dir, max_tracks="5", frame_overlap="2",
          min_seediness_prob="0.1", dump_dir="",
          reference_root="/root/reference"):
    sys.path.insert(0, reference_root)
    _install_stubs()

    import torch

    torch.set_num_threads(2)
    _patch_cuda_to_cpu()

    # DataLoader worker processes are pure overhead on a small CPU box and
    # num_workers=4 is hardcoded (inference_model.py:17) — run it inline.
    import stemseg.modeling.inference_model as im

    _orig_init = im.InferenceModel.__init__

    def _init(self, *a, **k):
        k.setdefault("cpu_workers", 0)
        _orig_init(self, *a, **k)

    im.InferenceModel.__init__ = _init

    from argparse import Namespace

    from stemseg.inference.main import main as ref_main

    if dump_dir:
        _install_label_dump(dump_dir)

    args = Namespace(
        model_path=model_pth,
        output_dir=out_dir,
        seqs=None,
        dataset=dataset,
        max_tracks=int(max_tracks),
        frame_overlap=int(frame_overlap),
        seediness_thresh=0.25,
        min_dim=None,
        max_dim=None,
        resize_embeddings=False,
        min_seediness_prob=float(min_seediness_prob),
        clustering_device="cpu",
        save_vis=False,
    )
    ref_main(args)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "make_ckpt":
        make_ckpt(*sys.argv[2:])
    elif mode == "infer":
        infer(*sys.argv[2:])
    else:
        raise SystemExit(f"unknown mode {mode}")
