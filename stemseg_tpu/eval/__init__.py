"""In-repo evaluation of the three benchmark formats.

The reference repo ships no scorers — quality is judged by the official
external tools (DAVIS: davis2017-evaluation; KITTI: mots_tools; YT-VIS:
the codalab server; see SURVEY.md §4 "external evaluation tools as the
oracle"). This package implements the same metrics natively so accuracy
can be scored end-to-end inside this framework:

* :mod:`stemseg_tpu.eval.davis` — unsupervised DAVIS J&F (region IoU +
  boundary F-measure, Hungarian proposal-to-object assignment).
* :mod:`stemseg_tpu.eval.mots` — CLEAR-MOTS for KITTI-MOTS (sMOTSA /
  MOTSA / MOTSP, mask-IoU matching, id switches, ignore regions).
* :mod:`stemseg_tpu.eval.ytvis` — YouTube-VIS AP (spatio-temporal mask
  IoU, COCO-style 101-point AP over IoU 0.5:0.05:0.95).
"""

from stemseg_tpu.eval.davis import db_eval_boundary, db_eval_iou, evaluate_davis_sequence
from stemseg_tpu.eval.mots import evaluate_mots
from stemseg_tpu.eval.ytvis import evaluate_ytvis

__all__ = [
    "db_eval_iou",
    "db_eval_boundary",
    "evaluate_davis_sequence",
    "evaluate_mots",
    "evaluate_ytvis",
]
