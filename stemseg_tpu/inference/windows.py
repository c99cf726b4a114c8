"""Overlapping-window schedule for arbitrary-length videos.

Behavioral reference: ``/root/reference/stemseg/inference/main.py:23-49``.
This is the long-sequence mechanism (SURVEY.md §5): fixed-T windows with
overlap (6 for DAVIS, 4 for YT-VIS / KITTI-MOTS) whose tracks are stitched by
the chainer; fixed T keeps every jitted graph static-shaped.
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def get_subsequence_frames(seq_len: int, subseq_len: int, frame_overlap: int
                           ) -> Tuple[List[List[int]], Optional[List[bool]]]:
    """:return: (list of windows — each a list of ``subseq_len`` frame
    indices; padded_frames — for short sequences, flags marking the leading
    repeats of frame 0, else None)."""
    assert frame_overlap < subseq_len

    if seq_len < subseq_len:
        # front-pad short sequences by repeating frame 0 (main.py:37-39)
        n_pad = subseq_len - seq_len
        padded_frames = [True] * n_pad + [False] * seq_len
        return [[0] * n_pad + list(range(seq_len))], padded_frames

    subseq_idxes = []
    last_frame_idx = -1
    for t in range(0, seq_len - subseq_len + 1, subseq_len - frame_overlap):
        subseq_idxes.append(list(range(t, t + subseq_len)))
        last_frame_idx = subseq_idxes[-1][-1]

    if last_frame_idx != seq_len - 1:
        # tail window anchored to the sequence end (main.py:45-46)
        subseq_idxes.append(list(range(seq_len - subseq_len, seq_len)))

    return subseq_idxes, None
