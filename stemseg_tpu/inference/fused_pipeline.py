"""One-jit sequence inference: the ENTIRE per-sequence pipeline — sliding-
window backbone, 3D heads, overlapping-window semseg averaging, per-window
clustering, AND the chainer's cross-window association (intersection
matmuls + Hungarian assignment + relabel) — compiled into a single XLA
program (two ``lax.scan``s over the static window schedule).

Behavioral reference: ``/root/reference/stemseg/modeling/inference_model.py``
(:83-186, streaming forward) + ``inference/online_chainer.py`` (:120-343,
stitching). The per-window streaming path (``engine.infer_sequence`` +
``chainer.OnlineChainer``) dispatches ~10 device ops per window; through the
axon tunnel (~0.67 ms per executed op, ~35 ms per round trip) that overhead
is comparable to the window's compute. This module leaves ONE host
round-trip per sequence regardless of length: ship raw uint8 frames H2D,
dispatch the fused graph, fetch final labels + fg + multiclass masks in one
batched transfer. (Until round 4 the Hungarian ran on the host between two
extra round trips — a measured 54 ms/sequence stall through the tunnel; the
on-device ``lsap.lsa_masked`` replica costs ~0.24 ms/window in-graph and
removes the device idle bubble on any remote-host deployment.)

Graph structure (per compile bucket):

* prelude: backbone+FPN on window 0's T frames -> feature rings
  (primary rows assigned statically: ``frame % 2T`` — any two live frames
  are < 2T apart; rows ``p < T-1`` are additionally MIRRORED at ``p + 2T``
  so a window's T rows are always one plain contiguous run, see the
  mirrored-ring note in ``_Schedule``);
* scan A over windows: backbone on the ≤stride NEW frames, ring write
  (primary + mirror), heads on ONE contiguous T-row dynamic-slice of the
  rings, scatter-add semseg logits into per-frame accumulators; emits
  (embeddings, bandwidths, seediness) per window;
* fg/multiclass from the accumulated means (``engine.derive_masks``);
* scan B over windows: (optional 4x upsample +) clustering in the window's
  disjoint raw id block; one-hot intersection matmul between the committed
  GLOBAL labels and the new raw labels on the overlap frames (the look-back
  candidate band is provably sufficient — the candidates are the lut roots
  of the band's raw ids, and every committed pixel on an overlap frame
  holds exactly such a root); IoU + masked Hungarian assignment in-graph
  (``lsap.lsa_masked`` — an exact replica of the scipy call the host path /
  the reference make, incl. tie-breaking); relabel of the window's labels
  to their matched global ids; commit of newly-seen frames into the dense
  ``committed`` volume. The carried ``lut`` (raw id -> global root) is
  updated by an unconditional scatter (trash-slot-redirected for padded
  windows — same carry-aliasing rule as the rings, see scan A).

Compile buckets: sequence length L is bucketed (multiple of 16) and the
window count W to a multiple of 4; padded windows are skipped at runtime
via ``lax.cond`` so they cost ~nothing. Short sequences (< T frames, with
duplicated frame 0) fall back to the streaming path in the caller.

Parity: produces bit-identical label volumes to
``OnlineChainer.process`` over ``engine.infer_sequence`` outputs (same raw
id blocks; the in-graph fold/Hungarian is provably the host
``fold_and_associate`` computation — intersection counts per global equal
the summed per-raw counts because chunk pixel sets are disjoint, and
``lsa_masked`` replicates scipy's tie-breaking exactly, fuzz-pinned by
``tests/test_lsap.py``); asserted by ``tests/test_fused_pipeline.py``.
The only representational difference: float32 IoU costs on device vs the
host path's float64 — these can disagree only when two assignments' total
costs differ by less than f32 eps (sub-ulp near-ties; exact ties compare
identically in both precisions).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stemseg_tpu.inference.chainer import track_stats
from stemseg_tpu.inference.clustering import ClusterParams, _cluster_window_jit
from stemseg_tpu.inference.engine import InferenceEngine, derive_masks
from stemseg_tpu.inference.lsap import lsa_masked


class _Schedule:
    """Static per-sequence schedule arrays (all numpy, shipped as traced
    inputs so one compile covers every sequence in the same bucket)."""

    def __init__(self, windows: List[List[int]], k: int,
                 l_pad: int, w_pad: int):
        w_real = len(windows)
        t_win = len(windows[0])
        # MIRRORED ring: period 2T plus T-1 mirror rows plus a trash row.
        # Window frames are contiguous (``get_subsequence_frames`` emits
        # ``range(t, t+T)`` windows; asserted below), so a window's rows are
        # a CIRCULAR contiguous run [s, s+T) mod 2T — mirroring rows
        # p < T-1 at p + 2T turns it into a PLAIN contiguous run [s, s+T)
        # over 3T-1 rows, and the heads' ring read becomes ONE
        # ``dynamic_slice`` (a bulk DMA). The index-array gather it replaces
        # lowered to an 8-iteration XLA while loop of per-row
        # dynamic-slice + layout-copy + update (profiled at ~3 ms/window of
        # the heads' 13 ms at 480p — the round-3 "machinery residual").
        ring = 2 * t_win
        self.ring_period = ring
        self.ring_rows = 3 * t_win          # 2T + (T-1) mirrors + 1 trash
        self.trash_row = 3 * t_win - 1
        self.t_win = t_win
        self.w_real = w_real
        self.w_pad = w_pad
        self.l_pad = l_pad
        self.k = k

        for win in windows:
            assert list(win) == list(range(win[0], win[0] + t_win)), \
                f"fused path requires contiguous windows, got {win}"

        def mirror_row(t: int) -> int:
            p = t % ring
            return p + ring if p <= t_win - 2 else self.trash_row

        # per-window new frames (frames not seen in any earlier window)
        seen: set = set()
        new_per_win: List[List[int]] = []
        for win in windows:
            new = [t for t in win if t not in seen]
            seen.update(new)
            new_per_win.append(new)
        assert new_per_win[0] == list(windows[0]), "window 0 must be all-new"

        # scan A processes windows 0..W-1; window 0's T frames are computed
        # by the prelude, so its scan slot recomputes nothing (all trash)
        s = max((len(n) for n in new_per_win[1:]), default=1)
        s = max(s, 1)
        self.s_new = s

        def pad_list(lst, n, fill):
            return list(lst) + [fill] * (n - len(lst))

        new_ids = []      # [W, S] frame to read (0 for trash slots)
        has_new = []      # [W] window computes >=1 new frame (False for
                          # window 0 — prelude did it — and padded windows)
        write_rows = []   # [W, S] primary ring row to write (trash unused)
        write_rows2 = []  # [W, S] mirror ring row (trash when p > T-2)
        win_start = []    # [W] ring row the heads' T-row slice starts at
        scatter_start = []  # [W] first frame of the window's contiguous
                            # accumulator block (l_pad = trash block)
        commit_tgt = []   # [W, T] committed-volume row (l_pad = trash)
        win_frames = []   # [W, T] frame ids (fg gather / committed gather)
        overlap_msk = []  # [W, T] 1.0 where frame shared with previous window
        is_real = []      # [W]

        committed_frames: set = set()
        prev = None
        # look-back band: windows whose raw ids can appear on overlap frames
        self.lookback = 1
        for i in range(w_pad):
            if i < w_real:
                win = windows[i]
                new = new_per_win[i] if i > 0 else []
                win_frames.append(list(win))
                win_start.append(win[0] % ring)
                new_ids.append(pad_list(new, s, 0))
                has_new.append(len(new) > 0)
                write_rows.append(pad_list([t % ring for t in new], s,
                                           self.trash_row))
                write_rows2.append(pad_list([mirror_row(t) for t in new], s,
                                            self.trash_row))
                scatter_start.append(win[0])
                commit_tgt.append([t if t in new_per_win[i] else l_pad
                                   for t in win])
                if i == 0:
                    overlap_msk.append([0.0] * t_win)
                else:
                    prev_set = set(prev)
                    overlap_msk.append([1.0 if t in prev_set else 0.0
                                        for t in win])
                    # committing window of each overlap frame bounds look-back
                    for t in win:
                        if t in prev_set:
                            self.lookback = max(self.lookback,
                                                i - committed_by[t])
                is_real.append(True)
                if i == 0:
                    committed_by = {t: 0 for t in win}
                else:
                    for t in new_per_win[i]:
                        committed_by[t] = i
                prev = win
            else:  # padded window — fully skipped at runtime
                win_frames.append([0] * t_win)
                win_start.append(0)
                new_ids.append([0] * s)
                has_new.append(False)
                write_rows.append([self.trash_row] * s)
                write_rows2.append([self.trash_row] * s)
                scatter_start.append(l_pad)
                commit_tgt.append([l_pad] * t_win)
                overlap_msk.append([0.0] * t_win)
                is_real.append(False)

        i32 = np.int32
        self.has_new = np.asarray(has_new, bool)
        self.new_ids = np.asarray(new_ids, i32)
        self.write_rows = np.asarray(write_rows, i32)
        self.write_rows2 = np.asarray(write_rows2, i32)
        self.win_start = np.asarray(win_start, i32)
        # prelude (window 0) write rows — consumed before the scan, shaped
        # [T] not [W, ...]; popped out of the scanned xs
        self.prelude_rows = np.asarray([t % ring for t in windows[0]], i32)
        self.prelude_mirror = np.asarray([mirror_row(t) for t in windows[0]],
                                         i32)
        self.scatter_start = np.asarray(scatter_start, i32)
        self.commit_tgt = np.asarray(commit_tgt, i32)
        self.win_frames = np.asarray(win_frames, i32)
        self.overlap_msk = np.asarray(overlap_msk, np.float32)
        self.is_real = np.asarray(is_real, bool)
        self.label_base = np.asarray([1 + i * k for i in range(w_pad)], i32)
        # candidate band start per window (ids below never on overlap frames)
        self.cand_base = np.asarray(
            [1 + (i - self.lookback) * k for i in range(w_pad)], i32)

    def as_xs(self) -> Dict[str, np.ndarray]:
        return {
            "has_new": self.has_new,
            "new_ids": self.new_ids,
            "write_rows": self.write_rows,
            "write_rows2": self.write_rows2,
            "win_start": self.win_start,
            "prelude_rows": self.prelude_rows,
            "prelude_mirror": self.prelude_mirror,
            "scatter_start": self.scatter_start,
            "commit_tgt": self.commit_tgt,
            "win_frames": self.win_frames,
            "overlap_msk": self.overlap_msk,
            "is_real": self.is_real,
            "label_base": self.label_base,
            "cand_base": self.cand_base,
        }


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _semseg_scatter(acc, cnt, start, wmap):
    """Per-window semseg-logit accumulation (the reference's overlapping-
    window averaging, ``inference_model.py:121-128``) as ONE contiguous
    slice + add + update-slice instead of a row scatter-add: window frames
    are a contiguous run (asserted in ``_Schedule``), and a T-row
    scatter-add lowered to serialized per-row updates — measured
    15.5 ms/sequence fp32 in the round-5 ablation vs ~bulk-DMA cost for
    the slice form (same bytes, same single addition per pixel, so the
    accumulated float values are bit-identical; padded windows point
    ``start`` at the trash block past ``l_pad`` and add zeros). Module-
    level so the ablation harness (``bench_fused_ablation.py``) can stub
    it; jit inlines it either way."""
    t_win = wmap.shape[0]
    blk = jax.lax.dynamic_slice_in_dim(acc, start, t_win, axis=0)
    acc = jax.lax.dynamic_update_slice_in_dim(acc, blk + wmap, start, axis=0)
    cblk = jax.lax.dynamic_slice_in_dim(cnt, start, t_win, axis=0)
    cnt = jax.lax.dynamic_update_slice_in_dim(cnt, cblk + 1.0, start, axis=0)
    return acc, cnt


def _remap_ids(committed, src, dst):
    """Sparse id relabel: committed == src[r] -> dst[r], else unchanged.
    ``src`` entries are unique (pad with -9, never a valid id), ``dst``
    entries >= 1 (pad with -1). One fused broadcast-compare-reduce pass —
    measured 1.5-2.4 ms at [65, 120, 216] x R<=128 vs 14.4 ms for the
    equivalent small-table LUT gather (TPU scalar gathers are slow)."""
    cand = jnp.where(committed[..., None] == src, dst, -1)
    best = jnp.max(cand, axis=-1)
    return jnp.where(best >= 0, best, committed)


def _intersection_block(existing, labels, ov, cand1, cand2):
    """Overlap-frame intersection counts between committed and new raw ids
    as one-hot MXU matmuls (``chainer._intersection_counts`` shape, queued
    in-graph). Module-level for the ablation harness."""
    a = jnp.where(ov, existing, -7).reshape(-1)
    b = jnp.where(ov, labels, -7).reshape(-1)
    # bf16 one-hots (round 5): exactly representable 0/1 values with f32
    # accumulation in both the dot and the sums, so every count is exact
    # (pixel counts < 2^24) while the materialized [band|k, P] operands
    # halve their bytes — the block's in-situ cost is memory-bound, not
    # MXU-bound (17.5 ms/sequence fp32 in the round-5 ablation)
    oh1 = (a[None, :] == cand1[:, None]).astype(jnp.bfloat16)
    oh2 = (b[None, :] == cand2[:, None]).astype(jnp.bfloat16)
    inter = jax.lax.dot_general(
        oh1, oh2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (inter, jnp.sum(oh1, axis=1, dtype=jnp.float32),
            jnp.sum(oh2, axis=1, dtype=jnp.float32))


class FusedSequencePipeline:
    """Drives the fused graph; host-side association between the two fetches.

    :param engine: InferenceEngine (provides model modules + params)
    :param cluster_params: ClusterParams
    :param cluster_full_scale: 4x-upsample embeddings before clustering (the
        reference's --resize_embeddings path, ``online_chainer.py:127-140``);
        requires the engine built with ``semseg_resize_scale=4``
    :param backend: clustering backend ('auto' | 'pallas' | 'xla')
    """

    LOOKBACK_PAD = 8  # candidate band padded to a multiple (jit signatures)

    def _band(self, lookback: int) -> int:
        """Candidate-band width, bucketed to 2 look-back windows so a tail
        window that overlaps one window further back (lookback N+1 vs the
        regular stride's N) still shares its sequence-length bucket's
        compile. Extra rows are provably zero (committed ids >= the window's
        own block never appear before its commit) and the in-graph
        association masks n1==0 rows out of the Hungarian (``row_valid``),
        exactly as the host ``fold_and_associate`` drops them."""
        k = self.cluster_params.max_instances
        return _round_up(k * lookback, max(self.LOOKBACK_PAD, 2 * k))

    def __init__(self, engine: InferenceEngine, cluster_params: ClusterParams,
                 cluster_full_scale: bool = False, backend: str = "auto"):
        self.engine = engine
        self.cluster_params = cluster_params
        self.cluster_full_scale = cluster_full_scale
        self.backend = backend
        self._sharded_cache: Dict = {}
        self._schedule_cache: Dict = {}
        self._fused = jax.jit(
            self._fused_graph,
            static_argnames=("resize_hw", "semseg_output_type",
                             "seediness_fg_threshold", "backend", "shape_key",
                             "band"))

    # ------------------------------------------------------------------

    def _schedule(self, windows: List[List[int]], k: int, l_pad: int,
                  w_pad: int) -> _Schedule:
        """Memoized ``_Schedule``: schedules are pure functions of
        (windows, k, l_pad, w_pad), and CLI runs call ``run()`` with the
        same window schedule for every same-length sequence — rebuilding
        the numpy arrays per call was a measured 6-10 ms of single-core
        host time on the per-sequence dispatch path (round-5 harness
        reconciliation, BASELINE.md)."""
        key = (tuple(tuple(w) for w in windows), k, l_pad, w_pad)
        sched = self._schedule_cache.get(key)
        if sched is None:
            sched = _Schedule(windows, k, l_pad, w_pad)
            self._schedule_cache[key] = sched
        return sched

    def _cluster_backend(self, p_points: int) -> str:
        if self.backend != "auto":
            return self.backend
        from stemseg_tpu.ops import pallas_clustering_supported

        return "pallas" if pallas_clustering_supported(
            p_points, self.cluster_params.max_instances,
            e_dims=self.engine.embedding_size) else "xla"

    def _fused_graph(self, variables, frames, xs, *, resize_hw,
                     semseg_output_type, seediness_fg_threshold, backend,
                     shape_key, band):
        """The whole sequence pipeline as one traced program.

        :param variables: {params, constants} — passed as jit ARGUMENTS (a
            closure would embed all weights as constants into the serialized
            HLO, overflowing the axon remote-compile request limit)
        :param frames: [L_pad, H0, W0, 3] uint8 raw (resize_hw given) or
            [L_pad, H, W, 3] float32 preprocessed
        :param xs: schedule arrays (dict of [W_pad, ...])
        :param shape_key: (l_pad, w_pad, t_win, ring_rows) — static
        """
        eng = self.engine
        l_pad, w_pad, t_win, ring_rows = shape_key

        if resize_hw is not None:
            from stemseg_tpu.structures.geometry import pad_to_multiple

            ph, pw = pad_to_multiple(*resize_hw)
        else:
            ph, pw = frames.shape[1], frames.shape[2]

        scales = (4, 8, 16, 32)
        c = eng.cfg.model.resnets.backbone_out_channels
        # rings hold backbone features in the ENGINE's compute dtype: under
        # --bf16 the features are bf16 already and the heads re-cast their
        # inputs to bf16, so a bf16 ring is bit-identical to the fp32 one
        # while halving the ring store+gather HBM traffic per window
        ring_dtype = eng.dtype or jnp.float32
        # rings are stored H/W-TRANSPOSED ([rows, W, H, C]): the heads'
        # convs consume window features in an H-minor layout, and with the
        # natural [rows, H, W, C] storage XLA's layout assignment converted
        # the WHOLE carried ring to that layout every window (an xplane-
        # profiled 28.5 ms/sequence bf16 copy, ~1 ms/window — round 5).
        # Transposed storage makes the ring's default layout coincide with
        # the consumer's, so the T-row read is a bitcast; the layout work
        # moves to the <=S-row write (a ~2-row transpose, ~zero)
        rings = tuple(jnp.zeros((ring_rows, pw // s, ph // s, c), ring_dtype)
                      for s in scales)

        # ---------- prelude: window 0's T frames ----------
        xs = dict(xs)
        prelude_rows = xs.pop("prelude_rows")      # [T], not scanned
        prelude_mirror = xs.pop("prelude_mirror")  # [T], not scanned
        first_win = xs["win_frames"][0]
        feats0 = eng._backbone_features(frames[first_win], resize_hw,
                                        variables=variables)
        prelude_wr = jnp.concatenate([prelude_rows, prelude_mirror])
        rings = tuple(
            r.at[prelude_wr].set(
                jnp.concatenate([f, f]).swapaxes(1, 2).astype(r.dtype))
            for r, f in zip(rings, feats0))

        # semseg accumulator dims (4x head scale x optional resize); without
        # a semseg head the accumulated map is the (unresized) seediness
        if eng.semseg_head is not None:
            ss = eng.semseg_resize_scale
            h_m, w_m = int(ph // 4 * ss), int(pw // 4 * ss)
            n_map_ch = eng.cfg.input.num_classes + (
                1 if eng.semseg_head.foreground_channel else 0)
            # + t_win trash rows: padded windows' slice-add block
            # starts at l_pad (see _semseg_scatter)
            acc0 = jnp.zeros((l_pad + t_win, h_m, w_m, n_map_ch),
                             jnp.float32)
        else:
            assert not self.cluster_full_scale, \
                "full-scale clustering requires the semseg head's fg masks"
            h_m, w_m = ph // 4, pw // 4
            acc0 = jnp.zeros((l_pad + t_win, h_m, w_m), jnp.float32)
        cnt0 = jnp.zeros((l_pad + t_win,), jnp.float32)

        e_dim = eng.embedding_size
        v_dim = eng.variance_channels
        h4, w4 = ph // 4, pw // 4

        def scan_a(carry, x):
            # CARRY-ALIASING INVARIANT: the ring buffers (and acc/cnt) must
            # never pass THROUGH a lax.cond — a conditional's carried
            # operands are copied in both branches (XLA copy insertion
            # cannot alias a buffer that two branch computations may write),
            # which at production scale is ~600 MB of ring copies per
            # window. Conds here carry only freshly-computed per-window
            # values; every update to a carried buffer is an unconditional
            # scatter whose row targets are redirected to trash rows by the
            # schedule when the window is padded / has no new frames.
            rings, acc, cnt = carry

            def with_new(_):
                batch = frames[x["new_ids"]]
                feats = eng._backbone_features(batch, resize_hw,
                                               variables=variables)
                return tuple(f.swapaxes(1, 2).astype(r.dtype)
                             for f, r in zip(feats, rings))

            def no_new(_):
                # window 0 (prelude did its frames) and padded windows:
                # zero features, written to trash rows below
                return tuple(
                    jnp.zeros((x["new_ids"].shape[0],) + r.shape[1:],
                              r.dtype) for r in rings)

            feats = jax.lax.cond(x["has_new"], with_new, no_new, None)
            # one scatter covering primary + mirror rows
            wr = jnp.concatenate([x["write_rows"], x["write_rows2"]])
            rings = tuple(r.at[wr].set(jnp.concatenate([f, f]))
                          for r, f in zip(rings, feats))

            def real(_):
                # ONE contiguous dynamic-slice per scale (see _Schedule's
                # mirrored-ring note) instead of an index-array gather
                window = tuple(
                    jax.lax.dynamic_slice_in_dim(r, x["win_start"], t_win,
                                                 axis=0) for r in rings)
                # un-transpose back to [T, H, W, C] — a bitcast given the
                # ring's layout now matches the heads' H-minor preference
                coarsest_first = [f.swapaxes(1, 2)[None]
                                  for f in window[::-1]]
                emb, bw, seed, semseg = eng._heads_from_features(
                    coarsest_first, variables=variables)
                wmap = semseg if eng.semseg_head is not None else seed
                # fp32 regardless of engine dtype: clustering/averaging stay
                # fp32 under --bf16, and the skip branch emits fp32 zeros
                return (emb.astype(jnp.float32), bw.astype(jnp.float32),
                        seed.astype(jnp.float32), wmap.astype(jnp.float32))

            def skip(_):
                z = lambda shape: jnp.zeros(shape, jnp.float32)
                return (z((t_win, h4, w4, e_dim)),
                        z((t_win, h4, w4, v_dim)),
                        z((t_win, h4, w4)),
                        z((t_win,) + acc.shape[1:]))

            emb, bw, seed, wmap = jax.lax.cond(x["is_real"], real, skip,
                                               None)
            # padded windows add zeros into the trash block at l_pad
            # (the schedule's scatter_start) — never read back
            acc, cnt = _semseg_scatter(acc, cnt, x["scatter_start"], wmap)
            return (rings, acc, cnt), (emb, bw, seed)

        (_, acc, cnt), (embs, bws, seeds) = jax.lax.scan(
            scan_a, (rings, acc0, cnt0), jax.tree.map(jnp.asarray, xs))

        # trash rows (>= l_pad) are dropped before the mean so derive_masks
        # never touches them (scan B reads only rows < l_pad)
        mean = acc[:l_pad] / jnp.maximum(cnt[:l_pad], 1.0).reshape(
            (l_pad,) + (1,) * (acc.ndim - 1))
        fg_masks, multiclass = derive_masks(
            mean, has_semseg=eng.semseg_head is not None,
            semseg_output_type=semseg_output_type,
            seediness_fg_threshold=seediness_fg_threshold)

        # ------- scan B: cluster + associate + relabel + commit -------
        k = self.cluster_params.max_instances
        h_c, w_c = (h4 * 4, w4 * 4) if self.cluster_full_scale else (h4, w4)
        committed0 = jnp.full((l_pad + 1, h_c, w_c), -1, jnp.int32)

        k_iota = jnp.arange(k, dtype=jnp.int32)
        band_iota = jnp.arange(band, dtype=jnp.int32)

        # raw id -> global root id. Raw ids span [1, w_pad*k]; slot 0 is the
        # clip target of out-of-band candidates (never a committed value)
        # and the LAST slot is the trash target of padded windows' scatters.
        lut_trash = w_pad * k + 1
        lut0 = jnp.arange(lut_trash + 1, dtype=jnp.int32)

        def scan_b(carry, x):
            # same carry-aliasing invariant as scan A: ``committed`` and
            # ``lut`` never pass THROUGH the cond (each branch would copy
            # the whole volume — 107 MB/window on the full-scale path); the
            # cond returns this window's relabeled labels + lut updates and
            # both commits are unconditional scatters into schedule rows
            # (trash rows/slots for padded windows, never read back)
            committed, lut = carry

            def real(_):
                emb = embs[x["i"]]
                bw = bws[x["i"]]
                seed = seeds[x["i"]]
                if self.cluster_full_scale:
                    from stemseg_tpu.models.layers import upsample_trilinear

                    emb = upsample_trilinear(emb[None], (1.0, 4.0, 4.0))[0]
                    bw = upsample_trilinear(bw[None], (1.0, 4.0, 4.0))[0]
                    seed = upsample_trilinear(
                        seed[None, ..., None], (1.0, 4.0, 4.0))[0, ..., 0]
                fg_win = fg_masks[x["win_frames"]]
                res = _cluster_window_jit(emb, bw, seed, fg_win,
                                          x["label_base"],
                                          self.cluster_params, backend)
                labels = res.labels  # [T, h_c, w_c] raw ids, this block

                # ---- fold: candidate GLOBALS = lut roots of band raws ----
                # committed pixels hold lut[raw-at-commit] and lut entries
                # are write-once (a new raw is assigned only at its own
                # window), so counting pixels == root directly equals the
                # host path's per-raw counts summed per root
                # (fold_and_associate; chunk pixel sets are disjoint).
                raws = jnp.maximum(x["cand_base"] + band_iota, 0)
                roots = jnp.sort(lut[raws])  # ascending = host g_ids order
                first = jnp.concatenate([jnp.ones((1,), bool),
                                         roots[1:] != roots[:-1]])

                existing = committed[x["win_frames"]]
                ov = x["overlap_msk"][:, None, None] > 0.5
                cand2 = x["label_base"] + k_iota
                inter, n1, n2 = _intersection_block(existing, labels, ov,
                                                    roots, cand2)

                # ---- associate: masked Hungarian, scipy tie-breaking ----
                row_valid = first & (roots > 0) & (n1 > 0)
                col_valid = n2 > 0
                union = n1[:, None] + n2[None, :] - inter
                iou = jnp.where(union > 0,
                                inter / jnp.maximum(union, 1.0), 0.0)
                _, r4c = lsa_masked(1.0 - iou, row_valid, col_valid)

                # per new cluster: its global id (matched root, else itself)
                src = cand2
                dst = jnp.where(r4c >= 0, roots[jnp.maximum(r4c, 0)], src)
                labels = _remap_ids(labels, src, dst)
                return labels, src, dst, (res.centers, res.bandwidths,
                                          res.valid, res.seed_probs)

            def skip(_):
                e_full = self.engine.embedding_size
                return (jnp.full((t_win, h_c, w_c), -1, jnp.int32),
                        jnp.full((k,), lut_trash, jnp.int32),
                        jnp.zeros((k,), jnp.int32),
                        (jnp.zeros((k, e_full), jnp.float32),
                         jnp.zeros((k, e_full), jnp.float32),
                         jnp.zeros((k,), bool),
                         jnp.zeros((k,), jnp.float32)))

            labels, src, dst, ys = jax.lax.cond(x["is_real"], real, skip,
                                                None)
            lut = lut.at[src].set(dst)
            committed = committed.at[x["commit_tgt"]].set(labels)
            return (committed, lut), ys

        xs_b = {key: jnp.asarray(xs[key]) for key in
                ("win_frames", "overlap_msk", "commit_tgt", "is_real",
                 "label_base", "cand_base")}
        xs_b["i"] = jnp.arange(w_pad, dtype=jnp.int32)
        (committed, _), (centers, cbws, valids, seedps) = \
            jax.lax.scan(scan_b, (committed0, lut0), xs_b)

        # int16 transport whenever ids fit (halves the label fetch)
        out_dtype = jnp.int16 if w_pad * k + 1 < 2 ** 15 else jnp.int32
        return {
            "fg_masks": fg_masks[:l_pad],
            "multiclass_masks": multiclass[:l_pad] if multiclass is not None
            else None,
            "labels": committed[:l_pad].astype(out_dtype),
            "centers": centers, "cluster_bandwidths": cbws,
            "valids": valids, "seed_probs": seedps,
        }

    # ------------------------------------------------------------------

    def run(self, frames: np.ndarray, windows: List[List[int]],
            seediness_fg_threshold: float = 0.25,
            semseg_output_type: str = "probs",
            resize_hw: Optional[Tuple[int, int]] = None,
            device_outputs: bool = False,
            fetch_multiclass: bool = True):
        """Full pipeline for one sequence.

        :param frames: [T_total, H0, W0, 3] uint8 raw (with resize_hw) or
            float32 preprocessed /32-padded frames; may already be a device
            array (pre-padded to a multiple of 16 frames) to overlap the H2D
            transfer with other work
        :param windows: schedule from ``get_subsequence_frames`` — must have
            no duplicate frames (sequences >= T; callers fall back to the
            streaming path otherwise)
        :param device_outputs: skip the final bulk D2H fetch and return
            device arrays (labels/fg/multiclass, still padded to l_pad) with
            counts/lifetimes as None — lets callers pipeline the fetch with
            the next sequence's compute. The labels array stays in the
            int16 transport dtype whenever ``w_pad*k+1 < 2**15``
            (int32 otherwise) — cast to int32 host-side after fetching,
            as the non-device path does
        :param fetch_multiclass: set False when the writer ignores
            category masks (the DAVIS format) — skips that transfer
        :return: (labels [T, h_c, w_c] int32 np, counts, lifetimes,
                  fg_masks np, multiclass np or None)
        """
        # true sequence length comes from the schedule, NOT frames.shape[0]:
        # device-resident frames arrive pre-padded to l_pad and the padding
        # frames must not leak into the sliced outputs / track stats
        t_total = max(max(w) for w in windows) + 1
        w_real = len(windows)
        assert frames.shape[0] >= t_total, (frames.shape, t_total)
        assert all(len(set(w)) == len(w) for w in windows), \
            "fused path requires duplicate-free windows (use streaming path)"

        k = self.cluster_params.max_instances
        l_pad = _round_up(t_total, 16)
        w_pad = _round_up(w_real, 4)
        sched = self._schedule(windows, k, l_pad, w_pad)
        band = self._band(sched.lookback)

        if frames.shape[0] != l_pad:
            assert not isinstance(frames, jax.Array), \
                "device-resident frames must be pre-padded to l_pad"
            if frames.shape[0] < l_pad:
                pad = np.zeros((l_pad - frames.shape[0],) + frames.shape[1:],
                               frames.dtype)
                frames = np.concatenate([frames, pad], axis=0)
            else:
                frames = frames[:l_pad]

        shape_key = (l_pad, w_pad, sched.t_win, sched.ring_rows)
        if resize_hw is not None:
            from stemseg_tpu.structures.geometry import pad_to_multiple

            ph, pw = pad_to_multiple(*resize_hw)
        else:
            ph, pw = frames.shape[1], frames.shape[2]
        scale = 1 if self.cluster_full_scale else 4
        p_points = sched.t_win * (ph // scale) * (pw // scale)
        backend = self._cluster_backend(p_points)

        variables = {"params": self.engine.params,
                     "constants": self.engine.constants}
        out = self._fused(variables, jnp.asarray(frames), sched.as_xs(),
                          resize_hw=resize_hw,
                          semseg_output_type=semseg_output_type,
                          seediness_fg_threshold=seediness_fg_threshold,
                          backend=backend, shape_key=shape_key, band=band)

        if device_outputs:
            return (out["labels"], None, None, out["fg_masks"],
                    out["multiclass_masks"])

        # ---- the single round trip: final volumes in one fetch ----
        fetch = [out["labels"], out["fg_masks"]]
        want_mc = fetch_multiclass and out["multiclass_masks"] is not None
        if want_mc:
            fetch.append(out["multiclass_masks"])
        fetched = jax.device_get(fetch)
        labels = np.asarray(fetched[0])[:t_total].astype(np.int32)
        fg = np.asarray(fetched[1])[:t_total]
        multiclass = np.asarray(fetched[2])[:t_total] if want_mc else None

        counts, lifetimes = track_stats(labels)
        return labels, counts, lifetimes, fg, multiclass

    # ------------------------------------------------------------------
    # Multi-chip batch inference (no reference analogue — the reference is
    # single-GPU; this scales serving throughput over a TPU mesh)
    # ------------------------------------------------------------------

    def _get_sharded(self, mesh, resize_hw, semseg_output_type,
                     seediness_fg_threshold, backend, shape_key, band):
        key = (mesh, resize_hw, semseg_output_type, seediness_fg_threshold,
               backend, shape_key, band)
        fn = self._sharded_cache.get(key)
        if fn is not None:
            return fn

        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]

        def per_device(variables, frames, xs):
            out = self._fused_graph(
                variables, frames[0], jax.tree.map(lambda a: a[0], xs),
                resize_hw=resize_hw, semseg_output_type=semseg_output_type,
                seediness_fg_threshold=seediness_fg_threshold,
                backend=backend, shape_key=shape_key, band=band)
            return jax.tree.map(lambda v: v[None], out)

        # check_vma off: the graph is embarrassingly per-device (no
        # collectives), but its lax.cond skip branches emit fresh zeros
        # which the varying-manual-axes checker would reject
        mapped = jax.shard_map(per_device, mesh=mesh,
                               in_specs=(P(), P(axis), P(axis)),
                               out_specs=P(axis), check_vma=False)
        fn = jax.jit(mapped,
                     in_shardings=(NamedSharding(mesh, P()),
                                   NamedSharding(mesh, P(axis)),
                                   NamedSharding(mesh, P(axis))))
        self._sharded_cache[key] = fn
        return fn

    def run_batch(self, frames_batch: List[np.ndarray],
                  windows_batch: List[List[List[int]]], mesh,
                  seediness_fg_threshold: float = 0.25,
                  semseg_output_type: str = "probs",
                  resize_hw: Optional[Tuple[int, int]] = None,
                  fetch_multiclass: bool = True):
        """Data-parallel inference: ONE SEQUENCE PER DEVICE over a 1-D mesh
        (``shard_map`` — each device runs the unbatched fused graph, so the
        Pallas clustering kernel and all gathers stay single-core).

        Sequences of different lengths share one compile: every schedule is
        padded to the batch's (l_pad, w_pad) bucket and padded windows are
        skipped at runtime via ``lax.cond``. The batch is padded to the mesh
        size by repeating sequence 0 (results discarded). The Hungarian
        association runs in-graph per device (``lsap.lsa_masked``), so the
        whole batch is ONE dispatch + ONE fetch with zero per-sequence host
        work in between.

        :param frames_batch: per-sequence frames, uint8 raw (with
            ``resize_hw``) or preprocessed float32; all sequences must share
            H0/W0 (one resize bucket)
        :param mesh: 1-D ``jax.sharding.Mesh``; ``len(frames_batch)`` must be
            <= mesh size (chunk larger workloads)
        :return: list of per-sequence (labels, counts, lifetimes, fg_masks,
            multiclass or None) — same contract as :meth:`run`
        """
        n_dev = int(np.prod(mesh.devices.shape))
        b_real = len(frames_batch)
        assert 1 <= b_real <= n_dev, (b_real, n_dev)
        for f, w in zip(frames_batch, windows_batch):
            assert all(len(set(win)) == len(win) for win in w), \
                "fused path requires duplicate-free windows"
            assert f.shape[1:] == frames_batch[0].shape[1:], \
                "all sequences in a batch must share one resize bucket"
        idxs = list(range(b_real)) + [0] * (n_dev - b_real)

        k = self.cluster_params.max_instances
        t_tots = [max(max(w) for w in ws) + 1 for ws in windows_batch]
        l_pad = max(_round_up(tt, 16) for tt in t_tots)
        w_pad = max(_round_up(len(w), 4) for w in windows_batch)
        scheds = [self._schedule(windows_batch[i], k, l_pad, w_pad)
                  for i in idxs]
        band = max(self._band(s.lookback) for s in scheds)

        def pad_frames(f):
            if f.shape[0] >= l_pad:
                return f[:l_pad]
            pad = np.zeros((l_pad - f.shape[0],) + f.shape[1:], f.dtype)
            return np.concatenate([f, pad], axis=0)

        frames = np.stack([pad_frames(frames_batch[i]) for i in idxs])
        xs = {name: np.stack([s.as_xs()[name] for s in scheds])
              for name in scheds[0].as_xs()}

        shape_key = (l_pad, w_pad, scheds[0].t_win, scheds[0].ring_rows)
        if resize_hw is not None:
            from stemseg_tpu.structures.geometry import pad_to_multiple

            ph, pw = pad_to_multiple(*resize_hw)
        else:
            ph, pw = frames.shape[2], frames.shape[3]
        scale = 1 if self.cluster_full_scale else 4
        p_points = scheds[0].t_win * (ph // scale) * (pw // scale)
        backend = self._cluster_backend(p_points)

        fn = self._get_sharded(mesh, resize_hw, semseg_output_type,
                               seediness_fg_threshold, backend, shape_key,
                               band)
        variables = {"params": self.engine.params,
                     "constants": self.engine.constants}
        out = fn(variables, frames, xs)

        # ---- the single round trip: all final volumes in one fetch ----
        fetch = [out["labels"], out["fg_masks"]]
        has_mc = fetch_multiclass and out["multiclass_masks"] is not None
        if has_mc:
            fetch.append(out["multiclass_masks"])
        fetched = jax.device_get(fetch)

        results = []
        for b in range(b_real):
            t_total = t_tots[b]
            labels = np.asarray(fetched[0][b])[:t_total].astype(np.int32)
            fg = np.asarray(fetched[1][b])[:t_total]
            mc = np.asarray(fetched[2][b])[:t_total] if has_mc else None
            counts, lifetimes = track_stats(labels)
            results.append((labels, counts, lifetimes, fg, mc))
        return results
