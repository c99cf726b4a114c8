"""Structural guard on the fused pipeline's compiled HLO: no carry-scale
copies inside the scan bodies.

XLA copy insertion materializes a copy of any buffer that passes THROUGH a
``lax.cond`` (both branches are writers of the conditional's output buffer),
which at production geometry costs ~600 MB of feature-ring copies per
window. The fused scans are structured so conditionals only return fresh
per-window values and carried buffers (rings, semseg accumulator, committed
labels) receive unconditional trash-row-redirected scatters — see the
carry-aliasing invariant in ``fused_pipeline.py``. Copy insertion is a
backend-shared XLA pass, so the CPU-compiled HLO is a faithful guard.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemseg_tpu.config import load_config
from stemseg_tpu.inference import get_subsequence_frames
from stemseg_tpu.inference.clustering import ClusterParams
from stemseg_tpu.inference.engine import InferenceEngine
from stemseg_tpu.inference.fused_pipeline import (FusedSequencePipeline,
                                                  _Schedule, _round_up)
from stemseg_tpu.models import build_model

H, W = 64, 96  # /32-aligned toy dims; ring rows are [9, h_s, w_s, 256]


@pytest.mark.slow
def test_fused_graph_has_no_carry_scale_copies():
    cfg = load_config({
        "input": {"num_frames": 4, "num_classes": 2},
        "model": {"backbone": {"type": "R-50-FPN"}},
        "clustering": {"max_instances": 5},
    })
    model = build_model(cfg, for_training=False)
    frames = np.zeros((16, H, W, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(frames[None, :4]))
    engine = InferenceEngine(cfg, variables)
    params = ClusterParams(max_instances=5)
    pipe = FusedSequencePipeline(engine, params, backend="xla")

    windows, _ = get_subsequence_frames(11, 4, 2)
    l_pad = _round_up(11, 16)
    w_pad = _round_up(len(windows), 4)
    sched = _Schedule(windows, params.max_instances, l_pad, w_pad)
    band = pipe._band(sched.lookback)
    shape_key = (l_pad, w_pad, sched.t_win, sched.ring_rows)

    txt = pipe._fused.lower(
        {"params": engine.params, "constants": engine.constants},
        jnp.asarray(frames), sched.as_xs(),
        resize_hw=None, semseg_output_type="probs",
        seediness_fg_threshold=0.25, backend="xla", shape_key=shape_key,
        band=band).compile().as_text()

    ring_rows = sched.ring_rows
    offenders = []
    # The EXPENSIVE rings are the two finest scales (4x, 8x) — at 480p they
    # are 160 MB + 40 MB and a per-window copy of them is the round-3
    # regression this test guards. The two COARSEST rings (16x, 32x) get a
    # small layout-conversion transpose+copy from XLA (FPN output layout vs
    # ring slice layout, ~4 ms/sequence at production scale — measured in
    # the round-4 xplane profile), which is accepted; only spatially-fine
    # ring copies and carried volumes are banned.
    fine_hs = {H // 4, H // 8}
    for m in re.finditer(r"= (\w+)\[([0-9,]+)\][^ ]* copy\(", txt):
        dims = [int(d) for d in m.group(2).split(",")]
        if (dims[:1] == [ring_rows] and dims[-1:] == [256]
                and len(dims) == 4 and dims[1] in fine_hs):
            offenders.append(("ring", m.group(0)))
        if dims[:1] == [l_pad + 1]:
            offenders.append(("carried volume", m.group(0)))
    assert not offenders, (
        "carry-scale copies reappeared in the fused HLO (a lax.cond is "
        f"carrying a scan buffer again): {offenders}")
