"""InferenceEngine consistency: the streaming per-frame-cached path must
reproduce the monolithic model forward exactly, window by window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemseg_tpu.config import load_config
from stemseg_tpu.inference import get_subsequence_frames
from stemseg_tpu.inference.engine import InferenceEngine
from stemseg_tpu.models import build_model


@pytest.fixture(scope="module")
def setup():
    cfg = load_config({
        "input": {"num_frames": 4, "num_classes": 2},
        "model": {"backbone": {"type": "R-50-FPN"}},
    })
    model = build_model(cfg, for_training=False)
    rng = np.random.RandomState(0)
    frames = (rng.randn(10, 64, 96, 3) * 30).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :4]))
    return cfg, model, variables, frames


def test_engine_matches_monolithic_forward(setup):
    cfg, model, variables, frames = setup
    windows, _ = get_subsequence_frames(len(frames), 4, 2)
    engine = InferenceEngine(cfg, variables)
    out = engine.infer_sequence(frames, windows)

    e = cfg.model.embeddings.embedding_size
    assert len(out["windows"]) == len(windows)

    semseg_sum = np.zeros((len(frames), 16, 24, 3), np.float32)
    semseg_cnt = np.zeros(len(frames), np.int32)

    for win, wout in zip(windows, out["windows"]):
        ref = model.apply(variables, jnp.asarray(frames[np.asarray(win)][None]))
        ref_emb = np.asarray(ref["embeddings"][0])
        np.testing.assert_allclose(np.asarray(wout["embeddings"]),
                                   ref_emb[..., :e], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wout["bandwidths"]),
                                   np.exp(ref_emb[..., e:-1]) * 10.0,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wout["seediness"]),
                                   ref_emb[..., -1], rtol=1e-5, atol=1e-5)
        ref_semseg = np.asarray(ref["semseg_masks"][0])
        for i, t in enumerate(win):
            semseg_sum[t] += ref_semseg[i]
            semseg_cnt[t] += 1

    # semseg averaging across overlapping windows, fg via sigmoid(fg channel)
    avg = semseg_sum / semseg_cnt[:, None, None, None]
    fg_expected = 1.0 / (1.0 + np.exp(-avg[..., -1])) > 0.5
    np.testing.assert_array_equal(np.asarray(out["fg_masks"]), fg_expected)


def test_engine_short_sequence_dedup(setup):
    """Front-padded windows (repeated frame 0) dedupe to unique frames."""
    cfg, model, variables, frames = setup
    short = frames[:3]
    windows, padded = get_subsequence_frames(3, 4, 2)
    assert windows == [[0, 0, 1, 2]] and padded == [True, False, False, False]

    engine = InferenceEngine(cfg, variables)
    out = engine.infer_sequence(short, windows)
    w = out["windows"][0]
    assert w["frames"] == [0, 1, 2]
    assert np.asarray(w["embeddings"]).shape[0] == 3
    assert np.asarray(out["fg_masks"]).shape[0] == 3

    # frame 0's output equals the LAST duplicate slot of the full window run
    ref = model.apply(variables, jnp.asarray(short[np.asarray(windows[0])][None]))
    ref_emb = np.asarray(ref["embeddings"][0])
    e = cfg.model.embeddings.embedding_size
    np.testing.assert_allclose(np.asarray(w["embeddings"])[0],
                               ref_emb[1, ..., :e], rtol=1e-5, atol=1e-5)


def test_engine_seediness_fg_fallback(setup):
    """Without a semseg head, fg comes from window-averaged seediness."""
    cfg0, model0, _, frames = setup
    cfg = load_config({
        "input": {"num_frames": 4, "num_classes": 2},
        "model": {"backbone": {"type": "R-50-FPN"}, "use_semseg_head": False,
                  "use_seediness_head": True},
    })
    model = build_model(cfg, for_training=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :4]))
    windows, _ = get_subsequence_frames(6, 4, 2)
    engine = InferenceEngine(cfg, variables)
    out = engine.infer_sequence(frames[:6], windows, seediness_fg_threshold=0.25)
    assert out["multiclass_masks"] is None
    assert np.asarray(out["fg_masks"]).dtype == bool

    # manual: average seediness over windows covering each frame
    seed_sum = np.zeros((6, 16, 24), np.float32)
    cnt = np.zeros(6, np.int32)
    for win, wout in zip(windows, out["windows"]):
        s = np.asarray(wout["seediness"])
        for i, t in enumerate(wout["frames"]):
            seed_sum[t] += s[i]
            cnt[t] += 1
    expected = (seed_sum / cnt[:, None, None]) > 0.25
    np.testing.assert_array_equal(np.asarray(out["fg_masks"]), expected)
