"""Numerical parity of the JAX model vs the reference PyTorch model.

The reference ``TrainingModel`` runs in a subprocess (``ref_runner.py`` —
torch and JAX thread pools deadlock when sharing a process) on a fixed random
clip; its state dict is converted with our converter and our model must
reproduce the embedding / semseg / seediness outputs. Parametrized over the
three head configurations: the default (semseg + fused seediness), the
DAVIS preset (separate seediness head, no semseg, xyff free dims) and the
YouTube-VIS preset (41-class semseg, xyff). This validates the whole stack
at once: layer semantics (FrozenBN, GN, trilinear/bilinear resizes,
avg-pool count_include_pad, coordinate grid) and the checkpoint converter's
name/layout mapping.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))

# variant -> our-side preset name (None = default config). "x101" runs the
# default head config on the ResNeXt-101 backbone (num_groups=32,
# width_per_group=8): the reference registers the key but its spec table
# lacks it (backbone/__init__.py:9 vs resnet.py:352-355), so ref_runner
# patches the spec into the torch subprocess — this covers the one model
# branch (grouped convs) the named presets never build.
PRESETS = {"default": None, "davis": "davis_1", "ytvis": "youtube_vis",
           "x101": None}

X101_OVERRIDES = {"model": {"backbone": {"type": "X-101-FPN"},
                            "resnets": {"num_groups": 32,
                                        "width_per_group": 8}}}


@pytest.fixture(scope="module", params=list(PRESETS))
def variant(request):
    return request.param


@pytest.fixture(scope="module")
def golden(tmp_path_factory, variant):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    tmp = tmp_path_factory.mktemp(f"parity_{variant}")
    rng = np.random.RandomState(0)
    x = (rng.randn(1, 8, 128, 192, 3) * 50.0).astype(np.float32)
    input_npz = str(tmp / "input.npz")
    out_npz = str(tmp / "golden.npz")
    np.savez(input_npz, x=x)

    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "ref_runner.py"), input_npz,
         out_npz, variant],
        capture_output=True, text=True, timeout=900,
    )
    if proc.returncode != 0:
        pytest.fail(f"ref_runner failed:\n{proc.stdout}\n{proc.stderr}")
    return x, np.load(out_npz)


@pytest.fixture(scope="module")
def converted(golden, variant):
    import jax

    from stemseg_tpu.config import default_config, load_preset
    from stemseg_tpu.models import build_model
    from stemseg_tpu.models.converter import convert_state_dict, merge_variables

    x, data = golden
    state_dict = {k[len("state/"):]: data[k] for k in data.files
                  if k.startswith("state/")}

    cfg = default_config() if PRESETS[variant] is None else load_preset(PRESETS[variant])
    if variant == "x101":
        from stemseg_tpu.config import merge

        cfg = merge(cfg, X101_OVERRIDES)
    model = build_model(cfg, for_training=False)
    init_vars = model.init(jax.random.PRNGKey(0), np.zeros_like(x))
    variables = merge_variables(init_vars, convert_state_dict(state_dict))
    return cfg, model, variables, state_dict


def test_full_forward_parity(golden, converted):
    x, data = golden
    cfg, model, variables, _ = converted

    out = model.apply(variables, x)
    emb = np.asarray(out["embeddings"], np.float32)

    ref_emb = data["embeddings"]
    if "seediness" in data.files:
        # separate seediness head: our model concatenates it as the last
        # channel (model_builder.py:190-200)
        np.testing.assert_allclose(emb[..., -1:], data["seediness"],
                                   rtol=1e-3, atol=5e-4)
        emb = emb[..., :-1]
    assert emb.shape == ref_emb.shape
    np.testing.assert_allclose(emb, ref_emb, rtol=1e-3, atol=5e-4)

    if "semseg" in data.files:
        semseg = np.asarray(out["semseg_masks"], np.float32)
        np.testing.assert_allclose(semseg, data["semseg"], rtol=1e-3, atol=5e-4)
    else:
        assert out["semseg_masks"] is None


def test_all_checkpoint_keys_consumed(converted):
    """Every torch parameter/buffer must land somewhere in our tree (no
    silently dropped weights)."""
    import jax

    _, _, variables, state_dict = converted
    n_torch = sum(int(np.prod(v.shape)) for k, v in state_dict.items()
                  if "loss_criterion" not in k)  # loss buffers are config-derived
    n_ours = sum(int(np.prod(np.shape(v))) for v in jax.tree.leaves(variables))
    assert n_torch == n_ours
