"""LR schedules, torch-SGD semantics, logger ETA, interrupt detector."""

import math
import time

import numpy as np
import pytest


def test_step_lr_schedule():
    from stemseg_tpu.config import load_config
    from stemseg_tpu.training.optim import make_lr_schedule

    cfg = load_config({"training": {"initial_lr": 0.1, "lr_decay_type": "step",
                                    "lr_decay_steps": [10, 20],
                                    "lr_decay_factor": 0.1}})
    sched = make_lr_schedule(cfg.training)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(0.1)
    assert float(sched(10)) == pytest.approx(0.01)
    assert float(sched(20)) == pytest.approx(0.001)


def test_exponential_lr_schedule():
    """gamma = exp(ln(factor)/steps) applied per step from start_at
    (reference exponential_lr.py:18-26)."""
    from stemseg_tpu.config import load_config
    from stemseg_tpu.training.optim import make_lr_schedule

    cfg = load_config({"training": {"initial_lr": 0.001,
                                    "lr_decay_type": "exponential",
                                    "lr_exp_decay_factor": 0.1,
                                    "lr_exp_decay_start": 100,
                                    "lr_exp_decay_steps": 50}})
    sched = make_lr_schedule(cfg.training)
    assert float(sched(0)) == pytest.approx(0.001)
    assert float(sched(100)) == pytest.approx(0.001)
    # after `steps` steps past start, lr decayed by `factor`
    assert float(sched(150)) == pytest.approx(0.001 * 0.1, rel=1e-4)
    gamma = math.exp(math.log(0.1) / 50)
    assert float(sched(101)) == pytest.approx(0.001 * gamma, rel=1e-5)


def test_sgd_matches_torch_semantics():
    """Our optax chain must reproduce torch SGD(nesterov, weight_decay)."""
    import torch

    import jax.numpy as jnp
    import optax

    from stemseg_tpu.config import load_config
    from stemseg_tpu.training.optim import make_optimizer

    lr, momentum, wd = 0.1, 0.9, 0.01
    w0 = np.asarray([1.0, -2.0, 3.0], np.float32)
    grads = [np.asarray(g, np.float32) for g in
             ([0.5, -0.25, 1.0], [0.1, 0.2, -0.3], [-0.7, 0.4, 0.05])]

    # torch
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr, momentum, weight_decay=wd, nesterov=True)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours — wrap in a 'trainable' pytree path (not frozen)
    cfg = load_config({"training": {"initial_lr": lr, "momentum": momentum,
                                    "weight_decay": wd, "nesterov": True,
                                    "optimizer": "SGD", "lr_decay_type": "none"}})
    params = {"embedding_head": {"w": jnp.asarray(w0)}}
    tx = make_optimizer(cfg.training, params)
    state = tx.init(params)
    for g in grads:
        gtree = {"embedding_head": {"w": jnp.asarray(g)}}
        updates, state = tx.update(gtree, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["embedding_head"]["w"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_logger_eta_and_state(tmp_path):
    from stemseg_tpu.training.logger import TrainingLogger

    logger = TrainingLogger(str(tmp_path))
    logger.add_scalars({"total": 1.5}, step=10)
    assert (tmp_path / "metrics.jsonl").exists()

    logger._start_time = time.time() - 100.0  # simulate 100s elapsed
    eta = logger.compute_eta(elapsed_iterations=10, total_iterations=110)
    assert eta == pytest.approx(1000.0, rel=0.05)

    state = logger.state_dict()
    logger2 = TrainingLogger(str(tmp_path))
    logger2.load_state_dict(state)
    assert logger2.total_elapsed() >= 100.0

    line = logger.format_console_line(10, 110, {"total": 1.5, "lovasz": 0.3},
                                      0.5, eta)
    assert "it 10/110" in line and "T: 1.5" in line and "L: 0.3" in line


def test_interrupt_detector():
    import os
    import signal

    from stemseg_tpu.training.interrupt import InterruptDetector, InterruptException

    det = InterruptDetector()
    det.start()
    assert not det.is_interrupted
    os.kill(os.getpid(), signal.SIGINT)
    assert det.is_interrupted
    with pytest.raises(InterruptException):
        det.raise_if_interrupted()
    signal.signal(signal.SIGINT, signal.default_int_handler)
