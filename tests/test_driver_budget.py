"""Budget discipline of the driver artifacts (VERDICT r4 items 1+6).

``MULTICHIP_r04.json`` recorded ok:false rc:124 because a newly-appended
dry-run phase ran unguarded past the driver's wall-clock budget. These
tests pin the guard so the NEXT phase someone appends can't silently
re-break the artifact: every phase must flow through
``__graft_entry__._run_phases``, which skips (never kills) later phases
once the deadline passes.
"""

import importlib.util
import sys
import time

import pytest


def _load_graft_entry():
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location(
        "graft_entry_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ge():
    return _load_graft_entry()


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_phases_all_run_within_deadline(ge):
    ran = []
    clock = FakeClock()

    def phase(name, cost):
        def thunk():
            ran.append(name)
            clock.t += cost
        return thunk

    results = ge._run_phases(
        [("a", phase("a", 10.0)), ("b", phase("b", 10.0))],
        deadline_s=100.0, clock=clock)
    assert ran == ["a", "b"]
    assert [(n, s) for n, s, _ in results] == [("a", "ok"), ("b", "ok")]


def test_slow_phase_skips_later_phases_instead_of_overrunning(ge):
    """The round-4 failure shape: phase 1 passes, phase 2 would blow the
    budget. The runner must SKIP phase 2 (exit 0 on phase 1's strength),
    not start it and get the process killed at rc=124."""
    ran = []
    clock = FakeClock()

    def slow():
        ran.append("train")
        clock.t += 2000.0  # past any sane deadline

    def never():
        ran.append("inference")

    results = ge._run_phases(
        [("train", slow), ("inference", never), ("extra", never)],
        deadline_s=1500.0, clock=clock)
    assert ran == ["train"]
    assert [(n, s) for n, s, _ in results] == [
        ("train", "ok"), ("inference", "skipped"), ("extra", "skipped")]


def test_first_phase_always_runs(ge):
    """A dry run that proves nothing is a fail, not a skip — phase 0 runs
    even if the deadline is already unmeetable."""
    ran = []
    clock = FakeClock()
    clock.t = 0.0

    def first():
        ran.append("train")
        clock.t += 99999.0

    ge._run_phases([("train", first)], deadline_s=0.0, clock=clock)
    assert ran == ["train"]


def test_start_by_threshold_skips_unsafe_phase(ge):
    """A phase whose start threshold has passed is skipped even though the
    overall deadline has not — starting it could carry the process past
    the driver's external kill (the r4 rc=124 shape: cold inference
    compile began late and the timeout hit mid-compile)."""
    ran = []
    clock = FakeClock()

    def train():
        ran.append("train")
        clock.t += 500.0  # deadline 900 not passed, but > 0.45 * 900

    results = ge._run_phases(
        [("train", train),
         ("inference", lambda: ran.append("inference"), 0.45)],
        deadline_s=900.0, clock=clock)
    assert ran == ["train"]
    assert [(n, s) for n, s, _ in results] == [
        ("train", "ok"), ("inference", "skipped")]

    # under the threshold the phase runs (warm-cache shape: train ~230 s)
    ran.clear()
    clock.t = 0.0

    def fast_train():
        ran.append("train")
        clock.t += 230.0

    results = ge._run_phases(
        [("train", fast_train),
         ("inference", lambda: ran.append("inference"), 0.45)],
        deadline_s=900.0, clock=clock)
    assert ran == ["train", "inference"]
    assert all(s == "ok" for _, s, _ in results)


def test_phase_failure_propagates(ge):
    """Assertion failures must still fail the artifact (nonzero exit) —
    the guard trades completeness for rc=0, never correctness."""
    with pytest.raises(AssertionError, match="boom"):
        ge._run_phases([("train", lambda: (_ for _ in ()).throw(
            AssertionError("boom")))], deadline_s=100.0)


def test_deadline_env_override(ge, monkeypatch):
    monkeypatch.setenv("DRYRUN_DEADLINE_S", "42.5")
    clock = FakeClock()

    def phase():
        clock.t += 43.0

    results = ge._run_phases([("a", phase), ("b", phase)], clock=clock)
    assert [(n, s) for n, s, _ in results] == [("a", "ok"), ("b", "skipped")]


def test_dryrun_multichip_routes_every_phase_through_the_runner(
        ge, monkeypatch):
    """Wiring guard: dryrun_multichip must hand BOTH driver-certified
    phases (train + inference) to _run_phases — a phase added outside the
    runner would dodge the deadline guard exactly as round 4's did."""
    captured = {}

    monkeypatch.setattr(ge, "_force_cpu_mesh", lambda n: None)

    def fake_run_phases(phases, deadline_s=None, clock=time.monotonic):
        captured["names"] = [p[0] for p in phases]
        return [(p[0], "ok", 0.0) for p in phases]

    monkeypatch.setattr(ge, "_run_phases", fake_run_phases)
    ge.dryrun_multichip(8)
    assert captured["names"] == ["train", "inference"]


def test_real_phases_print_ok_markers(ge):
    """The driver greps the tail for the OK lines; pin the exact markers so
    a refactor can't silently rename them."""
    import inspect

    assert "TRAIN OK" in inspect.getsource(ge._train_phase)
    assert "INFERENCE OK" in inspect.getsource(ge._inference_phase)
    assert sys.modules  # silence lint about unused import
