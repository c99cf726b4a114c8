"""Timer: accumulation, exclusion decorators (the fps-report mechanics —
reference ``utils/timer.py:4-114``, exclusion used so image I/O never counts
against model/clustering fps)."""

import time

from stemseg_tpu.utils.timer import Timer


def test_timer_accumulation_and_exclusion():
    Timer.reset()

    io_wall = []

    @Timer.log_duration("work")
    def work():
        time.sleep(0.05)
        io()

    @Timer.exclude_duration("work")
    def io():
        t0 = time.perf_counter()
        time.sleep(0.05)
        io_wall.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    work()
    work()
    outer_wall = time.perf_counter() - t0

    d = Timer.get_duration("work")
    # Assert the exclusion INVARIANT, not absolute wall bounds — on a loaded
    # host time.sleep can overshoot arbitrarily (observed 0.38s for 0.2s of
    # sleeps under a 3-job CPU), but the relations below hold regardless:
    # the io() sleeps are fully excluded, so what remains is at least the
    # two non-excluded sleeps and at most everything minus the excluded io
    # wall (decorator bookkeeping only adds).
    assert d >= 2 * 0.05 * 0.98, d  # sleeps never undershoot (2% clock slop)
    assert d <= outer_wall - sum(io_wall) + 0.02, (d, outer_wall, io_wall)
    assert Timer.get_durations_sum() == d

    Timer.reset()
    assert Timer.get_duration("work") == 0.0


def test_timer_start_stop():
    Timer.reset()
    Timer.start("x")
    time.sleep(0.03)
    Timer.stop("x")
    assert Timer.get_duration("x") >= 0.025
