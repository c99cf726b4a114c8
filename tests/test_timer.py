"""Timer: accumulation, exclusion decorators (the fps-report mechanics —
reference ``utils/timer.py:4-114``, exclusion used so image I/O never counts
against model/clustering fps)."""

import time

from stemseg_tpu.utils.timer import Timer


def test_timer_accumulation_and_exclusion():
    Timer.reset()

    @Timer.log_duration("work")
    def work():
        time.sleep(0.05)
        io()

    @Timer.exclude_duration("work")
    def io():
        time.sleep(0.05)

    work()
    work()

    d = Timer.get_duration("work")
    # two calls of ~0.1s each, minus two excluded ~0.05s sleeps
    assert 0.08 < d < 0.16, d
    assert Timer.get_durations_sum() == d

    Timer.reset()
    assert Timer.get_duration("work") == 0.0


def test_timer_start_stop():
    Timer.reset()
    Timer.start("x")
    time.sleep(0.03)
    Timer.stop("x")
    assert Timer.get_duration("x") >= 0.025
