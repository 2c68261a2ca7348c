"""The controls-gated bench retry (bench.py::gated_attempts, r11 verdict
task 3): the official bench re-runs itself while the same-run control
ratios read contended, keeps the best attempt, and records every attempt's
controls. Pure logic — driven here with fake measure functions, no Spark.
"""

from __future__ import annotations

import bench


FLOORS = {"ctl_a": 1.0, "ctl_b": 2.0}


def _mk(factor: float) -> dict[str, float]:
    """One fake attempt whose box factor is exactly `factor`."""
    return {"ctl_a": 1.0 * factor, "ctl_b": 2.0 * factor, "q": 5.0 * factor}


def test_quiet_first_attempt_stops_immediately():
    calls = []

    def measure():
        calls.append(1)
        return _mk(1.05)

    times, controls, extra = bench.gated_attempts(
        measure, max_attempts=3, control_floors=FLOORS)
    assert len(calls) == 1
    assert times == _mk(1.05)
    assert controls == [{"ctl_a": 1.05, "ctl_b": 1.05}]
    assert extra is None  # dict-returning measure carries no extra


def test_contended_then_quiet_keeps_quiet_attempt():
    attempts = iter([_mk(1.9), _mk(1.1)])

    def measure():
        return next(attempts)

    times, controls, _ = bench.gated_attempts(
        measure, max_attempts=3, control_floors=FLOORS)
    assert times == _mk(1.1)
    assert controls == [{"ctl_a": 1.9, "ctl_b": 1.9},
                        {"ctl_a": 1.1, "ctl_b": 1.1}]


def test_all_contended_exhausts_cap_and_keeps_best():
    attempts = iter([_mk(1.9), _mk(1.4), _mk(1.6)])

    def measure():
        return next(attempts)

    times, controls, _ = bench.gated_attempts(
        measure, max_attempts=3, control_floors=FLOORS)
    # best attempt by box factor is the middle one, not the last
    assert times == _mk(1.4)
    assert len(controls) == 3


def test_factor_is_max_over_controls_never_mixed_across_attempts():
    # attempt 1: one control quiet, the other contended -> gate must read
    # the MAX (contended); attempt 2 quiet on both -> accepted, and the
    # returned times are attempt 2's wholesale (no per-query min mixing).
    a1 = {"ctl_a": 0.9, "ctl_b": 2.0 * 1.8, "q": 0.1}     # q fast but window bad
    a2 = {"ctl_a": 1.1, "ctl_b": 2.0 * 1.1, "q": 4.0}

    attempts = iter([a1, a2])
    times, controls, _ = bench.gated_attempts(
        lambda: next(attempts), max_attempts=3, control_floors=FLOORS)
    assert times == a2          # not a blend taking q=0.1 from attempt 1
    assert controls[0] == {"ctl_a": 0.9, "ctl_b": 1.8}


def test_extra_rides_with_the_kept_attempt():
    # (times, extra) measure form (r13): the returned extra must come from
    # the KEPT attempt (the quiet one), never the contended first attempt.
    attempts = iter([(_mk(1.9), {"q": "cold-1"}), (_mk(1.1), {"q": "cold-2"})])
    times, controls, extra = bench.gated_attempts(
        lambda: next(attempts), max_attempts=3, control_floors=FLOORS)
    assert times == _mk(1.1)
    assert extra == {"q": "cold-2"}
    assert len(controls) == 2


def test_default_floors_are_the_frozen_controls():
    # the production floors never change (BASELINE.md rule); pin them so an
    # accidental edit is loud
    assert bench.CONTROL_FLOORS == {
        "latest_per_key": 0.299, "groupby_agg_q1": 0.847}
