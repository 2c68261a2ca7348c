"""Guard against silently un-verifying queries (the r2 failure mode).

The driver's correctness harness oracle-checks only the FIRST
``registry.DRIVER_WINDOW`` queries in ``queries()`` order each round. In
round 2, adding queries early in registration order pushed
``dedup_minhash_lsh``/``dedup_clusters`` (driver-green in r1) out of the
window — a regression in them would have shipped invisibly. These tests
make that failure mode a test failure instead.
"""

from __future__ import annotations

import json
import subprocess
from pathlib import Path

from kafka_flink_processing_spark.plans import registry

REPO = Path(__file__).resolve().parent.parent


def _correctness_files() -> list[Path]:
    """COMMITTED CORRECTNESS_r*.json files, in round order.

    git-pinned rather than globbed (r4 advice): mid-round the driver may
    drop a partial, untracked CORRECTNESS file into the working tree, and a
    glob would silently promote that half-written file to the asserted
    source of truth. Falls back to the glob only when git itself is
    unavailable (e.g. an exported tree).
    """
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"], cwd=REPO,
            capture_output=True, text=True, check=True).stdout.split()
        if out:
            return [REPO / f for f in sorted(out)]
    except (OSError, subprocess.CalledProcessError):
        pass
    return sorted(REPO.glob("CORRECTNESS_r*.json"))


def _committed_rows() -> set[str]:
    """Query names with ANY driver row (green or rows-only) in a committed
    CORRECTNESS_r*.json."""
    names: set[str] = set()
    for p in _correctness_files():
        names |= set(json.loads(p.read_text()))
    return names


def test_priority_exactly_fills_driver_window():
    # Every _PRIORITY name must exist (a typo would silently shrink the
    # window) and the list must be exactly the window size so the choice of
    # what gets driver signal stays explicit.
    registry._ensure_loaded()
    unknown = [n for n in registry._PRIORITY if n not in registry.QUERIES]
    assert not unknown, f"_PRIORITY names not registered: {unknown}"
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))
    assert len(registry._PRIORITY) == registry.DRIVER_WINDOW


def test_every_query_has_driver_signal():
    # window this round ∪ rows recorded in committed CORRECTNESS files
    # must cover every registered query; a new query must either enter the
    # priority window or wait until rotation gives it one.
    ordered = list(registry.queries())
    window = set(ordered[:registry.DRIVER_WINDOW])
    covered = window | _committed_rows() | set(registry.DEFERRED_VERIFICATION)
    uncovered = [n for n in ordered if n not in covered]
    assert not uncovered, (
        f"queries with no driver correctness signal (not in this round's "
        f"first-{registry.DRIVER_WINDOW} window, no committed row, and not "
        f"explicitly deferred in registry.DEFERRED_VERIFICATION): "
        f"{uncovered}")


def test_window_prefers_unproven_queries():
    # Queries that have never had a GREEN (hash or rows-only) driver row
    # must sit inside the window — they are the ones needing proof.
    green: set[str] = set()
    for p in _correctness_files():
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                green.add(name)
    ordered = list(registry.queries())
    window = set(ordered[:registry.DRIVER_WINDOW])
    never_proven = [n for n in ordered if n not in green]
    outside = [n for n in never_proven
               if n not in window and n not in registry.DEFERRED_VERIFICATION]
    assert not outside, f"never-proven queries outside driver window: {outside}"


def test_driver_window_size_matches_newest_correctness():
    # DRIVER_WINDOW = 50 is OBSERVED from the driver's behavior, not
    # contracted. Probe it every round: the newest committed CORRECTNESS
    # file must hold exactly DRIVER_WINDOW rows, and every row must name a
    # query that was registered (names can lag one round behind the current
    # ordering — the file reflects LAST round's registration order — so we
    # assert the size invariant, which is what the priority list depends
    # on, not name-for-name prefix equality).
    files = _correctness_files()
    assert files, "no committed CORRECTNESS files to probe"
    newest = json.loads(files[-1].read_text())
    assert len(newest) == registry.DRIVER_WINDOW, (
        f"driver window changed: newest CORRECTNESS file has {len(newest)} "
        f"rows but registry.DRIVER_WINDOW={registry.DRIVER_WINDOW} — update "
        f"DRIVER_WINDOW and re-plan the priority window")


def test_deferrals_are_current():
    # A deferral must reference a REGISTERED query that is actually outside
    # the window (a stale entry would mask a future silent demotion).
    registry._ensure_loaded()
    ordered = list(registry.queries())
    window = set(ordered[:registry.DRIVER_WINDOW])
    for name, reason in registry.DEFERRED_VERIFICATION.items():
        assert name in registry.QUERIES, f"deferred unknown query {name}"
        assert name not in window, f"deferred query {name} is IN the window"
        assert len(reason) > 40, f"deferral for {name} needs a real reason"


def test_staleness_bound():
    # The r5 freshness contract: no oracle-backed query's newest committed
    # driver signal may be more than STALE_BOUND rounds old unless it sits
    # in the CURRENT window (it refreshes this round) or is explicitly
    # deferred. `rotation_report.py --emit-priority` generates a window
    # satisfying this; the test makes hand-editing _PRIORITY below the
    # bound impossible.
    registry._ensure_loaded()
    newest_round: dict[str, int] = {}
    for p in _correctness_files():
        rnd = int(p.stem.split("_r")[-1])
        for name in json.loads(p.read_text()):
            newest_round[name] = max(newest_round.get(name, 0), rnd)
    assert newest_round, "no committed driver rounds"
    max_round = max(newest_round.values())
    ordered = list(registry.queries())
    window = set(ordered[:registry.DRIVER_WINDOW])
    too_stale = []
    for name in ordered:
        if registry.QUERIES[name].oracle is None:
            continue  # rows-only: rotated on the same cadence, not bound
        if name in window or name in registry.DEFERRED_VERIFICATION:
            continue
        age = max_round - newest_round.get(name, -10**6)
        if age >= registry.STALE_BOUND:
            too_stale.append((name, newest_round.get(name)))
    assert not too_stale, (
        f"oracle-backed queries whose newest driver signal is >= "
        f"{registry.STALE_BOUND} rounds old and that are NOT in this "
        f"round's window: {too_stale} — regenerate _PRIORITY with "
        f"`python tools/rotation_report.py --emit-priority`")


def test_stale_bound_feasible():
    # Pigeonhole feasibility (r6): each round refreshes at most
    # DRIVER_WINDOW signals and every oracle-backed query needs one at
    # least every STALE_BOUND rounds, so the bound is satisfiable only
    # while DRIVER_WINDOW * STALE_BOUND >= #registered queries. r5's
    # bound of 2 silently crossed this line (capacity 100 vs 162
    # queries) and forced a rolling deferral treadmill; this test makes
    # registration growth past capacity an explicit bound/window
    # decision instead.
    registry._ensure_loaded()
    capacity = registry.DRIVER_WINDOW * registry.STALE_BOUND
    assert capacity >= len(registry.QUERIES), (
        f"staleness contract infeasible: window {registry.DRIVER_WINDOW} x "
        f"bound {registry.STALE_BOUND} = {capacity} slots per cycle < "
        f"{len(registry.QUERIES)} registered queries — raise STALE_BOUND "
        f"(or split the window) before registering more")


def test_sentinels_are_registered():
    registry._ensure_loaded()
    unknown = [n for n in registry.SENTINELS if n not in registry.QUERIES]
    assert not unknown, f"SENTINELS naming unregistered queries: {unknown}"
