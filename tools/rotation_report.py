"""Driver-window rotation report: what the next round's _PRIORITY should
contain.

Reads every committed CORRECTNESS_r*.json and the live registry, and
prints, per registered query: its best driver signal so far (green hash /
rows-only / never-checked) and the round of its newest row. The rotation
rule the registry comment documents — never-green queries and new
registrations must sit inside the DRIVER_WINDOW, everything else rotates
by staleness — becomes mechanical with this list.

Usage:
  python tools/rotation_report.py                  # per-query signal table
  python tools/rotation_report.py --emit-priority  # print the NEXT round's
      _PRIORITY block, generated from signal age (paste into registry.py).

Generation rule (also enforced by tests/test_registry_guard.py::
test_staleness_bound and test_window_prefers_unproven_queries):
  1. UNPROVEN queries — no OK row ever: new registrations AND
     failed-on-debut — in registration order;
  2. regressed queries (newest committed row FAILED after an earlier OK);
  3. oracle-backed queries whose newest signal is >= STALE_BOUND rounds
     old (oldest signal first). Groups 1-3 are BINDING — the tool errors
     if they exceed the window, because a guard test would fail for any
     left out;
  4. rows-only queries at the same staleness (weaker signal, same
     rotation cadence, but explicitly the droppable tier under window
     pressure — never silently traded against a binding entry);
  5. registry.SENTINELS not already included (one per long-stable
     operator family, regression tripwires);
  6. remaining slots fill oldest-signal-first.
Reads COMMITTED CORRECTNESS files only (git-pinned, like the guard
tests): a partial mid-round file must not mark queries fresh.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kafka_flink_processing_spark.plans import registry  # noqa: E402


def _classify(row: dict) -> str:
    if row.get("hash_match") is True:
        return "green"
    if row.get("err") == "no_oracle":
        # rows-only contract: the driver records err='no_oracle' with the
        # Spark row count and NULL match fields — a HEALTHY row for a
        # query that ships no oracle, not a failure
        return "rows_only"
    return "FAILED"


def _correctness_files() -> list:
    """COMMITTED CORRECTNESS files only (same git-pinning as
    tests/test_registry_guard.py, and for the same reason: a partial,
    untracked mid-round file must not masquerade as a finished round —
    here it would mark half-recorded queries fresh and emit a window that
    omits genuinely stale ones)."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"], cwd=REPO,
            capture_output=True, text=True, check=True).stdout.split()
        if out:
            return [REPO / f for f in sorted(out)]
    except (OSError, subprocess.CalledProcessError):
        pass
    return sorted(REPO.glob("CORRECTNESS_r*.json"))


def _signals() -> tuple[dict[str, tuple[str, str]], set[str]]:
    """name -> (newest signal, round string); plus the ever-OK set."""
    newest: dict[str, tuple[str, str]] = {}
    ever_ok: set[str] = set()
    for p in _correctness_files():
        rnd = p.stem.split("_r")[-1]
        for name, row in json.loads(p.read_text()).items():
            sig = _classify(row)
            newest[name] = (sig, rnd)  # files sorted: later rounds win
            if sig != "FAILED":
                ever_ok.add(name)
    return newest, ever_ok


def emit_priority() -> None:
    """Print the next round's _PRIORITY block, generated mechanically."""
    registry._ensure_loaded()
    newest, ever_ok = _signals()
    reg_order = list(registry.QUERIES)  # registration order, not windowed
    max_round = max((int(r) for _, r in newest.values()), default=0)
    window = registry.DRIVER_WINDOW

    def age(name: str) -> int:
        if name not in newest:
            return 10**6  # never checked: infinitely stale
        return max_round - int(newest[name][1])

    # "unproven" = no OK row ever: covers both never-checked registrations
    # AND failed-on-debut queries (a FAILED-only history needs a re-check
    # slot just as urgently — and test_window_prefers_unproven_queries
    # requires both kinds inside the window)
    unproven = [n for n in reg_order if n not in ever_ok]
    regressed = [n for n in reg_order
                 if newest.get(n, ("", ""))[0] == "FAILED" and n in ever_ok]
    oracle_backed = {n for n in reg_order
                     if registry.QUERIES[n].oracle is not None}
    stale = [n for n in reg_order
             if n not in unproven and n not in regressed
             and age(n) >= registry.STALE_BOUND]
    stale.sort(key=lambda n: (-age(n), reg_order.index(n)))
    demand: list[str] = []
    for n in unproven + regressed + stale:
        if n not in demand:
            demand.append(n)
    # BINDING entries must fit or the guard tests fail on the pasted
    # output: every unproven/regressed query (any oracle mode — the
    # unproven-in-window test does not care), plus oracle-backed stale
    # (the staleness test binds only those). Rows-only STALE entries are
    # the droppable tier — they rotate on the same cadence but yield
    # first under window pressure.
    binding = [n for n in demand
               if (n in unproven or n in regressed or n in oracle_backed)
               and n not in registry.DEFERRED_VERIFICATION]
    droppable = [n for n in demand if n not in binding]
    if len(binding) > window:
        print(f"ERROR: {len(binding)} queries need a slot this round "
              f"(unproven/regressed + oracle-backed stale) but the window "
              f"holds {window}. Either raise STALE_BOUND, defer explicitly "
              f"in DEFERRED_VERIFICATION, or accept a guard-test failure.",
              file=sys.stderr)
        sys.exit(1)
    chosen = binding + droppable[:window - len(binding)]
    for n in registry.SENTINELS:        # family tripwires, then backfill
        if len(chosen) >= window:
            break
        if n not in chosen:
            chosen.append(n)
    rest = [n for n in reg_order if n not in chosen]
    rest.sort(key=lambda n: (-age(n), reg_order.index(n)))
    chosen.extend(rest[:window - len(chosen)])

    print(f"# generated by tools/rotation_report.py --emit-priority "
          f"(newest committed round: r{max_round:02d})")
    print("_PRIORITY: list[str] = [")
    for n in chosen:
        sig, rnd = newest.get(n, ("never", "-"))
        print(f'    "{n}",  # {sig} r{rnd}')
    print("]")


def main() -> None:
    registry._ensure_loaded()
    newest, ever_ok = _signals()
    ordered = list(registry.queries())
    window = set(ordered[:registry.DRIVER_WINDOW])
    print(f"{'query':42s} {'newest':10s} {'round':6s} {'ever_ok':8s} "
          f"{'in_window':9s}")
    never, regressed = [], []
    for name in ordered:
        sig, rnd = newest.get(name, ("never", "-"))
        if name not in ever_ok:
            never.append(name)
        if sig == "FAILED" and name in ever_ok:
            regressed.append(name)
        print(f"{name:42s} {sig:10s} {rnd:6s} "
              f"{'yes' if name in ever_ok else '':8s} "
              f"{'YES' if name in window else ''}")
    outside = [n for n in never if n not in window
               and n not in registry.DEFERRED_VERIFICATION]
    print(f"\nnever-ok: {len(never)}; "
          f"outside the window (MUST be empty): {outside}")
    print(f"regressed (newest row FAILED after an earlier OK — put back "
          f"in the window): {regressed}")


if __name__ == "__main__":
    if "--emit-priority" in sys.argv:
        emit_priority()
    else:
        main()
