"""Driver-window rotation report: what the next round's _PRIORITY should
contain.

Reads every committed CORRECTNESS_r*.json and the live registry, and
prints, per registered query: its best driver signal so far (green hash /
rows-only / never-checked) and the round of its newest row. The rotation
rule the registry comment documents — never-green queries and new
registrations must sit inside the DRIVER_WINDOW, everything else rotates
by staleness — becomes mechanical with this list.

Usage: python tools/rotation_report.py
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


def main() -> None:
    registry._ensure_loaded()
    newest: dict[str, tuple[str, str]] = {}   # name -> (signal, round)
    ever_ok: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = p.stem.split("_r")[-1]
        for name, row in json.loads(p.read_text()).items():
            sig = _classify(row)
            newest[name] = (sig, rnd)  # files sorted: later rounds win
            if sig != "FAILED":
                ever_ok.add(name)

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
    main()
