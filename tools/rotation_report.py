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


def main() -> None:
    registry._ensure_loaded()
    rounds = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = p.stem.split("_r")[-1]
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") is True:
                sig = "green"
            elif row.get("err") == "no_oracle" and row.get("rows_match"):
                sig = "rows_only"
            else:
                sig = "FAILED"
            best, _ = rounds.get(name, ("never", ""))
            # green beats rows_only beats FAILED; newest round wins ties
            rank = {"never": 0, "FAILED": 1, "rows_only": 2, "green": 3}
            if rank[sig] >= rank[best]:
                rounds[name] = (sig, rnd)

    ordered = list(registry.queries())
    window = set(ordered[:registry.DRIVER_WINDOW])
    print(f"{'query':42s} {'signal':10s} {'round':6s} {'in_window':9s}")
    never = []
    for name in ordered:
        sig, rnd = rounds.get(name, ("never", "-"))
        if sig == "never":
            never.append(name)
        print(f"{name:42s} {sig:10s} {rnd:6s} "
              f"{'YES' if name in window else ''}")
    outside = [n for n in never if n not in window]
    print(f"\nnever-driver-checked: {len(never)}; "
          f"outside the window (MUST be empty or deferred): {outside}")


if __name__ == "__main__":
    main()
