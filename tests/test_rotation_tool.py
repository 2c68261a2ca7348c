"""Unit tests for the driver-window generator (tools/rotation_report.py
--emit-priority) — it became the authoritative source of _PRIORITY in r5,
so its selection rules get pinned against synthetic signal histories
(monkeypatched _signals; the real registry supplies the query universe).
"""

from __future__ import annotations

import pytest

from tools import rotation_report as rr


def _emit(monkeypatch, capsys, newest, ever_ok):
    monkeypatch.setattr(rr, "_signals", lambda: (dict(newest), set(ever_ok)))
    rr.emit_priority()
    out = capsys.readouterr().out
    return [line.split('"')[1] for line in out.splitlines()
            if line.strip().startswith('"')]


def _names():
    rr.registry._ensure_loaded()
    return list(rr.registry.QUERIES)


def test_all_fresh_emits_sentinels_first_then_window_size(monkeypatch, capsys):
    names = _names()
    newest = {n: ("green", "05") for n in names}
    chosen = _emit(monkeypatch, capsys, newest, names)
    assert len(chosen) == rr.registry.DRIVER_WINDOW
    assert len(set(chosen)) == len(chosen)
    # nothing is stale/unproven, so the sentinels take the lead slots
    assert chosen[:len(rr.registry.SENTINELS)] == rr.registry.SENTINELS


def test_failed_on_debut_lands_in_window(monkeypatch, capsys):
    # a query whose ONLY driver row is FAILED is unproven and must get a
    # re-check slot even though its signal is fresh (r5 review finding)
    names = _names()
    newest = {n: ("green", "05") for n in names}
    bad = names[len(names) // 2]
    newest[bad] = ("FAILED", "05")
    chosen = _emit(monkeypatch, capsys, newest, set(names) - {bad})
    assert bad in chosen
    assert chosen[0] == bad  # unproven group leads


def test_stale_oracle_backed_never_truncated_for_rows_only(monkeypatch,
                                                          capsys):
    # make EVERYTHING stale: binding = all oracle-backed; the droppable
    # rows-only tier must absorb the entire shortfall
    names = _names()
    rows_only = [n for n in names
                 if rr.registry.QUERIES[n].oracle is None]
    oracle_backed = [n for n in names if n not in set(rows_only)]
    if len(oracle_backed) <= rr.registry.DRIVER_WINDOW:
        pytest.skip("registry smaller than window")
    newest = {n: ("green" if n in set(oracle_backed) else "rows_only", "01")
              for n in names}
    # one fresh row pins max_round = 1 + STALE_BOUND, so every r01 signal
    # is exactly STALE_BOUND rounds old (binding whatever the bound is)
    newest[oracle_backed[0]] = (
        "green", f"{1 + rr.registry.STALE_BOUND:02d}")
    monkeypatch.setattr(rr, "_signals",
                        lambda: (dict(newest), set(names)))
    with pytest.raises(SystemExit):
        rr.emit_priority()  # binding overflow must ERROR, never drop
    err = capsys.readouterr().err
    assert "need a slot" in err


def test_regressed_query_returns_to_window(monkeypatch, capsys):
    names = _names()
    newest = {n: ("green", "05") for n in names}
    reg = names[-1]
    newest[reg] = ("FAILED", "05")  # failed AFTER an earlier OK
    chosen = _emit(monkeypatch, capsys, newest, set(names))  # ever_ok: all
    assert reg in chosen
