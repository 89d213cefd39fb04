"""Rotation-tool classification tests (VERDICT r03 items 1-2).

The round driver spends a ~50-key budget in registration order, so
``tools/rotate_order.py`` decides which keys get driver rows each round.
Two hard-won rules are pinned here:

1. A ``no_oracle`` row is WEAK, not green — the run produced rows but
   nothing was hash-compared. Weak keys must front-load (their next row
   upgrades them to hash-green now that every key carries a full SQL
   oracle), never park behind verified keys in VERIFY_LAST.
2. Green sticks across rounds, but any hard failure re-promotes the key
   to the very front regardless of an older green row.
"""

from __future__ import annotations

import importlib.util
import json
import sys


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "rotate_order", "/root/repo/tools/rotate_order.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text(json.dumps(rows))
    return str(p)


def test_no_oracle_rows_classify_weak_not_green(tmp_path):
    tool = _load_tool()
    f = _write(tmp_path, "r1.json", {
        "a": {"hash_match": True, "spark_rows": 5},
        "b": {"err": "no_oracle", "spark_rows": 5},
    })
    failed, weak, green, seen = tool.classify([f])
    assert failed == []
    assert weak == ["b"], "no_oracle must be weak (front-loaded), not green"
    assert green == ["a"]
    assert set(seen) == {"a", "b"}


def test_weak_upgrades_to_green_on_later_hash_match(tmp_path):
    tool = _load_tool()
    f1 = _write(tmp_path, "r1.json", {
        "a": {"err": "no_oracle", "spark_rows": 5},
    })
    f2 = _write(tmp_path, "r2.json", {
        "a": {"hash_match": True, "spark_rows": 5},
    })
    failed, weak, green, _ = tool.classify([f1, f2])
    assert (failed, weak, green) == ([], [], ["a"])


def test_hard_failure_repromotes_even_after_green(tmp_path):
    tool = _load_tool()
    f1 = _write(tmp_path, "r1.json", {
        "a": {"hash_match": True, "spark_rows": 5},
    })
    f2 = _write(tmp_path, "r2.json", {
        "a": {"hash_match": False, "spark_rows": 5, "err": "hash_mismatch"},
    })
    failed, weak, green, _ = tool.classify([f1, f2])
    assert failed == ["a"], "a later hard failure must re-promote"
    assert green == []


def test_green_sticks_across_rounds(tmp_path):
    tool = _load_tool()
    f1 = _write(tmp_path, "r1.json", {
        "a": {"hash_match": True, "spark_rows": 5},
    })
    # round 2 didn't reach "a" at all (no row) — stays green
    f2 = _write(tmp_path, "r2.json", {
        "b": {"hash_match": True, "spark_rows": 1},
    })
    failed, weak, green, _ = tool.classify([f1, f2])
    assert sorted(green) == ["a", "b"]


def test_check_mode_detects_staleness(tmp_path, monkeypatch):
    """``rotate_order.py --check`` is the round-START staleness gate: it
    exits non-zero when VERIFY_FIRST contains keys with green driver
    rows. It is deliberately NOT a pytest-time assertion against the
    real _order.py — after the round driver lands CORRECTNESS_r{N}.json
    the committed front block is *expected* to contain newly-green keys
    until the next round rotates, and a post-round pytest run must stay
    green."""
    tool = _load_tool()
    f = _write(tmp_path, "r1.json", {
        "tpch_q3_shipping_priority": {"hash_match": True, "spark_rows": 5},
    })
    # tpch_q3 is in the current committed VERIFY_FIRST (never verified as
    # of r03), so a fake green row for it must trip the check.
    assert tool.check_front([f]) != 0
    f2 = _write(tmp_path, "r2.json", {
        "not_a_registered_key": {"hash_match": True, "spark_rows": 5},
    })
    assert tool.check_front([f2]) == 0
