"""SURVEY §2 ↔ registry parity guard (VERDICT r03 item 3).

Round 3 shipped a key (`ts_rollup_multi_grain`) that was registered,
oracled, and plan-pinned but missing from SURVEY §2 — invisible to
anyone auditing contract coverage from the document. The documented
contract must equal the registry, both ways, at every commit.
"""

from __future__ import annotations

import re

import dbsuite_spark


def _survey_keys() -> set[str]:
    lines = open("/root/repo/SURVEY.md").read().split("\n")
    s = next(i for i, l in enumerate(lines) if l.startswith("## 2."))
    e = next(i for i, l in enumerate(lines) if l.startswith("## 3."))
    keys = set()
    for line in lines[s:e]:
        m = re.match(r"\|\s*`([a-z0-9_]+)`", line)
        if m:
            keys.add(m.group(1))
    return keys


def test_survey_section2_equals_registry():
    reg = set(dbsuite_spark.queries())
    doc = _survey_keys()
    assert reg - doc == set(), (
        f"registered but undocumented in SURVEY §2: {sorted(reg - doc)[:5]}"
    )
    assert doc - reg == set(), (
        f"documented in SURVEY §2 but not registered: {sorted(doc - reg)[:5]}"
    )
