"""Order-insensitive result comparison mirroring the driver's t2 gate
(SURVEY §5.2): sort columns by name, canonicalize values, compare the row
multisets exactly. Exact float equality is deliberate — queries must be
designed (decimal-exact sums, explicit rounding) so both engines produce
bit-identical doubles; anything looser would hide driver hash mismatches.

Driver-faithfulness (round-2 hardening): the real driver builds a pandas
frame from the raw rows and ``sort_values``/hashes it. That path *crashes*
on list/map/struct values (``TypeError: unhashable type: 'list'``) and
hashes ``Decimal`` objects by their engine-specific rendering — both
confirmed as round-1 red keys (CORRECTNESS_r01.json). The round-1 version
of this module silently canonicalized those values (lists → joined strings,
Decimal → float), so the local sim was green where the driver was red.
This version REFUSES them instead: a Decimal, list, tuple, dict, bytes/
bytearray (round-4 red key: pandas ``sort_values`` raises on bytearray),
or numpy array in any final value raises ``HashUnsafeValue``, so local
green implies driver green.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


class HashUnsafeValue(TypeError):
    """A final-projection value the driver's canonicalizer cannot hash
    portably: Decimal (engine-specific rendering) or any nested container
    (pandas sort_values crash). Fix the query, not the comparator."""


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        raise HashUnsafeValue(
            "Decimal in final projection — cast to DOUBLE (driver hashes "
            "Decimals by engine-specific rendering; round-1 red key)"
        )
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple, dict, set)):
        raise HashUnsafeValue(
            f"nested {type(v).__name__} in final projection — serialize or "
            "explode it (driver's pandas canonicalizer crashes on it; "
            "round-1 red keys)"
        )
    if isinstance(v, (bytes, bytearray)):
        raise HashUnsafeValue(
            "bytes in final projection — project lower(hex(col)) instead "
            "(driver's pandas sort_values dies on bytearray: TypeError "
            "unhashable; round-4 red key media_attach_binary)"
        )
    if type(v).__module__ == "numpy":  # ndarray or numpy scalar leaking out
        import numpy as np

        if isinstance(v, np.ndarray):
            raise HashUnsafeValue("numpy array in final projection")
        return canon(v.item())
    return f"s:{v}"


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, [tuple(canon(row[c]) for c in cols) for row in df.collect()]


def duckdb_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return cols, rows


def assert_match(df, con, sql, key=""):
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duckdb_rows(con, sql)
    assert s_cols == d_cols, f"{key}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{key}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
    if s_sorted != d_sorted:
        diffs = [
            (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
        ][:5]
        raise AssertionError(
            f"{key}: value mismatch; first diffs (spark, duckdb): {diffs}"
        )
