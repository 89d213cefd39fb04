"""Order-insensitive result comparison mirroring the driver's t2 gate
(SURVEY §5.2): sort columns by name, canonicalize values, compare the row
multisets exactly. Exact float equality is deliberate — queries must be
designed (decimal-exact sums, explicit rounding) so both engines produce
bit-identical doubles; anything looser would hide driver hash mismatches.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


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
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
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
