"""Unit tests for the dbexec-equivalent statement splitter + policy engine
(the one hand-written parser in the repo, SURVEY §7.2)."""

from __future__ import annotations

from dbsuite_spark.etl.script_runner import (
    run_script,
    split_statements,
    substitute_vars,
)


def test_split_basic():
    assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]


def test_split_semicolon_in_string():
    stmts = split_statements("SELECT ';' AS x; SELECT 2")
    assert stmts == ["SELECT ';' AS x", "SELECT 2"]


def test_split_escaped_quote():
    stmts = split_statements("SELECT 'a;''b;' AS x; SELECT 2")
    assert stmts == ["SELECT 'a;''b;' AS x", "SELECT 2"]


def test_split_line_comment():
    stmts = split_statements("SELECT 1 -- trailing; not a split\n; SELECT 2")
    assert stmts == ["SELECT 1", "SELECT 2"]


def test_split_block_comment():
    stmts = split_statements("SELECT /* ; */ 1; SELECT 2")
    assert stmts == ["SELECT  1", "SELECT 2"]


def test_split_double_quoted_identifier():
    stmts = split_statements('SELECT 1 AS "a;b"; SELECT 2')
    assert stmts == ['SELECT 1 AS "a;b"', "SELECT 2"]


def test_substitute_vars():
    sql = substitute_vars(
        "SELECT * FROM t WHERE x > ${lo} AND y < ${hi} AND z = ${missing}",
        {"lo": "1", "hi": "2"},
    )
    assert sql == "SELECT * FROM t WHERE x > 1 AND y < 2 AND z = ${missing}"


def test_on_error_stop_vs_continue(spark):
    script = "SELECT 1 AS a; SELECT broken FROM nowhere; SELECT 2 AS b"
    stop = run_script(spark, script, on_error="stop")
    assert [r.status for r in stop.results] == ["ok", "error", "skipped"]
    cont = run_script(spark, script, on_error="continue")
    assert [r.status for r in cont.results] == ["ok", "error", "ok"]
    assert cont.last_df.collect()[0].b == 2


def test_retry_counts(spark):
    res = run_script(spark, "SELECT broken FROM nowhere", retries=2)
    assert res.results[0].attempts == 3
    assert res.results[0].status == "error"


def test_format_sql_idempotent():
    from dbsuite_spark.etl.sql_format import DEMO_SCRIPT, format_sql
    from dbsuite_spark.etl.script_runner import split_statements

    for s in split_statements(DEMO_SCRIPT):
        once = format_sql(s)
        assert format_sql(once) == once


def test_format_sql_preserves_literals_and_strips_comments():
    from dbsuite_spark.etl.sql_format import format_sql

    out = format_sql("select 'It''s; raw' as s -- trailing\nfrom t")
    assert "'It''s; raw'" in out          # literal untouched (incl. ; and case)
    assert "trailing" not in out          # comment stripped
    assert out.startswith("SELECT")       # keyword uppercased
