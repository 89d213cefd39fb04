"""dbtidysql-equivalent SQL pretty-printer (the reference's reformatter
tool, built on its tokenizer/parser [PUBLIC, module-level; checkout empty —
SURVEY §0]).

We write no SQL parser (SURVEY §3.2 — Spark's ANTLR parser does the
parsing); this is the *formatting* surface only: a tokenizer-based
reformatter that uppercases keywords, collapses whitespace, strips
comments, and breaks lines before major clauses. The formatter is a pure
string→string function, so at scale it runs as an Arrow-batched pandas UDF
over a DataFrame of statements (format a million warehouse scripts in one
pass) — the key exercises exactly that path.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.etl.script_runner import split_statements
from dbsuite_spark.registry import query

# Clause starters that open a new line at indent 0 / 1.
_MAJOR = (
    "WITH", "SELECT", "FROM", "WHERE", "GROUP BY", "HAVING",
    "ORDER BY", "LIMIT", "UNION ALL", "UNION", "EXCEPT", "INTERSECT",
)
_INDENTED = (
    "LEFT OUTER JOIN", "RIGHT OUTER JOIN", "FULL OUTER JOIN",
    "LEFT JOIN", "RIGHT JOIN", "INNER JOIN", "CROSS JOIN", "JOIN", "ON",
)

_KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "union", "all", "except", "intersect", "join", "inner", "left",
    "right", "full", "outer", "cross", "on", "as", "and", "or", "not",
    "in", "exists", "between", "like", "is", "null", "case", "when",
    "then", "else", "end", "distinct", "with", "asc", "desc", "sum",
    "avg", "min", "max", "count",
}

_TOKEN = re.compile(
    r"'(?:[^']|'')*'"      # string literal (with '' escape)
    r'|"(?:[^"]|"")*"'     # quoted identifier
    r"|--[^\n]*"           # line comment
    r"|/\*.*?\*/"          # block comment
    r"|[A-Za-z_][A-Za-z0-9_.]*"  # word
    r"|\d+(?:\.\d+)?"      # numeric literal
    r"|<>|!=|>=|<=|\|\|"   # multi-char operators
    r"|\S",                # any other single char
    re.DOTALL,
)


def _tokens(stmt: str) -> list[str]:
    out = []
    for tok in _TOKEN.findall(stmt):
        if tok.startswith("--") or tok.startswith("/*"):
            continue  # comments are dropped, as dbtidysql's tidy mode did
        if tok[0].isalpha() or tok[0] == "_":
            out.append(tok.upper() if tok.lower() in _KEYWORDS else tok)
        else:
            out.append(tok)
    return out


def format_sql(stmt: str) -> str:
    """Reformat one statement: keywords uppercased, comments stripped,
    one space between tokens (none before , ) or after ( ), and a newline
    before each major clause; joins/ON indented two spaces."""
    toks = _tokens(stmt)
    text = ""
    i = 0
    while i < len(toks):
        # longest clause-keyword match at this position
        matched = None
        for phrase in sorted(
            _MAJOR + _INDENTED, key=lambda p: -len(p.split())
        ):
            words = phrase.split()
            if [w.upper() for w in toks[i : i + len(words)]] == words:
                matched = phrase
                break
        if matched:
            indent = "  " if matched in _INDENTED else ""
            text = (text.rstrip() + "\n" if text else "") + indent + matched
            i += len(matched.split())
            continue
        tok = toks[i]
        if tok in {",", ")", ";"}:
            text = text.rstrip() + tok
        elif text.endswith("(") or text == "" or text.endswith("\n"):
            text += tok
        else:
            text += " " + tok
        i += 1
    return text.strip()


# Fixed demonstration script (what dbtidysql would be pointed at): messy
# casing, stray comments, collapsed whitespace, a join and a set op.
DEMO_SCRIPT = """
select o_orderkey,o_totalprice from orders where o_totalprice>100 -- big
order by o_totalprice desc limit 5;
/* enrich */ select c.c_name, o.o_orderkey from customer c
  inner join orders o on o.o_custkey=c.c_custkey where c.c_acctbal>0;
select n_name from nation union all select r_name from region;
"""


def _expected() -> list[tuple[int, str]]:
    return [
        (i, format_sql(s))
        for i, s in enumerate(split_statements(DEMO_SCRIPT))
    ]


def _values_oracle() -> str:
    rows = ",\n".join(
        "({}, '{}')".format(i, s.replace("'", "''"))
        for i, s in _expected()
    )
    return (
        "SELECT CAST(stmt_id AS INT) AS stmt_id, formatted\n"
        f"FROM (VALUES {rows}) AS t(stmt_id, formatted)"
    )


@query("etl_sql_format", oracle=_values_oracle(), category="K")
def etl_sql_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbtidysql parity: split the demo script with the dbexec splitter,
    reformat every statement through the pure formatter as an
    Arrow-batched pandas UDF (the distributed path — same function would
    format millions of stored scripts), return (stmt_id, formatted). The
    oracle is the expected text computed from the same pure function
    driver-side, so the check proves the distributed round-trip is
    faithful."""

    @F.pandas_udf("string")
    def fmt(col: pd.Series) -> pd.Series:
        return col.map(format_sql)

    stmts = split_statements(DEMO_SCRIPT)
    df = spark.createDataFrame(
        list(enumerate(stmts)), "stmt_id int, raw string"
    )
    return df.select("stmt_id", fmt("raw").alias("formatted"))
