"""dbexec-equivalent SQL script engine (SURVEY §2K, §3.2).

Reference semantics: dbsuite's ``dbexec`` tool — run SQL script files
against the warehouse with statement splitting, variable substitution,
per-statement on-error policy with retry, and a multi-script mode that
executes scripts in dependency order, parallelizing independent scripts
[PUBLIC, module-level; checkout empty — SURVEY §0].

Spark-first: each statement is dispatched to ``spark.sql`` — Spark's ANTLR
parser/Catalyst replace DB2's engine, so the only parsing here is the
statement *splitter* (terminators inside string literals and comments must
not split — the one hand-written tokenizer in this repo, SURVEY §7.2).
Threads share the thread-safe SparkSession; DAG waves run concurrent
``spark.sql`` calls, which a real cluster overlaps across executors.
"""

from __future__ import annotations

import re
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


def split_statements(script: str, terminator: str = ";") -> list[str]:
    """Split a SQL script into statements on ``terminator``, honoring
    single/double-quoted literals (with '' escape), line comments (``--``)
    and block comments (``/* */``)."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        two = script[i : i + 2]
        if ch in ("'", '"'):  # quoted literal / identifier
            quote = ch
            buf.append(ch)
            i += 1
            while i < n:
                buf.append(script[i])
                if script[i] == quote:
                    if script[i : i + 2] == quote * 2:  # escaped quote
                        buf.append(script[i + 1])
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if two == "--":
            j = script.find("\n", i)
            i = n if j < 0 else j  # drop comment, keep newline
            continue
        if two == "/*":
            j = script.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if ch == terminator:
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def substitute_vars(sql: str, variables: dict[str, str]) -> str:
    """dbexec-style ``${name}`` substitution; unknown names left intact."""
    return re.sub(
        r"\$\{(\w+)\}",
        lambda m: str(variables.get(m.group(1), m.group(0))),
        sql,
    )


@dataclass
class StatementResult:
    statement: str
    status: str  # ok | error | skipped
    attempts: int
    error: str = ""


@dataclass
class ScriptResult:
    results: list[StatementResult] = field(default_factory=list)
    last_df: DataFrame | None = None

    @property
    def ok(self) -> bool:
        return all(r.status == "ok" for r in self.results)


def run_script(
    spark: SparkSession,
    script: str,
    variables: dict[str, str] | None = None,
    on_error: str = "stop",  # stop | continue
    retries: int = 0,
    retry_wait: float = 0.0,
) -> ScriptResult:
    """Execute a multi-statement script through ``spark.sql`` with dbexec's
    policy knobs. Returns per-statement outcomes plus the final statement's
    DataFrame (lazily — nothing is collected here)."""
    variables = variables or {}
    res = ScriptResult()
    stopped = False
    for stmt in split_statements(script):
        if stopped:
            res.results.append(StatementResult(stmt, "skipped", 0))
            continue
        sql = substitute_vars(stmt, variables)
        attempt, err = 0, ""
        while True:
            attempt += 1
            try:
                res.last_df = spark.sql(sql)
                res.results.append(StatementResult(sql, "ok", attempt))
                break
            except Exception as exc:  # noqa: BLE001 — policy boundary
                err = str(exc).split("\n")[0]
                if attempt <= retries:
                    time.sleep(retry_wait)
                    continue
                res.results.append(
                    StatementResult(sql, "error", attempt, err)
                )
                if on_error == "stop":
                    stopped = True
                break
    return res


def run_script_dag(
    spark: SparkSession,
    scripts: dict[str, str],
    depends_on: dict[str, list[str]],
    variables: dict[str, str] | None = None,
    max_workers: int = 4,
) -> dict[str, ScriptResult]:
    """dbexec multi-script mode: topological waves, independent scripts in
    parallel threads over the shared (thread-safe) SparkSession."""
    sorter = TopologicalSorter(
        {name: depends_on.get(name, []) for name in scripts}
    )
    sorter.prepare()
    results: dict[str, ScriptResult] = {}
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        while sorter.is_active():
            wave = list(sorter.get_ready())
            futs = {
                name: pool.submit(
                    run_script, spark, scripts[name], variables
                )
                for name in wave
            }
            for name, fut in futs.items():
                results[name] = fut.result()
                sorter.done(name)
    return results
