"""Category K — script-runner query keys (SURVEY §2K ``etl_script_runner``,
``etl_script_dag``): the dbexec execution engine driving real multi-
statement SQL through Spark. The engine itself lives in
``script_runner.py``; these keys exercise it end-to-end with scripts that
contain the hazards the splitter must survive (terminators inside literals
and comments, ${var} substitution, dependency ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbsuite_spark.etl.script_runner import run_script, run_script_dag
from dbsuite_spark.exact import BIGCOUNT, DSUM
from dbsuite_spark.registry import query
from dbsuite_spark.tables import register_views

_RUNNER_SCRIPT = """
-- dbexec-style warehouse script; this comment has a ; in it
CREATE OR REPLACE TEMP VIEW big_orders AS
SELECT o_orderkey, o_custkey, o_totalprice,
       ';' AS terminator_literal   /* a ; inside a string literal */
FROM orders
WHERE o_totalprice > ${min_price};

CREATE OR REPLACE TEMP VIEW cust_big AS
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS big_total,
       CAST(COUNT(*) AS BIGINT) AS n_big
FROM big_orders
GROUP BY o_custkey;

SELECT c_mktsegment,
       CAST(SUM(CAST(big_total AS DECIMAL(18,6))) AS DOUBLE) AS segment_total,
       CAST(SUM(n_big) AS BIGINT) AS n_orders
FROM cust_big
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query(
    "etl_script_runner",
    oracle=f"""
SELECT c_mktsegment,
       {DSUM('o_totalprice')} AS segment_total,
       {BIGCOUNT('*')} AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 150000
GROUP BY c_mktsegment
""",
    category="K",
)
def etl_script_runner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a 3-statement dbexec-style script (views → aggregate → final
    report) with ``${min_price}`` substitution; statements contain ``;``
    inside a comment and a string literal, proving the splitter. The oracle
    computes the same report in one SQL statement."""
    register_views(spark, sf_dir)
    res = run_script(
        spark, _RUNNER_SCRIPT, variables={"min_price": "150000"}
    )
    assert res.ok, [r.error for r in res.results if r.status == "error"]
    return res.last_df


_DAG_SCRIPTS = {
    "stage_orders": """
CREATE OR REPLACE TEMP VIEW dag_orders AS
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderstatus = 'F'
""",
    "stage_customers": """
CREATE OR REPLACE TEMP VIEW dag_customers AS
SELECT c_custkey, c_nationkey FROM customer
""",
    "mart": """
CREATE OR REPLACE TEMP VIEW dag_mart AS
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM dag_orders
JOIN dag_customers ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name;

SELECT * FROM dag_mart
""",
}


@query(
    "etl_script_dag",
    oracle=f"""
SELECT n_name,
       {DSUM('o_totalprice')} AS revenue,
       {BIGCOUNT('*')} AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
""",
    category="K",
)
def etl_script_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbexec multi-script mode: two independent staging scripts run in a
    parallel wave, then a dependent mart script joins their outputs. The
    oracle recomputes the mart in one statement."""
    register_views(spark, sf_dir)
    results = run_script_dag(
        spark,
        _DAG_SCRIPTS,
        depends_on={"mart": ["stage_orders", "stage_customers"]},
    )
    assert all(r.ok for r in results.values()), {
        k: [s.error for s in v.results if s.status == "error"]
        for k, v in results.items()
        if not v.ok
    }
    return results["mart"].last_df
