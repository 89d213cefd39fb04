"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Execution is forced with the `noop`
sink (full computation, no driver materialization) so timings measure the
distributed plan, not collect().
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: one representative per major category (extended as
# categories land). Keys not yet registered are skipped silently so this
# file never breaks mid-build.
HEADLINE = [
    "agg_groupby_basic",
    "agg_rollup",
    "agg_count_distinct",
    "pivot_values",
    "join_multiway_star",
    "join_asof",
    "join_bucketed_colocate",
    "join_dpp_partitioned",
    "sim_search_range",
    "win_topk_per_group",
    "win_running_total",
    "set_except_all",
    "fn_json_extract",
    "dedup_exact",
    "dedup_near_minhash",
    "sim_search_cosine_topk",
    "text_tfidf_topterms",
    "etl_scd2_dimension",
    "stream_session_window",
    # round 2 additions — one per new capability cluster
    "win_sessionize",
    "join_range_binned",
    "dedup_connected_components",
    "sim_embed_quantize",
    # composite TPC-H-shaped workloads
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_volume",
    "tpch_q9_product_type_profit",
    "tpch_q21_waiting_suppliers",
    # late round-2 additions
    "graph_pagerank_fixed",
    "events_funnel_conversion",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from dbsuite_spark.session import get_spark

    import dbsuite_spark

    spark = get_spark(app_name="dbsuite-bench")
    specs = dbsuite_spark.all_specs()

    from dbsuite_spark.tables import clear_session_cache

    def run(name: str, cold: bool = False) -> float:
        # cold=True forgets session-memoized substrates first, so every
        # timed run measures the key's OWN full plan cost — neither a
        # sibling headline key's warm cache (dedup_near_minhash after
        # dedup_connected_components) nor the key's own previous run
        # (VERDICT r08 ask #3). Both best-of-2 runs are cold: min()
        # still removes GC/compilation spikes, but never cache hits.
        if cold:
            clear_session_cache(spark)
        fn = specs[name].fn
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    # Warm the JVM/codegen path once (untimed).
    warm = next((k for k in HEADLINE if k in specs), None)
    if warm:
        run(warm)

    # Window-calibration sentinel (VERDICT r10 ask #3): the same bench
    # on the same code has read 21-38 s purely on host-window noise,
    # eating most of the 2x gate headroom. Two fixed probes make a
    # degraded window machine-detectable from the artifact itself:
    # a single-thread CPU microbench (md5 chain — pure compute, no I/O)
    # and a 32-way Spark scaling probe (range-sum over 32 partitions —
    # JVM task scheduling + thread contention). Expected bands are
    # documented in BASELINE.md; a reading far above band means "noisy
    # host", not "plan regression".
    def window_cal() -> dict:
        import hashlib

        t0 = time.perf_counter()
        h = b"calibrate"
        for _ in range(200_000):
            h = hashlib.md5(h).digest()
        cpu_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        spark.range(0, 64_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).write.format("noop").mode("overwrite").save()
        par32 = time.perf_counter() - t0
        return {
            "cpu_single_sec": round(cpu_single, 3),
            "spark_par32_sec": round(par32, 3),
        }

    cal = window_cal()

    # Best-of-2 per query: wall-clock on a shared box is noisy (transient
    # GC/compilation/contention spikes of 3-10x were observed); the min of
    # two runs measures the steady-state plan, which is the number that
    # scales to a real cluster.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        timings[name] = round(
            min(run(name, cold=True), run(name, cold=True)), 3
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "window_cal": cal,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
