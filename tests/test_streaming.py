"""Streaming-specific checks beyond the differential oracle (SURVEY §5.3.4):
the weak-checked watermark-append key must emit a subset of its batch twin,
and a healthy fraction of it (the cadence is 6 time-ranged files, so the
watermark crosses most window ends before end-of-stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsuite_spark.streaming.streams import stream_watermark_append
from dbsuite_spark.tables import t


def test_watermark_append_subset_of_batch_twin(spark, sf_dir):
    emitted = stream_watermark_append(spark, sf_dir).collect()
    batch = {
        (r.window_start, r.window_end, r.event_type, r.n)
        for r in (
            t(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type",
                "n",
            )
        ).collect()
    }
    got = {(r.window_start, r.window_end, r.event_type, r.n) for r in emitted}
    assert got <= batch, "append emitted a row the batch twin doesn't have"
    assert len(got) >= 0.5 * len(batch), (
        f"append emitted only {len(got)}/{len(batch)} windows"
    )


def test_outer_join_emits_both_populations(spark, sf_dir):
    """Left-outer stream-stream join: matched pairs AND watermark-expired
    NULL rows must both be present, and no purchase may appear both
    matched and NULL."""
    from pyspark.sql import functions as F

    import dbsuite_spark

    out = (
        dbsuite_spark.all_specs()["stream_stream_outer_join"]
        .fn(spark, sf_dir)
        .cache()
    )
    matched = out.filter(F.col("click_id").isNotNull())
    nulls = out.filter(F.col("click_id").isNull())
    assert matched.count() > 0, "no matched pairs"
    assert nulls.count() > 0, "watermark never expired any left row"
    overlap = (
        out.groupBy("purchase_id")
        .agg(
            F.sum(F.col("click_id").isNull().cast("int")).alias("n_null"),
            F.sum(F.col("click_id").isNotNull().cast("int")).alias("n_hit"),
        )
        .filter((F.col("n_null") > 0) & (F.col("n_hit") > 0))
        .count()
    )
    assert overlap == 0, "a matched purchase also emitted a NULL row"
    out.unpersist()


def test_tumbling_count_batch_boundary_invariant(spark, sf_dir):
    """Complete-mode aggregation must be independent of micro-batch
    boundaries: the same events landed as 1 file vs 5 files (1 file per
    trigger → 1 vs 5 micro-batches) produce identical final windows."""
    from pyspark.sql import functions as F

    from dbsuite_spark.streaming.streams import (
        _land_events,
        _read_stream,
        _run_to_memory,
    )

    def run(n_files, name):
        path, src = _land_events(
            spark, sf_dir, f"tumbling_inv_{n_files}", n_files=n_files
        )
        sdf = (
            _read_stream(spark, path, src.schema)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
            )
        )
        out = _run_to_memory(spark, sdf, name, "complete")
        return sorted(tuple(r) for r in out.collect())

    assert run(1, "mem_inv_one") == run(5, "mem_inv_five")


def test_session_window_landing_layout_invariant(spark, sf_dir):
    """Round-13 optimization law: the session-window result must be
    identical whether the landing zone is range-partitioned by ts or
    round-robin (``ranged=False`` — the production key's layout since the
    single-trigger complete-mode consumer never observes file
    boundaries). Guards the ranged=False rewrite of
    ``stream_session_window``."""
    from pyspark.sql import functions as F

    from dbsuite_spark.streaming.streams import (
        GAP,
        _land_events,
        _read_stream,
        _run_to_memory,
    )

    def run(ranged, name):
        path, src = _land_events(
            spark, sf_dir, f"session_inv_{int(ranged)}", n_files=3,
            ranged=ranged,
        )
        sdf = (
            _read_stream(spark, path, src.schema, files_per_trigger=3)
            .groupBy(F.session_window("ts", GAP), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
            )
        )
        out = _run_to_memory(spark, sdf, name, "complete")
        return sorted(tuple(r) for r in out.collect())

    assert run(True, "mem_sess_rng") == run(False, "mem_sess_rr")
