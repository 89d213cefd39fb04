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
