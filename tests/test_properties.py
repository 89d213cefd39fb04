"""Property-based algebraic invariants (SURVEY §5.3.3) — hypothesis
generates small relations; each property is a law the engine must satisfy
for ANY input, complementing the fixture-bound differential tests.
Example counts are kept low because every example runs a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@given(rows=ROWS)
@SETTINGS
def test_filter_commutes_with_project(spark, rows):
    df = _df(spark, rows)
    a = df.select("k").filter(F.col("k") > 2)
    b = df.filter(F.col("k") > 2).select("k")
    assert sorted(r.k for r in a.collect()) == sorted(
        r.k for r in b.collect()
    )


@given(rows=ROWS, rows2=ROWS)
@SETTINGS
def test_union_all_count_additive(spark, rows, rows2):
    a, b = _df(spark, rows), _df(spark, rows2)
    assert a.unionAll(b).count() == a.count() + b.count()


@given(rows=ROWS, rows2=ROWS)
@SETTINGS
def test_semi_join_equals_in_filter(spark, rows, rows2):
    a, b = _df(spark, rows), _df(spark, rows2)
    semi = a.join(b, "k", "left_semi")
    keys = {r.k for r in b.select("k").distinct().collect()}
    expect = [r for r in a.collect() if r.k in keys]
    assert sorted((r.k, r.v) for r in semi.collect()) == sorted(
        (r.k, r.v) for r in expect
    )


@given(rows=ROWS)
@SETTINGS
def test_unbounded_window_sum_equals_group_sum(spark, rows):
    df = _df(spark, rows)
    w = (
        Window.partitionBy("k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    via_window = {
        (r.k, r.s)
        for r in df.select("k", F.sum("v").over(w).alias("s")).collect()
    }
    via_group = {
        (r.k, r.s)
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert via_window == via_group


@given(rows=ROWS)
@SETTINGS
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.distinct()
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, once.distinct().collect())
    )


@given(rows=ROWS, rows2=ROWS)
@SETTINGS
def test_anti_plus_semi_partition(spark, rows, rows2):
    """semi ∪ anti partitions the left relation exactly."""
    a, b = _df(spark, rows), _df(spark, rows2)
    semi = a.join(b, "k", "left_semi")
    anti = a.join(b, "k", "left_anti")
    combined = sorted(
        [(r.k, r.v) for r in semi.collect()]
        + [(r.k, r.v) for r in anti.collect()]
    )
    assert combined == sorted((r.k, r.v) for r in a.collect())


def test_sessionize_gap_invariants(spark, sf_dir):
    """Within a session no consecutive gap exceeds 30 min; across
    consecutive sessions of one user the start-to-previous-end gap
    exceeds 30 min; per-user event counts are conserved."""
    from pyspark.sql import functions as F

    from dbsuite_spark.operators.analytics import win_sessionize
    from dbsuite_spark.tables import t

    sess = win_sessionize(spark, sf_dir).collect()
    per_user = {}
    for r in sess:
        per_user.setdefault(r.user_id, []).append(r)
    gap = 30 * 60
    for user, rows in per_user.items():
        rows.sort(key=lambda r: r.session_seq)
        for a, b in zip(rows, rows[1:]):
            delta = (b.session_start - a.session_end).total_seconds()
            assert delta > gap, (
                f"user {user}: sessions {a.session_seq}->{b.session_seq} "
                f"gap {delta}s should exceed {gap}s"
            )
    n_events = sum(r.n_events for r in sess)
    assert n_events == t(spark, sf_dir, "events").count()
    # every session's span is consistent with its event count
    assert all(r.session_start <= r.session_end for r in sess)


def test_asof_nearest_is_truly_nearest(spark, sf_dir):
    """For every matched purchase, no same-user click may be strictly
    closer than the reported nearest, and the match must exist in the
    click set."""
    import dbsuite_spark
    from dbsuite_spark.tables import t

    res = dbsuite_spark.all_specs()["join_asof_nearest"].fn(spark, sf_dir)
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").alias("pts"), "user_id"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    joined = res.join(p, "event_id")
    dist = F.abs(F.unix_micros("pts") - F.unix_micros("nearest_click_ts"))
    closer = (
        joined.join(c, joined.user_id == c.cu)
        .filter(F.col("cts") != F.col("pts"))
        .filter(
            F.abs(F.unix_micros("pts") - F.unix_micros("cts")) < dist
        )
    )
    assert closer.count() == 0, "a strictly closer click exists"
    matched = joined.filter(F.col("nearest_click_ts").isNotNull())
    valid = matched.join(
        c,
        (matched.user_id == c.cu)
        & (matched.nearest_click_ts == c.cts),
        "left_semi",
    )
    assert valid.count() == matched.count(), "match not an actual click"


def test_ewma_bounded_by_series_extremes(spark, sf_dir):
    """Every EWMA prefix value must lie within [min, max] of its series —
    the convex-combination invariant of the recursion."""
    import dbsuite_spark

    df = dbsuite_spark.all_specs()["ts_ewma"].fn(spark, sf_dir)
    w = Window.partitionBy("event_type")
    out = df.select(
        "event_type",
        "ewma",
        F.min("v").over(w).alias("lo"),
        F.max("v").over(w).alias("hi"),
    ).filter((F.col("ewma") < F.col("lo")) | (F.col("ewma") > F.col("hi")))
    assert out.count() == 0


def test_sliding_median_within_frame_bounds(spark, sf_dir):
    """med24 must lie within [min, max] of the 24-row frame it summarizes."""
    import dbsuite_spark

    df = dbsuite_spark.all_specs()["win_sliding_median"].fn(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-23, Window.currentRow)
    )
    out = df.select(
        "med24",
        F.min("v").over(w).alias("lo"),
        F.max("v").over(w).alias("hi"),
    ).filter(
        (F.col("med24") < F.col("lo")) | (F.col("med24") > F.col("hi"))
    )
    assert out.count() == 0


def test_split_partitions_and_leak_check_consistent(spark, sf_dir):
    """Splits partition the corpus (every doc exactly one split) and every
    reported leaking pair really straddles two different splits."""
    import dbsuite_spark
    from dbsuite_spark.tables import t

    specs = dbsuite_spark.all_specs()
    split = specs["docs_train_test_split"].fn(spark, sf_dir)
    assert split.count() == t(spark, sf_dir, "documents").count()
    assert split.select("doc_id").distinct().count() == split.count()
    leaks = specs["docs_split_leakage_check"].fn(spark, sf_dir)
    assert leaks.filter(F.col("split1") == F.col("split2")).count() == 0


@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=40),  # n_tokens per doc
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_pack_assignment_matches_python_reference(spark, toks):
    """Concat-and-chunk packing (single shard) must agree with a direct
    sequential Python packer for ANY token-count sequence."""
    BUDGET = 16
    rows = [(i, n) for i, n in enumerate(toks)]
    d = spark.createDataFrame(rows, "doc_id int, n_tokens bigint")
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in d.withColumn(
            "off", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
        .select(
            "doc_id",
            F.expr(f"off div {BUDGET}").alias("seq_id"),
            (F.col("off") % BUDGET).alias("seq_offset"),
        )
        .collect()
    }
    # sequential reference: walk the docs accumulating the global offset
    off = 0
    for i, n in enumerate(toks):
        assert got[i] == (off // BUDGET, off % BUDGET), f"doc {i}"
        off += n
