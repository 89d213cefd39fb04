"""Interleaved A/B: exploded-index MinHash signatures (current) vs
row-local array signatures (candidate change). Equality gate first.

Usage: python3 bench_logs/r13h_exp_minhash_variants.py [sf_dir] [rounds]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from dbsuite_spark.session import get_spark  # noqa: E402
from dbsuite_spark.tables import clear_session_cache, fan_out, t  # noqa: E402
from dbsuite_spark.pipeline.dedup import (  # noqa: E402
    BAND_BUCKET_CAP,
    BAND_SIZE,
    JACCARD_THRESHOLD,
    N_HASHES,
    _minhash_verified_pairs_build,
    _shingle_rows,
    shingles,
)

spark = get_spark(app_name="exp-minhash-rowlocal")
spark.sparkContext.setLogLevel("WARN")


def build_old(spark, sf_dir):
    return _minhash_verified_pairs_build(spark, sf_dir)


def build_new(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents").select("doc_id", "text"))
    docs_arr = (
        d.select("doc_id", shingles(F.col("text")).alias("arr"))
        .filter(F.size("arr") >= 1)
        .cache()
    )
    def _hash_j(seed):
        return lambda s: F.xxhash64(s, F.lit(seed))

    sig = docs_arr.select(
        "doc_id",
        *[
            F.array_min(F.transform("arr", _hash_j(j))).alias(f"h{j}")
            for j in range(N_HASHES)
        ],
    )
    n_bands = N_HASHES // BAND_SIZE
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                f"h{b * BAND_SIZE + r}"
                                for r in range(BAND_SIZE)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    wb = Window.partitionBy("band", "key")
    capped = (
        bands.withColumn("bn", F.count("*").over(wb))
        .filter(F.col("bn") <= BAND_BUCKET_CAP)
        .drop("bn")
    )
    buckets = (
        capped.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.d1", "p.d2")
        .distinct()
        .cache()
    )
    cand_docs = candidates.select(F.col("d1").alias("doc_id")).union(
        candidates.select(F.col("d2"))
    )
    cand_arrs = docs_arr.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    scored = (
        candidates.join(
            cand_arrs.select(
                F.col("doc_id").alias("d1"), F.col("arr").alias("a1")
            ),
            "d1",
        )
        .join(
            cand_arrs.select(
                F.col("doc_id").alias("d2"), F.col("arr").alias("a2")
            ),
            "d2",
        )
        .withColumn("ni", F.size(F.array_intersect("a1", "a2")))
        .select(
            "d1",
            "d2",
            (
                F.col("ni").cast("double")
                / (F.size("a1") + F.size("a2") - F.col("ni"))
            ).alias("jaccard"),
        )
    )
    return scored.filter(F.col("jaccard") >= JACCARD_THRESHOLD).cache()


def build_c(spark, sf_dir):
    """Old codegen'd signature chain, array-verify from the documents
    scan for candidate docs only; sh never cached (single consumer)."""
    sh = _shingle_rows(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("s", F.lit(j))).alias(f"h{j}")
            for j in range(N_HASHES)
        ]
    )
    n_bands = N_HASHES // BAND_SIZE
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                f"h{b * BAND_SIZE + r}"
                                for r in range(BAND_SIZE)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    wb = Window.partitionBy("band", "key")
    capped = (
        bands.withColumn("bn", F.count("*").over(wb))
        .filter(F.col("bn") <= BAND_BUCKET_CAP)
        .drop("bn")
    )
    buckets = (
        capped.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.d1", "p.d2")
        .distinct()
        .cache()
    )
    cand_docs = candidates.select(F.col("d1").alias("doc_id")).union(
        candidates.select(F.col("d2"))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    cand_arrs = docs.join(
        F.broadcast(cand_docs), "doc_id", "left_semi"
    ).select("doc_id", shingles(F.col("text")).alias("arr"))
    scored = (
        candidates.join(
            cand_arrs.select(
                F.col("doc_id").alias("d1"), F.col("arr").alias("a1")
            ),
            "d1",
        )
        .join(
            cand_arrs.select(
                F.col("doc_id").alias("d2"), F.col("arr").alias("a2")
            ),
            "d2",
        )
        .withColumn("ni", F.size(F.array_intersect("a1", "a2")))
        .select(
            "d1",
            "d2",
            (
                F.col("ni").cast("double")
                / (F.size("a1") + F.size("a2") - F.col("ni"))
            ).alias("jaccard"),
        )
    )
    return scored.filter(F.col("jaccard") >= JACCARD_THRESHOLD).cache()


# ---------- equality gate ----------
def rows_of(df):
    return sorted(
        (r["d1"], r["d2"], r["jaccard"]) for r in df.collect()
    )


for eq_sf in ("/root/testdata/sf0.01", sf_dir):
    clear_session_cache(spark)
    old_rows = rows_of(build_old(spark, eq_sf))
    clear_session_cache(spark)
    new_rows = rows_of(build_c(spark, eq_sf))
    same = old_rows == new_rows
    print(f"EQUALITY {eq_sf}: {'IDENTICAL' if same else 'MISMATCH'} "
          f"({len(old_rows)} vs {len(new_rows)} rows)", flush=True)
    if not same:
        only_old = set(old_rows) - set(new_rows)
        only_new = set(new_rows) - set(old_rows)
        print("  only_old:", list(only_old)[:5])
        print("  only_new:", list(only_new)[:5])
        sys.exit(1)

# ---------- interleaved timing ----------
def timed(build):
    clear_session_cache(spark)
    t0 = time.perf_counter()
    df = build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# warmup both codepaths once (codegen/JIT), untimed
timed(build_old)
timed(build_c)

olds, news = [], []
for i in range(rounds):
    a = timed(build_old)
    b = timed(build_c)
    olds.append(a)
    news.append(b)
    print(f"round {i}: old={a:.3f} new={b:.3f}  winner={'NEW' if b < a else 'old'}", flush=True)
    # alternate order within the next round to cancel position bias
    b2 = timed(build_c)
    a2 = timed(build_old)
    olds.append(a2)
    news.append(b2)
    print(f"round {i}': new={b2:.3f} old={a2:.3f}  winner={'NEW' if b2 < a2 else 'old'}", flush=True)

import statistics
print(f"old: min={min(olds):.3f} median={statistics.median(olds):.3f}")
print(f"new: min={min(news):.3f} median={statistics.median(news):.3f}")
wins = sum(1 for a, b in zip(olds, news) if b < a)
print(f"new wins {wins}/{len(olds)} paired rounds")
spark.stop()
