"""Round-14 change #2 gate+AB: fan_out(documents, key='doc_id') vs
round-robin fan_out in _shingle_rows.

Equality gate at the given sf for the consuming keys, plan-shape check
(signature groupBy exchange count), then interleaved cold rounds.

Usage: python3 bench_logs/r14_exp_fanout_key.py [sf_dir] [rounds] [--gate-only]
"""
import os, sys, time, re
sys.path.insert(0, "/root/repo")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
gate_only = "--gate-only" in sys.argv

import dbsuite_spark
from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import clear_session_cache, fan_out, t
from dbsuite_spark.pipeline import dedup
from pyspark.sql import functions as F

spark = get_spark(app_name="r14-fanout-key")
specs = dbsuite_spark.all_specs()

new_shingle_rows = dedup._shingle_rows
def old_shingle_rows(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents").select("doc_id", "text"))
    return d.select("doc_id", F.explode(dedup.shingles(F.col("text"))).alias("s"))

def set_new(on):
    dedup._shingle_rows = new_shingle_rows if on else old_shingle_rows

GATE_KEYS = ["dedup_near_minhash", "dedup_connected_components",
             "dedup_exact_jaccard", "dedup_simhash", "text_fingerprint"]
for key in GATE_KEYS:
    set_new(False); clear_session_cache(spark)
    old = specs[key].fn(spark, sf).collect()
    set_new(True); clear_session_cache(spark)
    new = specs[key].fn(spark, sf).collect()
    assert sorted(map(tuple, old)) == sorted(map(tuple, new)), f"EQUALITY FAIL {key}"
    print(f"equality OK {key}: {len(old)} rows", flush=True)

# plan check: exchanges in the pinned minhash head
set_new(True); clear_session_cache(spark)
plan = specs["dedup_near_minhash"].fn(spark, sf)._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
print("new plan: Exchange", len(re.findall(r"\(\d+\) Exchange", plan)),
      "nodes", len(re.findall(r"^\(\d+\)", plan, re.M)), flush=True)
if gate_only:
    spark.stop(); sys.exit(0)

KEYS = ["dedup_near_minhash", "dedup_connected_components", "dedup_exact_jaccard"]
def run(key):
    clear_session_cache(spark)
    fn = specs[key].fn
    t0 = time.perf_counter()
    specs[key].fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
set_new(True); run(KEYS[0])  # warm
times = {k: {"old": [], "new": []} for k in KEYS}
for r in range(rounds):
    order = [(False,"old"),(True,"new")] if r%2==0 else [(True,"new"),(False,"old")]
    for on,lbl in order:
        set_new(on)
        for k in KEYS: times[k][lbl].append(run(k))
    print(f"round {r}: " + " | ".join(f"{k}: old {times[k]['old'][-1]:.3f} new {times[k]['new'][-1]:.3f}" for k in KEYS), flush=True)
import statistics
for k in KEYS:
    o,n = times[k]["old"], times[k]["new"]
    print(f"{k}: new wins {sum(1 for a,b in zip(o,n) if b<a)}/{rounds} med old {statistics.median(o):.3f} new {statistics.median(n):.3f}")
spark.stop()
