"""Round-14: keyed fan_out of the documents scan feeding text_tfidf_topterms
(_tokens key="doc_id"). Equality gate then interleaved old-vs-new (old =
fan_out disabled at this site).

Usage: python3 bench_logs/r14_exp_tfidf_fanout.py [sf_dir] [rounds]
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
import dbsuite_spark
from dbsuite_spark import tables
from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import clear_session_cache
from dbsuite_spark.pipeline import text
spark = get_spark(app_name="r14-tfidf-fanout")
specs = dbsuite_spark.all_specs()
real = tables.fan_out
def no_fan_out(df, key=None):
    return df
def set_new(on):
    text.fan_out = real if on else no_fan_out
KEYS = ["text_tfidf_topterms"]
for key in KEYS:
    set_new(False); clear_session_cache(spark)
    old = specs[key].fn(spark, sf).collect()
    set_new(True); clear_session_cache(spark)
    new = specs[key].fn(spark, sf).collect()
    assert sorted(map(str, old)) == sorted(map(str, new)), f"EQUALITY FAIL {key}"
    print(f"equality OK {key}: {len(old)} rows", flush=True)
set_new(True)
p = specs[KEYS[0]].fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
print("new plan: Exchange", p.count("Exchange hashpartitioning"),
      "scans", p.count("Scan parquet"), flush=True)
def run(key):
    clear_session_cache(spark)
    t0 = time.perf_counter()
    specs[key].fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run(KEYS[0])
times = {k: {"old": [], "new": []} for k in KEYS}
for r in range(rounds):
    order = [(False,"old"),(True,"new")] if r%2==0 else [(True,"new"),(False,"old")]
    for on,lbl in order:
        set_new(on)
        for k in KEYS: times[k][lbl].append(run(k))
    print(f"round {r} done", flush=True)
for k in KEYS:
    o,n = times[k]["old"], times[k]["new"]
    print(f"{k}: new wins {sum(1 for a,b in zip(o,n) if b<a)}/{rounds} med old {statistics.median(o):.3f} new {statistics.median(n):.3f}  old {[round(x,2) for x in o]} new {[round(x,2) for x in n]}")
spark.stop()
