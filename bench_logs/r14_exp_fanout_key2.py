"""Round-14: keyed fan_out for agg_groupby_basic / fn_json_extract /
sim_embed_quantize (skips sortBeforeRepartition). Equality gate, then
interleaved cold rounds; old = fan_out ignoring the key.

Usage: python3 bench_logs/r14_exp_fanout_key2.py [sf_dir] [rounds]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

import dbsuite_spark
from dbsuite_spark import tables
from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import clear_session_cache
from dbsuite_spark.operators import aggregates
from dbsuite_spark.functions import semistructured
from dbsuite_spark.pipeline import similarity

spark = get_spark(app_name="r14-fanout-key2")
specs = dbsuite_spark.all_specs()
real_fan_out = tables.fan_out
def old_fan_out(df, key=None):
    return real_fan_out(df)
MODS = (aggregates, semistructured, similarity)
def set_new(on):
    for m in MODS:
        m.fan_out = real_fan_out if on else old_fan_out

KEYS = ["agg_groupby_basic", "fn_json_extract", "sim_embed_quantize"]
for key in KEYS:
    set_new(False); clear_session_cache(spark)
    old = specs[key].fn(spark, sf).collect()
    set_new(True); clear_session_cache(spark)
    new = specs[key].fn(spark, sf).collect()
    assert sorted(map(str, old)) == sorted(map(str, new)), f"EQUALITY FAIL {key}"
    print(f"equality OK {key}: {len(old)} rows", flush=True)

def run(key):
    clear_session_cache(spark)
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
