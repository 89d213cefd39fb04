"""Round-14: keyed fan_out on the broadcast-star fact probes
(join_multiway_star, tpch q3/q5/q9/q18). Equality gate then interleaved.

Usage: python3 bench_logs/r14_exp_fanout_tpch.py [sf_dir] [rounds]
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
import dbsuite_spark
from dbsuite_spark import tables
from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import clear_session_cache
from dbsuite_spark.operators import joins
from dbsuite_spark import workloads
from dbsuite_spark.workloads import tpch
spark = get_spark(app_name="r14-fanout-tpch")
specs = dbsuite_spark.all_specs()
real = tables.fan_out
def old_fan_out(df, key=None):
    return df  # the pre-change shape had NO fan_out at these sites
def set_new(on):
    joins.fan_out = real if on else old_fan_out
    tpch.fan_out = real if on else old_fan_out
KEYS = ["join_multiway_star", "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
        "tpch_q9_product_type_profit", "tpch_q18_large_volume"]
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
set_new(True); run(KEYS[0])
times = {k: {"old": [], "new": []} for k in KEYS}
for r in range(rounds):
    order = [(False,"old"),(True,"new")] if r%2==0 else [(True,"new"),(False,"old")]
    for on,lbl in order:
        set_new(on)
        for k in KEYS: times[k][lbl].append(run(k))
    print(f"round {r}: " + " | ".join(f"{k.split('_')[1]}: o {times[k]['old'][-1]:.2f} n {times[k]['new'][-1]:.2f}" for k in KEYS), flush=True)
for k in KEYS:
    o,n = times[k]["old"], times[k]["new"]
    print(f"{k}: new wins {sum(1 for a,b in zip(o,n) if b<a)}/{rounds} med old {statistics.median(o):.3f} new {statistics.median(n):.3f}")
spark.stop()
