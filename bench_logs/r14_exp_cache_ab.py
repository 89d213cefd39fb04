"""Interleaved A/B for the round-14 intra-build caches:
  - text_tfidf_topterms: cache tf (feeds df agg + scored join)
  - dedup_near_minhash / dedup_connected_components: cache cand_arrs

Equality gate first (flag on vs off, exceptAll both ways), then
interleaved cold rounds alternating old/new, both orderings.

Usage: python3 bench_logs/r14_exp_cache_ab.py [sf_dir] [rounds]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
os.environ["SPARK_GRAFT_SF_DIR"] = sf

import dbsuite_spark
from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import clear_session_cache
from dbsuite_spark.pipeline import dedup, text

spark = get_spark(app_name="r14-cache-ab")
specs = dbsuite_spark.all_specs()
KEYS = ["text_tfidf_topterms", "dedup_near_minhash", "dedup_connected_components"]

def set_new(on):
    dedup._R14_CACHE_CAND_ARRS = on
    text._R14_CACHE_TF = on

def run(key):
    clear_session_cache(spark)
    fn = specs[key].fn
    t0 = time.perf_counter()
    df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

# --- equality gate ---
for key in KEYS:
    set_new(False); clear_session_cache(spark)
    old = specs[key].fn(spark, sf).collect()
    set_new(True); clear_session_cache(spark)
    new_df = specs[key].fn(spark, sf)
    new = new_df.collect()
    assert sorted(map(tuple, old)) == sorted(map(tuple, new)), f"EQUALITY FAIL {key}"
    print(f"equality OK {key}: {len(old)} rows", flush=True)

# --- warm ---
set_new(True); run(KEYS[0])

# --- interleaved ---
times = {k: {"old": [], "new": []} for k in KEYS}
for r in range(rounds):
    order = [(False, "old"), (True, "new")] if r % 2 == 0 else [(True, "new"), (False, "old")]
    for on, lbl in order:
        set_new(on)
        for k in KEYS:
            times[k][lbl].append(run(k))
    print(f"round {r}: " + " | ".join(
        f"{k}: old {times[k]['old'][-1]:.3f} new {times[k]['new'][-1]:.3f}"
        for k in KEYS), flush=True)

for k in KEYS:
    o, n = times[k]["old"], times[k]["new"]
    wins = sum(1 for a, b in zip(o, n) if b < a)
    print(f"{k}: new wins {wins}/{len(o)}  old {sorted(o)}  new {sorted(n)}", flush=True)
spark.stop()
