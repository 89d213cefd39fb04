"""Shuffle-bytes census for the headline keys (measurement probe only).

Runs each headline key once (cold, same confs as bench.py) with the Spark
UI enabled, then reads per-stage shuffle write/read bytes from the REST
API and attributes them to the key by job group. Used in round 13 to
adjudicate the deferred session-config candidates (shuffle codec, AQE
advisory partition size): the whole 30-key bench shuffles ~56 MB total at
sf0.1, so those knobs have no local mechanism to measure (guide §9 —
config tuning needs bytes to act on).

Run from the repo root: python3 tools/probe_shuffle_census.py

Caveat (ADVICE r13): stage-to-key attribution keeps only the LAST job
group touching a stage id, so a stage shared across jobs from different
groups (e.g. AQE exchange reuse) can be attributed to the wrong key.
Totals are unaffected; per-key rows can shift slightly. Fine for a
one-shot census.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

from pyspark.sql import SparkSession  # noqa: E402

import dbsuite_spark  # noqa: E402
from dbsuite_spark.tables import clear_session_cache  # noqa: E402
from bench import HEADLINE  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.appName("shuffle-census")
    .master(f"local[{cpus}]")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "true")  # census needs the REST API
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    .config("spark.sql.join.preferSortMergeJoin", "false")
    .getOrCreate()
)
specs = dbsuite_spark.all_specs()
sc = spark.sparkContext

results = {}
for name in HEADLINE:
    if name not in specs:
        continue
    clear_session_cache(spark)
    sc.setJobGroup(name, name)
    fn = specs[name].fn
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    sc.setJobGroup("idle", "idle")
    results[name] = {"sec": round(dt, 3)}

ui = sc.uiWebUrl
app_id = sc.applicationId


def get(path):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


jobs = get("/jobs?status=succeeded") + get("/jobs?status=failed")
stage_to_group = {}
for j in jobs:
    grp = j.get("jobGroup") or ""
    for sid in j.get("stageIds", []):
        stage_to_group[sid] = grp

stages = get("/stages")
agg = {}
for st in stages:
    grp = stage_to_group.get(st["stageId"])
    if not grp or grp == "idle":
        continue
    a = agg.setdefault(grp, {"sw": 0, "sr": 0, "in": 0, "stages": 0, "tasks": 0})
    a["sw"] += st.get("shuffleWriteBytes", 0)
    a["sr"] += st.get("shuffleReadBytes", 0)
    a["in"] += st.get("inputBytes", 0)
    a["stages"] += 1
    a["tasks"] += st.get("numCompleteTasks", 0)

out = []
for name, r in results.items():
    a = agg.get(name, {"sw": 0, "sr": 0, "in": 0, "stages": 0, "tasks": 0})
    out.append((a["sw"], name, r["sec"], a))

print(f"{'key':32s} {'sec':>7s} {'shufW_MB':>9s} {'shufR_MB':>9s} {'input_MB':>9s} {'stages':>6s} {'tasks':>6s}")
tot_w = 0
for sw, name, sec, a in sorted(out, reverse=True):
    tot_w += sw
    print(
        f"{name:32s} {sec:7.3f} {sw/1e6:9.2f} {a['sr']/1e6:9.2f} "
        f"{a['in']/1e6:9.2f} {a['stages']:6d} {a['tasks']:6d}"
    )
print(f"TOTAL shuffle write MB: {tot_w/1e6:.2f}")
spark.stop()
