"""Round-14: sim_embed_quantize — per-partition numpy GEMM + partial
top-k (guide §4.2) vs the JVM zip_with/aggregate fold. Integer dots are
order-free, so the GEMM is bit-identical by construction; equality is
gated anyway. Usage: python3 bench_logs/r14_exp_quantize_gemm.py [sf_dir] [rounds]
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
import numpy as np
import dbsuite_spark
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import clear_session_cache, fan_out
from dbsuite_spark.pipeline.similarity import _quantized, QUERY_MOD, TOP_K
spark = get_spark(app_name="r14-quant-gemm")
specs = dbsuite_spark.all_specs()

def gemm_variant(spark, sf_dir):
    qz = _quantized(spark, sf_dir)
    qrows = qz.filter(F.col("vec_id") % QUERY_MOD == 0).collect()
    qa = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Qm = np.array([list(r.qv) for r in qrows], dtype=np.int64)
    bq = spark.sparkContext.broadcast((qa, Qm))
    K = TOP_K
    def gen(it):
        import pandas as pd
        import numpy as _np
        qa_l, Qm_l = bq.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = _np.stack([_np.asarray(v, dtype=_np.int64) for v in pdf["qv"].values])
            ids = pdf["vec_id"].to_numpy(dtype=_np.int64)
            D = C @ Qm_l.T  # n x Q exact int64 dots
            oq, on, od = [], [], []
            for j in range(len(qa_l)):
                col = D[:, j]
                idx = _np.nonzero(ids != qa_l[j])[0]
                if len(idx) == 0:
                    continue
                sel = idx[_np.lexsort((ids[idx], -col[idx]))[: min(K, len(idx))]]
                oq.extend([qa_l[j]] * len(sel))
                on.extend(ids[sel].tolist())
                od.extend(col[sel].tolist())
            yield pd.DataFrame({"qid": oq, "neighbor_id": on, "qdot": od})
    pairs = fan_out(qz, key="vec_id").mapInPandas(
        gen, "qid long, neighbor_id long, qdot long"
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("qid", "neighbor_id", "qdot", "rank")
    )

old_fn = specs["sim_embed_quantize"].fn
clear_session_cache(spark)
old = old_fn(spark, sf).collect()
clear_session_cache(spark)
new = gemm_variant(spark, sf).collect()
assert sorted(map(str, old)) == sorted(map(str, new)), "EQUALITY FAIL"
print(f"equality OK sim_embed_quantize: {len(old)} rows", flush=True)

def run(fn):
    clear_session_cache(spark)
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run(gemm_variant)
o, n = [], []
for r in range(rounds):
    order = [(old_fn, o), (gemm_variant, n)] if r % 2 == 0 else [(gemm_variant, n), (old_fn, o)]
    for fn, acc in order:
        acc.append(run(fn))
    print(f"round {r}: old {o[-1]:.3f} new {n[-1]:.3f}", flush=True)
print(f"new wins {sum(1 for a,b in zip(o,n) if b<a)}/{rounds} med old {statistics.median(o):.3f} new {statistics.median(n):.3f}")
spark.stop()
