"""q44 KMeans phase breakdown (VERDICT r6 next #3): split the MLlib fit
wall into first-scan/init vs Lloyd iterations at sf1 and sf10 via
maxIter=1 vs maxIter=20 fits (+ a cached-input variant). Findings in
SCALE.md round-7: iterations are LINEAR in rows (3.2 s/iter at 60M);
the 19x sf1->sf10 wall ratio was a small-denominator artifact; do NOT
persist the features (188 s vs 90 s cold at sf1).

Run SOLO: SPARK_DRIVER_MEMORY=64g python tools/kmeans_phase_breakdown.py <sf_dir> ...
"""
import sys, time, os
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from postgresml_spark.session import get_spark, load_table
from pyspark.sql import functions as F
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector

spark = get_spark("kminst")
for sf_dir in sys.argv[1:]:
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(array_to_vector(F.array(
        F.col("l_quantity").cast("double"),
        F.col("l_discount").cast("double"),
        F.col("l_tax").cast("double"))).alias("features"))
    n = feats.count()  # warm footers
    res = {"sf_dir": sf_dir, "rows": n}
    t0 = time.perf_counter()
    m1 = KMeans(k=4, seed=42, maxIter=1, initMode="random",
                featuresCol="features").fit(feats)
    res["t_maxiter1"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    m20 = KMeans(k=4, seed=42, maxIter=20, initMode="random",
                 featuresCol="features").fit(feats)
    res["t_maxiter20"] = round(time.perf_counter() - t0, 2)
    res["numIter_20"] = m20.summary.numIter
    # cached-input variant (KMeans warns 'input not cached' otherwise)
    feats_c = feats.persist()
    feats_c.count()
    t0 = time.perf_counter()
    mc = KMeans(k=4, seed=42, maxIter=20, initMode="random",
                featuresCol="features").fit(feats_c)
    res["t_maxiter20_cached"] = round(time.perf_counter() - t0, 2)
    res["numIter_cached"] = mc.summary.numIter
    feats_c.unpersist()
    k = max(res["numIter_20"] - 1, 1)
    res["per_iter_est_s"] = round((res["t_maxiter20"] - res["t_maxiter1"]) / k, 2)
    res["init_plus_1iter_s"] = res["t_maxiter1"]
    print("RESULT", res, flush=True)
