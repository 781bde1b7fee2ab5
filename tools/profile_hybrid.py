"""Profile the served-hybrid query path (VERDICT r4 What's-wrong #2:
hybrid_search_indexed_ms regressed 16.9 -> 27.9 ms r3->r4).

Reproduces bench.py's hybrid-indexed measurement, then cProfiles the
warm query loop to attribute the per-query milliseconds.
"""
from __future__ import annotations

import cProfile
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgresml_spark.collections import Collection, Pipeline  # noqa: E402
from postgresml_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_hybrid")
    wh = tempfile.mkdtemp(prefix="prof_hyb_")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        F.col("text").isNotNull()
    )
    coll = Collection("prof_hyb", spark, warehouse=wh)
    coll.upsert_documents_df(d.select(F.col("doc_id").alias("id"), "text", "lang"))
    pipe2 = Pipeline(
        "ph",
        {"text": {"semantic_search": {"model": "hash:16"},
                  "full_text_search": {"configuration": "english"}}},
    )
    coll.add_pipeline(pipe2)
    probes = ["distributed query engine", "vector similarity search",
              "stream processing state", "columnar storage format",
              "hash join strategy", "window aggregate partition",
              "sorted merge spill", "shuffle exchange reuse"]
    hq = lambda t: {  # noqa: E731
        "query": {
            "semantic_search": {"text": {"query": t, "boost": 1.5}},
            "full_text_search": {"text": {"query": t, "boost": 0.8}},
        },
        "limit": 10,
    }
    coll.search(hq(probes[0]), pipe2, method="index")  # build + warm

    ts = []
    for p in probes:
        t0 = time.perf_counter()
        coll.search(hq(p), pipe2, method="index")
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"median ms: {ts[len(ts)//2]*1000:.2f}  all: "
          f"{[round(t*1000,2) for t in ts]}")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(5):
        for p in probes:
            coll.search(hq(p), pipe2, method="index")
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(35)
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
