"""Capture .explain('formatted') for the round-10-touched plans.

Usage: python tools/capture_plans_r10.py <suffix> <out_dir>
  suffix = before | after  (run `before` at the pre-round-10 commit
  or before editing, `after` at HEAD).

Covered plans:
  - set_similarity_join (q203's operator) over sf0.1 documents
  - sparse_search_index served query (the sparse_served_ms path)
  - q117 FPGrowth input (baskets) — the fit itself is eager; its
    input plan plus the job census is the evidence
  - chunks delta read (regression guard: the r9 literal-tombstone
    plan must survive round-10's storage changes)

Lifecycle queries (q54/q218/q177/...) execute eagerly and have no
single plan; their evidence is the Spark-job census
(tools/job_profile.py) committed alongside these files.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresml_spark.session import get_spark, load_table  # noqa: E402


def explain_str(df) -> str:
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    suffix, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans-r10")

    from pyspark.sql import functions as F

    def dump(name: str, df) -> None:
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print("wrote", name)

    # 1. q203's operator plan (PPJoin set-similarity self-join)
    from postgresml_spark.operators import dedup as DD

    d = load_table(spark, sf_dir, "documents")
    out = DD.set_similarity_join(d, "text", "doc_id", shingle_n=3,
                                 threshold=0.3)
    dump("set_similarity_join",
         out.repartition(1).sortWithinPartitions("id_a", "id_b"))
    # the ONE shingle-UDF evaluation that localCheckpoint materializes
    # (invisible in the final plan above, which scans the checkpointed
    # RDD): exactly one ArrowEvalPython above an explicit-n Exchange —
    # the UDF stage runs at session-core parallelism, never at scan
    # parallelism
    par = spark.sparkContext.defaultParallelism
    sh_plan = (
        d.select(F.col("doc_id").alias("id"), F.col("text").alias("__t"))
        .repartition(par, F.col("id"))
        .select("id", DD.word_shingles_batch(3)(F.col("__t")).alias("s"))
        .withColumn("n", F.size("s"))
    )
    dump("set_similarity_shingle_stage", sh_plan)

    # 2. served sparse search (sparse_served_ms)
    from postgresml_spark.operators.sparse import (
        build_sparse_index,
        sparse_search_index,
    )

    spath = tempfile.mkdtemp(prefix="plans_sparse_")
    build_sparse_index(d, spath)
    dump("sparse_index_search",
         sparse_search_index(spark, spath, ["vector", "merge"], k=10))

    # 3. q117 FPGrowth input (the fit is eager — census is the rest)
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_distinct(F.collect_list("p_brand")).alias("items"))
    )
    dump("fpgrowth_baskets", baskets)

    # 4. chunks delta read (guard: r9's literal-tombstone plan holds)
    from postgresml_spark.collections import Collection, Pipeline

    wh = tempfile.mkdtemp(prefix="plans_r10_")
    docs = d.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("id"), "text", "lang"
    )
    coll = Collection("plans10", spark, warehouse=wh)
    pipe = Pipeline("p", {"text": {
        "semantic_search": {"model": "hash:64"},
        "full_text_search": {"configuration": "english"},
    }})
    coll.upsert_documents_df(docs)
    coll.add_pipeline(pipe)
    changed = docs.filter(F.pmod(F.col("id"), F.lit(20)) == 0).withColumn(
        "text", F.concat(F.lit("UPDATED "), F.col("text"))
    )
    coll.upsert_documents_df(changed)  # attached pipeline syncs (delta)
    dump("chunks_delta_read", pipe.table("text_chunks"))
    dump("embeddings_delta_read", pipe.table("text_embeddings"))

    import shutil

    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(spath, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
