"""Capture .explain('formatted') for the round-9-touched plans.

Usage: python tools/capture_plans_r09.py <suffix> <out_dir>
  suffix = before | after  (run `before` from a worktree at the
  pre-round-9 commit, `after` at HEAD; the exact-search construction
  is transcribed from each tree's search.py — per-field
  orderBy().limit() + union + orderBy().limit() before, single
  terminal orderBy().limit() after).

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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("capture-plans-r09")

    from pyspark.sql import functions as F

    from postgresml_spark.collections import Collection, Pipeline

    def dump(name: str, df) -> None:
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print("wrote", name)

    # -- a small synced collection with one incremental sync so the
    #    derived tables carry a delta version (tombstones + delta)
    wh = tempfile.mkdtemp(prefix="plans_r09_")
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select(F.col("doc_id").alias("id"), "text", "lang")
    coll = Collection("plans9", spark, warehouse=wh)
    pipe = Pipeline("p", {"text": {
        "semantic_search": {"model": "hash:64"},
        "full_text_search": {"configuration": "english"},
    }})
    coll.upsert_documents_df(d)
    coll.add_pipeline(pipe)
    changed = d.filter(F.pmod(F.col("id"), F.lit(20)) == 0).withColumn(
        "text", F.concat(F.lit("UPDATED "), F.col("text"))
    )
    coll.upsert_documents_df(changed)  # attached pipeline syncs (delta)

    # 1. delta-version table read (tombstone handling changed:
    #    broadcast anti-join -> literal NOT-isin filter)
    dump("chunks_delta_read", pipe.table("text_chunks"))

    # 2. the exact vector_search plan (q54/q218 method='exact' tail)
    from postgresml_spark.collections.search import _scored_chunks

    fetch = 64
    scored = _scored_chunks(coll, pipe, "text", "query text sample", None)
    sel = scored.select(
        "document_id", "document", "chunk",
        (F.col("cosine") * 1.0).alias("score"),
    )
    if suffix == "before":
        per = sel.orderBy(
            F.col("score").desc(), F.col("document_id")
        ).limit(fetch)
        final = per.orderBy(
            F.col("score").desc(), F.col("document_id")
        ).limit(fetch)
    else:
        final = sel.orderBy(
            F.col("score").desc(), F.col("document_id")
        ).limit(fetch)
    dump("vector_search_exact", final)

    # 3. bm25 served search (term hashing moved driver-side; the data
    #    plan itself is unchanged — the win is one fewer Spark JOB,
    #    see the job census)
    from postgresml_spark.functions.text import (
        bm25_search_index,
        build_text_index,
    )

    store = tempfile.mkdtemp(prefix="plans_bm25_")
    build_text_index(load_table(spark, sf_dir, "documents"), store,
                     "text", "doc_id")
    dump("bm25_index_search",
         bm25_search_index(spark, store, ["vector", "merge", "stream"], k=20))

    import shutil

    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
