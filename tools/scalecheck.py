"""Scale-stress harness: do the heavy operators scale linearly?

Synthesizes an N× documents/embeddings corpus from the sf dir (each
replica's text is perturbed with a replica token so near-dup structure
stays realistic; exact-dup groups survive intact), then times the
operators whose plans carry the 100 TB risk — dedup candidate joins,
signature UDFs, column stats, splits, ANN — at increasing scale.

A plan that holds should grow ~linearly in rows (the corpus fits in
page cache here, so superlinear growth means a bad join/shuffle, not
I/O). Usage:

    python tools/scalecheck.py [sf_dir] [factors...]   # default 1 4 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from postgresml_spark.session import get_spark, load_table


def scaled_documents(spark, sf_dir: str, factor: int):
    d = load_table(spark, sf_dir, "documents")
    if factor == 1:
        return d
    n = d.count()
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    return (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__rep") * n).alias("doc_id"),
            # replica 0 keeps original text (exact-dup groups intact);
            # others get a suffix token → realistic near-dup neighbors
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.concat(F.lit("rep"), "__rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )


def scaled_embeddings(spark, sf_dir: str, factor: int):
    e = load_table(spark, sf_dir, "embeddings")
    if factor == 1:
        return e
    n = e.count()
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    jitter = (F.col("__rep") % 7).cast("double") / 1000.0
    return (
        e.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__rep") * n).alias("vec_id"),
            F.transform("embedding", lambda x: x + jitter).alias("embedding"),
            "label",
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]

    spark = get_spark("scalecheck")
    from postgresml_spark.operators import dedup as DD
    from postgresml_spark.operators.similarity import (
        fit_ivf_centroids,
        ivf_assign,
        knn_exact,
    )
    from postgresml_spark.preprocess import (
        analyze_columns,
        fit_preprocessor,
        train_test_split,
    )

    results: dict[str, dict[int, float]] = {}

    def bench(name: str, factor: int, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        results.setdefault(name, {})[factor] = round(dt, 2)
        print(f"  {name:28s} {factor:3d}x  {dt:7.2f}s  ({out})", flush=True)

    for factor in factors:
        print(f"-- factor {factor} --", flush=True)
        docs = scaled_documents(spark, sf_dir, factor)
        # materialize the synthetic corpus to parquet so every operator
        # reads a real store (and scan parallelism matches reality)
        dpath = f"/tmp/scalecheck/docs_{factor}"
        docs.write.mode("overwrite").parquet(dpath)
        docs = spark.read.parquet(dpath)
        emb = scaled_embeddings(spark, sf_dir, factor)
        epath = f"/tmp/scalecheck/emb_{factor}"
        emb.write.mode("overwrite").parquet(epath)
        emb = spark.read.parquet(epath)

        bench("exact_dedup", factor, lambda: DD.exact_dedup(docs, F.md5(F.lower("text")), "doc_id").count())
        bench(
            "minhash_candidates",
            factor,
            lambda: DD.minhash_candidate_pairs(
                docs, "text", "doc_id", num_perm=32, bands=8
            ).count(),
        )
        bench(
            "simhash_pairs",
            factor,
            lambda: DD.simhash_candidate_pairs(docs, "text", "doc_id", max_hamming=3).count(),
        )
        bench(
            "simhash_pairs_capped",
            factor,
            lambda: DD.simhash_candidate_pairs(
                docs, "text", "doc_id", max_hamming=3, max_bucket_size=64
            ).count(),
        )
        bench(
            "column_stats",
            factor,
            lambda: len(analyze_columns(docs.select("n_chars"), ["n_chars"])),
        )
        bench(
            "split_last",
            factor,
            lambda: train_test_split(docs, 0.25, "last", order_col="doc_id")[1].count(),
        )
        bench(
            "standard_scale_fit_tx",
            factor,
            lambda: fit_preprocessor(
                docs.select("doc_id", "n_chars"),
                ["n_chars"],
                preprocess={"n_chars": {"scale": "standard"}},
            )
            .transform(docs.select("doc_id", "n_chars"))
            .count(),
        )
        qv = [float(x) for x in emb.head()["embedding"]]
        bench("knn_exact", factor, lambda: knn_exact(emb, qv, k=10).count())
        cents = fit_ivf_centroids(emb, nlist=16, sample_fraction=0.2)
        bench(
            "ivf_assign_count",
            factor,
            lambda: ivf_assign(emb, cents).groupBy("centroid_id").count().count(),
        )

        # corpus hygiene: the bench set is FIXED-size (real eval suites
        # are), so decontamination should scale with the corpus only
        from postgresml_spark.operators.corpus import repetition_flags
        from postgresml_spark.operators.decontam import contamination_report

        bench_set = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") >= 400
        )
        bench(
            "decontamination",
            factor,
            lambda: contamination_report(docs, bench_set, n=5)
            .filter(F.col("ratio") > 0.1)
            .count(),
        )
        bench(
            "repetition_flags",
            factor,
            lambda: repetition_flags(docs).filter(~F.col("keep_repetition")).count(),
        )
        ebuck = emb.withColumn("bucket", DD.sign_lsh_bucket("embedding", 6))
        bench(
            "near_dup_block",
            factor,
            lambda: DD.embedding_near_dup_pairs(
                ebuck, "embedding", "vec_id", threshold=0.35,
                group_col="bucket", impl="block",
            ).count(),
        )
        qbatch = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.limit(16).collect()
        ]
        from postgresml_spark.operators.similarity import knn_join

        bench(
            "knn_join_16q",
            factor,
            lambda: knn_join(emb, qbatch, k=10).count(),
        )

        # round-2 additions: cluster closure, LM scoring, incremental
        # dedup, per-group sampling
        from postgresml_spark.operators.corpus import (
            stratified_take,
            unigram_lm_scores,
        )

        pairs = DD.minhash_candidate_pairs(
            docs, "text", "doc_id", num_perm=32, bands=8
        ).localCheckpoint()
        bench(
            "dup_clusters",
            factor,
            lambda: DD.dup_clusters(docs.select("doc_id"), pairs)
            .filter("is_canonical")
            .count(),
        )
        bench(
            "unigram_lm",
            factor,
            lambda: unigram_lm_scores(docs, vocab_cap=100_000)
            .agg(F.avg("nll"))
            .count(),
        )
        n_docs = docs.count()
        hist = docs.filter(F.col("doc_id") < n_docs // 2)
        batch = docs.filter(F.col("doc_id") >= n_docs // 2)
        fp_index = hist.select(
            F.md5(F.lower("text")).alias("fp")
        ).distinct().localCheckpoint()
        bench(
            "incremental_dedup",
            factor,
            lambda: DD.incremental_exact_dedup(
                batch, fp_index, F.md5(F.lower(F.col("text")))
            )[0].count(),
        )
        bench(
            "stratified_take_10",
            factor,
            lambda: stratified_take(docs, "source", 10, ["doc_id"]).count(),
        )

        # round-2 continuation: sparse retrieval, heavy hitters, as-of
        from postgresml_spark.operators import sparse as SP
        from postgresml_spark.operators.corpus import heavy_hitters
        from postgresml_spark.operators.timeseries import asof_join

        bench(
            "sparse_features_build",
            factor,
            lambda: SP.sparse_features(docs, "text", "doc_id").count(),
        )
        post = SP.sparse_features(docs, "text", "doc_id").localCheckpoint()
        qv = SP.sparse_query(docs, ["vector", "merge", "stream"], "text")
        bench(
            "sparse_topk_on_built",
            factor,
            lambda: SP.sparse_topk(post, qv, k=10).count(),
        )
        from postgresml_spark.functions.text import tokenize as _tok
        toks = docs.select(F.explode(_tok(F.col("text"))).alias("t"))
        bench(
            "heavy_hitters_k20",
            factor,
            lambda: heavy_hitters(toks, "t", k=20, capacity=4096).count(),
        )
        half = n_docs // 2
        aleft = docs.filter(F.col("doc_id") < half).select(
            "source", F.col("doc_id").alias("t"), "n_chars"
        )
        aright = docs.filter(F.col("doc_id") >= half).select(
            "source", (F.col("doc_id") - half).alias("t"),
            F.col("n_chars").alias("rv"),
        )
        bench(
            "asof_nearest_by_source",
            factor,
            lambda: asof_join(
                aleft, aright, on="t", by="source", direction="nearest"
            ).count(),
        )

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
