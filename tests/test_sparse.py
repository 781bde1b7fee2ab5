"""Sparse-vector retrieval (pgvector sparsevec analog) + exact
heavy hitters: semantics against naive references, and the promised
physical shapes (broadcast query side, TakeOrdered top-k, bounded
candidate shuffle)."""

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import assert_no_spark_jobs

from postgresml_spark.operators import corpus as CO
from postgresml_spark.operators import sparse as SP
from postgresml_spark.session import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# -- sparse features --------------------------------------------------------


def test_sparse_features_match_manual_tfidf(spark):
    docs = spark.createDataFrame(
        [(1, "red red blue"), (2, "blue green"), (3, "red")],
        "doc_id long, text string",
    )
    post = SP.sparse_features(docs, "text", "doc_id", dim=1 << 18).collect()
    import math

    n = 3
    df_t = {"red": 2, "blue": 2, "green": 1}

    def w(tf, df):
        return (1 + math.log(tf)) * (math.log((n + 1) / (df + 1)) + 1)

    by_doc = {}
    for r in post:
        by_doc.setdefault(r["doc_id"], []).append(r["weight"])
    # doc 1: red tf=2, blue tf=1
    got = sorted(by_doc[1])
    want = sorted([w(2, df_t["red"]), w(1, df_t["blue"])])
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))
    # idx values live in [0, dim) and hash deterministically
    assert all(0 <= r["idx"] < (1 << 18) for r in post)


def test_sparse_topk_matches_dense_dot(spark):
    """Posting-join scores equal the explicit dense dot product."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark shuffle join", "join join filter", "spark spark spark",
             "filter scan", "shuffle shuffle join scan"]
        )],
        "doc_id long, text string",
    )
    post = SP.sparse_features(docs, "text", "doc_id")
    qv = SP.sparse_query(docs, ["join", "scan"], "text")
    got = {r["doc_id"]: r["score"] for r in SP.sparse_topk(post, qv, k=5).collect()}

    pw = {(r["doc_id"], r["idx"]): r["weight"] for r in post.collect()}
    qw = {r["idx"]: r["qweight"] for r in qv.collect()}
    want = {}
    for (d, i), w in pw.items():
        if i in qw:
            want[d] = want.get(d, 0.0) + w * qw[i]
    for d, s in got.items():
        assert abs(s - want[d]) < 1e-9
    assert set(got) == set(want)  # k=5 covers all matching docs


def test_sparse_hash_collisions_sum(spark):
    """dim=1 forces every term onto index 0: weights must sum, and the
    single posting per doc equals the sum of per-term weights."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    post = SP.sparse_features(docs, "text", "doc_id", dim=1)
    rows = post.collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["idx"] == 0 for r in rows)
    wide = SP.sparse_features(docs, "text", "doc_id", dim=1 << 20)
    sums = {
        r["doc_id"]: r["s"]
        for r in wide.groupBy("doc_id").agg(F.sum("weight").alias("s")).collect()
    }
    for r in rows:
        assert abs(r["weight"] - sums[r["doc_id"]]) < 1e-9


def test_sparse_topk_plan_broadcasts_query_and_takeordered(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    post = SP.sparse_features(d, "text", "doc_id")
    qv = SP.sparse_query(d, ["vector", "merge"], "text")
    plan = _plan(SP.sparse_topk(post, qv, k=10))
    assert "TakeOrderedAndProject" in plan  # no global sort
    # the query side reaches the posting join as a broadcast
    assert "BroadcastHashJoin" in plan


def test_to_sparsevec_rows(spark):
    docs = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    post = SP.sparse_features(docs, "text", "doc_id")
    row = SP.to_sparsevec(post, "doc_id").head()
    vec = row["sparsevec"]
    assert len(vec) == 2
    assert [e["i"] for e in vec] == sorted(e["i"] for e in vec)


# -- heavy hitters ----------------------------------------------------------


def test_heavy_hitters_exact_topk(spark, sf_dir):
    """Two-pass result == naive groupBy top-k (same ordering)."""
    d = load_table(spark, sf_dir, "documents")
    from postgresml_spark.functions.text import tokenize

    items = d.select(F.explode(tokenize(F.col("text"))).alias("term"))
    got = [(r["term"], r["cnt"]) for r in CO.heavy_hitters(items, "term", k=15).collect()]
    want = [
        (r["term"], r["cnt"])
        for r in items.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(15)
        .collect()
    ]
    assert got == want


def test_heavy_hitters_candidate_pass_bounds_emission(spark):
    """With capacity < distinct values, each partition emits at most
    ``capacity`` candidates — and frequent values still win exactly."""
    # 2 heavy values + 500 singletons, capacity 16
    rows = [("heavy_a",)] * 300 + [("heavy_b",)] * 200 + [
        (f"rare_{i}",) for i in range(500)
    ]
    items = spark.createDataFrame(rows, "term string").repartition(4)
    out = CO.heavy_hitters(items, "term", k=2, capacity=16).collect()
    assert [(r["term"], r["cnt"]) for r in out] == [("heavy_a", 300), ("heavy_b", 200)]


def test_heavy_hitters_survives_skewed_partitioning(spark):
    """All copies of the heavy value in ONE partition (worst case for
    per-partition summaries) still surface it."""
    rows = [(("hot" if i < 400 else f"cold_{i}"),) for i in range(1000)]
    items = spark.createDataFrame(rows, "term string").repartition(8, F.col("term"))
    out = CO.heavy_hitters(items, "term", k=1, capacity=64).collect()
    assert out[0]["term"] == "hot" and out[0]["cnt"] == 400


def test_sparse_queries_single_pass_matches_per_query(spark):
    """Batched (qid, idx, qweight) frame equals N independent
    sparse_query builds."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark shuffle join", "join filter", "scan filter scan"]
        )],
        "doc_id long, text string",
    )
    qdefs = [(0, ["join", "scan"]), (1, ["filter", "filter", "spark"])]
    batched = {
        (r["qid"], r["idx"]): r["qweight"]
        for r in SP.sparse_queries(docs, qdefs).collect()
    }
    for qid, terms in qdefs:
        single = {
            r["idx"]: r["qweight"] for r in SP.sparse_query(docs, terms).collect()
        }
        for idx, w in single.items():
            assert abs(batched[(qid, idx)] - w) < 1e-9
    assert len(batched) == sum(
        len(set(t.lower() for t in terms)) for _, terms in qdefs
    )


def test_sparse_topk_join_matches_per_query_topk(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark shuffle join", "join join filter", "spark spark spark",
             "filter scan", "shuffle shuffle join scan"]
        )],
        "doc_id long, text string",
    )
    post = SP.sparse_features(docs, "text", "doc_id")
    qdefs = [(0, ["join"]), (1, ["scan", "spark"])]
    qs = SP.sparse_queries(docs, qdefs)
    got = {
        (r["qid"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in SP.sparse_topk_join(post, qs, k=3).collect()
    }
    for qid, terms in qdefs:
        single = SP.sparse_topk(post, SP.sparse_query(docs, terms), k=3).collect()
        for rank, r in enumerate(single, start=1):
            d, s = got[(qid, rank)]
            assert d == r["doc_id"] and abs(s - r["score"]) < 1e-9


# -- materialized sparse index ----------------------------------------------


def _collision_free(terms, dim=1 << 18):
    from postgresml_spark.operators.sparse import _py_term_index

    idxs = [_py_term_index(t, dim, "sparse") for t in terms]
    return len(set(idxs)) == len(idxs)


def test_sparse_index_serves_same_scores_as_corpus_pipeline(spark, tmp_path):
    """On a collision-free vocabulary the served index reproduces the
    corpus-pipeline scores exactly (same idf form, idx == term)."""
    vocab = ["spark", "shuffle", "join", "filter", "scan", "merge"]
    assert _collision_free(vocab)
    docs = spark.createDataFrame(
        [(0, "spark shuffle join"), (1, "join join filter"),
         (2, "spark spark spark scan"), (3, "filter scan merge"),
         (4, "shuffle shuffle join scan")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sidx")
    SP.build_sparse_index(docs, path)
    terms = ["join", "scan"]
    served = {
        r["doc_id"]: r["score"]
        for r in SP.sparse_search_index(spark, path, terms, k=10).collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in SP.sparse_topk(
            SP.sparse_features(docs, "text", "doc_id"),
            SP.sparse_query(docs, terms, "text"),
            k=10,
        ).collect()
    }
    assert set(served) == set(want)
    for d in served:
        assert abs(served[d] - want[d]) < 1e-9


def test_sparse_index_prunes_buckets(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)], "doc_id long, text string"
    )
    path = str(tmp_path / "sidx_prune")
    SP.build_sparse_index(docs, path, n_buckets=16)
    df = SP.sparse_search_index(spark, path, ["common"], k=5)
    plan = _plan(df)
    assert "PartitionFilters" in plan and "__bucket" in plan
    assert df.count() == 5


def test_sparse_index_append_visible_and_idf_fresh(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "sidx_app")
    SP.build_sparse_index(docs, path)
    before = {r["doc_id"]: r["score"]
              for r in SP.sparse_search_index(spark, path, ["alpha"], k=10).collect()}
    assert set(before) == {0}
    batch = spark.createDataFrame([(2, "alpha alpha")], "doc_id long, text string")
    stats = SP.append_to_sparse_index(batch, path)
    assert stats["n_docs"] == 3
    after = {r["doc_id"]: r["score"]
             for r in SP.sparse_search_index(spark, path, ["alpha"], k=10).collect()}
    assert set(after) == {0, 2}
    # idf went stale-free: df(alpha) rose 1→2 and N 2→3, so doc 0's
    # score must CHANGE relative to the pre-append serve
    assert abs(after[0] - before[0]) > 1e-12
    # and doc 2 (tf=2) outscores doc 0 (tf=1)
    assert after[2] > after[0]


# -- MLlib bridge: hashed-text-feature classifier ---------------------------


def test_postings_to_vectors_trains_text_classifier(spark):
    """fasttext-style path: sparse hashed features → LogisticRegression.
    Two separable vocabularies must classify near-perfectly."""
    from pyspark.ml.classification import LogisticRegression

    rows = []
    for i in range(60):
        rows.append((i, "spark shuffle exchange partition stage", 0.0))
        rows.append((100 + i, "tomato basil garlic pasta olive", 1.0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label double")
    dim = 1 << 12
    post = SP.sparse_features(docs, "text", "doc_id", dim=dim)
    vec = SP.postings_to_vectors(post, dim)
    train = vec.join(docs.select("doc_id", "label"), "doc_id")
    from postgresml_spark.ml.train import strip_training_summary

    # direct fit outside pgml.train: strip the training summary like
    # train() does — it pins the SparkSession (non-serializable
    # ObservationManager) and flakes the transform closure when the
    # session has seen observed metrics (order-dependent)
    model = strip_training_summary(
        LogisticRegression(featuresCol="features_vec", labelCol="label").fit(train),
        spark,
    )
    pred = model.transform(train)
    acc = pred.filter(F.col("prediction") == F.col("label")).count() / train.count()
    assert acc >= 0.99
    # vectors really are sparse: dim large, stored entries per doc small
    sv = vec.head()["features_vec"]
    assert sv.size == dim and len(sv.indices) <= 5


def test_group_fold_is_group_coherent_and_balanced(spark):
    from postgresml_spark.ml.train import group_fold

    df = spark.createDataFrame(
        [(i % 50, i) for i in range(1000)], "grp long, row_id long"
    )
    folded = df.withColumn("fold", group_fold("grp", 5))
    # coherence: one fold per group
    per_group = folded.groupBy("grp").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert per_group.filter(F.col("nf") != 1).count() == 0
    # balance: every fold non-trivial (hash-uniform over 50 groups)
    sizes = {r["fold"]: r["n"] for r in
             folded.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 5 and min(sizes.values()) >= 60


def test_heavy_hitters_preserves_numeric_type(spark):
    """Non-string value columns (top user_ids — the canonical use) work
    and keep their dtype through the verify pass."""
    rows = [(7,)] * 30 + [(11,)] * 20 + [(i,) for i in range(100, 140)]
    items = spark.createDataFrame(rows, "uid long")
    out = CO.heavy_hitters(items, "uid", k=2, capacity=16)
    assert dict(out.dtypes)["uid"] == "bigint"
    assert [(r["uid"], r["cnt"]) for r in out.collect()] == [(7, 30), (11, 20)]


def test_served_sparse_index_parity_and_no_job(spark, sf_dir):
    """Resident sparse tier: identical top-k (ids + 6-dp scores) to the
    Spark sparse_topk_join path, zero Spark jobs on the warm query, and
    sub-millisecond latency class."""
    import time

    from postgresml_spark.operators.sparse import (
        ServedSparseIndex,
        sparse_features,
        sparse_queries,
        sparse_topk_join,
    )
    from postgresml_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    idx = ServedSparseIndex(d)
    cases = [["vector", "merge"], ["stream"], ["hash", "table", "hash"],
             ["nosuchtoken", "vector"]]
    post = sparse_features(d, "text", "doc_id")
    qs = sparse_queries(d, [(i, t) for i, t in enumerate(cases)])
    want_rows = sparse_topk_join(post, qs, k=10).collect()
    by_q = {}
    for r in want_rows:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for i, terms in enumerate(cases):
        got = idx.search(terms, k=10)
        want = sorted(by_q.get(i, []), key=lambda t: (-t[1], t[0]))
        assert [g[0] for g in got] == [w[0] for w in want], terms
        for (gd, gs), (wd, ws) in zip(got, want):
            assert round(gs, 6) == round(ws, 6)
    # no Spark job on the warm path
    with assert_no_spark_jobs(spark, "served sparse query"):
        t0 = time.perf_counter()
        for _ in range(5):
            idx.search(["vector", "merge"], k=10)
        dt = (time.perf_counter() - t0) / 5
    assert dt < 0.05, f"served sparse query {dt*1000:.2f} ms"
