"""Corpus-hygiene operators: benchmark decontamination + PII redaction."""

import pytest
from pyspark.sql import functions as F

from postgresml_spark.functions.pii import PII_PATTERNS, pii_counts, redact_pii
from postgresml_spark.operators.decontam import (
    benchmark_grams,
    contamination_report,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "completely unrelated sentence about spark physical plans"),
        (2, "the quick brown fox jumps over something else entirely"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


def test_contamination_ratio(corpus, bench):
    rep = {
        r["doc_id"]: r
        for r in contamination_report(corpus, bench, n=3).collect()
    }
    # doc 0 shares almost all 3-grams with the benchmark doc
    assert rep[0]["n_hits"] >= 6 and rep[0]["ratio"] > 0.7
    # doc 1 shares none
    assert rep[1]["n_hits"] == 0 and rep[1]["ratio"] == 0.0
    # doc 2 shares the "the quick brown ..." prefix grams only
    assert 0 < rep[2]["ratio"] < 1
    # empty doc: 1 degenerate gram (''), zero hits unless bench has one
    assert rep[3]["n_hits"] == 0 and rep[3]["ratio"] == 0.0


def test_decontaminate_drops_dirty(corpus, bench):
    kept = decontaminate(corpus, bench, n=3, max_ratio=0.7)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 not in ids  # near-copy of the benchmark is dropped
    assert {1, 2, 3} <= ids
    # original columns survive
    assert kept.columns == corpus.columns


def test_benchmark_grams_distinct(bench):
    g = benchmark_grams(bench, n=3)
    vals = [r["gram"] for r in g.collect()]
    assert len(vals) == len(set(vals))
    assert "the quick brown" in vals


def test_contamination_join_is_broadcast(corpus, bench):
    plan = contamination_report(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


PII_SAMPLE = (
    "mail alice.smith+x@corp.example.org, card 4111 1111 1111 1111, "
    "ssn 123-45-6789, call 555-123-4567 or 555.987.6543, host 10.0.0.7 done"
)


def test_pii_counts(spark):
    df = spark.createDataFrame([(PII_SAMPLE,), ("no pii here",)], "text string")
    rows = df.select(pii_counts("text").alias("p")).collect()
    p = rows[0]["p"].asDict()
    assert p == {
        "email": 1, "credit_card": 1, "ssn": 1, "phone": 2, "ipv4": 1,
        "total": 6,
    }
    assert rows[1]["p"]["total"] == 0


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame([(PII_SAMPLE,)], "text string")
    red = df.select(redact_pii("text").alias("r")).head()["r"]
    for kind in PII_PATTERNS:
        assert f"<{kind.upper()}>" in red
    # no raw identifiers survive
    for frag in ("example.org", "4111", "123-45-6789", "555-123-4567", "10.0.0.7"):
        assert frag not in red


def test_redact_pii_kinds_subset(spark):
    df = spark.createDataFrame([(PII_SAMPLE,)], "text string")
    red = df.select(redact_pii("text", kinds=["email"]).alias("r")).head()["r"]
    assert "<EMAIL>" in red and "<PHONE>" not in red
    assert "555-123-4567" in red  # untouched kinds survive


def test_ssn_phone_disambiguation(spark):
    # 3-2-4 is SSN, 3-3-4 is phone; each must match only its own shape
    df = spark.createDataFrame(
        [("a 111-22-3333 b 444-555-6666 c",)], "text string"
    )
    row = df.select(
        pii_counts("text").alias("p"), redact_pii("text").alias("r")
    ).head()
    assert row["p"]["ssn"] == 1 and row["p"]["phone"] == 1
    assert "<SSN>" in row["r"] and "<PHONE>" in row["r"]


def test_pii_is_codegen_only(spark):
    # whole pipeline stays in one WholeStageCodegen project — no
    # BatchEvalPython / shuffle anywhere
    df = spark.createDataFrame([(PII_SAMPLE,)], "text string")
    out = df.select(redact_pii("text").alias("r"), pii_counts("text").alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_embedding_near_dup_block_parity(spark, sf_dir):
    """impl='block' (per-bucket gram matmul) finds the same pairs as
    the expression join, with cosines equal to 1e-9, and its plan moves
    rows (FlatMapGroupsInPandas), never candidate pairs (no join)."""
    from postgresml_spark.operators import dedup as DD
    from postgresml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", DD.sign_lsh_bucket("embedding", 4)
    )
    kw = dict(threshold=0.35, group_col="bucket")
    expr_pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in DD.embedding_near_dup_pairs(emb, "embedding", "vec_id", **kw).collect()
    }
    block = DD.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", impl="block", block_rows=64, **kw
    )
    block_pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in block.collect()}
    assert set(block_pairs) == set(expr_pairs)
    for k, v in expr_pairs.items():
        assert abs(block_pairs[k] - v) < 1e-9
    plan = block._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_repetition_flags(spark):
    from postgresml_spark.operators.corpus import repetition_flags

    rows = [
        # clean prose: everything under thresholds
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"),
        # the same line repeated -> dup_line_frac 0.75
        (1, "same line here\nsame line here\nsame line here\nsame line here"),
        # one 5-gram repeated over and over -> dup_ngram_frac high
        (2, " ".join(["one two three four five"] * 10)),
        # empty text: all fracs 0, kept
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_flags(df).collect()}
    assert out[0]["keep_repetition"]
    assert out[0]["dup_line_frac"] == 0.0 and out[0]["dup_ngram_frac"] == 0.0

    assert out[1]["dup_line_frac"] == 0.75
    assert not out[1]["keep_repetition"]

    assert out[2]["dup_ngram_frac"] > 0.8
    # "one two" (etc) dominates the 2-gram mass too
    assert out[2]["top2gram_char_frac"] > 0.2
    assert not out[2]["keep_repetition"]

    assert out[3]["dup_line_frac"] == 0.0 and out[3]["keep_repetition"]


def test_semantic_dedup_keep_first(spark):
    from postgresml_spark.operators.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 -> dropped
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal -> kept
        (3, [0.0, 0.999, 0.01, 0.0]),   # near-dup of 2 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, threshold=0.95, group_col=None, impl="block",
                          allow_all_pairs=True)  # small fixture opts in
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert ids == [0, 2]
    # column set preserved
    assert set(kept.columns) == {"vec_id", "embedding"}


def test_knn_join_matches_knn_exact(spark, sf_dir):
    from postgresml_spark.operators.similarity import knn_exact, knn_join
    from postgresml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    joined = knn_join(emb, qs, k=5)
    got = {}
    for r in joined.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], round(r["score"], 9)))
    for qid, qv in qs:
        exact = [
            (r["vec_id"], round(r["score"], 9))
            for r in knn_exact(emb, qv, k=5).collect()
        ]
        assert sorted(got[qid]) == sorted(exact), f"query {qid}"
    # scale shape: no cartesian product in the plan — scoring happens
    # inside mapInPandas, the only join-free wide op is the final window
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "MapInPandas" in plan


def test_remote_embed_import_gate(spark):
    """openai: models route to the client-side remote path; without the
    openai client the gate must raise NotImplementedError with a clear
    message (never a half-built plan)."""
    import pytest as _pytest

    from postgresml_spark.collections import Collection, Pipeline
    from postgresml_spark.functions.embed import remote_embed_py

    with _pytest.raises(NotImplementedError, match="openai"):
        remote_embed_py("openai:text-embedding-3-small", "hello")

    coll = Collection("remote_gate", spark, warehouse="/tmp/pgml_remote_gate")
    pipe = Pipeline("p", {"text": {"semantic_search": {"model": "openai:text-embedding-3-small"}}})
    pipe.attach(coll)
    with _pytest.raises(NotImplementedError, match="openai"):
        pipe.embed_query("hello", "text")


def test_catalog_plan_lint(spark):
    """Plan-lint over the ENTIRE query catalog: no CartesianProduct
    anywhere, and unpartitioned (global) windows appear only in the
    whitelisted queries where the windowed frame is provably bounded
    (LIMIT-bounded top-N lists, distinct-value/statistic frames) —
    the WindowExec-suppression contract in session.py, now pinned so
    a future query can't silently regress into a corpus-sized global
    sort or an accidental cross join."""
    import re

    import __spark_entry__ as entry_mod

    from conftest import SF_DIR

    # every global window here runs over a bounded frame:
    #   q92/q168/q146 — LIMIT-bounded top-N result lists
    #   q134/q138/q139 — distinct-value / per-bin statistic frames
    #   q118 — aggregated event-time axis (K-M curve rows)
    #   q147 — filtered per-customer sequence audit
    bounded_global_windows = {
        "q92_rrf_hybrid", "q168_sparse_dense_hybrid", "q146_ranking_metrics",
        "q134_spearman_corr", "q138_ks_drift", "q139_mann_whitney",
        "q118_kaplan_meier", "q147_orderkey_islands",
    }
    gw = re.compile(r"windowspecdefinition\([^,()]+ (?:ASC|DESC) NULLS \w+,")
    offenders = {}
    for name, fn in sorted(entry_mod.queries().items()):
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if gw.search(plan) and name not in bounded_global_windows:
            flags.append("unpartitioned window")
        if flags:
            offenders[name] = flags
    assert offenders == {}, offenders


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


def test_bloom_report_equals_exact(corpus, bench):
    from postgresml_spark.operators.decontam import (
        bloom_contamination_report,
    )

    exact = sorted(
        contamination_report(corpus, bench, n=3).collect(),
        key=lambda r: r["doc_id"],
    )
    blm = sorted(
        bloom_contamination_report(corpus, bench, n=3).collect(),
        key=lambda r: r["doc_id"],
    )
    assert blm == exact  # exact verify stage ⇒ identical report


def test_bloom_no_false_negatives_and_filters(corpus, bench):
    """Every benchmark gram must pass its own bitmap (structural — a
    Bloom filter has no false negatives), and on disjoint text the
    probe must actually reject most grams (selectivity)."""
    from postgresml_spark.operators.decontam import (
        _doc_grams,
        bloom_probe,
        build_bloom,
    )

    grams = benchmark_grams(bench, n=3)
    words, m, k = build_bloom(grams)
    assert grams.where(~bloom_probe(F.col("gram"), words, m, k)).count() == 0

    corpus_grams = _doc_grams(corpus, "text", "doc_id", 3)
    total = corpus_grams.count()
    kept = corpus_grams.where(bloom_probe(F.col("gram"), words, m, k)).count()
    true = corpus_grams.join(F.broadcast(grams), "gram").count()
    assert true <= kept < total  # superset of truth, strict prefilter


def test_bloom_probe_is_codegen_no_join(corpus, bench):
    """The prefilter itself must add no join to the plan — it's a
    Filter over the scan (the bitmap rides as a plan literal)."""
    from postgresml_spark.operators.decontam import (
        _doc_grams,
        bloom_probe,
        build_bloom,
    )

    words, m, k = build_bloom(benchmark_grams(bench, n=3))
    dg = _doc_grams(corpus, "text", "doc_id", 3)
    plan = (
        dg.where(bloom_probe(F.col("gram"), words, m, k))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
