"""Tests for the remaining SURVEY §2 surface: k-fold CV, joint models,
dump/load, metric wrappers, chat shim, query builder, ER diagram."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from postgresml_spark.ml import Registry, train
from postgresml_spark.ml.joint import predict_joint, train_joint
from postgresml_spark.ml.metrics import (
    classification_metrics_values,
    f1_score,
    r2_score,
    regression_metrics_values,
)
from postgresml_spark.sources.datasets import load_dataset


@pytest.fixture()
def registry(spark):
    d = tempfile.mkdtemp(prefix="pgml_wh_")
    yield Registry(spark, warehouse=d)
    shutil.rmtree(d, ignore_errors=True)


def test_linnerud_and_wine_datasets(spark, registry):
    # the reference ships 6 toy sets (api.rs:561-587); linnerud is the
    # multi-target one (chins situps jumps weight waist pulse), wine a
    # 13-feature 3-class set
    lin, n = load_dataset(spark, "linnerud")
    assert n == 20
    assert set(lin.columns) == {
        "row_id", "chins", "situps", "jumps", "weight", "waist", "pulse"
    }
    wine, n = load_dataset(spark, "wine")
    assert n == 178
    assert "alcohol" in wine.columns and "proline" in wine.columns
    assert wine.select("target").distinct().count() == 3
    res = train(
        spark, "Wine", "classification", wine, "target", algorithm="logistic",
        test_sampling="stratified", order_col="row_id", registry=registry,
    )
    assert res["metrics"]["accuracy"] > 0.8


def test_kfold_cv_search(spark, registry):
    df, _ = load_dataset(spark, "diabetes")
    res = train(
        spark, "CV", "regression", df, "target", algorithm="ridge",
        search="grid", search_params={"alpha": [0.01, 5000.0]},
        search_args={"cv": 3},
        test_sampling="last", order_col="row_id", registry=registry,
    )
    # CV must pick the small alpha (the huge one ruins r2)
    assert res["metrics"]["r2"] > 0.5


def test_train_joint_and_predict_joint(spark, registry):
    import pandas as pd

    df, _ = load_dataset(spark, "diabetes")
    # second synthetic target correlated with features
    df2 = df.withColumn("target2", F.col("target") * 2 + 10)
    res = train_joint(
        spark, "Joint", df2, ["target", "target2"],
        algorithm="linear", order_col="row_id", registry=registry,
    )
    assert res["metrics"]["per_target"]["target"]["r2"] > 0.5
    assert res["metrics"]["per_target"]["target2"]["r2"] > 0.5
    out = predict_joint(spark, "Joint", df2.drop("target", "target2"), registry=registry)
    row = out.head()
    assert len(row["predictions"]) == 2
    # target2 = 2*target + 10 must hold between the two predictions
    assert abs(row["predictions"][1] - (2 * row["predictions"][0] + 10)) < 1.0


def test_registry_dump_load(spark, registry, tmp_path):
    df, _ = load_dataset(spark, "diabetes", limit=100)
    train(spark, "D", "regression", df, "target", algorithm="linear",
          test_sampling="last", order_col="row_id", registry=registry)
    dump_dir = str(tmp_path / "dump")
    registry.dump_all(dump_dir)
    fresh = Registry(spark, warehouse=str(tmp_path / "wh2"))
    counts = fresh.load_all(dump_dir)
    assert counts["projects"] == 1 and counts["models"] == 1
    assert fresh.get_project("D") is not None
    assert fresh.deployed_model_id("D") is not None


def test_metric_value_wrappers(spark):
    assert abs(r2_score([1, 2, 3, 4], [1, 2, 3, 4]) - 1.0) < 1e-9
    assert abs(f1_score([0, 1, 1, 0], [0, 1, 1, 0]) - 1.0) < 1e-9
    m = regression_metrics_values([1, 2, 3], [1.1, 2.1, 2.9])
    assert m["mean_absolute_error"] < 0.2
    c = classification_metrics_values([0, 1, 0, 1], [0, 1, 1, 1])
    assert 0 < c["accuracy"] < 1
    # binary MCC, hand-computed: TP=2 TN=1 FP=1 FN=0 →
    # (2*1-1*0)/sqrt((2+1)(2+0)(1+1)(1+0)) = 2/sqrt(12)
    assert abs(c["mcc"] - 2 / 12**0.5) < 1e-9
    assert "mcc_error" not in c
    perfect = classification_metrics_values([0, 1, 2, 0], [0, 1, 2, 0])
    assert abs(perfect["mcc"] - 1.0) < 1e-9


def test_chat_completions_shim():
    from postgresml_spark.functions.llm import chat_completions_create

    out = chat_completions_create(
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "what is spark?"}]
    )
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert "what is spark?" in out["choices"][0]["message"]["content"]
    out2 = chat_completions_create(
        [{"role": "user", "content": "hi"}], completion_fn=lambda p: "real answer"
    )
    assert out2["choices"][0]["message"]["content"] == "real answer"


def test_clear_gpu_cache_noop():
    from postgresml_spark.functions.llm import clear_gpu_cache

    assert clear_gpu_cache() is False  # no GPU in this image


def test_query_builder_fluent(spark, tmp_path):
    from postgresml_spark.collections import Collection, Pipeline

    c = Collection("qb", spark, warehouse=str(tmp_path))
    c.upsert_documents([
        {"id": 1, "body": "spark distributed engine", "tag": "a"},
        {"id": 2, "body": "pasta cooking recipe", "tag": "b"},
    ])
    p = Pipeline("p", {"body": {"semantic_search": {"model": "hash:64"}}})
    c.add_pipeline(p)
    rows = c.query_builder().vector_recall("spark engine", p).limit(1).fetch_all()
    assert len(rows) == 1
    score, chunk, doc = rows[0]
    assert doc["id"] == 1
    rows2 = (
        c.query_builder().vector_recall("spark engine", p)
        .filter({"tag": "b"}).limit(5).fetch_all()
    )
    assert [r[2]["id"] for r in rows2] == [2]


def test_er_diagram(spark, tmp_path):
    from postgresml_spark.collections import Collection, Pipeline

    c = Collection("er", spark, warehouse=str(tmp_path))
    c.upsert_documents([{"id": 1, "body": "x"}])
    p = Pipeline("p", {"body": {"semantic_search": {"model": "hash:16"},
                                "full_text_search": {"configuration": "english"}}})
    c.add_pipeline(p)
    mermaid = c.generate_er_diagram()
    assert mermaid.startswith("erDiagram")
    assert "p_body_chunks" in mermaid and "p_body_embeddings" in mermaid
    assert "documents ||--o{" in mermaid


def test_approx_count_distinct_within_rsd(spark):
    """Approximate-distinct (HLL++) stays within its declared relative
    standard deviation — the sketch the streaming rollup and any
    100 TB cardinality estimate rely on."""
    from pyspark.sql import functions as F

    n = 20_000
    df = spark.range(n).select((F.col("id") % 7919).alias("k"))  # 7919 distinct
    exact = 7919
    for rsd in (0.05, 0.01):
        got = df.agg(F.approx_count_distinct("k", rsd).alias("a")).head()["a"]
        assert abs(got - exact) / exact < 4 * rsd, (rsd, got)


def test_query_registry_contract():
    """Gate-contract lint: every oracle has a query, names are unique
    and well-formed, and EVERY catalog query carries an oracle (r3:
    q15/q24/q25 gained md5-portable / IVF-store-closure oracles and
    q29 moved to real raw decode over md5-derived pixels with the
    features recomputed arithmetically — zero rows-only entries)."""
    import __spark_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q)
    rows_only = set(q) - set(o)
    assert rows_only == set()
    assert all(name.startswith("q") and "_" in name for name in q)
    # oracle SQL strings are non-trivial and reference a known table
    tables = ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings")
    for name, sql in o.items():
        assert len(sql) > 40, name
        assert any(t in sql for t in tables), name


def test_jsonl_roundtrip_and_corrupt_lines(spark, tmp_path):
    """JSONL corpus IO: write→read is lossless under an enforced
    schema; a corrupt line is captured (not job-fatal), countable,
    and droppable."""
    import gzip
    import os

    from postgresml_spark.sources.corpus_io import (
        corrupt_line_count,
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(1, 'a "quoted"\nline', 7), (2, "unicode é中", 9)],
        "doc_id bigint, text string, n int",
    )
    p = str(tmp_path / "corpus")
    write_jsonl(df, p, max_records_per_file=1)
    back = read_jsonl(spark, p, schema="doc_id bigint, text string, n int")
    assert corrupt_line_count(back) == 0
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {1: 'a "quoted"\nline', 2: "unicode é中"}

    # inject a corrupt shard
    with gzip.open(os.path.join(p, "bad.json.gz"), "wt") as f:
        f.write('{"doc_id": 3, "text": "ok", "n": 1}\n')
        f.write("{not json at all\n")
    back2 = read_jsonl(spark, p, schema="doc_id bigint, text string, n int")
    assert corrupt_line_count(back2) == 1
    clean = read_jsonl(
        spark, p, schema="doc_id bigint, text string, n int", drop_corrupt=True
    )
    assert clean.count() == 3 and "_corrupt_record" not in clean.columns


def test_tar_shard_roundtrip(spark, tmp_path):
    """WebDataset tar shards: write (key, member, data) samples to tar
    shards, re-read distributed, byte-exact roundtrip with whole
    samples kept in one shard."""
    from postgresml_spark.sources.corpus_io import (
        read_tar_shards,
        write_tar_shards,
    )

    rows = []
    for i in range(20):
        rows.append((f"{i:06d}", "bin", bytes([i % 256]) * (i + 1)))
        rows.append((f"{i:06d}", "json", f'{{"id": {i}}}'.encode()))
    df = spark.createDataFrame(rows, "key string, member string, data binary")
    p = str(tmp_path / "shards")
    n_shards = write_tar_shards(df, p, samples_per_shard=8)
    assert n_shards >= 3  # 20 samples / 8 per shard

    back = read_tar_shards(spark, p)
    got = back.collect()
    assert len(got) == 40
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], {})[r["member"]] = (bytes(r["data"]), r["shard"])
    assert set(by_key) == {f"{i:06d}" for i in range(20)}
    for i in range(20):
        k = f"{i:06d}"
        assert by_key[k]["bin"][0] == bytes([i % 256]) * (i + 1)
        assert by_key[k]["json"][0] == f'{{"id": {i}}}'.encode()
        # whole sample in one shard
        assert by_key[k]["bin"][1] == by_key[k]["json"][1]


def test_kmv_estimator_error_bound(spark):
    """KMV distinct sketch: relative error on a known-cardinality set
    stays within 4/sqrt(k) (k=128 → 35%); typical is ~1/sqrt(k)."""
    from pyspark.sql import functions as F

    k = 128
    n_true = 10_000
    df = spark.range(n_true).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    )
    top = df.distinct().orderBy("hv").limit(k)
    row = top.agg(F.count("*").alias("n"), F.max("hv").alias("hk")).head()
    assert row["n"] == k
    est = (k - 1) / (row["hk"] / float(1 << 60))
    assert abs(est - n_true) / n_true < 4 / (k ** 0.5), est


def test_csv_corpus_and_schema_evolution(spark, tmp_path):
    """CSV corpus read (quoted multiline, corrupt capture) and JSONL
    schema evolution: later shards add a field; an evolved read
    null-fills old rows instead of failing."""
    import os

    from postgresml_spark.sources.corpus_io import (
        read_csv_corpus,
        read_jsonl,
        write_jsonl,
    )

    # CSV with a quoted multiline field and an embedded quote
    p = str(tmp_path / "csv")
    os.makedirs(p)
    with open(os.path.join(p, "a.csv"), "w") as f:
        f.write('doc_id,text\n1,"line one\nline two"\n2,"said ""hi"""\n')
    df = read_csv_corpus(spark, p, schema="doc_id bigint, text string")
    got = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == {1: "line one\nline two", 2: 'said "hi"'}

    # JSONL schema evolution: v2 shards add `lang`
    j = str(tmp_path / "jsonl")
    v1 = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    v2 = spark.createDataFrame(
        [(2, "b", "en")], "doc_id bigint, text string, lang string"
    )
    write_jsonl(v1, os.path.join(j, "v1"))
    write_jsonl(v2, os.path.join(j, "v2"))
    evolved = read_jsonl(
        spark, os.path.join(j, "*"),
        schema="doc_id bigint, text string, lang string", drop_corrupt=True,
    )
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in evolved.collect()}
    assert rows == {1: ("a", None), 2: ("b", "en")}
