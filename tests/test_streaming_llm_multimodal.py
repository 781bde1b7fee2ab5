"""Streaming, LLM-surface, and multimodal plumbing tests."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from postgresml_spark.functions.llm import TaskWhitelist, generate_udf, rank, transform_udf
from postgresml_spark.operators import multimodal as MM
from postgresml_spark.session import load_table
from postgresml_spark.streaming import (
    stream_documents_into_collection,
    transform_stream,
    windowed_event_aggregation,
)
from postgresml_spark.streaming.streams import EVENT_SCHEMA, run_stream_to_memory


def test_windowed_agg_batch_parity(spark, sf_dir):
    # batch mode: same expression as q30 but with window() bucketing
    e = load_table(spark, sf_dir, "events")
    agg = windowed_event_aggregation(e)
    rows = agg.collect()
    assert rows
    total = sum(r["n_events"] for r in rows)
    assert total == e.count()


def test_windowed_agg_streaming(spark, sf_dir, tmp_path):
    # stream the events parquet as files → watermarked windowed agg
    e = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream_src")
    e.limit(500).write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    agg = windowed_event_aggregation(stream, window="1 hour", watermark="2 hours")
    assert agg.isStreaming
    run_stream_to_memory(agg, "evt_out")
    got = spark.sql("SELECT sum(n_events) FROM evt_out").head()[0]
    assert got == 500


def test_stream_documents_into_collection(spark, tmp_path):
    from postgresml_spark.collections import Collection, Pipeline

    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    coll = Collection("streamc", spark, warehouse=str(tmp_path / "wh"))
    pipe = Pipeline("p", {"body": {"semantic_search": {"model": "hash:16"}}})
    coll.add_pipeline(pipe)
    with open(os.path.join(src, "batch1.json"), "w") as f:
        f.write(json.dumps({"id": 1, "body": "hello spark streaming"}) + "\n")
        f.write(json.dumps({"id": 2, "body": "second document"}) + "\n")
    q = stream_documents_into_collection(spark, src, coll)
    q.processAllAvailable()
    # late-arriving file
    with open(os.path.join(src, "batch2.json"), "w") as f:
        f.write(json.dumps({"id": 3, "body": "third arrives later"}) + "\n")
    q.processAllAvailable()
    q.stop()
    assert len(coll.get_documents()) == 3
    assert pipe.status()["counts"]["body_embeddings"] == 3


def test_transform_stream_contract():
    toks = list(transform_stream("one two three", max_tokens=8))
    assert [t["index"] for t in toks] == list(range(8))
    # prompt-conditioned decode: every token comes from the prompt vocab
    assert all(t["token"] in {"one", "two", "three"} for t in toks)
    # deterministic
    again = [t["token"] for t in transform_stream("one two three", max_tokens=8)]
    assert again == [t["token"] for t in toks]


def test_transform_stream_is_incremental():
    """api.rs:753-824 semantics: tokens arrive BEFORE generation
    completes — the decode step for token i runs only when the
    consumer pulls token i."""
    from postgresml_spark.functions.llm import HashLM

    lm = HashLM()
    gen = transform_stream("alpha beta gamma delta", max_tokens=16, lm=lm)
    assert lm.generated == 0  # nothing decoded until first pull
    first = next(gen)
    assert lm.generated == 1 and first["index"] == 0
    next(gen)
    assert lm.generated == 2  # exactly one more decode step
    rest = list(gen)
    assert lm.generated == 16 and len(rest) == 14


def test_rag_stream_routes_twin_lm(spark, tmp_path):
    from postgresml_spark.collections import Collection, Pipeline
    from postgresml_spark.collections.search import rag_stream
    from postgresml_spark.functions.llm import HashLM

    coll = Collection("ragstream", spark, warehouse=str(tmp_path / "wh"))
    pipe = Pipeline("p", {"body": {"semantic_search": {"model": "hash:16"}}})
    coll.add_pipeline(pipe)
    coll.upsert_documents(
        [
            {"id": 1, "body": "spark is a distributed engine"},
            {"id": 2, "body": "postgres stores relational data"},
        ]
    )
    lm = HashLM()
    gen = rag_stream(
        coll,
        pipe,
        {
            "CONTEXT": {
                "vector_search": {
                    "query": {"fields": {"body": {"query": "spark engine"}}},
                    "document": {"keys": ["id"]},
                    "limit": 1,
                },
                "aggregate": {"join": "\n"},
            },
            "completion": {
                "prompt": "Answer from: {CONTEXT}",
                "max_tokens": 6,
            },
        },
        lm=lm,
    )
    head = next(gen)
    assert "{CONTEXT}" not in head["prompt"] and head["sources"]["CONTEXT"]
    assert lm.generated == 0  # retrieval done, generation not started
    tok = next(gen)
    assert lm.generated == 1 and tok["index"] == 0
    toks = [tok] + list(gen)
    assert len(toks) == 6 and lm.generated == 6


def test_transform_udf_fake_shapes(spark):
    df = spark.createDataFrame(
        [(1, "this is a good great day"), (2, "bad poor terrible")], "id int, t string"
    )
    out = df.select("id", transform_udf("text-classification")(F.col("t")).alias("r")).collect()
    r1 = json.loads(out[0]["r"])[0]
    r2 = json.loads(out[1]["r"])[0]
    assert r1["label"] == "POSITIVE" and r2["label"] == "NEGATIVE"
    assert 0.5 <= r1["score"] <= 1.0


def test_transform_whitelist():
    with pytest.raises(ValueError, match="not whitelisted"):
        transform_udf("arbitrary-code-execution")
    wl = TaskWhitelist(allowed_models=["google/"])
    with pytest.raises(ValueError, match="whitelist"):
        transform_udf("summarization", model="evil/model", whitelist=wl)
    transform_udf("summarization", model="google/flan", whitelist=wl)  # ok


def test_transform_strict_raises_without_transformers():
    with pytest.raises(NotImplementedError):
        transform_udf("summarization", strict=True)


def test_rank_ordering(spark):
    df = spark.createDataFrame(
        [(1, "spark engine for data"), (2, "cooking pasta recipes"), (3, "spark data")],
        "cid int, chunk string",
    )
    out = rank(df, "spark data engine", id_col="cid").collect()
    assert out[0]["corpus_id"] in (1, 3)
    assert out[-1]["corpus_id"] == 2
    assert out[0]["score"] >= out[1]["score"] >= out[2]["score"]


def test_generate_udf_fallback(spark):
    df = spark.createDataFrame([("complete this",)], "p string")
    out = df.select(generate_udf()(F.col("p")).alias("g")).head()["g"]
    assert out.endswith("<generated>")


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"\x01\x02\x03", {"width": 16, "height": 8, "duration_ms": None, "format": "png"}),
        (2, "image", b"\x04\x05", {"width": 4, "height": 4, "duration_ms": None, "format": "png"}),
        (3, "video", b"\x0a", {"width": 64, "height": 32, "duration_ms": 5500, "format": "mp4"}),
    ]
    return spark.createDataFrame(rows, MM.ASSET_SCHEMA)


def test_multimodal_extract_features(assets):
    out = MM.extract_features(assets, decoder=MM.fake_decoder).collect()
    got = {r["asset_id"]: r["features"] for r in out}
    assert len(got[1]) == 8
    assert got[1][2] == 16 * 8  # size = h*w
    # deterministic: same bytes → same features
    out2 = MM.extract_features(assets, decoder=MM.fake_decoder).collect()
    assert {r["asset_id"]: r["features"] for r in out2} == got


def test_multimodal_strict_decoder_raises(assets):
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        MM.extract_features(assets, decoder=MM.strict_decoder).collect()


def test_multimodal_resize(assets):
    out = MM.resize(assets, 4, 4, decoder=MM.fake_decoder).collect()
    for r in out:
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
        assert len(r["data"]) == 16  # 4x4 uint8


def test_multimodal_frame_sample(assets):
    out = MM.frame_sample(assets, every_ms=1000).collect()
    assert {r["asset_id"] for r in out} == {3}
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000, 4000]


def test_stateful_sessionize_streaming(spark, sf_dir, tmp_path):
    from postgresml_spark.streaming.streams import stateful_sessionize

    e = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "sess_src")
    e.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    sessions = stateful_sessionize(stream, gap_minutes=30)
    assert sessions.isStreaming
    q = (sessions.writeStream.outputMode("append")
         .format("memory").queryName("sess_out").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT count(*) AS n, sum(n_events) AS total FROM sess_out"
    ).head()
    # closed sessions only (append mode drops the still-open tail), but
    # every emitted session must be internally consistent
    rows = spark.sql("SELECT * FROM sess_out").collect()
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    assert got["n"] is not None


def test_predict_one_fast_path(spark, tmp_path):
    import time

    from postgresml_spark.ml import Registry, train
    from postgresml_spark.ml.predict import predict_one
    from postgresml_spark.sources.datasets import load_dataset

    reg = Registry(spark, warehouse=str(tmp_path))
    df, _ = load_dataset(spark, "diabetes")
    train(spark, "Fast", "regression", df, "target", algorithm="linear",
          test_sampling="last", order_col="row_id", registry=reg)
    feats = [float(x) for x in df.drop("target").head()[0:]]
    p1 = predict_one(spark, "Fast", feats, registry=reg)
    assert isinstance(p1, float)
    # cached second call is sub-millisecond-ish (no Spark job)
    t0 = time.time()
    for _ in range(50):
        predict_one(spark, "Fast", feats, registry=reg)
    assert (time.time() - t0) / 50 < 0.05


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicates inside the watermark horizon are dropped; state stays
    bounded by the watermark (dropDuplicatesWithinWatermark)."""
    from postgresml_spark.streaming.streams import streaming_dedup

    src = str(tmp_path / "dd_in")
    os.makedirs(src)
    rows = [
        {"ts": "2026-01-01T10:00:00", "fingerprint": "aaa", "text": "one"},
        {"ts": "2026-01-01T10:00:05", "fingerprint": "bbb", "text": "two"},
        {"ts": "2026-01-01T10:00:10", "fingerprint": "aaa", "text": "one dup"},
        {"ts": "2026-01-01T10:00:20", "fingerprint": "ccc", "text": "three"},
        {"ts": "2026-01-01T10:00:25", "fingerprint": "bbb", "text": "two dup"},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "ts timestamp, fingerprint string, text string"
    ).json(src)
    deduped = streaming_dedup(stream, ts_col="ts", fingerprint_col="fingerprint")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT fingerprint FROM dd_out").collect()
    finally:
        q.stop()
    fps = sorted(r["fingerprint"] for r in got)
    assert fps == ["aaa", "bbb", "ccc"]


def test_stream_corpus_pipeline_end_to_end(spark, tmp_path):
    """Continuous corpus ingest with hygiene: the quality gate drops
    junk, the watermark dedup drops in-horizon repeats, survivors land
    in the collection and the attached pipeline re-syncs."""
    from postgresml_spark.collections import Collection, Pipeline
    from postgresml_spark.streaming.streams import stream_corpus_pipeline

    good = ("the quick brown fox jumps over the lazy dog and then "
            "keeps running through the field for a while longer")
    src = str(tmp_path / "corpus_in")
    os.makedirs(src)
    coll = Collection("streamh", spark, warehouse=str(tmp_path / "whh"))
    pipe = Pipeline("p", {"text": {"semantic_search": {"model": "hash:16"}}})
    coll.add_pipeline(pipe)

    rows = [
        {"id": 1, "text": good, "ts": "2026-01-01T00:00:00"},
        {"id": 2, "text": good, "ts": "2026-01-01T00:10:00"},      # dup of 1 (in horizon)
        {"id": 3, "text": "x", "ts": "2026-01-01T00:20:00"},       # fails word-count gate
        {"id": 4, "text": good + " with a genuinely different tail here",
         "ts": "2026-01-01T00:30:00"},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    q = stream_corpus_pipeline(spark, src, coll)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    docs = coll.get_documents()
    ids = sorted(d["document"]["id"] for d in docs)
    assert ids == [1, 4]  # 2 deduped, 3 gated out
    assert pipe.status()["counts"]["text_embeddings"] == 2


def test_stream_corpus_pipeline_history_index_dedup(spark, tmp_path):
    """Cross-horizon duplicates (beyond the watermark) are caught by
    the persistent fingerprint index, not stream state."""
    from postgresml_spark.collections import Collection
    from postgresml_spark.streaming.streams import stream_corpus_pipeline

    good = ("the quick brown fox jumps over the lazy dog and then "
            "keeps running through the field for a while longer")
    other = ("meanwhile the cat sat quietly on the warm windowsill "
             "watching the birds outside in the garden all afternoon")
    src = str(tmp_path / "corpus_in2")
    os.makedirs(src)
    coll = Collection("streamidx", spark, warehouse=str(tmp_path / "whidx"))
    idx = str(tmp_path / "fp_index")

    q = stream_corpus_pipeline(
        spark, src, coll, dedup_delay="10 minutes",
        checkpoint=str(tmp_path / "ckpt2"),
        fingerprint_index_path=idx,
    )
    try:
        with open(os.path.join(src, "b1.json"), "w") as f:
            f.write(json.dumps({"id": 1, "text": good,
                                "ts": "2026-01-01T00:00:00"}) + "\n")
        q.processAllAvailable()
        # batch 2 arrives 10 DAYS later: watermark state is long gone,
        # only the index can know doc 1's text was already ingested
        with open(os.path.join(src, "b2.json"), "w") as f:
            f.write(json.dumps({"id": 2, "text": good,
                                "ts": "2026-01-11T00:00:00"}) + "\n")
            f.write(json.dumps({"id": 3, "text": other,
                                "ts": "2026-01-11T00:00:01"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(d["document"]["id"] for d in coll.get_documents())
    assert ids == [1, 3]  # 2 suppressed by the history index
    fps = spark.read.parquet(idx)
    assert fps.count() == 2 and fps.distinct().count() == 2


def test_enrich_stream_static_broadcast_join(spark, tmp_path):
    from postgresml_spark.streaming.streams import enrich_stream

    src = str(tmp_path / "enrich_in")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(json.dumps({"user_id": 1, "value": 10.0}) + "\n")
        f.write(json.dumps({"user_id": 2, "value": 20.0}) + "\n")
        f.write(json.dumps({"user_id": 9, "value": 5.0}) + "\n")
    stream = spark.readStream.schema("user_id long, value double").json(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    out = enrich_stream(stream, dim, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["user_id"]: r["tier"] for r in spark.sql(
        "select * from enriched_out").collect()}
    assert rows == {1: "gold", 2: "silver", 9: None}


def test_idempotent_sink_skips_replayed_epoch(spark, tmp_path):
    from postgresml_spark.collections import Collection
    from postgresml_spark.streaming.streams import idempotent_sink

    coll = Collection("idem", spark, warehouse=str(tmp_path / "wh_idem"))
    sink = idempotent_sink(coll, str(tmp_path / "fence"))
    b1 = spark.createDataFrame(
        [(1, "first doc text", "2026-01-01")], "id long, text string, ts string"
    )
    sink(b1, epoch_id=0)
    assert len(coll.get_documents()) == 1
    # crash-replay of epoch 0 with the same payload: must be a no-op
    sink(b1, epoch_id=0)
    assert len(coll.get_documents()) == 1
    # next epoch applies
    b2 = spark.createDataFrame(
        [(2, "second doc text", "2026-01-02")], "id long, text string, ts string"
    )
    sink(b2, epoch_id=1)
    assert len(coll.get_documents()) == 2
    # stale epoch arriving late (out-of-order replay) is also fenced
    sink(b1, epoch_id=0)
    assert len(coll.get_documents()) == 2


def test_stateful_ewma_anomaly_live_stream(spark, tmp_path):
    """State persists ACROSS micro-batches: a spike in batch 2 is
    judged against statistics learned in batch 1."""
    import math

    from postgresml_spark.streaming.streams import stateful_ewma_anomaly

    src = str(tmp_path / "ewma_in")
    os.makedirs(src)
    base = [{"user_id": 1, "ts": f"2026-01-01T00:{i:02d}:00", "value": 10.0 + (i % 3)}
            for i in range(10)]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in base:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double").json(src)
    out = stateful_ewma_anomaly(stream, alpha=0.3, z_threshold=3.0)
    q = (out.writeStream.format("memory").queryName("ewma_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ewma_ckpt")).start())
    try:
        q.processAllAvailable()
        with open(os.path.join(src, "b2.json"), "w") as f:
            f.write(json.dumps({"user_id": 1, "ts": "2026-01-01T00:30:00",
                                "value": 500.0}) + "\n")
            f.write(json.dumps({"user_id": 1, "ts": "2026-01-01T00:31:00",
                                "value": 11.0}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["value"]: r for r in spark.sql("select * from ewma_out").collect()}
    assert rows[500.0]["is_anomaly"] is True     # spike vs batch-1 state
    assert rows[10.0]["is_anomaly"] is False
    assert all(not r["is_anomaly"] for v, r in rows.items() if v < 20 and v != 11.0)


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    from postgresml_spark.streaming.streams import stream_interval_join

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view")
    purchases = e.filter(F.col("event_type") == "purchase")
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    views.write.parquet(vdir)
    purchases.write.parquet(pdir)

    # batch reference on the same data
    expected = stream_interval_join(views, purchases).count()
    assert expected > 0

    vs = spark.readStream.schema(EVENT_SCHEMA).parquet(vdir)
    ps = spark.readStream.schema(EVENT_SCHEMA).parquet(pdir)
    joined = stream_interval_join(vs, ps)
    assert joined.isStreaming
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) FROM attrib_out").head()[0]
    assert got == expected


def test_stream_vectors_into_ivf(spark, sf_dir, tmp_path):
    """Live streaming ANN ingest: vectors dropped as JSON files land in
    their centroid partitions and are immediately probe-servable."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from postgresml_spark.operators.partitioning import (
        read_ivf_probe,
        write_ivf_store,
    )
    from postgresml_spark.operators.similarity import fit_ivf_centroids
    from postgresml_spark.session import load_table
    from postgresml_spark.streaming.streams import stream_vectors_into_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 200)
    cents = fit_ivf_centroids(old, nlist=4)
    store = str(tmp_path / "ivf_stream")
    write_ivf_store(old, store, cents)

    src = str(tmp_path / "in")
    os.makedirs(src)
    newrows = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 210)
    ).collect()
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for r in newrows:
            f.write(
                _json.dumps(
                    {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
                )
                + "\n"
            )

    q = stream_vectors_into_ivf(spark, src, store, cents)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    target = newrows[0]
    qv = [float(x) for x in target["embedding"]]
    got = [
        r["vec_id"]
        for r in read_ivf_probe(spark, store, cents, qv, k=5, nprobe=4).collect()
    ]
    assert got[0] == target["vec_id"]


def test_ivf_sink_epoch_fence(spark, sf_dir, tmp_path):
    """A replayed micro-batch (same epoch id) must NOT double-append."""
    from pyspark.sql import functions as F

    from postgresml_spark.operators.partitioning import write_ivf_store
    from postgresml_spark.operators.similarity import fit_ivf_centroids
    from postgresml_spark.session import load_table
    from postgresml_spark.streaming.streams import ivf_epoch_fenced_sink

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 100)
    cents = fit_ivf_centroids(old, nlist=4)
    store = str(tmp_path / "ivf_fence")
    write_ivf_store(old, store, cents)
    base = spark.read.parquet(store).count()

    batch = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    sink = ivf_epoch_fenced_sink(store, cents)
    sink(batch, 7)
    sink(batch, 7)  # replay - must be skipped
    n = spark.read.parquet(store).count()
    assert n == base + 20, n
    sink(batch.filter(F.col("vec_id") >= 110), 8)  # next epoch applies
    assert spark.read.parquet(store).count() == base + 30


def test_streaming_heavy_hitters_exact_and_accumulating(spark, tmp_path):
    """First batch: counts exact (= naive counts), undercount 0.
    Second batch: counts accumulate across batches via shard state."""
    from postgresml_spark.streaming.streams import streaming_heavy_hitters

    src = str(tmp_path / "hh_in")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for w, n in (("alpha", 5), ("beta", 3), ("gamma", 1)):
            for _ in range(n):
                f.write(json.dumps({"w": w}) + "\n")
    stream = spark.readStream.schema("w string").json(src)
    out = streaming_heavy_hitters(stream, "w", capacity=64, n_shards=4)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "select * from hh_out where seq = 1"
        ).collect()
        got = {r["w"]: r["cnt"] for r in rows}
        assert got == {"alpha": 5, "beta": 3, "gamma": 1}
        assert all(r["max_undercount"] == 0 for r in rows)

        with open(os.path.join(src, "b.json"), "w") as f:
            for _ in range(4):
                f.write(json.dumps({"w": "beta"}) + "\n")
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("select * from hh_out").collect():
            cur = latest.get(r["w"])
            if cur is None or r["seq"] > cur[0]:
                latest[r["w"]] = (r["seq"], r["cnt"])
        assert latest["beta"][1] == 7  # 3 + 4 across batches
        assert latest["alpha"][1] == 5
    finally:
        q.stop()


def test_streaming_heavy_hitters_state_bounded(spark, tmp_path):
    """500 distinct singletons through capacity-8 shards: emissions
    stay <= capacity per shard and the heavy value survives with a
    bounded undercount."""
    from postgresml_spark.streaming.streams import streaming_heavy_hitters

    src = str(tmp_path / "hh_bound_in")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for i in range(500):
            f.write(json.dumps({"w": f"rare_{i}"}) + "\n")
        for _ in range(100):
            f.write(json.dumps({"w": "hot"}) + "\n")
    stream = spark.readStream.schema("w string").json(src)
    out = streaming_heavy_hitters(stream, "w", capacity=8, n_shards=2)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_bound_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from hh_bound_out").collect()
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r)
    assert all(len(v) <= 8 for v in per_shard.values())
    hot = [r for r in rows if r["w"] == "hot"]
    assert hot, "heavy value must survive its shard's MG summary"
    # lower bound + undercount brackets the true count
    assert hot[0]["cnt"] <= 100 <= hot[0]["cnt"] + hot[0]["max_undercount"]


def test_stream_interval_join_left_outer_emits_unconverted(spark, tmp_path):
    """Views with no purchase inside the window surface with NULL
    purchase columns once both watermarks pass — the churn-label
    stream. Matched rows appear too, identical to inner."""
    from postgresml_spark.streaming.streams import stream_interval_join

    vdir = str(tmp_path / "lo_views")
    pdir = str(tmp_path / "lo_purch")
    os.makedirs(vdir); os.makedirs(pdir)
    schema = "user_id long, ts timestamp, value double"

    def _write(d, name, rows):
        import glob
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp()
        spark.createDataFrame(
            [(u, t, v) for u, t, v in rows],
            "user_id long, ts string, value double",
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(d, name))
        shutil.rmtree(tmp, ignore_errors=True)

    # user 1 converts inside 1h; user 2 never converts
    _write(vdir, "b1.parquet", [(1, "2024-01-01 00:00:00", 0.0),
                                (2, "2024-01-01 00:10:00", 0.0)])
    _write(pdir, "b1.parquet", [(1, "2024-01-01 00:30:00", 9.5)])

    vs = spark.readStream.schema(schema).parquet(vdir)
    ps = spark.readStream.schema(schema).parquet(pdir)
    joined = stream_interval_join(
        vs, ps, gap_hours=1, watermark="1 hour", how="left_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("lo_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance BOTH watermarks far past the window, then one more
        # batch so the outer results flush
        _write(vdir, "b2.parquet", [(9, "2024-01-02 12:00:00", 0.0)])
        _write(pdir, "b2.parquet", [(9, "2024-01-02 12:00:00", 1.0)])
        q.processAllAvailable()
        _write(vdir, "b3.parquet", [(9, "2024-01-02 13:00:00", 0.0)])
        _write(pdir, "b3.parquet", [(9, "2024-01-02 13:00:00", 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from lo_out").collect()
    matched = [r for r in rows if r["user_id"] == 1 and r["purchase_ts"] is not None]
    unmatched = [r for r in rows if r["user_id"] == 2]
    assert matched and abs(matched[0]["purchase_value"] - 9.5) < 1e-9
    assert unmatched and unmatched[0]["purchase_ts"] is None


def test_stream_documents_into_sparse_index(spark, tmp_path):
    """Live sparse-index ingest: streamed documents become searchable
    with query-time idf reflecting the grown corpus."""
    from postgresml_spark.operators.sparse import (
        build_sparse_index,
        sparse_search_index,
    )
    from postgresml_spark.streaming.streams import (
        stream_documents_into_sparse_index,
    )

    idx = str(tmp_path / "s_idx")
    seed_docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    build_sparse_index(seed_docs, idx)
    src = str(tmp_path / "s_src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "alpha alpha epsilon"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": "zeta eta"}) + "\n")
    q = stream_documents_into_sparse_index(spark, src, idx)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in sparse_search_index(spark, idx, ["alpha"]).collect()}
    assert got == {0, 2}
    with open(os.path.join(idx, "_stats.json")) as f:
        assert json.load(f)["n_docs"] == 4
    # crash-replay of the committed epoch is fenced: re-running the
    # sink with the same epoch id must not double-append
    import glob

    n_files = len(glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True))
    with open(os.path.join(idx, "_sparse_last_epoch")) as f:
        assert int(f.read()) >= 0
    q2 = stream_documents_into_sparse_index(spark, src, idx)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # note: q2 uses a FRESH checkpoint so its epoch 0 replays the same
    # files; the fence must reject it
    with open(os.path.join(idx, "_stats.json")) as f:
        assert json.load(f)["n_docs"] == 4
    assert len(glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)) == n_files


def test_expectations_quarantine_stream_splits(spark, tmp_path):
    from postgresml_spark.streaming.streams import (
        expectations_quarantine_stream,
    )

    src = str(tmp_path / "eq_in")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(json.dumps({"id": 1, "v": 10.0, "lang": "en"}) + "\n")
        f.write(json.dumps({"id": 2, "v": -3.0, "lang": "en"}) + "\n")
        f.write(json.dumps({"id": 3, "v": 5.0, "lang": None}) + "\n")
        f.write(json.dumps({"id": 4, "v": None, "lang": "en"}) + "\n")
    stream = spark.readStream.schema("id long, v double, lang string").json(src)
    good, bad = [], []
    rules = {
        "v_nonneg": F.col("v") >= 0,
        "lang_present": F.col("lang").isNotNull(),
    }
    q = expectations_quarantine_stream(
        stream, rules,
        lambda df, e: good.extend(df.collect()),
        lambda df, e: bad.extend(df.collect()),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [r["id"] for r in good] == [1]
    got_bad = {r["id"]: list(r["violated"]) for r in bad}
    # id 4: NULL predicate fails closed (three-valued logic must not
    # leak nulls into the good stream)
    assert got_bad == {2: ["v_nonneg"], 3: ["lang_present"], 4: ["v_nonneg"]}


def test_expectations_quarantine_requeue_preserves_prior_violations(spark, tmp_path):
    """ADVICE r2 #3: a requeued quarantine feed already carries a
    'violated' column from its previous trip — the sink must emit ONE
    fresh 'violated' plus the prior one as 'violated_prev', never two
    ambiguous same-name columns."""
    from postgresml_spark.streaming.streams import (
        expectations_quarantine_stream,
    )

    src = str(tmp_path / "eq_rq")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(json.dumps({"id": 2, "v": -3.0, "violated": ["v_nonneg"]}) + "\n")
        f.write(json.dumps({"id": 5, "v": 7.0, "violated": ["v_nonneg"]}) + "\n")
    stream = spark.readStream.schema(
        "id long, v double, violated array<string>"
    ).json(src)
    good, bad = [], []
    q = expectations_quarantine_stream(
        stream, {"v_nonneg": F.col("v") >= 0},
        lambda df, e: good.extend(df.collect()),
        lambda df, e: bad.extend(df.collect()),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # fixed row flows to good (its old 'violated' tag intact)
    assert [(r["id"], list(r["violated"])) for r in good] == [(5, ["v_nonneg"])]
    assert len(bad) == 1 and bad[0]["id"] == 2
    assert bad[0].asDict().keys() >= {"violated", "violated_prev"}
    assert list(bad[0]["violated"]) == ["v_nonneg"]
    assert list(bad[0]["violated_prev"]) == ["v_nonneg"]
