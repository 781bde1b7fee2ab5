"""Round-9 optimization pins: zero-job footer statistics, the
driver-side XXH64 twin, literal tombstone filters, and the lifecycle
job budget (guide §1.2 / §2.4 / §2.6 — the optimizations change
operator internals, so each gets a focused contract test)."""

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_driver_xxhash64_matches_spark(spark):
    """The bm25/trigram served paths hash query terms driver-side now;
    the twin must equal Spark SQL's xxhash64 bit-for-bit (else bucket
    pruning would silently read the wrong partitions)."""
    from postgresml_spark.functions.hashing import (
        spark_pmod_xxhash64,
        spark_xxhash64,
    )

    words = [
        "", "a", "ab", "abc", "vector", "merge", "stream", "hash",
        "tbl", "ÿüñíçødé", "x" * 7, "y" * 8, "z" * 9, "w" * 31,
        "v" * 32, "u" * 33, "t" * 100, "query term with spaces",
    ]
    rows = (
        spark.createDataFrame([(w,) for w in words], "w string")
        .select(
            "w",
            F.xxhash64("w").alias("h"),
            F.pmod(F.xxhash64("w"), F.lit(32)).cast("int").alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert spark_xxhash64(r["w"]) == r["h"], r["w"]
        assert spark_pmod_xxhash64(r["w"], 32) == r["b"], r["w"]


def test_parquet_dir_stats_census(spark, tmp_path):
    """Footer census == Spark aggregation on a bucket-partitioned
    write, including max(column) and null counts; sidecar stores
    (_delta/_tombstones) are excluded like Spark's listing excludes
    them."""
    from postgresml_spark.collections.storage import (
        BucketedVersionedTable,
        parquet_dir_stats,
    )

    tbl = BucketedVersionedTable(
        spark, str(tmp_path / "t"), "id long, k string, v string", key="k"
    )
    df = spark.createDataFrame(
        [(i, f"k{i}", None if i % 3 == 0 else f"v{i}") for i in range(50)],
        "id long, k string, v string",
    )
    tbl.overwrite(df)
    vdir = tbl._vdir(tbl._current_version())
    # drop a decoy sidecar dir that must NOT be counted
    os.makedirs(os.path.join(vdir, "_delta"), exist_ok=True)
    import shutil
    src = None
    for root, _, files in os.walk(vdir):
        for fn in files:
            if fn.endswith(".parquet") and "__bucket=" in root:
                src = os.path.join(root, fn)
                break
        if src:
            break
    shutil.copy2(src, os.path.join(vdir, "_delta", "part-0.parquet"))

    st = parquet_dir_stats(vdir, column="id", null_count_col="v")
    assert st["rows"] == 50
    assert st["stats_ok"]
    assert int(st["max"]) == 49
    assert st["nulls"] == df.filter(F.col("v").isNull()).count()


def test_upsert_stats_and_delete_counts(spark, tmp_path):
    """n_rows/max_id stats maintained across fresh upsert, re-upsert
    and delete; the delete count (now footer-derived) matches the
    filter's true cardinality."""
    from postgresml_spark.collections import Collection

    coll = Collection("opt9", spark, warehouse=str(tmp_path))
    n = coll.upsert_documents(
        [{"id": i, "text": f"t{i}", "lang": "en" if i % 2 else "de"}
         for i in range(30)]
    )
    assert n == 30
    st = coll.documents.stats()
    assert st["n_rows"] == 30 and st["max_id"] >= 30
    # re-upsert 5 (small-batch literal path)
    n = coll.upsert_documents([{"id": i, "text": f"u{i}"} for i in range(5)])
    assert n == 5
    st = coll.documents.stats()
    assert st["n_rows"] == 30  # replaced, not added
    assert coll.documents.read().count() == 30
    # delete the 15 'de' docs (ids 0,2,...28 kept text from upsert?
    # ids 0-4 were re-upserted without lang — they no longer match)
    deleted = coll.delete_documents({"lang": "de"})
    expect = len([i for i in range(5, 30) if i % 2 == 0])
    assert deleted == expect
    assert coll.documents.stats()["n_rows"] == 30 - expect
    assert coll.documents.read().count() == 30 - expect


def test_lifecycle_job_budget(spark, tmp_path):
    """Scheduling-overhead ceiling for the SDK lifecycle (VERDICT r8
    next #8): a 20-doc upsert + incremental sync on an attached
    chunks+embeddings+tsvectors pipeline stays within the optimized
    job budget. Every job here is ~0.1-0.3 s of local scheduling, so
    the ceiling IS the latency contract; regressions that re-add
    count/broadcast/take jobs trip it."""
    import uuid as _uuid

    from postgresml_spark.collections import Collection, Pipeline

    coll = Collection("jb9", spark, warehouse=str(tmp_path))
    pipe = Pipeline("p", {"text": {
        "semantic_search": {"model": "hash:16"},
        "full_text_search": {"configuration": "english"},
    }})
    coll.upsert_documents(
        [{"id": i, "text": f"alpha beta doc {i}"} for i in range(100)]
    )
    coll.add_pipeline(pipe)

    sc = spark.sparkContext
    group = f"jb-{_uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "job budget")
    try:
        coll.upsert_documents(
            [{"id": i, "text": f"gamma delta doc {i}"} for i in range(20)]
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    # optimized path: detection take + log write + version write
    # (+AQE stage jobs) + 3 concurrent delta writes (+stages).
    # Was ~18 before round 9; headroom over the measured count (9)
    # absorbs AQE stage-count jitter without letting the old plan back.
    assert len(jobs) <= 14, sorted(jobs)
    # and the derived tables are correct after the concurrent writes
    chunks = pipe.table("text_chunks")
    assert chunks.filter(F.col("chunk").contains("gamma")).count() == 20
    assert pipe.table("text_embeddings").count() == chunks.count()
    assert pipe.table("text_tsvectors").count() == chunks.count()
