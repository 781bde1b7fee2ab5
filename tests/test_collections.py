"""Collection/Pipeline/search tests (reference: SDK suite lib.rs:320-2868)."""

import shutil
import tempfile

import pytest

from postgresml_spark.collections import Collection, Pipeline
from postgresml_spark.collections.search import add_search_event


@pytest.fixture()
def warehouse():
    d = tempfile.mkdtemp(prefix="pgml_coll_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


DOCS = [
    {"id": 1, "title": "spark engine", "body": "spark is a distributed analytics engine for big data processing", "meta": {"tag": "infra", "level": 1}},
    {"id": 2, "title": "postgres ml", "body": "machine learning inside the database with sql functions", "meta": {"tag": "ml", "level": 2}},
    {"id": 3, "title": "vector search", "body": "cosine similarity search over dense vector embeddings", "meta": {"tag": "ml", "level": 3}},
    {"id": 4, "title": "cooking pasta", "body": "boil water add salt cook the pasta until al dente", "meta": {"tag": "food", "level": 1}},
]


@pytest.fixture()
def coll(spark, warehouse):
    c = Collection("testc", spark, warehouse=warehouse)
    c.upsert_documents(DOCS)
    return c


@pytest.fixture()
def pipe(coll):
    p = Pipeline(
        "p1",
        {
            "body": {
                "semantic_search": {"model": "hash:64"},
                "full_text_search": {"configuration": "english"},
            }
        },
    )
    coll.add_pipeline(p)
    return p


def test_upsert_and_get(coll):
    docs = coll.get_documents()
    assert len(docs) == 4
    assert docs[0]["document"]["title"] == "spark engine"


def test_upsert_update_and_merge(coll):
    coll.upsert_documents([{"id": 1, "title": "spark engine v2"}], merge=True)
    docs = coll.get_documents(filter={"id": 1})
    assert docs[0]["document"]["title"] == "spark engine v2"
    assert "body" in docs[0]["document"]  # merged, not replaced
    coll.upsert_documents([{"id": 2, "title": "replaced"}], merge=False)
    docs = coll.get_documents(filter={"id": 2})
    assert "body" not in docs[0]["document"]  # replaced
    assert len(coll.get_documents()) == 4  # no dup rows


def test_upsert_documents_df(coll, spark):
    df = spark.createDataFrame(
        [(2, "updated title", "new body"), (9, "brand new", "fresh body")],
        "id long, title string, body string",
    )
    n = coll.upsert_documents_df(df)
    assert n == 2
    docs = coll.get_documents()
    assert len(docs) == 5
    d2 = coll.get_documents(filter={"id": 2})[0]["document"]
    assert d2["title"] == "updated title"
    assert "meta" not in d2  # replaced, not merged
    d9 = coll.get_documents(filter={"id": 9})[0]["document"]
    assert d9["body"] == "fresh body"


def test_upsert_documents_df_merge(coll, spark):
    df = spark.createDataFrame([(2, "merged title")], "id long, title string")
    coll.upsert_documents_df(df, merge=True)
    d2 = coll.get_documents(filter={"id": 2})[0]["document"]
    assert d2["title"] == "merged title"
    assert "body" in d2  # merged keeps existing keys
    assert d2["meta"]["tag"] == "ml"


def test_upsert_merge_without_ids_keeps_rows_distinct(coll):
    # docs lacking 'id' must not collapse onto one sid (r1 ADVICE bug)
    before = len(coll.get_documents())
    coll.upsert_documents([{"title": "anon a"}, {"title": "anon b"}], merge=True)
    assert len(coll.get_documents()) == before + 2


def test_get_documents_filter_order_keyset(coll):
    out = coll.get_documents(filter={"meta": {"tag": "ml"}})
    assert {d["document"]["id"] for d in out} == {2, 3}
    out = coll.get_documents(order_by={"meta": {"level": "desc"}}, limit=2)
    assert [d["document"]["id"] for d in out] == [3, 2]
    first = coll.get_documents(limit=2)
    rest = coll.get_documents(last_row_id=first[-1]["row_id"])
    assert len(first) + len(rest) == 4
    keys = coll.get_documents(keys=["title"], limit=1)
    assert set(keys[0]["document"].keys()) == {"title"}


def test_delete_documents(coll):
    n = coll.delete_documents({"meta": {"tag": "food"}})
    assert n == 1
    assert len(coll.get_documents()) == 3


def test_pipeline_sync_counts(coll, pipe):
    st = pipe.status()
    assert st["documents"] == 4
    assert st["counts"]["body_chunks"] == 4  # whole-field (no splitter)
    assert st["counts"]["body_embeddings"] == 4
    assert st["counts"]["body_tsvectors"] == 4
    # reference shape (pipeline.rs:231): synced/not_synced/total per stage
    assert st["body"]["chunks"] == {"synced": 4, "not_synced": 0, "total": 4}
    assert st["body"]["embeddings"] == {"synced": 4, "not_synced": 0, "total": 4}
    assert st["body"]["tsvectors"] == {"synced": 4, "not_synced": 0, "total": 4}


def test_pipeline_status_not_synced_split(coll, pipe):
    # add a doc without syncing: chunks stage shows 1 not_synced
    coll._pipelines.pop("p1")
    coll.upsert_documents([{"id": 99, "body": "unsynced new document"}])
    st = pipe.status()
    assert st["body"]["chunks"]["total"] == 5
    assert st["body"]["chunks"]["synced"] == 4
    assert st["body"]["chunks"]["not_synced"] == 1


def test_pipeline_incremental_sync(coll, pipe):
    # detach so upsert doesn't auto-sync; we want to observe the delta
    coll._pipelines.pop("p1")
    coll.upsert_documents(
        [{"id": 1, "title": "spark engine", "body": "completely new body text", "meta": {"tag": "infra", "level": 1}}]
    )
    counts = pipe.sync()
    assert counts["body_chunks"] == 1  # only the changed doc re-chunked/embedded
    st = pipe.status()
    assert st["counts"]["body_chunks"] == 4 and st["counts"]["body_embeddings"] == 4
    # idempotent: nothing changed => nothing recomputed
    assert pipe.sync()["body_chunks"] == 0


def test_pipeline_splitter_chunks(coll):
    p = Pipeline(
        "p2",
        {"body": {"splitter": {"model": "recursive_character",
                               "parameters": {"chunk_size": 20, "chunk_overlap": 0}},
                  "semantic_search": {"model": "hash:16"}}},
    )
    coll.add_pipeline(p)
    st = p.status()
    assert st["counts"]["body_chunks"] > 4  # multiple chunks per doc
    chunks = p.table("body_chunks").collect()
    assert all(len(r["chunk"]) <= 20 for r in chunks)


def test_vector_search_relevance(coll, pipe):
    res = coll.vector_search(
        {"query": {"fields": {"body": {"query": "distributed spark analytics engine"}}},
         "limit": 2},
        pipe,
    )
    assert res[0]["document"]["id"] == 1
    assert res[0]["score"] > res[1]["score"]


def test_vector_search_with_filter(coll, pipe):
    res = coll.vector_search(
        {"query": {"fields": {"body": {"query": "vector embeddings similarity"}},
                   "filter": {"meta": {"tag": "ml"}}},
         "limit": 4},
        pipe,
    )
    ids = {r["document"]["id"] for r in res}
    assert ids <= {2, 3}
    assert res[0]["document"]["id"] == 3


def test_vector_search_rerank(coll, pipe):
    res = coll.vector_search(
        {"query": {"fields": {"body": {"query": "pasta al dente"}}}, "limit": 4},
        pipe, rerank=True,
    )
    assert res[0]["document"]["id"] == 4
    assert "rerank_score" in res[0]


def test_hybrid_search_and_telemetry(coll, pipe):
    res = coll.search(
        {"query": {
            "semantic_search": {"body": {"query": "machine learning database", "boost": 1.0}},
            "full_text_search": {"body": {"query": "sql machine learning", "boost": 1.0}},
        }, "limit": 3},
        pipe,
    )
    assert res[0]["document"]["id"] == 2  # both signals agree
    assert res[0]["score"] >= res[-1]["score"]
    assert "search_id" in res[0]
    # this pipeline declares no index, so the default (auto) runs the
    # exact plan with SYNCHRONOUS telemetry; an explicit method='index'
    # hybrid serves from the resident tier and BUFFERS telemetry —
    # flushed rows match the synchronous shape
    from postgresml_spark.collections.search import flush_search_telemetry

    coll.search(
        {"query": {
            "semantic_search": {"body": {"query": "machine learning database"}},
        }, "limit": 3},
        pipe,
        method="index",
    )
    assert flush_search_telemetry(coll) >= 1
    cur = open(f"{coll.root}/searches/_current").read().strip()
    searches = coll.spark.read.parquet(f"{coll.root}/searches/v_{cur}")
    assert searches.count() >= 1
    add_search_event(coll, res[0]["search_id"], 1, {"type": "click"})


def test_hybrid_search_coalesce_sum(coll, pipe):
    # doc 4 matches full-text 'pasta' but semantic query about something else:
    # its total must still include the ft score (COALESCE, not inner join)
    res = coll.search(
        {"query": {
            "semantic_search": {"body": {"query": "database internals"}},
            "full_text_search": {"body": {"query": "pasta"}},
        }, "limit": 4},
        pipe,
    )
    by_id = {r["document"]["id"]: r for r in res}
    assert 4 in by_id
    assert by_id[4]["score_ft_body"] > 0


def test_rag_prompt_assembly(coll, pipe):
    out = coll.rag(
        {
            "CONTEXT": {
                "vector_search": {
                    "query": {"fields": {"body": {"query": "spark distributed engine"}}},
                    "limit": 2,
                },
                "aggregate": {"join": "\n---\n"},
            },
            "completion": {"prompt": "Answer from context:\n{CONTEXT}\nQ: what is spark?"},
        },
        pipe,
    )
    assert "spark is a distributed analytics engine" in out["prompt"]
    assert "{CONTEXT}" not in out["prompt"]
    assert len(out["sources"]["CONTEXT"]) == 2
    # pluggable completion
    out2 = coll.rag(
        {
            "CONTEXT": {
                "vector_search": {"query": {"fields": {"body": {"query": "spark"}}}, "limit": 1},
            },
            "completion": {"prompt": "{CONTEXT}"},
            "completion_fn": lambda p: f"LLM({len(p)} chars)",
        },
        pipe,
    )
    assert out2["rag"].startswith("LLM(")


def test_archive(coll):
    dst = coll.archive()
    import os
    assert os.path.exists(dst)
    assert not os.path.exists(coll.root)


def test_search_unknown_field_named_error(coll, pipe):
    import pytest as pt

    with pt.raises(ValueError, match="nosuch.*configured fields"):
        coll.vector_search(
            {"query": {"fields": {"nosuch": {"query": "x"}}}, "limit": 1}, pipe
        )


def test_partitioned_upsert_rewrites_only_touched_buckets(spark, warehouse):
    import os

    c = Collection("bigc", spark, warehouse=warehouse)
    c.upsert_documents([{"id": i, "body": f"document {i}"} for i in range(400)])
    tbl = c.documents
    c.upsert_documents([{"id": 3, "body": "changed body"}])  # 1-doc batch
    vdir = os.path.join(tbl.path, f"v_{tbl._current_version()}")
    fresh, linked = 0, 0
    for root, _, files in os.walk(vdir):
        for fn in files:
            if fn.endswith(".parquet"):
                if os.stat(os.path.join(root, fn)).st_nlink > 1:
                    linked += 1
                else:
                    fresh += 1
    # 1-doc upsert touches 1 of 32 buckets: <10% of files rewritten
    assert linked > 0
    assert fresh / (fresh + linked) < 0.1
    # correctness: all 400 docs present, doc 3 updated, ids unique
    docs = c.get_documents(limit=1000)
    assert len(docs) == 400
    assert c.get_documents(filter={"id": 3})[0]["document"]["body"] == "changed body"
    ids = [d["row_id"] for d in docs]
    assert len(set(ids)) == 400


def test_versioned_table_vacuum(coll):
    import os

    # many overwrites must not accumulate versions beyond keep window
    for i in range(6):
        coll.upsert_documents([{"id": 100 + i, "body": f"doc {i}"}])
    doc_dir = os.path.join(coll.root, "documents")
    versions = [d for d in os.listdir(doc_dir) if d.startswith("v_")]
    assert len(versions) <= 2
    # table still reads fine after vacuum
    assert len(coll.get_documents()) == 4 + 6


def test_compact_parquet_dir(spark, tmp_path):
    from postgresml_spark.collections.storage import compact_parquet_dir

    path = str(tmp_path / "fp_idx")
    # simulate 12 micro-batch appends -> 12+ small files
    for i in range(12):
        spark.createDataFrame([(f"fp{i}a",), (f"fp{i}b",)], "fp string").write.mode(
            "append"
        ).parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 12
    content_before = sorted(r["fp"] for r in spark.read.parquet(path).collect())
    n = compact_parquet_dir(spark, path, target_rows_per_file=1000)
    after = glob.glob(path + "/*.parquet")
    assert n == 1 and len(after) == 1
    assert sorted(r["fp"] for r in spark.read.parquet(path).collect()) == content_before


def test_compact_partitioned_no_phantoms(spark, tmp_path, monkeypatch):
    """ADVICE r2 #1: during compaction of a `key=value`-partitioned
    store, the in-flight temp/old dirs must be invisible to a
    concurrent reader's partition discovery — a `key=A.compact_tmp`
    sibling would parse as a phantom partition value. Intercept every
    rename and assert the store root never lists an unexpected
    '='-containing entry."""
    import os as os_mod

    from postgresml_spark.collections.storage import compact_parquet_dir

    path = str(tmp_path / "pstore")
    df = spark.range(40).selectExpr("id", "cast(id % 2 as int) as k")
    for _ in range(3):  # several small appends per partition
        df.write.mode("append").partitionBy("k").parquet(path)

    real_parts = {"k=0", "k=1"}
    seen_roots = []
    real_rename = os_mod.rename

    def spy_rename(src, dst):
        seen_roots.append(sorted(os_mod.listdir(path)))
        return real_rename(src, dst)

    monkeypatch.setattr(os_mod, "rename", spy_rename)
    compact_parquet_dir(spark, path, target_rows_per_file=1000)
    monkeypatch.undo()

    assert seen_roots, "rename spy never fired"
    for listing in seen_roots:
        # Spark's listing drops entries whose NAME starts with '.' or
        # '_' (hidden-path filter) — only the rest reach partition
        # discovery, and those must be exactly the real partitions.
        visible = [e for e in listing if not e.startswith((".", "_"))]
        phantom = [e for e in visible if "=" in e and e not in real_parts]
        assert not phantom, f"phantom partition entries visible: {phantom}"
    # store reads back complete and deduplicated
    got = spark.read.parquet(path)
    assert got.count() == 120 and set(
        r["k"] for r in got.select("k").distinct().collect()
    ) == {0, 1}


def test_rrf_fuse_golden(spark):
    from postgresml_spark.collections.search import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id int, score double"
    )
    l2 = spark.createDataFrame(
        [(3, 5.0), (1, 4.0)], "doc_id int, score double"
    )
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([l1, l2], k=60).collect()}
    assert abs(got[1] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(got[2] - 1 / 62) < 1e-12
    assert abs(got[3] - (1 / 63 + 1 / 61)) < 1e-12
    # doc in both lists outranks doc in one list with a better single rank
    assert got[3] > got[2]


def test_versioned_table_time_travel(spark, tmp_path):
    from postgresml_spark.collections.storage import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt"), "id long, v string")
    t.overwrite(spark.createDataFrame([(1, "a")], t.schema), keep_versions=3)
    t.overwrite(spark.createDataFrame([(1, "b"), (2, "c")], t.schema), keep_versions=3)
    assert t.versions() == [1, 2]
    old = {(r["id"], r["v"]) for r in t.read_version(1).collect()}
    cur = {(r["id"], r["v"]) for r in t.read().collect()}
    assert old == {(1, "a")} and cur == {(1, "b"), (2, "c")}
    # vacuumed versions raise a clear error
    t.overwrite(spark.createDataFrame([(3, "d")], t.schema), keep_versions=1)
    import pytest as _pt
    with _pt.raises(ValueError, match="not retained"):
        t.read_version(1)


def test_merge_into_touches_only_batch_buckets(spark, tmp_path):
    import glob
    import os

    from postgresml_spark.collections.storage import (
        BucketedVersionedTable, merge_into,
    )

    t = BucketedVersionedTable(
        spark, str(tmp_path / "mt"), "k long, v string", key="k", n_buckets=16
    )
    base = spark.createDataFrame([(i, f"v{i}") for i in range(200)], t.schema)
    t.overwrite(base, keep_versions=3)
    v1_files = {os.path.basename(f) for f in glob.glob(str(tmp_path / "mt/v_1/__bucket=*/*.parquet"))}

    batch = spark.createDataFrame([(1, "NEW"), (999, "INS")], t.schema)
    touched = merge_into(t, batch, key="k", keep_versions=3)
    assert 1 <= len(touched) <= 2  # the two keys hash to <=2 buckets

    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1] == "NEW" and got[999] == "INS" and got[2] == "v2"
    assert len(got) == 201

    # untouched buckets carried over as the same files (hardlinks)
    import glob as g
    carried = 0
    for f in g.glob(str(tmp_path / "mt/v_2/__bucket=*/*.parquet")):
        bucket = int(f.split("__bucket=")[1].split("/")[0])
        if bucket not in touched and os.path.basename(f) in v1_files:
            carried += 1
    assert carried >= 14  # 16 buckets minus <=2 touched

    # when_matched='ignore' keeps existing rows
    merge_into(t, spark.createDataFrame([(1, "IGNORED"), (1000, "OK")], t.schema),
               key="k", when_matched="ignore", keep_versions=3)
    got2 = {r["k"]: r["v"] for r in t.read().collect()}
    assert got2[1] == "NEW" and got2[1000] == "OK"


def test_table_diff_with_time_travel(spark, tmp_path):
    from postgresml_spark.collections.storage import VersionedTable, table_diff

    t = VersionedTable(spark, str(tmp_path / "td"), "k long, v string")
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], t.schema),
                keep_versions=3)
    t.overwrite(spark.createDataFrame([(2, "B"), (3, "c"), (4, "d")], t.schema),
                keep_versions=3)
    diff = {r["k"]: r["change"] for r in
            table_diff(t.read_version(1), t.read_version(2), key="k").collect()}
    assert diff == {1: "removed", 2: "changed", 4: "added"}


def test_purge_documents_physically_forgets(spark, tmp_path):
    """After purge, NO parquet file anywhere under the collection —
    current or historical version, documents or derived tables —
    contains the purged document's content."""
    import glob
    import os

    import pyarrow.parquet as pq

    from postgresml_spark.collections import Collection, Pipeline

    coll = Collection("purge_me", spark, warehouse=str(tmp_path / "wh"))
    pipe = Pipeline("p", {"body": {"semantic_search": {"model": "hash:16"}}})
    coll.add_pipeline(pipe)
    coll.upsert_documents([
        {"id": "keep1", "body": "ordinary text that stays"},
        {"id": "gone1", "body": "SECRET_TOKEN_XYZZY must vanish"},
        {"id": "keep2", "body": "another surviving document"},
    ])
    assert len(coll.get_documents()) == 3
    # the secret exists on disk before the purge (control)
    root = os.path.join(str(tmp_path / "wh"), "collections", "purge_me")

    def _disk_contains(needle: bytes) -> bool:
        for fp in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
            t = pq.read_table(fp)
            for col in t.column_names:
                if needle in str(t[col].to_pylist()).encode():
                    return True
        return False

    assert _disk_contains(b"XYZZY")
    n = coll.purge_documents({"id": "gone1"})
    assert n == 1
    assert len(coll.get_documents()) == 2
    assert not _disk_contains(b"XYZZY")
    # survivors intact and still searchable
    assert _disk_contains(b"surviving")
    hits = coll.vector_search({"query": {"fields": {"body": {"query": "ordinary text"}}}}, pipe)
    assert len(hits) >= 1


def test_pipeline_management_surface(spark, tmp_path):
    """get_pipeline(s) / remove_pipeline / enable+disable_pipeline /
    upsert_file — the reference Collection API's pipeline-management
    methods (collection.rs). Disable semantics: upserts while disabled
    leave derived tables untouched; enable catches up via the
    change-detection sync (reference requires an explicit resync)."""
    import pytest as _pytest

    from postgresml_spark.collections import Collection, Pipeline

    coll = Collection("pmgmt", spark, warehouse=str(tmp_path / "wh"))
    coll.upsert_documents([{"id": 1, "text": "alpha beta gamma"}])
    pipe = Pipeline("p1", {"text": {"semantic_search": {"model": "hash:8"}}})
    coll.add_pipeline(pipe)

    assert coll.get_pipeline("p1") is pipe
    assert coll.get_pipelines() == [pipe]
    with _pytest.raises(ValueError, match="no pipeline"):
        coll.get_pipeline("nope")

    # disable: upserts don't touch derived tables
    n_before = pipe.table("text_chunks").count()
    coll.disable_pipeline("p1")
    coll.upsert_documents([{"id": 2, "text": "delta epsilon"}])
    assert pipe.table("text_chunks").count() == n_before
    # enable: incremental sync catches the missed upsert
    coll.enable_pipeline("p1")
    assert pipe.table("text_chunks").count() == n_before + 1

    # upsert_file
    f = tmp_path / "doc.txt"
    f.write_text("zeta eta theta")
    assert coll.upsert_file(str(f)) == 1
    got = coll.get_documents(filter={"id": str(f)})
    assert len(got) == 1 and "zeta" in got[0]["document"]["text"]

    # remove: derived tables dropped from disk, documents intact
    import os as _os

    roots = [t.path for t in pipe._tables.values()]
    coll.remove_pipeline("p1")
    assert coll.get_pipelines() == []
    assert all(not _os.path.exists(r) for r in roots)
    assert coll.documents.read().count() == 3


def test_incremental_sync_noop_writes_nothing(coll, pipe):
    """VERDICT r6 next #7: a sync with no document changes must leave
    every derived table's version UNTOUCHED (the no-op set is not
    rewritten), and a changed-doc sync must rewrite only the touched
    buckets (untouched buckets hardlink to the previous version)."""
    import os

    coll._pipelines.pop("p1")  # manual sync control

    def versions():
        return {k: t._current_version() for k, t in pipe._tables.items()}

    before = versions()
    assert pipe.sync() == {"body_chunks": 0, "body_embeddings": 0,
                           "body_tsvectors": 0}
    assert versions() == before, "no-op sync must not write new versions"

    # one changed doc: counts say 1, versions bump exactly once, and the
    # new chunks version hardlinks (st_nlink > 1) the untouched buckets
    coll.upsert_documents(
        [{"id": 2, "title": "postgres ml", "body": "rewritten body text",
          "meta": {"tag": "ml", "level": 2}}]
    )
    counts = pipe.sync()
    assert counts["body_chunks"] == 1
    after = versions()
    assert all(after[k] == before[k] + 1 for k in after)
    tbl = pipe._tables["body_chunks"]
    vdir = os.path.join(tbl.path, f"v_{after['body_chunks']}")
    bucket_dirs = [d for d in os.listdir(vdir) if d.startswith("__bucket=")]
    linked = sum(
        1 for d in bucket_dirs
        for f in os.listdir(os.path.join(vdir, d))
        if f.endswith(".parquet")
        and os.stat(os.path.join(vdir, d, f)).st_nlink > 1
    )
    assert linked >= len(bucket_dirs) - 1, "untouched buckets must hardlink"
    # derived rows stayed consistent: 4 docs, 4 chunks, updated text wins
    rows = {r["document_id"]: r["chunk"]
            for r in pipe.table("body_chunks").collect()}
    assert len(rows) == 4
    assert "rewritten body text" in rows[
        [r["id"] for r in coll.documents.read().select("id", "source_uuid")
         .collect() if r["source_uuid"] == "2"][0]
    ]


def test_read_version_delta_aware(coll, pipe):
    """ADVICE r7: time-travel onto a DELTA version must apply that
    version's _delta/_tombstones — a plain parquet scan would miss the
    delta rows and resurrect tombstoned ones."""
    coll._pipelines.pop("p1")
    pipe.sync()
    tbl = pipe._tables["body_chunks"]
    coll.upsert_documents([{"id": 1, "body": "travelled body text"}])
    pipe.sync()
    v = tbl._current_version()
    import os

    assert os.path.isdir(os.path.join(tbl.path, f"v_{v}", "_delta"))
    snap = {r["chunk"] for r in tbl.read_version(v).collect()}
    assert "travelled body text" in snap, "delta rows must be visible"
    assert "spark is a distributed analytics engine for big data processing" \
        not in snap, "tombstoned rows must stay dead in time-travel"
    assert snap == {r["chunk"] for r in tbl.read().collect()}


def test_tombstone_foldback_compaction(coll, pipe, monkeypatch):
    """VERDICT r7 next #6: when accumulated tombstones cross the
    threshold, sync must fold the delta chain back via a full rebuild
    — reads identical before/after modulo the new change, stats reset,
    and the folded version is a plain bucketed write (no _delta)."""
    import os

    coll._pipelines.pop("p1")
    pipe.sync()
    tbl = pipe._tables["body_chunks"]

    def chunk_texts():
        return {r["chunk"] for r in pipe.table("body_chunks").collect()}

    # two incremental syncs accumulate doc-key tombstones
    for i, txt in ((1, "first rewritten body"), (2, "second rewritten body")):
        coll.upsert_documents([{"id": i, "body": txt}])
        pipe.sync()
    assert tbl.stats().get("tomb_rows", 0) >= 2
    assert os.path.isdir(
        os.path.join(tbl.path, f"v_{tbl._current_version()}", "_delta")
    ), "precondition: delta chain exists"
    before = chunk_texts()

    # force the fold on the next changed sync
    monkeypatch.setattr(pipe, "COMPACTION_MIN_TOMBS", 0)
    coll.upsert_documents([{"id": 3, "body": "third rewritten body"}])
    counts = pipe.sync()
    # (a) the fold-back full rebuild fired: counts cover the whole
    # corpus and the new version carries no _delta
    assert counts["body_chunks"] == 4
    vdir = os.path.join(tbl.path, f"v_{tbl._current_version()}")
    assert not os.path.isdir(os.path.join(vdir, "_delta"))
    # (b) reads are identical across the fold modulo the new change
    after = chunk_texts()
    assert after == (before - {"cosine similarity search over dense vector embeddings"}) | {
        "third rewritten body"
    }
    # (c) stats reset
    st = tbl.stats()
    assert st.get("tomb_rows") == 0 and st.get("base_rows") == 4
    # and the derived siblings folded with it (shared tombstone history)
    assert pipe.table("body_embeddings").count() == 4
    assert pipe.table("body_tsvectors").count() == 4


def _log_seqs(coll):
    import os

    if not os.path.isdir(coll._changes_path):
        return set()
    return {
        int(d.split("=", 1)[1])
        for d in os.listdir(coll._changes_path)
        if d.startswith("seq=")
    }


def test_change_log_pruned_after_sync(coll, pipe):
    """ADVICE r7: sync() must prune change-log partitions every
    pipeline has consumed — retention is O(churn window), not
    unbounded accumulation of upsert payloads."""
    coll._pipelines.pop("p1")
    # add_pipeline's initial sync already pruned the bootstrap
    # partition — retention is in effect from the very first sync
    assert _log_seqs(coll) == set(), "initial sync must already prune"
    coll.upsert_documents([{"id": 9, "body": "fresh body text"}])
    new_seqs = _log_seqs(coll)
    assert new_seqs, "new upsert logs a fresh partition"
    pipe.sync()
    assert _log_seqs(coll) == set()
    # and the prune high-water marker reflects what is gone
    assert coll._pruned_upto() >= max(new_seqs)


def test_pruned_log_gap_forces_full_sync(coll, pipe):
    """A watermark BEHIND the prune marker means the log is gapped for
    this pipeline — sync must take the full-rebuild path (counts cover
    the whole corpus), never a silent partial incremental."""
    coll._pipelines.pop("p1")
    pipe.sync()
    coll.upsert_documents([{"id": 5, "body": "brand new doc body"}])
    # simulate purge-style compliance pruning that outruns the
    # pipeline's watermark (purge prunes to the current version
    # regardless of unattached pipelines)
    coll._prune_changes(coll.documents._current_version())
    assert coll._pruned_upto() > pipe._get_watermark("body")
    counts = pipe.sync()
    # full rebuild re-derives every live doc (4 originals + 1 new),
    # not just the changed one — and the result is complete
    assert counts["body_chunks"] == 5
    assert pipe.table("body_chunks").count() == 5


def test_removed_pipeline_unpins_change_log(coll, pipe):
    """remove_pipeline must delete the pipeline root (incl. its sync
    watermarks) so a dead pipeline's stale watermark can't pin
    change-log retention forever; a second attached pipeline that
    hasn't consumed a partition still holds it back."""
    from postgresml_spark.collections import Pipeline

    coll._pipelines.pop("p1")
    p2 = Pipeline("p2", {"body": {"full_text_search": {}}})
    coll.add_pipeline(p2)
    coll._pipelines.pop("p2")
    pipe.sync()
    p2.sync()
    coll.upsert_documents([{"id": 6, "body": "only p1 will see this"}])
    pipe.sync()  # p2's older on-disk watermark pins the new partition
    assert _log_seqs(coll), "unconsumed-by-p2 partition must survive"
    coll._pipelines["p2"] = p2  # re-register so remove_pipeline finds it
    coll.remove_pipeline("p2")
    pipe.sync()  # no-op, but retention re-evaluates without p2
    assert _log_seqs(coll) == set()


def test_incremental_sync_deleted_doc_drops_orphans(coll, pipe):
    """Deleting a document and syncing drops its chunks/embeddings/
    tsvectors via the touched-bucket rewrite (orphan cleanup,
    queries.rs:284-299)."""
    coll._pipelines.pop("p1")
    coll.delete_documents({"meta": {"tag": "food"}})
    pipe.sync()
    chunks = pipe.table("body_chunks").collect()
    assert len(chunks) == 3
    ids = {r["chunk_id"] for r in chunks}
    assert {r["chunk_id"] for r in pipe.table("body_embeddings").collect()} == ids
    assert {r["chunk_id"] for r in pipe.table("body_tsvectors").collect()} == ids


def test_mixed_linked_plain_change_log_schema(spark, warehouse):
    """ADVICE r8 #4: hardlinked initial change-log partitions carry an
    extra `version` column that later plain partitions lack. The reader
    contract (pipeline.py _sync_incremental) selects only
    (id, source_uuid, document) with no mergeSchema — pin that a mixed
    linked+plain directory reads correctly under sampled inference."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    c = Collection("mixedlog", spark, warehouse=warehouse)
    c.upsert_documents(DOCS)  # initial build: hardlinked partition
    c.upsert_documents([{"id": 9, "body": "late plain-logged doc"}])
    seq_dirs = sorted(
        d for d in os.listdir(c._changes_path) if d.startswith("seq=")
    )
    assert len(seq_dirs) == 2
    cols_by_seq = {}
    for d in seq_dirs:
        dd = os.path.join(c._changes_path, d)
        f = next(f for f in sorted(os.listdir(dd)) if f.endswith(".parquet"))
        cols_by_seq[d] = set(pq.read_schema(os.path.join(dd, f)).names)
    # the asymmetry this test exists to document:
    assert any("version" in v for v in cols_by_seq.values()), "linked"
    assert any("version" not in v for v in cols_by_seq.values()), "plain"
    # every file carries the three contract columns
    for v in cols_by_seq.values():
        assert {"id", "source_uuid", "document"} <= v
    # the reader pattern over the MIX: contract columns only
    pend = spark.read.parquet(c._changes_path).filter(F.col("seq") > -1)
    rows = pend.select("id", "source_uuid", "document").collect()
    assert len(rows) == 5  # 4 initial + 1 late upsert
    assert sum(r["document"] is None for r in rows) == 0
    # end-to-end: incremental sync across the mixed log (watermark -1
    # so BOTH partitions are pending) derives every live doc
    p = Pipeline("pm", {"body": {"full_text_search": {}}})
    c.add_pipeline(p)
    assert p.table("body_chunks").count() == 5


def test_small_batch_upsert_keeps_null_source_uuid(spark, warehouse):
    """ADVICE r8 #2: a stored doc with NULL source_uuid in a touched
    bucket must survive the small-batch literal In() path — plain
    ~isin() evaluates to NULL on NULL keys and silently deleted the
    row, where the left_anti join path retains it."""
    from pyspark.sql import functions as F

    c = Collection("nullsuid", spark, warehouse=warehouse)
    df = spark.createDataFrame(
        [(None, "null-id doc body"), ("a", "doc a body")],
        "id string, body string",
    )
    c.upsert_documents_df(df)
    assert c.documents.read().count() == 2
    # find a literal id landing in the NULL row's bucket so the
    # touched-bucket scan includes the NULL row
    null_bucket = (
        spark.range(1)
        .select(c.documents.bucket_of(F.lit(None)).alias("b"))
        .head()["b"]
    )
    probe = next(
        s
        for s in (f"k{i}" for i in range(200))
        if spark.range(1)
        .select(c.documents.bucket_of(F.lit(s)).alias("b"))
        .head()["b"]
        == null_bucket
    )
    c.upsert_documents_df(
        spark.createDataFrame([(probe, "probe body")], "id string, body string")
    )
    docs = c.documents.read().collect()
    assert len(docs) == 3, "NULL-source_uuid row silently deleted"
    assert sum(r["source_uuid"] is None for r in docs) == 1


def test_change_log_bounded_under_sustained_churn(coll, pipe):
    """VERDICT r8 next #7: N upsert+sync cycles keep the on-disk
    `_changes` directory O(churn window). With every pipeline current,
    each sync prunes to zero; with one lagging pipeline the partition
    count equals exactly the laggard's unconsumed window (never more),
    and catches up to zero once the laggard syncs."""
    from postgresml_spark.collections import Pipeline

    coll._pipelines.pop("p1")
    # phase 1: no laggard — every cycle ends with an empty log
    for i in range(5):
        coll.upsert_documents(
            [{"id": 100 + i, "body": f"churn cycle {i} body"}]
        )
        pipe.sync()
        assert _log_seqs(coll) == set(), f"cycle {i}: log not pruned"
    # phase 2: attach a second pipeline, sync it once (on-disk
    # watermark), then let it lag (popped from the registry ==
    # attached from another session)
    p2 = Pipeline("lag", {"body": {"full_text_search": {}}})
    coll.add_pipeline(p2)
    coll._pipelines.pop("lag")
    sizes = []
    for i in range(10):
        coll.upsert_documents(
            [{"id": 200 + i, "body": f"lagged churn {i} body"}]
        )
        pipe.sync()
        sizes.append(len(_log_seqs(coll)))
    # the window grows 1 per unconsumed cycle — bounded by the lag,
    # with no extra partitions beyond it
    assert sizes == list(range(1, 11))
    # laggard catches up: retention immediately reclaims everything
    coll._pipelines["lag"] = p2
    p2.sync()
    assert _log_seqs(coll) == set()
    # and both pipelines see the full corpus (4 fixture + 15 churn)
    assert pipe.table("body_chunks").count() == 19
    assert p2.table("body_chunks").count() == 19
