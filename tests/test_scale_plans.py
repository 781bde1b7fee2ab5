"""Physical-plan assertions: the scale properties the engine promises
(pushdown, broadcast, partition pruning, shuffle-free bucketed joins)
are checked against actual executed plans so regressions fail tests.

Parameterized over sf0.1 AND sf1 (VERDICT r4 #5): statistics-driven
choices (broadcast vs sort-merge, AQE re-plans) can flip with real
file sizes, so every shape is asserted at both scales — a broadcast
that silently becomes a shuffle at 10x is exactly the 100x question.
sf1 lives at /tmp/testdata_sf1 (tools/make_sf1.py builds it).

A THIRD decade is opt-in (VERDICT r5 next #7): set
SPARK_GRAFT_SF10_DIR=/tmp/testdata_sf10 (tools/make_sf1.py with
factor 100) and the same shapes are asserted against sf10 statistics.
Opt-in because the bucketed-write/IVF-store tests materialize real
data — minutes at 60M lineitem rows, evidence-run cost, not CI cost.
"""

import os

import pytest
from pyspark.sql import functions as F

_SF1_DIR = "/tmp/testdata_sf1"
_SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "")


@pytest.fixture(
    scope="module",
    params=[
        "/root/testdata/sf0.1",
        pytest.param(
            _SF1_DIR,
            marks=pytest.mark.skipif(
                not os.path.isdir(_SF1_DIR),
                reason="sf1 not built (python tools/make_sf1.py)",
            ),
        ),
        pytest.param(
            _SF10_DIR,
            marks=pytest.mark.skipif(
                not (_SF10_DIR and os.path.isdir(_SF10_DIR)),
                reason="sf10 opt-in: set SPARK_GRAFT_SF10_DIR "
                       "(tools/make_sf1.py <dir> 100)",
            ),
        ),
    ],
    ids=["sf0.1", "sf1", "sf10"],
)
def sf_dir(request):
    # overrides the session-level sf0.001 fixture FOR THIS MODULE:
    # plan shapes are asserted where statistics actually bite
    return request.param

from postgresml_spark.operators.partitioning import (
    bucketed_join_ready,
    read_ivf_probe,
    salted_join,
    write_bucketed,
    write_ivf_store,
)
from postgresml_spark.operators.similarity import fit_ivf_centroids, knn_exact
from postgresml_spark.session import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_shipdate") <= F.lit("1995-01-01").cast("timestamp")).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 3 referenced columns in ReadSchema
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:300]


def test_broadcast_join_for_dims(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_knn_is_take_ordered(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.head()["embedding"]]
    plan = _plan(knn_exact(emb, qv, k=5))
    # top-k must be TakeOrdered (partial per-partition top-k), not a global sort
    assert "TakeOrderedAndProject" in plan


def test_bucketed_near_dup_is_equi_join(spark, sf_dir):
    # the sign-LSH bucketed near-dup must plan as a hash/sort-merge
    # equi-join on the bucket key, never a BroadcastNestedLoopJoin
    from postgresml_spark.operators import dedup as DD

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", DD.sign_lsh_bucket("embedding", 4)
    )
    pairs = DD.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.35, group_col="bucket"
    )
    plan = _plan(pairs)
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    # uses the default spark-warehouse dir (static conf, gitignored)
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "bkt.li_b", "l_orderkey", buckets=8)
    write_bucketed(o, "bkt.o_b", "l_orderkey", buckets=8)
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, shuffle_free = bucketed_join_ready(spark, "bkt.li_b", "bkt.o_b", "l_orderkey")
        assert shuffle_free, _plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt.li_b")
        spark.sql("DROP TABLE IF EXISTS bkt.o_b")


def test_ivf_store_partition_pruning(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = fit_ivf_centroids(emb, nlist=8)
    store = str(tmp_path / "ivf")
    write_ivf_store(emb, store, cents)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    probe = read_ivf_probe(spark, store, cents, qv, k=10, nprobe=2)
    plan = _plan(probe)
    # partition filter reaches the scan: pruning happens before I/O
    assert "centroid_id" in plan and ("PartitionFilters" in plan or "partitionFilters" in plan)
    rows = probe.collect()
    assert rows[0]["vec_id"] == 5  # self found in its own partition
    # recall vs exact within probed fraction
    exact = {r["vec_id"] for r in knn_exact(emb, qv, k=10).collect()}
    got = {r["vec_id"] for r in rows}
    assert len(exact & got) >= 4


def test_salted_join_correctness(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(2, i) for i in range(10)], "k int, v int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, name string")
    out = salted_join(big, small, "k")
    assert out.count() == 1010
    got = {r["k"]: r["name"] for r in out.select("k", "name").distinct().collect()}
    assert got == {1: "hot", 2: "cold"}


def test_aqe_enabled_by_default(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_decorrelated_queries_plan_shapes(spark, sf_dir):
    """q78-q81 (TPC-H Q4/Q17/Q21/Q22 shapes) must plan as their
    decorrelated forms: semi/anti joins, partitioned windows (never a
    single-partition global window), broadcast dims, TakeOrdered."""
    from postgresml_spark import queries as Q

    p78 = _plan(Q.q78_order_priority_exists(spark, sf_dir))
    assert "LeftSemi" in p78

    p79 = _plan(Q.q79_small_quantity_revenue(spark, sf_dir))
    assert "Window" in p79 and "l_partkey" in p79.split("Window")[1][:400]
    assert "BroadcastHashJoin" in p79

    p80 = _plan(Q.q80_waiting_suppliers(spark, sf_dir))
    assert "TakeOrderedAndProject" in p80
    assert "BroadcastHashJoin" in p80  # supplier dim

    p81 = _plan(Q.q81_idle_rich_customers(spark, sf_dir))
    assert "LeftAnti" in p81
    assert "BroadcastNestedLoopJoin" in p81  # the 1-row scalar crossJoin only


def test_new_operator_plan_shapes(spark, sf_dir):
    """Round-2 operators keep their promised physical shapes."""
    from postgresml_spark import queries as Q

    # BM25: idf + constants broadcast; no sort anywhere (pure aggregate)
    p85 = _plan(Q.q85_bm25(spark, sf_dir))
    assert "BroadcastHashJoin" in p85
    assert "BroadcastNestedLoopJoin" in p85  # the 1-row consts crossJoin

    # rolling features: ONE exchange on user_id serves all three frames
    p93 = _plan(Q.q93_rolling_window_features(spark, sf_dir))
    assert p93.count("Exchange hashpartitioning(user_id") == 1

    # PQ top-k: TakeOrdered, never a global sort
    from postgresml_spark.operators.similarity import fit_pq, pq_encode, pq_topk
    from postgresml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.head()["embedding"]]
    books = fit_pq(emb, "embedding", m=4, k=8)
    plan = _plan(pq_topk(pq_encode(emb, books), books, qv, k=5))
    assert "TakeOrderedAndProject" in plan

    # gapfill: scaffold side has no data-shuffle (broadcast sequence)
    from postgresml_spark.operators.timeseries import gapfill_locf
    e = load_table(spark, sf_dir, "events")
    pgf = _plan(gapfill_locf(e, "ts", "event_type", "value",
                             "2024-01-05 00:00:00", "2024-01-06 00:00:00"))
    assert "Window" in pgf and "event_type" in pgf.split("Window")[1][:300]


def test_bm25_index_prunes_term_buckets(spark, sf_dir, tmp_path):
    """The served BM25 query must prune the posting store to its
    terms' hash buckets at file listing (PartitionFilters), and its
    scores must equal corpus-scan bm25_scores exactly."""
    from postgresml_spark.functions.text import (
        bm25_scores, bm25_search_index, build_text_index,
    )

    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "ftidx")
    build_text_index(d, path, "text", "doc_id")
    served = bm25_search_index(spark, path, ["vector", "merge"])
    plan = _plan(served)
    assert "PartitionFilters" in plan and "__bucket" in plan

    scan = bm25_scores(d, ["vector", "merge"], "text", "doc_id")
    a = {r["doc_id"]: round(r["score"], 9) for r in served.collect()}
    b = {r["doc_id"]: round(r["score"], 9) for r in scan.collect()}
    assert a == b


def test_ivf_store_incremental_append(spark, sf_dir, tmp_path):
    """append_ivf_store: new vectors join frozen-centroid partitions
    without touching existing files; probes see them immediately and
    results equal a full rebuild over the combined corpus."""
    import os

    from postgresml_spark.operators.partitioning import append_ivf_store

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 300)
    new = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    cents = fit_ivf_centroids(old, nlist=8)

    store = str(tmp_path / "ivf_inc")
    write_ivf_store(old, store, cents)

    def file_set():
        out = set()
        for root, _, files in os.walk(store):
            out |= {os.path.join(root, f) for f in files if f.endswith(".parquet")}
        return out

    before = file_set()
    append_ivf_store(new, store, cents)
    after = file_set()
    assert before <= after and len(after) > len(before)  # append-only

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 350).head()["embedding"]]
    probe = read_ivf_probe(spark, store, cents, qv, k=10, nprobe=8)
    got = [r["vec_id"] for r in probe.collect()]
    assert got[0] == 350  # appended vector served

    rebuilt = str(tmp_path / "ivf_full")
    write_ivf_store(old.unionByName(new), rebuilt, cents)
    full = [r["vec_id"] for r in read_ivf_probe(spark, rebuilt, cents, qv, k=10, nprobe=8).collect()]
    assert got == full  # incremental == rebuild at same centroids


def test_runtime_bloom_filter_injects(spark, sf_dir):
    """Runtime bloom-filter join pruning: with a selective dim-side
    filter, Catalyst injects a bloom filter on the fact side's join
    key so non-matching fact rows drop at the scan, pre-shuffle. The
    default activation gate is a 10 GB application-side scan — i.e.
    this turns itself on exactly at the scale we design for; the test
    lowers the size gates to observe injection at test scale."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 400000)
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        assert j.count() >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        )


def test_tpch_q2_q16_and_dp_plan_shapes(spark, sf_dir):
    """q161/q162 (TPC-H Q2/Q16 shapes) and q163 keep their promised
    physical shapes: dims broadcast, NOT-IN as a broadcast anti join,
    no cartesian products, and the DP release adds no shuffle beyond
    its one aggregate."""
    from postgresml_spark import queries as Q

    p161 = _plan(Q.q161_min_cost_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in p161          # eu suppliers + part dim
    assert "CartesianProduct" not in p161
    assert "TakeOrderedAndProject" in p161      # top-100, never global sort

    p162 = _plan(Q.q162_parts_supplier_counts(spark, sf_dir))
    assert "LeftAnti" in p162                   # NOT IN → anti join
    assert "BroadcastHashJoin" in p162
    assert "TakeOrderedAndProject" in p162

    p163 = _plan(Q.q163_dp_release(spark, sf_dir))
    # one aggregate exchange over the corpus; noise is scalar exprs
    assert p163.count("Exchange hashpartitioning") == 1
    assert "Window" not in p163


def test_image_near_dup_query_plan_is_banded(spark, sf_dir):
    """q160's pair stage must be the banded equi-join, never a
    broadcast-nested-loop/cartesian pair enumeration."""
    from postgresml_spark import queries as Q

    p160 = _plan(Q.q160_image_ahash_pairs(spark, sf_dir))
    assert "CartesianProduct" not in p160
    assert "BroadcastNestedLoopJoin" not in p160
    assert "ShuffledHashJoin" in p160 or "SortMergeJoin" in p160


def test_rendezvous_reshard_movement(spark):
    """HRW property: growing 8→9 buckets moves ~1/9 of keys, every
    mover lands ON the new bucket (an O(moved) partial rewrite), and
    assignment stays balanced. Modulo routing would remap ~8/9."""
    from postgresml_spark.operators.partitioning import rendezvous_bucket

    n = 9000
    a = spark.range(n).select(
        rendezvous_bucket("id", 8).alias("b8"),
        rendezvous_bucket("id", 9).alias("b9"),
    )
    moved = a.filter(F.col("b8") != F.col("b9")).cache()
    frac = moved.count() / n
    assert 0.08 < frac < 0.15
    assert moved.filter(F.col("b9") != 8).count() == 0
    counts = [r["c"] for r in a.groupBy("b8").agg(F.count("*").alias("c")).collect()]
    assert len(counts) == 8 and min(counts) > n / 8 * 0.7
    moved.unpersist()


def test_continuation_query_plan_shapes(spark, sf_dir):
    """Round-2-continuation flagships keep their promised shapes."""
    from postgresml_spark import queries as Q

    def tree(df):
        return _plan(df).split("\n\n")[0]

    # sparse retrieval: broadcast query postings, TakeOrdered top-k
    t = tree(Q.q167_sparse_retrieval(spark, sf_dir))
    assert "TakeOrderedAndProject" in t and "BroadcastHashJoin" in t
    assert "CartesianProduct" not in t and "SortMergeJoin" not in t

    # heavy hitters: candidates broadcast into the exact verify pass
    t = tree(Q.q166_heavy_hitters(spark, sf_dir))
    assert "TakeOrderedAndProject" in t and "BroadcastHashJoin" in t

    # point-in-time features: every window key-partitioned (the plan
    # lint already guarantees no global window; pin the shuffle budget)
    t = tree(Q.q171_point_in_time_features(spark, sf_dir))
    assert t.count("Exchange") <= 4

    # SCD2 PIT lookup: history build + as-of share the user_id
    # partitioning — two exchanges total
    t = tree(Q.q175_scd2_pit_lookup(spark, sf_dir))
    assert t.count("Exchange") <= 2
