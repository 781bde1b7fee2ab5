"""Mergeable-sketch operators: HLL, Count-Min, bottom-k sample,
winnowing fingerprints.  Properties tested are the sketch CONTRACTS
(mergeability, never-undercount, bounded error, selection guarantees),
not just output shapes — the oracle queries (q193–q196) pin the
engine-portable arithmetic separately."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresml_spark.operators import sketches as SK
from postgresml_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_similar_pairs,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def test_hll_estimate_within_rsd(orders):
    """m=64 ⇒ rsd ≈ 1.04/8 = 13%; assert within 4σ (the md5 'seed' is
    fixed, so this is a deterministic check, not a flaky one)."""
    regs = SK.hll_registers(orders, [], "o_custkey")
    est = SK.hll_estimate(regs, []).collect()[0]["hll_estimate"]
    exact = orders.select("o_custkey").distinct().count()
    assert abs(est - exact) / exact < 4 * 0.13


def test_hll_register_table_bounded(orders):
    regs = SK.hll_registers(orders, ["o_orderpriority"], "o_custkey")
    n_groups = orders.select("o_orderpriority").distinct().count()
    assert regs.count() <= 64 * n_groups


def test_hll_merge_equals_direct(orders):
    """Mergeability: union per-group register tables, max-merge, and
    the result must EQUAL the sketch built directly on the whole
    column — register-wise max is lossless for HLL state."""
    per = SK.hll_registers(orders, ["o_orderpriority"], "o_custkey")
    merged = SK.hll_merge(
        per.select(F.lit("ALL").alias("g"), "bucket", "reg"), ["g"]
    )
    direct = SK.hll_registers(orders, [], "o_custkey")
    m = {r["bucket"]: r["reg"] for r in merged.collect()}
    d = {r["bucket"]: r["reg"] for r in direct.collect()}
    assert m == d


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cm_never_undercounts(lineitem):
    counts = lineitem.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    sk = SK.cm_sketch(counts, "l_partkey", "cnt", d=4, w=256)
    probes = counts.orderBy(F.col("cnt").desc(), "l_partkey").limit(50)
    est = SK.cm_lookup(sk, probes, "l_partkey", d=4, w=256).collect()
    assert len(est) == min(50, counts.count())
    for r in est:
        assert r["cm_estimate"] >= r["cnt"]


def test_cm_sketch_bounded_and_mass_preserved(lineitem):
    """Each of the d rows of the sketch holds the FULL count mass
    (every key lands in exactly one cell per row); table ≤ d×w cells."""
    counts = lineitem.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    sk = SK.cm_sketch(counts, "l_partkey", "cnt", d=4, w=256)
    assert sk.count() <= 4 * 256
    total = lineitem.count()
    per_row = {
        r["j"]: r["s"]
        for r in sk.groupBy("j").agg(F.sum("cell").alias("s")).collect()
    }
    assert set(per_row) == {0, 1, 2, 3}
    assert all(v == total for v in per_row.values())


def test_cm_merge_is_cellwise_sum(lineitem):
    """Linearity: sketch(A ∪ B) == cell-wise sum of sketch(A) and
    sketch(B) — the property that lets epochs merge without data."""
    a = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    b = lineitem.filter(F.col("l_orderkey") % 2 == 1)

    def sk_of(df):
        c = df.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
        return SK.cm_sketch(c, "l_partkey", "cnt", d=2, w=64)

    merged = (
        sk_of(a)
        .unionAll(sk_of(b))
        .groupBy("j", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    direct = sk_of(lineitem)
    m = {(r["j"], r["bucket"]): r["cell"] for r in merged.collect()}
    d = {(r["j"], r["bucket"]): r["cell"] for r in direct.collect()}
    assert m == d


# ---------------------------------------------------------------------------
# Bottom-k sample
# ---------------------------------------------------------------------------


def test_bottomk_is_partitioning_invariant(lineitem):
    """The sample must depend only on row CONTENT: repartitioning the
    input (which changes spark_partition_id assignments, i.e. the
    stage-1 winnow groups) must not change the selected rows."""
    ids = ["l_orderkey", "l_linenumber"]

    def sample_keys(df):
        s = SK.bottomk_sample(df, ["l_returnflag"], ids, k=32)
        return sorted(
            (r["l_returnflag"], r["l_orderkey"], r["l_linenumber"])
            for r in s.select("l_returnflag", *ids).collect()
        )

    assert sample_keys(lineitem) == sample_keys(lineitem.repartition(13))


def test_bottomk_matches_single_stage(lineitem):
    """Two-stage winnow ≡ global bottom-k (the k smallest hashes each
    survive their local partition's cut)."""
    ids = ["l_orderkey", "l_linenumber"]
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in SK.bottomk_sample(lineitem, ["l_returnflag"], ids, k=16)
        .filter(F.col("l_returnflag") == "R")
        .select(*ids)
        .collect()
    )
    prio = SK.md5_long(
        F.concat_ws("-", *[F.col(c).cast("string") for c in ids])
    )
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in lineitem.filter(F.col("l_returnflag") == "R")
        .select(*ids, prio.alias("p"))
        .orderBy("p")
        .limit(16)
        .collect()
    )
    assert got == want


def test_bottomk_sizes(lineitem):
    s = SK.bottomk_sample(
        lineitem, ["l_returnflag"], ["l_orderkey", "l_linenumber"], k=64
    )
    sizes = {
        r["l_returnflag"]: r["n"]
        for r in s.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["l_returnflag"]: r["n"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for g, n in sizes.items():
        assert n == min(64, full[g])


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------


def test_winnow_guarantee_on_shared_run(spark):
    """Schleimer et al.'s guarantee: two documents sharing a token run
    of length ≥ n + w - 1 share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = n+w-1
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight nine"),
            (3, "totally different words everywhere here now and then"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", n=3, w=4)
    pairs = winnow_similar_pairs(fps, "doc_id", min_shared=1).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_winnow_density(spark, sf_dir):
    """Selected fingerprints ≈ 2/(w+1) of grams (positions picked);
    assert the set is a real winnow: non-empty and well below the full
    gram count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    fps = winnow_fingerprints(docs, "text", "doc_id", n=3, w=4)
    n_fps = fps.count()
    n_grams = (
        docs.select(
            (F.size(F.split(F.lower("text"), "[^a-z0-9]+")) - 2).alias("g")
        )
        .agg(F.sum("g"))
        .collect()[0][0]
    )
    assert 0 < n_fps < 0.8 * n_grams


def test_winnow_identical_docs_share_all(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    fps = winnow_fingerprints(docs, "text", "doc_id", n=3, w=4)
    a = {r["fp"] for r in fps.filter("doc_id = 1").collect()}
    b = {r["fp"] for r in fps.filter("doc_id = 2").collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# JL projection (q200's machinery)
# ---------------------------------------------------------------------------


def test_jl_ratio_concentrates(spark, sf_dir):
    """JL with k=16: distance ratios concentrate near 1 — assert every
    emitted ratio is within [0.4, 1.8] and the mean within 15% of 1
    (k=16 gives ε≈sqrt(8·ln n / k)≈... loose bounds chosen 4σ-safe;
    deterministic sign matrix ⇒ not flaky)."""
    from postgresml_spark.queries import q200_jl_random_projection

    rows = q200_jl_random_projection(spark, sf_dir).collect()
    assert len(rows) > 0
    ratios = [r["ratio"] for r in rows]
    assert all(0.4 < x < 1.8 for x in ratios)
    mean = sum(ratios) / len(ratios)
    assert abs(mean - 1.0) < 0.15


# ---------------------------------------------------------------------------
# PPJoin set-similarity join
# ---------------------------------------------------------------------------


def test_ppjoin_equals_every_shingle_join(spark, sf_dir):
    """Prefix filtering must lose nothing: PPJoin output == the plain
    inverted-index (every-shingle) join's thresholded output."""
    from postgresml_spark.operators.dedup import (
        ngram_jaccard_pairs,
        set_similarity_join,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pp = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in set_similarity_join(
            docs, "text", "doc_id", shingle_n=3, threshold=0.3
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", shingle_n=3, threshold=0.3
        ).collect()
    }
    assert pp == exact and len(pp) > 0


def test_ppjoin_prefix_actually_filters(spark):
    """The candidate prefix posting list must be a strict subset of the
    full posting list (the whole point); verify on synthetic docs with
    a known near-dup pair."""
    from postgresml_spark.operators.dedup import set_similarity_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, "completely different words here and there everywhere now"),
        ],
        ["doc_id", "text"],
    )
    got = set_similarity_join(docs, "text", "doc_id", 3, 0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert not any(3 in p for p in pairs)


# ---------------------------------------------------------------------------
# Streaming HLL (streams.streaming_hll_registers)
# ---------------------------------------------------------------------------


def test_streaming_hll_matches_batch_registers(spark, tmp_path):
    """The streamed register table must EQUAL the batch hll_registers
    over the same rows (same md5 arithmetic, max-monoid incremental
    update), and hll_estimate must read a sane distinct estimate off
    it — the streaming twin of q193."""
    import json
    import os

    from postgresml_spark.operators.sketches import hll_estimate
    from postgresml_spark.streaming.streams import streaming_hll_registers

    src = str(tmp_path / "hll_in")
    os.makedirs(src)
    rows = [
        {"ts": f"2026-01-01T10:{m:02d}:00", "user_id": uid}
        for m, uid in enumerate([1, 2, 3, 1, 2, 4, 5, 1, 6, 7] * 3)
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema("ts timestamp, user_id long").json(src)
    regs = streaming_hll_registers(
        stream, ts_col="ts", value_col="user_id", window="1 hour"
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["bucket"], r["reg"])
            for r in spark.sql("SELECT bucket, reg FROM hll_out").collect()
        }
    finally:
        q.stop()

    from postgresml_spark.operators.sketches import hll_registers

    batch = spark.read.schema("ts timestamp, user_id long").json(src)
    expect = {
        (r["bucket"], r["reg"])
        for r in hll_registers(batch, [], "user_id").collect()
    }
    assert streamed == expect

    est_df = spark.sql(
        "SELECT window_start AS g, bucket, reg FROM hll_out"
    )
    est = hll_estimate(est_df, ["g"]).collect()[0]["hll_estimate"]
    assert abs(est - 7) / 7 < 0.55  # m=64 rsd on a tiny set — sanity only


def test_streaming_cm_matches_batch_cells(spark, tmp_path):
    """Streamed CM cells over one window must equal the batch cm_sketch
    built from the same rows' per-key counts (CM linearity + identical
    salted-md5 buckets)."""
    import json
    import os

    from postgresml_spark.streaming.streams import streaming_cm_sketch

    src = str(tmp_path / "cm_in")
    os.makedirs(src)
    uids = [1, 2, 3, 1, 2, 1, 7, 7, 7, 7, 9] * 2
    rows = [
        {"ts": f"2026-01-01T10:{m:02d}:00", "user_id": uid}
        for m, uid in enumerate(uids)
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema("ts timestamp, user_id long").json(src)
    cm = streaming_cm_sketch(
        stream, ts_col="ts", key_col="user_id", window="1 hour", d=2, w=64
    )
    q = (
        cm.writeStream.format("memory")
        .queryName("cm_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["j"], r["bucket"]): r["cell"]
            for r in spark.sql("SELECT j, bucket, cell FROM cm_out").collect()
        }
    finally:
        q.stop()

    batch = spark.read.schema("ts timestamp, user_id long").json(src)
    counts = batch.groupBy("user_id").agg(F.count("*").alias("cnt"))
    expect = {
        (r["j"], r["bucket"]): r["cell"]
        for r in SK.cm_sketch(counts, "user_id", "cnt", d=2, w=64).collect()
    }
    assert streamed == expect
    assert sum(v for (j, _), v in streamed.items() if j == 0) == len(uids)


def test_cm_merge_equals_rebuild(lineitem):
    """CM is linear: cell-wise merge of per-epoch sketches must equal
    the sketch rebuilt from the union — exactly, not approximately."""
    from pyspark.sql import functions as F

    counts = lineitem.groupBy(
        "l_partkey", (F.col("l_orderkey") % 2).alias("epoch")
    ).agg(F.count("*").alias("cnt"))
    per_epoch = [
        SK.cm_sketch(counts.filter(F.col("epoch") == ep), "l_partkey", "cnt",
                     d=4, w=64)
        for ep in (0, 1)
    ]
    merged = SK.cm_merge(per_epoch[0].unionAll(per_epoch[1]))
    totals = lineitem.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    rebuilt = SK.cm_sketch(totals, "l_partkey", "cnt", d=4, w=64)
    m = {(r["j"], r["bucket"]): r["cell"] for r in merged.collect()}
    r = {(r["j"], r["bucket"]): r["cell"] for r in rebuilt.collect()}
    assert m == r


def test_cm_merge_config_guard(spark):
    """ADVICE r5: merging sketches built with different d/w silently
    produced garbage. With the declared config passed, rows outside
    the d×w grid (a wider/deeper input sketch) fail the plan; matching
    sketches merge unchanged (guard vs no-guard identical)."""
    import pytest

    counts = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 2)], "k string, cnt int"
    )
    good = SK.cm_sketch(counts, "k", "cnt", d=4, w=64)
    merged = {
        (r["j"], r["bucket"]): r["cell"]
        for r in SK.cm_merge(good.unionAll(good), d=4, w=64).collect()
    }
    plain = {
        (r["j"], r["bucket"]): r["cell"]
        for r in SK.cm_merge(good.unionAll(good)).collect()
    }
    assert merged == plain

    wide = SK.cm_sketch(counts, "k", "cnt", d=4, w=4096)  # mismatched w
    bad = SK.cm_merge(good.unionAll(wide), d=4, w=64)
    with pytest.raises(Exception, match="cm_merge"):
        bad.collect()


def test_cm_lookup_absent_key_estimates_zero(spark):
    """A probe key whose d cells were never touched by the build must
    estimate 0 (left join + coalesce), not vanish or overestimate."""
    counts = spark.createDataFrame([("k1", 5), ("k2", 7)], "k string, cnt int")
    sk = SK.cm_sketch(counts, "k", "cnt", d=4, w=4096)
    probes = spark.createDataFrame([("absent-key-xyz",)], "k string")
    got = SK.cm_lookup(sk, probes, "k", d=4, w=4096).collect()
    assert len(got) == 1 and got[0]["cm_estimate"] == 0
