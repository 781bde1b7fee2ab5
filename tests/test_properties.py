"""Property-based tests (hypothesis) for the deterministic kernels.

Pure-Python properties run at full hypothesis volume; Spark-backed
properties use small example counts (each example is a Spark job).
"""

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from postgresml_spark.functions.embed import _polyhash_py
from postgresml_spark.functions.text import recursive_character_split

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"), max_codepoint=0x2000),
    max_size=400,
)


@given(TEXT, st.integers(10, 100), st.integers(0, 9))
@settings(max_examples=200, deadline=None)
def test_chunker_invariants(text, size, overlap):
    chunks = recursive_character_split(text, chunk_size=size, chunk_overlap=overlap)
    # 1. every chunk within size
    assert all(len(c) <= size for c in chunks)
    # 2. no empty/whitespace-only chunks
    assert all(c.strip() for c in chunks)
    # 3. deterministic
    assert chunks == recursive_character_split(text, chunk_size=size, chunk_overlap=overlap)
    # 4. all non-space content preserved (order-insensitively by char counts)
    def counts(s):
        out = {}
        for ch in s:
            if not ch.isspace():
                out[ch] = out.get(ch, 0) + 1
        return out
    original = counts(text)
    emitted = counts("".join(chunks))
    # chunks may duplicate chars (overlap) but never lose them
    for ch, n in original.items():
        assert emitted.get(ch, 0) >= n


@given(st.text(max_size=100))
@settings(max_examples=500, deadline=None)
def test_polyhash_range_and_determinism(s):
    h = _polyhash_py(s)
    assert 0 <= h < 2147483647
    assert h == _polyhash_py(s)


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=32))
@settings(max_examples=30, deadline=None)
def test_vector_norms_match_numpy(spark, xs):
    import numpy as np
    from postgresml_spark.functions import vectors as V

    df = spark.createDataFrame([(xs,)], "v array<double>")
    row = df.select(
        V.norm_l1("v").alias("l1"),
        V.norm_l2("v").alias("l2"),
        V.norm_max("v").alias("lmax"),
        V.norm_l0("v").alias("l0"),
    ).head()
    a = np.array(xs)
    assert math.isclose(row["l1"], float(np.abs(a).sum()), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["l2"], float(np.sqrt((a * a).sum())), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["lmax"], float(np.abs(a).max()), rel_tol=1e-12)
    assert row["l0"] == int((a != 0).sum())


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 100)), min_size=1, max_size=60
    )
)
@settings(max_examples=20, deadline=None)
def test_filter_dsl_matches_python_semantics(spark, rows):
    from postgresml_spark.operators.filter_dsl import compile_filter, struct_resolver

    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(rows)], "id int, a int, b int")
    spec = {"$or": [{"a": {"$gte": 25}}, {"$and": [{"b": {"$lt": 40}}, {"$not": {"a": {"$in": [1, 2, 3]}}}]}]}
    got = sorted(r["id"] for r in df.filter(compile_filter(spec, struct_resolver())).collect())
    want = sorted(
        i for i, (a, b) in enumerate(rows)
        if a >= 25 or (b < 40 and a not in (1, 2, 3))
    )
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(1, 30), st.integers(1, 30)).filter(lambda p: p[0] != p[1]),
        min_size=0, max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_dup_clusters_is_a_valid_partition(spark, edge_list):
    """Property: cluster labels form a valid partition — every node
    labeled, labels are component minima, label is idempotent under
    re-running on the quotient (one canonical per cluster)."""
    from postgresml_spark.operators.dedup import dup_clusters

    nodes = sorted({n for e in edge_list for n in e} | {99})
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id int")
    edf = spark.createDataFrame(edge_list or [(98, 98)], "id_a int, id_b int")
    if not edge_list:
        edf = edf.filter("id_a != id_a")  # empty
    out = {r["doc_id"]: r["cluster_id"] for r in
           dup_clusters(ndf, edf, id_col="doc_id").collect()}
    assert set(out) == set(nodes)

    # union-find reference
    parent = {n: n for n in nodes}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edge_list:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}
    assert out == want


@given(st.lists(st.floats(0.01, 5.0), min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_rrf_scores_bounded_and_order_free(spark, scores):
    """Property: rrf_score ∈ (0, lists/(k+1)]; permuting input list
    order never changes the fused result."""
    from postgresml_spark.collections.search import rrf_fuse

    rows = [(i, s) for i, s in enumerate(scores)]
    l1 = spark.createDataFrame(rows, "doc_id int, score double")
    l2 = spark.createDataFrame(list(reversed(rows)), "doc_id int, score double")
    a = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([l1, l2], k=60).collect()}
    b = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([l2, l1], k=60).collect()}
    assert a == b
    assert all(0 < v <= 2 / 61 for v in a.values())


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1, max_size=20,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=0, max_size=20,
    ),
    st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_pandas_randomized(spark, lrows, rrows, direction):
    """Random (key, t) layouts, all three directions, vs pd.merge_asof.
    Right side deduped per (key, t) — the operator's determinism
    contract."""
    import pandas as pd

    from postgresml_spark.operators.timeseries import asof_join

    rdedup = {}
    for i, (k, t) in enumerate(rrows):
        rdedup.setdefault((k, t), i)
    left = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(lrows)],
        "k long, t double, lid long",
    )
    if rdedup:
        right = spark.createDataFrame(
            [(k, float(t), v) for (k, t), v in sorted(rdedup.items())],
            "k long, t double, rv long",
        )
    else:
        right = spark.createDataFrame([], "k long, t double, rv long")
    got = (
        asof_join(left, right, on="t", by="k", direction=direction)
        .orderBy("k", "t", "lid")
        .toPandas()
    )
    lp = left.toPandas().sort_values(["t", "lid"], kind="stable")
    rp = right.toPandas().sort_values("t", kind="stable")
    want = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction, suffixes=("", "_r")
    ).sort_values(["k", "t", "lid"], kind="stable")
    got_vals = list(got["rv_r"].fillna(-1).astype(int))
    want_vals = list(want["rv"].fillna(-1).astype(int))
    if direction == "nearest":
        # tie semantics at equal distance may differ (we pin backward);
        # accept either side of an exact tie
        lp_t = list(want["t"])
        for i, (g, w) in enumerate(zip(got_vals, want_vals)):
            if g == w:
                continue
            k, t = int(want.iloc[i]["k"]), float(lp_t[i])
            cand = rp[rp["k"] == k]
            dists = {int(r.rv): abs(float(r.t) - t) for r in cand.itertuples()}
            assert g in dists and w in dists and abs(dists[g] - dists[w]) < 1e-12
    else:
        assert got_vals == want_vals


@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=300),
    st.integers(2, 16),
)
@settings(max_examples=10, deadline=None)
def test_heavy_hitters_exact_vs_counter(spark, vals, capacity):
    """Whatever the capacity and layout, the verified top-k equals the
    Counter ground truth whenever the MG guarantee holds (k-th count >
    N/capacity); we pick k=3 and only assert on inputs satisfying it."""
    from collections import Counter

    from postgresml_spark.operators.corpus import heavy_hitters

    c = Counter(str(v) for v in vals)
    truth = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    if len(truth) < 3 or truth[-1][1] <= len(vals) / capacity:
        return  # guarantee not applicable at this capacity
    items = spark.createDataFrame([(str(v),) for v in vals], "term string")
    got = [
        (r["term"], r["cnt"])
        for r in heavy_hitters(items, "term", k=3, capacity=capacity).collect()
    ]
    assert got == truth
