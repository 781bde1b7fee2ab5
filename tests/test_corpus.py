"""Tests for training-corpus assembly operators (operators/corpus.py)
and binary-quantized ANN (operators/similarity.py)."""

import pytest
from pyspark.sql import functions as F

from postgresml_spark.operators import corpus as CO
from postgresml_spark.operators.similarity import (
    binary_signature,
    binary_signature_py,
    hamming_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", f"doc number {i} body text") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# deterministic_shuffle
# ---------------------------------------------------------------------------

def test_shuffle_is_permutation_and_deterministic(docs):
    a = CO.deterministic_shuffle(docs, ["doc_id"], seed=1)
    ranks = [r["shuffle_rank"] for r in a.select("shuffle_rank").collect()]
    assert sorted(ranks) == list(range(1, 201))
    b = CO.deterministic_shuffle(docs, ["doc_id"], seed=1)
    assert (
        a.select("doc_id", "shuffle_rank").collect()
        == b.select("doc_id", "shuffle_rank").collect()
    )


def test_shuffle_seed_changes_order(docs):
    a = {
        r["doc_id"]: r["shuffle_rank"]
        for r in CO.deterministic_shuffle(docs, ["doc_id"], seed=1).collect()
    }
    b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in CO.deterministic_shuffle(docs, ["doc_id"], seed=2).collect()
    }
    assert a != b


def test_shuffle_no_single_partition_window(docs):
    plan = CO.deterministic_shuffle(docs, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan must be partitioned (no global sort)
    for line in plan.splitlines():
        if "Window" in line and "windowspec" in line.lower():
            assert "partitionBy" not in line or "partitionBy=[]" not in line


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------

def test_weighted_sample_rates(docs):
    out = CO.weighted_sample(
        docs, "source", {"src0": 2.0, "src1": 0.5, "src2": 1.0}, ["doc_id"], seed=3
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src0"] == 100  # exactly 2 copies of each of 50
    assert counts["src2"] == 50  # kept verbatim
    assert 10 <= counts["src1"] <= 40  # ~half of 50
    assert "src3" not in counts  # default_rate=0 drops unlisted domains


def test_weighted_sample_copy_index_distinct(docs):
    out = CO.weighted_sample(docs, "source", {"src0": 3.0}, ["doc_id"], seed=3)
    assert out.count() == 150
    assert out.select("doc_id", "copy").distinct().count() == 150
    assert out.agg(F.max("copy")).head()[0] == 3


def test_weighted_sample_deterministic(docs):
    w = {"src0": 0.5, "src1": 0.25}
    a = CO.weighted_sample(docs, "source", w, ["doc_id"], seed=9).collect()
    b = CO.weighted_sample(docs, "source", w, ["doc_id"], seed=9).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_weighted_sample_broadcasts_rate_table(docs):
    out = CO.weighted_sample(docs, "source", {"src0": 1.0}, ["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# gopher_quality_flags
# ---------------------------------------------------------------------------

def test_quality_flags(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and all of its friends"),
        (2, "#### $$$$ %%%% @@@@ !!!! ???? &&&& ****"),  # symbols, no stopwords
        (3, "a b"),  # too few words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in CO.gopher_quality_flags(df).collect()}
    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 14
    assert out[2]["keep"] is False
    assert out[2]["alpha_word_ratio"] == 0.0
    assert out[3]["keep"] is False


# ---------------------------------------------------------------------------
# pack_sequences / greedy_pack
# ---------------------------------------------------------------------------

def test_pack_sequences_accounting(spark):
    rows = [
        (1, "a", 100), (2, "a", 100), (3, "a", 100),  # doc 3 straddles 256
        (4, "a", 400),  # spans two budgets on its own
        (5, "b", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, tokens long")
    out = {r["doc_id"]: r for r in CO.pack_sequences(df, "tokens", "doc_id", "lang", 256).collect()}
    assert out[1]["pack_start"] == 0 and out[1]["pack_first"] == 0 and out[1]["pack_last"] == 0
    assert out[3]["pack_start"] == 200
    assert (out[3]["pack_first"], out[3]["pack_last"]) == (0, 1)  # straddles
    assert out[4]["pack_start"] == 300
    assert (out[4]["pack_first"], out[4]["pack_last"]) == (1, 2)
    assert out[4]["pack_count"] == 2
    assert out[5]["pack_first"] == 0  # independent stream


def test_pack_sequences_zero_token_doc(spark):
    df = spark.createDataFrame(
        [(1, "a", 256), (2, "a", 0), (3, "a", 1)], "doc_id long, lang string, tokens long"
    )
    out = {r["doc_id"]: r for r in CO.pack_sequences(df, "tokens", "doc_id", "lang", 256).collect()}
    # empty doc sits at the boundary; pack_last clamps to pack_first
    assert out[2]["pack_first"] == out[2]["pack_last"] == 1
    assert out[2]["pack_count"] == 1


def test_greedy_pack_first_fit(spark):
    rows = [
        (1, "a", 100), (2, "a", 100), (3, "a", 100),  # 1+2 fit; 3 overflows
        (4, "a", 300),  # oversize: own pack
        (5, "a", 50),
        (6, "b", 500),  # oversize, fresh stream: pack 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, tokens long")
    out = {r["doc_id"]: r["pack_id"] for r in CO.greedy_pack(df, "tokens", "doc_id", "lang", 256).collect()}
    assert out[1] == 0 and out[2] == 0
    assert out[3] == 1
    assert out[4] == 2  # would overflow pack 1 (100+300)
    assert out[5] == 3  # 300+50 > 256 → new pack
    assert out[6] == 0


def test_greedy_pack_never_splits_and_bounds(spark):
    import random

    rng = random.Random(5)
    rows = [(i, "s", rng.randint(1, 200)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, tokens long")
    out = CO.greedy_pack(df, "tokens", "doc_id", "lang", 256)
    sums = out.groupBy("pack_id").agg(F.sum("tokens").alias("s"), F.count("*").alias("n")).collect()
    for r in sums:
        # a pack exceeds budget only when it is a single oversize doc
        assert r["s"] <= 256 or r["n"] == 1


# ---------------------------------------------------------------------------
# binary signature / hamming
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(120)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_binary_signature_batch_expr_parity(vecs):
    _, df = vecs
    a = df.select("vec_id", binary_signature("embedding", 64, impl="batch").alias("s"))
    b = df.select("vec_id", binary_signature("embedding", 64, impl="expr").alias("s"))
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_binary_signature_py_parity(vecs):
    rows, df = vecs
    got = {r["vec_id"]: r["s"] for r in df.select("vec_id", binary_signature("embedding", 64).alias("s")).collect()}
    for vid, v in rows[:10]:
        # cast float32 like parquet/createDataFrame does before signing
        import numpy as np

        v32 = np.asarray(v, dtype="float32").tolist()
        assert got[vid] == binary_signature_py(v32)


def test_binary_signature_non_multiple_dim(spark):
    df = spark.createDataFrame([(1, [1.0, -1.0, 2.0])], "vec_id long, embedding array<float>")
    got = df.select(binary_signature("embedding", 3).alias("s")).head()["s"]
    assert got == [0b101]
    exp = df.select(binary_signature("embedding", 3, impl="expr").alias("s")).head()["s"]
    assert exp == got


def test_hamming_topk_matches_bruteforce(vecs):
    rows, df = vecs
    qv = rows[0][1]
    got = [(r["vec_id"], r["hamming"]) for r in hamming_topk(df, qv, dim=64, k=5).collect()]

    qs = binary_signature_py([float(x) for x in __import__("numpy").asarray(qv, dtype="float32")])
    def ham(v):
        s = binary_signature_py([float(x) for x in __import__("numpy").asarray(v, dtype="float32")])
        return sum(bin(a ^ b).count("1") for a, b in zip(s, qs))

    exp = sorted(((vid, ham(v)) for vid, v in rows), key=lambda t: (t[1], t[0]))[:5]
    assert got == exp


def test_hamming_topk_plan_is_take_ordered(vecs):
    _, df = vecs
    plan = hamming_topk(df, [0.1] * 64, dim=64, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_lm_scores_golden(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in CO.unigram_lm_scores(df).collect()}
    # vocab a:3 b:1 c:1, N=5 V=3, denom=9; p(a)=4/9 p(b)=p(c)=2/9
    exp1 = -(2 * math.log(4 / 9) + math.log(2 / 9)) / 3
    exp2 = -(math.log(4 / 9) + math.log(2 / 9)) / 2
    assert out[1]["n_tokens"] == 3 and abs(out[1]["nll"] - exp1) < 1e-12
    assert out[2]["n_tokens"] == 2 and abs(out[2]["nll"] - exp2) < 1e-12


def test_unigram_lm_vocab_cap_folds_tail_into_oov(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in
           CO.unigram_lm_scores(df, vocab_cap=2).collect()}
    # top-2 (count desc, tok asc): a:3, b:1 → N=4 V=2 denom=7; c is OOV
    exp2 = -(math.log(4 / 7) + math.log(1 / 7)) / 2
    assert abs(out[2]["nll"] - exp2) < 1e-12


def test_unigram_lm_scoring_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} common word") for i in range(50)],
        "doc_id int, text string",
    )
    plan = (
        CO.unigram_lm_scores(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_stratified_take_exact_k_and_layout_independent(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)], "doc_id int, source string"
    )
    got = CO.stratified_take(df, "source", 5, ["doc_id"], seed=1)
    counts = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5}
    # same seed, different physical layout → identical sample
    re_part = df.repartition(13, "doc_id")
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in CO.stratified_take(re_part, "source", 5, ["doc_id"], seed=1).collect()}
    assert a == b
    # different seed → different sample (overwhelmingly likely)
    c = {tuple(r) for r in CO.stratified_take(df, "source", 5, ["doc_id"], seed=2).collect()}
    assert a != c
    # k larger than group keeps everything
    assert CO.stratified_take(df, "source", 999, ["doc_id"]).count() == 60


def test_pq_lossy_recall_and_compression(spark, sf_dir):
    from postgresml_spark.operators.similarity import (
        fit_pq, knn_exact, pq_encode, pq_topk,
    )
    from postgresml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.head()["embedding"]]
    exact = [r["vec_id"] for r in knn_exact(emb, qv, k=10).collect()]

    # synthetic embeddings are ~uniform random - the hostile case for
    # PQ (no cluster structure to exploit); m=16 subspaces of 4 dims
    # keep quantization error below neighbor spacing
    books = fit_pq(emb, "embedding", m=16, k=64)
    assert len(books) == 16 and books[0].shape == (64, 4)  # 64-dim / m=16
    enc = pq_encode(emb, books, "embedding")
    # 16 small-int codes/vector vs 64 float32s: 16x resident-index cut
    row = enc.head()
    assert len(row["pq_code"]) == 16
    assert all(0 <= c < 64 for c in row["pq_code"])

    got = [r["vec_id"] for r in pq_topk(enc, books, qv, k=10).collect()]
    # top-k by cosine vs L2 differ in principle; compare against L2 exact
    import numpy as np
    rows = emb.select("vec_id", "embedding").collect()
    q = np.asarray(qv)
    l2 = sorted(
        ((float(np.linalg.norm(np.asarray([float(x) for x in r["embedding"]]) - q)), r["vec_id"])
         for r in rows),
    )[:10]
    l2_ids = [vid for _, vid in l2]
    recall = len(set(got) & set(l2_ids)) / 10
    assert recall >= 0.4, (recall, got, l2_ids)
    assert exact  # plan sanity


def test_ivf_pq_closure_equals_exact(spark, sf_dir):
    """nprobe=nlist + degenerate codebooks => IVF-PQ must return the
    exact L2 top-k (the q66 x q95 closure composed)."""
    import numpy as np
    from postgresml_spark.operators.similarity import (
        fit_ivf_centroids, fit_pq, knn_ivf_pq,
    )
    from postgresml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.head()["embedding"]]
    cents = fit_ivf_centroids(emb, nlist=8)
    books = fit_pq(emb, "embedding", m=4, k=512)  # >= 500 distinct subvectors
    got = [(r["vec_id"], round(r["dist"], 6)) for r in
           knn_ivf_pq(emb, cents, books, qv, k=10, nprobe=8).collect()]

    rows = emb.select("vec_id", "embedding").collect()
    q = np.asarray(qv)
    exact = sorted(
        (round(float(np.linalg.norm(
            np.asarray([float(x) for x in r["embedding"]]) - q)), 6), r["vec_id"])
        for r in rows
    )[:10]
    assert got == [(vid, d) for d, vid in exact]


def test_served_index_pq_compressed_cache(spark, sf_dir):
    import numpy as np
    from postgresml_spark.operators.similarity import ServedIndex
    from postgresml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.head()["embedding"]]
    idx = ServedIndex(emb, pq=(16, 64))
    try:
        # the resident cache holds codes, NOT vectors
        assert "embedding" not in idx.df.columns
        assert "pq_code" in idx.df.columns
        got = {r["vec_id"] for r in idx.search(qv, k=10).collect()}
    finally:
        idx.close()
    rows = emb.select("vec_id", "embedding").collect()
    q = np.asarray(qv)
    exact = sorted(
        (float(np.linalg.norm(np.asarray([float(x) for x in r["embedding"]]) - q)),
         r["vec_id"]) for r in rows
    )[:10]
    recall = len(got & {v for _, v in exact}) / 10
    assert recall >= 0.4, recall


def test_weighted_take_is_biased_and_deterministic(spark):
    # weights 100 vs 1: heavy rows must dominate a k=50 sample of 200
    rows = [(i, 100 if i < 100 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, w int")
    got = {r["doc_id"] for r in CO.weighted_take(df, 50, "w", ["doc_id"], seed=3).collect()}
    heavy = sum(1 for i in got if i < 100)
    assert heavy >= 40  # ~E[heavy] is near 50 at a 100:1 weight ratio
    # deterministic under repartition
    again = {r["doc_id"] for r in CO.weighted_take(
        df.repartition(7), 50, "w", ["doc_id"], seed=3).collect()}
    assert got == again
    # TakeOrdered plan, not a global sort
    plan = CO.weighted_take(df, 50, "w", ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kn_bigram_golden_hand_computation(spark):
    """Kneser–Ney bigram scores match a pure-Python hand computation of
    the textbook formula (discount mass conservation included): the
    engine-portable arithmetic q191's oracle relies on."""
    import math

    from postgresml_spark.operators.corpus import kn_bigram_scores

    train = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the cat ran")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(0, "the cat sat"), (1, "dog jumps high")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_nll"])
        for r in kn_bigram_scores(train, score).collect()
    }

    # hand-built stats from the train corpus
    bigrams = [
        ("the", "cat"), ("cat", "sat"), ("sat", "on"), ("on", "the"),
        ("the", "mat"), ("the", "cat"), ("cat", "ran"),
    ]
    from collections import Counter

    c12 = Counter(bigrams)
    c1 = Counter(); n1pf = Counter(); n1pb = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1pf[w1] += 1
        n1pb[w2] += 1
    B = len(c12)
    D = 0.75

    def p(w1, w2):
        cont = n1pb.get(w2, 0) / B
        if w1 in c1:
            raw = max(c12.get((w1, w2), 0) - D, 0.0) / c1[w1] + (
                D * n1pf[w1] / c1[w1]
            ) * cont
        else:
            raw = cont
        return raw if raw > 0 else 1.0 / (B + 1)

    exp0 = -(math.log(p("the", "cat")) + math.log(p("cat", "sat"))) / 2
    exp1 = -(math.log(p("dog", "jumps")) + math.log(p("jumps", "high"))) / 2
    assert got[0][0] == 2 and abs(got[0][1] - exp0) < 1e-9
    assert got[1][0] == 2 and abs(got[1][1] - exp1) < 1e-9
    # seen bigram in a seen context scores far more likely than OOV
    assert got[0][1] < got[1][1]

    # discount mass conservation: P(·|w1) sums to 1 over the
    # continuation vocabulary for a seen context
    vocab = set(n1pb)
    total = sum(p("the", w) for w in vocab)
    assert abs(total - 1.0) < 1e-12
