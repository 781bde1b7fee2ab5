"""Sparse-vector features and retrieval (pgvector ``sparsevec`` analog).

The reference stack stores sparse embeddings (SPLADE-style learned
lexical vectors) in pgvector's ``sparsevec`` type and scores them with
the inner-product operator; the SDK's pipeline schema accepts a sparse
index on an embeddings field the same way it accepts HNSW on dense
ones. Spark has no sparse-vector type — and doesn't need one: the
natural *distributed* representation of a sparse matrix is its posting
list, one row per ``(id, index, weight)``. This module builds
deterministic sparse features from text (portable-hash indices,
log-saturated tf × idf — the no-model twin of a SPLADE encoder,
exactly as ``functions/embed.py::hash_embed`` is the no-model twin of
a dense encoder) and retrieves by sparse inner product via a
posting-list equi-join.

Scale shape (100 TB):

- Featurization is ONE corpus scan: explode tokens → groupBy (id,
  term) tf (map-side partial) → broadcast idf join → portable-hash
  index → groupBy (id, idx) collision merge. Every exchange carries
  (id, term/idx) rows — reduced relative to corpus text, uniform keys.
- Retrieval broadcasts the QUERY postings (bounded by query length),
  so the corpus posting store is filtered map-side; the only shuffle
  is the per-(id) partial-sum, bounded by |matching postings|, and the
  final top-k is TakeOrdered (no global sort).
- The posting store is write-once and appendable; index maintenance is
  the same append-only posting discipline as the BM25 inverted index
  (functions/text.py) and the IVF store (operators/partitioning.py).

Reference parity: pgvector sparsevec inner product (`<#>`), pgml SDK
sparse-embedding pipeline fields (pgml-sdks/pgml/src/models.rs
pipeline schema).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from postgresml_spark.functions.text import tokenize
from postgresml_spark.operators.corpus import hash_key

__all__ = [
    "sparse_features",
    "sparse_query",
    "sparse_queries",
    "sparse_topk",
    "sparse_topk_join",
    "sparse_cosine_topk",
    "to_sparsevec",
    "postings_to_vectors",
    "build_sparse_index",
    "sparse_search_index",
    "append_to_sparse_index",
    "ServedSparseIndex",
    "SPARSE_IDF_SQL",
]


# DuckDB twin of the idf used below (ln((N+1)/(df+1)) + 1, positive,
# smoothed — sklearn's TfidfVectorizer smooth_idf form):
SPARSE_IDF_SQL = "(ln((n_docs + 1.0) / (df_t + 1.0)) + 1.0)"


def _term_index(term: Column, dim: int, seed: int | str) -> Column:
    """Portable hash index in [0, dim): md5-derived, bit-equal in
    DuckDB via corpus.hash_key's documented SQL twin ``% dim``."""
    return (hash_key(seed, term) % F.lit(dim)).cast("bigint")


def _tfidf_weight(tf: Column, df: Column, n: Column) -> Column:
    """(1 + ln tf) · (ln((N+1)/(df+1)) + 1) — THE weight form of this
    module (docs, queries, and the DuckDB twin all state it once)."""
    return (F.lit(1.0) + F.log(tf.cast("double"))) * (
        F.log((n + F.lit(1.0)) / (df + F.lit(1.0))) + F.lit(1.0)
    )


def sparse_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 18,
    seed: int | str = "sparse",
) -> DataFrame:
    """Posting-list sparse features: one row per (id, idx, weight).

    weight(term) = (1 + ln(tf)) · (ln((N+1)/(df+1)) + 1) — log-saturated
    term frequency (BM25/SPLADE-style saturation) times smoothed idf.
    Hash collisions (two terms → one index) sum, as in feature hashing.

    Columns out: ``id_col``, ``idx`` (bigint in [0, dim)), ``weight``.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__term")
    )
    tf = toks.groupBy(id_col, "__term").agg(F.count("*").alias("__tf"))
    dft = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    n_docs = df.select(F.count("*").alias("__n"))
    # dft is corpus-vocabulary-sized: at web scale (10^9+ word types,
    # the bound this module's scale contract cites) a forced broadcast
    # would exceed the broadcast limit and take down the job — and the
    # hint also blocks fallback to a shuffle join. Unhinted, AQE picks
    # broadcast only when the RUNTIME vocab stat is actually small and
    # otherwise shuffle-joins on __term — dft's groupBy already leaves
    # it partitioned on __term, so the fallback costs one exchange of
    # tf (ADVICE r2 #2). The single-row n_docs broadcast is
    # unconditionally safe.
    w = (
        tf.join(dft, "__term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            _term_index(F.col("__term"), dim, seed).alias("idx"),
            _tfidf_weight(F.col("__tf"), F.col("__df"), F.col("__n")).alias("__w"),
        )
    )
    return w.groupBy(id_col, "idx").agg(F.sum("__w").alias("weight"))


def sparse_query(
    corpus: DataFrame,
    terms: list[str],
    text_col: str = "text",
    dim: int = 1 << 18,
    seed: int | str = "sparse",
) -> DataFrame:
    """Sparse query vector for a bag of terms, weighted by the CORPUS
    idf (the standard tf-idf query form; repeated query terms saturate
    like document terms). Returns (idx, qweight) — small by
    construction (≤ |terms| rows), intended for broadcast. Thin
    single-query wrapper over :func:`sparse_queries`."""
    return sparse_queries(
        corpus, [(0, terms)], text_col, dim, seed
    ).drop("qid")


def sparse_queries(
    corpus: DataFrame,
    qdefs: list[tuple[int, list[str]]],
    text_col: str = "text",
    dim: int = 1 << 18,
    seed: int | str = "sparse",
    qid_col: str = "qid",
) -> DataFrame:
    """Batched form of :func:`sparse_query`: (qid, terms) pairs →
    one (qid, idx, qweight) frame with ONE corpus scan for the df
    stats (per-query scans would cost N corpus passes). All queries'
    distinct terms share the document-frequency aggregate; the result
    stays broadcast-sized (Σ query lengths rows)."""
    spark = corpus.sparkSession
    rows = []
    for qid, terms in qdefs:
        tf: dict[str, int] = {}
        for t in terms:
            t = t.lower()
            tf[t] = tf.get(t, 0) + 1
        rows.extend((int(qid), t, n) for t, n in sorted(tf.items()))
    qdf = spark.createDataFrame(rows, f"{qid_col} int, __term string, __tf int")
    all_terms = qdf.select("__term").distinct()
    toks = corpus.select(
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("__term")
    )
    dft = (
        toks.join(F.broadcast(all_terms), "__term")
        .groupBy("__term")
        .agg(F.count("*").alias("__df"))
    )
    n_docs = corpus.select(F.count("*").alias("__n"))
    return (
        qdf.join(F.broadcast(dft), "__term", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(qid_col),
            _term_index(F.col("__term"), dim, seed).alias("idx"),
            _tfidf_weight(
                F.col("__tf"),
                F.coalesce(F.col("__df"), F.lit(0)),
                F.col("__n"),
            ).alias("qweight"),
        )
        .groupBy(qid_col, "idx")
        .agg(F.sum("qweight").alias("qweight"))
    )


def sparse_topk(
    postings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Top-k documents by sparse inner product ⟨query, doc⟩.

    ``postings``: (id_col, idx, weight); ``query``: (idx, qweight) —
    broadcast (a query has O(query length) non-zeros). The corpus side
    is filtered to matching indices MAP-SIDE by the broadcast hash
    join, the per-doc sum is a map-side-partial groupBy, and the top-k
    is TakeOrdered. Nothing global touches non-matching postings.

    Ties break on id. ``round_to`` rounds the score BEFORE ordering —
    duplicate documents score identically up to float summation order,
    so rank-then-tiebreak on the rounded score is reproducible across
    engines/partitionings where the raw float order is not.
    """
    score = F.sum(F.col("weight") * F.col("qweight"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        postings.join(F.broadcast(query), "idx")
        .groupBy(id_col)
        .agg(score.alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def sparse_topk_join(
    postings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    qid_col: str = "qid",
    round_to: int | None = None,
) -> DataFrame:
    """Batched sparse retrieval: top-k docs for EVERY query in one
    corpus pass (the sparse analog of similarity.knn_join).

    ``queries``: (qid_col, idx, qweight) — the union of all query
    posting lists, still tiny (Σ query lengths), broadcast as one
    map-side filter. One shuffle carries (qid, doc) partial sums; the
    per-query top-k is a window over the per-(qid,doc) aggregate,
    partitioned by qid — never global. Amortizes exactly like the
    dense batched kNN join: N queries cost one scan, not N jobs.
    """
    from pyspark.sql import Window

    score = F.sum(F.col("weight") * F.col("qweight"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        postings.join(F.broadcast(queries), "idx")
        .groupBy(qid_col, id_col)
        .agg(score.alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", F.col("rank").cast("bigint").alias("rank"))
    )


def to_sparsevec(postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collect a posting frame into pgvector-sparsevec-shaped rows:
    (id, array<struct<i,w>> sorted by index). The per-row form for
    storage/interchange; computation stays on the posting form."""
    return (
        postings.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx").alias("i"), F.col("weight").alias("w")))
            ).alias("sparsevec")
        )
    )


# ---------------------------------------------------------------------------
# Materialized sparse index: build once, serve by bucket-pruned postings.
# ---------------------------------------------------------------------------


def build_sparse_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 18,
    n_buckets: int = 32,
    seed: int | str = "sparse",
) -> dict:
    """Materialize a servable sparse-vector index (the persisted-store
    step `functions/text.build_text_index` does for BM25): postings
    (doc_id, idx, tflog) hash-bucketed BY INDEX so a query touches only
    its indices' buckets at file listing, plus an N sidecar.

    Postings store the idf-FREE log-saturated tf (1 + ln tf) at hashed-
    index granularity; idf is derived at query time from the pruned
    postings themselves (df per idx = posting count), so APPENDS are
    visible immediately and never go stale against a frozen idf — the
    same freshness argument as the BM25 index's query-time df_t.
    Granularity note: terms colliding into one idx pool their tf and
    share one df; identical to the per-term pipeline whenever no
    collision touches a scored doc (dim 2^18 makes that the common
    case), and the consistent feature-hashing semantics otherwise.
    """
    import json
    import os

    from pyspark.sql import Observation

    # n_docs is observed on the pre-explode node of the postings write
    # itself — the trailing df.count() was a whole second corpus scan
    # job for a number the write pass already streams past (guide §1.2)
    obs = Observation()
    docs0 = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("__t")
    ).observe(obs, F.count(F.lit(1)).alias("n"))
    toks = docs0.select(
        "doc_id", F.explode("__t").alias("__term")
    ).select("doc_id", _term_index(F.col("__term"), dim, seed).alias("idx"))
    postings = (
        toks.groupBy("doc_id", "idx")
        .agg((F.lit(1.0) + F.log(F.count("*").cast("double"))).alias("tflog"))
        .withColumn("__bucket", F.pmod(F.col("idx"), F.lit(n_buckets)).cast("int"))
        .repartition(n_buckets, F.col("__bucket"))
    )
    postings.write.mode("overwrite").partitionBy("__bucket").parquet(path)
    try:
        n_docs = int(obs.get["n"])
    except Exception:
        # statically-empty inputs prune the CollectMetrics node away
        n_docs = df.count()
    stats = {"n_docs": n_docs, "dim": dim, "n_buckets": n_buckets, "seed": str(seed),
             # write-time schema: served queries read with it and skip
             # the per-query schema-inference Spark job
             "schema": postings.schema.json()}
    with open(os.path.join(path, "_stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def _py_term_index(term: str, dim: int, seed: str) -> int:
    """Driver-side twin of _term_index (md5 60-bit prefix % dim)."""
    import hashlib

    h = hashlib.md5(f"{seed}:{term}".encode()).hexdigest()
    return int(h[:15], 16) % dim


def sparse_search_index(
    spark,
    path: str,
    terms: list[str],
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Sparse top-k against a materialized index. The query embeds
    CLIENT-SIDE (hash indices + log-saturated tf — no corpus scan, no
    job), prunes to its indices' buckets at file listing, derives idf
    from the pruned postings (df per idx) + the N sidecar, and scores
    score(d) = Σ_idx (1+ln tf_d)·(1+ln tf_q)·idf², the served form of
    sparse_features∘sparse_query (idf applied to both sides)."""
    import json
    import os

    with open(os.path.join(path, "_stats.json")) as f:
        stats = json.load(f)
    dim, seed = int(stats["dim"]), stats["seed"]
    tf: dict[int, int] = {}
    for t in terms:
        i = _py_term_index(t.lower(), dim, seed)
        tf[i] = tf.get(i, 0) + 1
    import math

    qrows = [(i, 1.0 + math.log(c)) for i, c in sorted(tf.items())]
    buckets = sorted({i % stats["n_buckets"] for i, _ in qrows})
    reader = spark.read
    if "schema" in stats:  # zero-job read (schema recorded at build)
        import json as _json

        from pyspark.sql import types as T

        reader = reader.schema(T.StructType.fromJson(_json.loads(stats["schema"])))
    # The query vector binds as a LITERAL map + isin filter instead of
    # a broadcast join against a createDataFrame (guide §2.4): one
    # whole broadcast-exchange job per served query gone, and the
    # membership test now reaches the parquet scan as a pushed filter
    # (PushedFilters: In(idx, ...)) so row groups without the query's
    # indices are skipped by min/max stats. Scores are bit-identical:
    # the broadcast hash join preserved streamed-side row order, so
    # the same (tflog, qtflog) products enter the same aggregation
    # buffers in the same order. Query vectors are a handful of terms,
    # so the literal map is O(|terms|) plan nodes — the SCALE.md giant-
    # literal concern starts 3 orders of magnitude later.
    qmap = F.create_map(
        *[F.lit(v) for i, q in qrows for v in (i, q)]
    )
    post = (
        reader.parquet(path)
        .filter(F.col("__bucket").isin(buckets))
        .filter(F.col("idx").isin([i for i, _ in qrows]))
        .withColumn("qtflog", qmap[F.col("idx")])
    )
    dfi = post.groupBy("idx").agg(F.count("*").alias("__df"))
    idf = (
        F.log(
            (F.lit(float(stats["n_docs"])) + 1.0) / (F.col("__df") + 1.0)
        )
        + 1.0
    )
    score = F.sum(F.col("tflog") * F.col("qtflog") * idf * idf)
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        post.join(F.broadcast(dfi), "idx")
        .groupBy("doc_id")
        .agg(score.alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def append_to_sparse_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally add documents: the batch's postings APPEND into
    their index buckets (no file rewritten; idf is query-time so new
    postings shift it correctly and immediately) and N updates in the
    sidecar. Batch-sized work per ingest wave; compact on a
    maintenance schedule like the other append-only stores."""
    import json
    import os

    with open(os.path.join(path, "_stats.json")) as f:
        stats = json.load(f)
    dim, seed, n_buckets = int(stats["dim"]), stats["seed"], int(stats["n_buckets"])
    from pyspark.sql import Observation

    # batch count observed on the append write — one job per ingest
    # wave instead of two (guide §1.2; the streaming sink calls this
    # every micro-batch)
    obs = Observation()
    docs0 = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("__t")
    ).observe(obs, F.count(F.lit(1)).alias("n"))
    toks = docs0.select(
        "doc_id", F.explode("__t").alias("__term")
    ).select("doc_id", _term_index(F.col("__term"), dim, seed).alias("idx"))
    postings = (
        toks.groupBy("doc_id", "idx")
        .agg((F.lit(1.0) + F.log(F.count("*").cast("double"))).alias("tflog"))
        .withColumn("__bucket", F.pmod(F.col("idx"), F.lit(n_buckets)).cast("int"))
        .repartition(n_buckets, F.col("__bucket"))
    )
    postings.write.mode("append").partitionBy("__bucket").parquet(path)
    try:
        n_new = int(obs.get["n"])
    except Exception:  # empty batch: CollectMetrics pruned away
        n_new = df.count()
    stats["n_docs"] = int(stats["n_docs"]) + n_new
    with open(os.path.join(path, "_stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def postings_to_vectors(
    postings: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    out_col: str = "features_vec",
) -> DataFrame:
    """Bridge posting-list sparse features into MLlib: one row per id
    with a SparseVector column — what LogisticRegression / linear
    models / NaiveBayes consume. This is the fasttext-style text-
    classifier data path (hashed lexical features → linear model)
    with no vocabulary file to ship.

    The groupBy collects each id's postings (bounded by that doc's
    distinct terms, not the corpus); vector construction crosses the
    Python boundary once per DOC on the already-reduced frame —
    VectorUDT has no Arrow codec, so a row UDF over (indices, values)
    pairs is the available boundary, and it is per-doc, never
    per-posting.
    """
    from pyspark.ml.linalg import SparseVector, VectorUDT

    @F.udf(returnType=VectorUDT())
    def _sv(pairs):
        pairs = sorted((int(p["i"]), float(p["w"])) for p in pairs)
        return SparseVector(dim, [i for i, _ in pairs], [w for _, w in pairs])

    return (
        postings.groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("idx").alias("i"), F.col("weight").alias("w"))
            ).alias("__p")
        )
        .select(F.col(id_col), _sv("__p").alias(out_col))
    )


def sparse_cosine_topk(
    postings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Top-k by sparse COSINE — pgvector's `sparsevec <=>` operator
    (sparse_topk is `<#>`, inner product). Document norms come from
    ONE groupBy over the full posting store (norms include components
    the query never touches); the query norm is a 1-row aggregate.
    Both joins key on id_col, so the norm join reuses the score
    aggregation's partitioning. Cosine ranks differ from inner-product
    ranks exactly where document length does — length-invariant
    matching, the standard choice for near-dup retrieval."""
    qn = query.agg(
        F.sqrt(F.sum(F.col("qweight") * F.col("qweight"))).alias("__qn")
    )
    dn = postings.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("__dn")
    )
    dots = (
        postings.join(F.broadcast(query), "idx")
        .groupBy(id_col)
        .agg(F.sum(F.col("weight") * F.col("qweight")).alias("__dot"))
    )
    score = F.col("__dot") / (F.col("__dn") * F.col("__qn"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        dots.join(dn, id_col)
        .crossJoin(F.broadcast(qn))
        .select(F.col(id_col), score.alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


class ServedSparseIndex:
    """Driver-resident sparse retrieval tier — the sparsevec analog of
    similarity.ResidentANN: Spark BUILDS (sparse_features postings +
    one vocabulary df aggregate, each a distributed pass), the serving
    process HOLDS {idx → (doc_ids, weights)} postings plus the
    term→df map, and queries score with pure dict/numpy work — no
    Spark job on the hot path (the Spark-plan `sparse_search_index`
    measures ~750 ms/query at sf0.1 from per-query job overhead; this
    tier serves the same scores in well under a millisecond).

    Memory honesty: postings are O(Σ doc nnz) and the vocab map is
    O(|vocab|) — the same state a Postgres GIN index holds in shared
    buffers; corpora past one host shard by idx range across serving
    processes (idf is global: ship the df map to every shard, it is
    the small side).

    Scoring parity: identical weight form to the Spark path
    ((1+ln tf)·(ln((N+1)/(df+1))+1) on both sides, md5 term hashing
    via the documented python twin of corpus.hash_key), so results
    match sparse_topk_join at the 6-decimal rounding the oracle
    queries use (pinned in tests)."""

    def __init__(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        dim: int = 1 << 18,
        seed: int | str = "sparse",
    ):
        import numpy as np

        self.dim = dim
        self.seed = seed
        pdf = sparse_features(df, text_col, id_col, dim, seed).toPandas()
        self.postings: dict[int, tuple] = {}
        ids = pdf[id_col].to_numpy()
        idxs = pdf["idx"].to_numpy()
        ws = pdf["weight"].to_numpy()
        order = np.argsort(idxs, kind="stable")
        ids, idxs, ws = ids[order], idxs[order], ws[order]
        # dense doc-row mapping so scoring is one np.add.at scatter per
        # query index instead of a python dict loop (measured 6 ms →
        # sub-ms on common-term probes)
        self.doc_ids_uniq = np.unique(ids)
        row_of = {int(d): i for i, d in enumerate(self.doc_ids_uniq)}
        rows = np.asarray([row_of[int(d)] for d in ids], dtype=np.int64)
        uniq = np.unique(idxs)
        bounds = np.append(np.searchsorted(idxs, uniq), len(idxs))
        for i, ix in enumerate(uniq):
            self.postings[int(ix)] = (
                rows[bounds[i]:bounds[i + 1]],
                ws[bounds[i]:bounds[i + 1]],
            )
        # vocabulary document frequencies (one distributed aggregate);
        # n_docs rides the same job as an observed metric on the
        # pre-explode node — the trailing df.count() was a second
        # corpus-scan job (guide §1.2)
        from pyspark.sql import Observation

        obs = Observation()
        pre = df.select(
            F.array_distinct(tokenize(F.col(text_col))).alias("__t")
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        dft = (
            pre.select(F.explode("__t").alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("df"))
        )
        self.df_t = {r["t"]: int(r["df"]) for r in dft.collect()}
        try:
            self.n_docs = int(obs.get["n"])
        except Exception:  # statically-empty input prunes CollectMetrics
            self.n_docs = df.count()

    def _term_idx(self, term: str) -> int:
        import hashlib

        h = hashlib.md5(f"{self.seed}:{term}".encode()).hexdigest()[:15]
        return int(h, 16) % self.dim

    def search(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) — pure python/numpy, no Spark job."""
        import math

        tf: dict[str, int] = {}
        for t in terms:
            t = t.lower()
            tf[t] = tf.get(t, 0) + 1
        qw: dict[int, float] = {}
        for t, n in sorted(tf.items()):
            w = (1.0 + math.log(n)) * (
                math.log((self.n_docs + 1.0) / (self.df_t.get(t, 0) + 1.0)) + 1.0
            )
            ix = self._term_idx(t)
            qw[ix] = qw.get(ix, 0.0) + w
        import numpy as np

        acc = np.zeros(len(self.doc_ids_uniq), dtype=np.float64)
        touched = []
        for ix, w in qw.items():
            post = self.postings.get(ix)
            if post is None:
                continue
            rows, ws = post
            np.add.at(acc, rows, ws * w)
            touched.append(rows)
        if not touched:
            return []
        cand = np.unique(np.concatenate(touched))
        sc = acc[cand]
        kk = min(k, len(cand))
        if len(cand) > 4 * k:
            # argpartition splits score TIES at the boundary
            # arbitrarily — widen the pool to everything at or above
            # the k-th score, then tie-break by doc_id exactly like
            # the Spark plan's (score DESC, doc_id) ordering
            part = np.argpartition(-sc, kk - 1)[:kk]
            pool = np.where(sc >= sc[part].min())[0]
        else:
            pool = np.arange(len(cand))
        order = sorted(
            pool.tolist(),
            key=lambda i: (-sc[i], int(self.doc_ids_uniq[cand[i]])),
        )[:k]
        return [(int(self.doc_ids_uniq[cand[i]]), float(sc[i])) for i in order]
