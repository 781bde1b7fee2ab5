"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference's surface (postgresml has no corpus dedup);
these are the standard LLM-data-pipeline operators, designed for
100 TB scale: every variant works through shuffle-on-key joins and
band-bucketing (inverted-index style) — never a cross join — so cost is
O(candidate pairs), not O(n²).

All hashing is seeded and deterministic across runs and cluster sizes:
xxhash64 with literal seeds in the Column-expression forms, crc32-based
linear permutations in the vectorized `*_batch` bulk paths (Arrow
pandas UDFs — signatures are per-row Python-side work that the
interpreted higher-order-function expressions evaluate ~1000× slower).
The banding/bucket-join stages are pure Column expressions either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresml_spark.functions.text import tokenize
from postgresml_spark.functions.vectors import cosine_similarity

def _widen(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism before an expensive
    per-row signature UDF. A small parquet file scans as few partitions
    (often 1), serializing the UDF; signature cost >> the text shuffle,
    so widening always pays. No-op when the scan is already wide."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "minhash_signature_batch",
    "minhash_candidate_pairs",
    "minhash_candidate_pairs_portable",
    "dup_clusters",
    "incremental_exact_dedup",
    "duplicate_spans",
    "simhash_batch",
    "simhash_portable_signatures",
    "simhash_pairs_portable",
    "hamming_distance",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_candidate_pairs",
    "embedding_near_dup_pairs",
    "semantic_dedup",
    "corpus_line_dedup",
    "winnow_fingerprints",
    "winnow_similar_pairs",
    "set_similarity_join",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on a normalized key; keep the lowest id.
# Scale: one shuffle on md5(text) — uniformly distributed, no skew.
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per exact key; adds `dup_count`."""
    w = Window.partitionBy("__dedup_key").orderBy(F.col(id_col))
    return (
        df.withColumn("__dedup_key", key)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(Window.partitionBy("__dedup_key")))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__dedup_key")
    )


# ---------------------------------------------------------------------------
# Word shingles (n-gram sets) — shared by minhash + jaccard.
# ---------------------------------------------------------------------------

def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram strings (array<string>). Docs shorter than n
    tokens contribute their full token string as a single shingle."""
    toks = tokenize(text)
    k = F.size(toks)
    joined = F.array_join(toks, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(F.when(k >= n, grams).otherwise(F.array(joined)))


def word_shingles_batch(n: int = 3):
    """Arrow-batched twin of `word_shingles` — element-identical output
    (verified: zero posting diff at sf0.1), ~5× faster: the interpreted
    higher-order transform+slice chain costs ~16 µs/shingle, the
    Python-loop-over-Arrow form ~3 µs. Same tokenizer as
    functions.text.tokenize ([^a-z0-9]+ split on lowercased text, empty
    runs dropped); dict.fromkeys preserves first-occurrence order like
    array_distinct."""
    import re

    from pyspark.sql import types as T

    tok_re = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:  # expression parity: array_join(NULL) under
                out.append([None])  # otherwise() yields [NULL], not NULL
                continue
            toks = [x for x in tok_re.split(t.lower()) if x]
            if len(toks) >= n:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
            else:
                out.append([" ".join(toks)])
        return pd.Series(out)

    return _sh


# ---------------------------------------------------------------------------
# MinHash + LSH banding.
#
# signature[i] = min over shingles s of xxhash64(s, seed=i)  (one pass,
# all expressions). Bands of r signature slots hash to a bucket key;
# candidate pairs = docs sharing any (band, bucket) — an equi-join on
# the bucket key, the classic LSH inverted index. Verified pairs get
# exact Jaccard via a distinct-shingle join.
# ---------------------------------------------------------------------------

def minhash_signature(text: Column | str, num_perm: int = 64, shingle_n: int = 3) -> Column:
    sh = word_shingles(text, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def minhash_signature_batch(num_perm: int = 64, shingle_n: int = 3):
    """Vectorized minhash signature as an Arrow pandas UDF (the bulk
    path — the Column-expression form evaluates O(num_perm × shingles)
    interpreted lambdas, ~200 ms/doc; this is ~100 µs/doc).

    Standard construction: one base hash per shingle (crc32, C-speed),
    then num_perm seeded linear permutations h_i = (a_i·h + b_i) mod
    (2^31-1), min per permutation — all one numpy broadcast.
    """
    import re
    from zlib import crc32

    from pyspark.sql import types as T

    p = 2147483647
    rng = np.random.default_rng(42)
    A = rng.integers(1, p, num_perm).astype(np.int64)
    B = rng.integers(0, p, num_perm).astype(np.int64)
    tok_re = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [x for x in tok_re.split((t or "").lower()) if x]
            if len(toks) >= shingle_n:
                sh = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            else:
                sh = {" ".join(toks)}
            base = np.fromiter(
                (crc32(s.encode()) % p for s in sh), dtype=np.int64, count=len(sh)
            )
            if base.size == 0:
                out.append([0] * num_perm)
                continue
            sig = ((A[:, None] * base[None, :] + B[:, None]) % p).min(axis=1)
            out.append([int(x) for x in sig])
        return pd.Series(out)

    return _sig


def minhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    impl: str = "batch",
) -> DataFrame:
    """(id, band, bucket) LSH posting rows — the persistable band
    index. minhash_candidate_pairs self-joins these; the incremental
    path (incremental_minhash_pairs) appends a batch's rows to a
    stored index and joins batch-vs-all instead of re-banding the
    corpus. Bucket = xxhash64 over the band's signature slice, so
    rows are engine-stable for a given (num_perm, bands, shingle_n)."""
    r = num_perm // bands
    if impl == "batch":
        sig_col = minhash_signature_batch(num_perm, shingle_n)(F.col(text_col))
    else:
        sig_col = minhash_signature(F.col(text_col), num_perm, shingle_n)
    sig = _widen(df).select(F.col(id_col).alias("id"), sig_col.alias("sig"))
    return sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r)), F.lit(-1)
                ),
            )
        ).alias("band", "bucket"),
    )


def incremental_minhash_pairs(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    impl: str = "batch",
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup candidates for a NEW batch against all history,
    without re-banding the corpus.

    `index` is the stored (id, band, bucket) posting table built by
    minhash_band_rows with the SAME parameters (empty for a first
    batch). Returns (pairs, new_index_rows): `pairs` = every candidate
    pair with at least one side in the batch (batch↔history and
    batch↔batch, id_a < id_b, deduplicated); `new_index_rows` = the
    batch's posting rows to append to the index (append-only, like
    incremental_exact_dedup's fingerprint index and the IVF store's
    frozen-centroid appends).

    This is the production dedup shape at 100 TB: the daily crawl
    increment is banded once (Arrow-batched signature UDF over the
    batch only), then one equi-join of batch postings against the
    bucketed index — work scales with |batch| × bucket density, never
    with |history|². History-internal pairs are by construction
    already known from earlier batches. The completeness invariant
    (incremental ≡ full-corpus pairs restricted to pairs touching the
    batch) is pinned by test.

    max_bucket_size caps hot buckets counted over index ∪ batch —
    same saturated-cluster argument as minhash_candidate_pairs.
    """
    new_rows = minhash_band_rows(
        batch, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, shingle_n=shingle_n, impl=impl,
    )
    all_rows = index.select("id", "band", "bucket").unionByName(new_rows)
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "bucket")
        all_rows = (
            all_rows.withColumn("__bs", F.count("*").over(wb))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
        new_side = all_rows.join(
            new_rows.select("id").distinct(), "id", "left_semi"
        )
    else:
        new_side = new_rows
    a, b = new_side.alias("a"), all_rows.alias("b")
    pairs = (
        a.hint("SHUFFLE_HASH").join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    return pairs, new_rows


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    impl: str = "batch",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b, band-deduplicated).

    rows-per-band r = num_perm/bands; P(candidate) ≈ 1-(1-j^r)^bands.
    Scale: shuffle keys are (band_id, bucket_hash) — high cardinality,
    no skew beyond true duplicate clusters; AQE skew-join covers those.
    The self-join is pinned to SHUFFLE_HASH so both sides are identical
    hashpartitioning exchanges and the signature UDF + shuffle are
    computed ONCE and reused (a broadcast side would re-evaluate the
    whole signature stage in a separate build job).
    impl='batch' (default) uses the vectorized signature UDF;
    impl='expr' the pure-expression form (parity/small inputs).

    max_bucket_size caps the self-join's hot buckets: a bucket with m
    members emits O(m²) pairs, so one mega-cluster of near-identical
    docs dominates the whole job (measured: a corpus where every doc
    has 15 near-copies grows output 17× at 16× input). Buckets above
    the cap are dropped — by construction they're saturated duplicate
    clusters; run exact_dedup first (or treat an over-cap bucket itself
    as a duplicate group) rather than enumerating its pairs.
    """
    banded = minhash_band_rows(
        df, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, shingle_n=shingle_n, impl=impl,
    )
    if max_bucket_size is not None:
        # same partition key as the join → the count window reuses the
        # join's exchange instead of adding one
        wb = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bs", F.count("*").over(wb))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.hint("SHUFFLE_HASH").join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_candidate_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    impl: str = "batch",
) -> DataFrame:
    """MinHash-LSH candidate pairs with an engine-portable hash.

    Same LSH semantics as `minhash_candidate_pairs`, but the permutation
    hash is engine-portable md5 with Kirsch-Mitzenmacher double
    hashing: h_i(s) = (h1(s) + i*(h2(s)|1)) mod 2^40, where h1/h2 are
    the first/second 10 hex digits of ONE md5(shingle) — md5 is
    bit-identical across Spark, DuckDB, Postgres and Python, and KM
    preserves MinHash's collision analysis with TWO hashes instead of
    num_perm (Kirsch & Mitzenmacher 2006; the same trick every Bloom
    filter library uses). One md5 per shingle instead of num_perm
    md5s measured 23.5 s → 6.2 s at sf0.1 for q24's 64-perm config
    (and 20.6 s → 8.9 s at sf1).
    Use this variant when the candidate set must be auditable outside
    Spark; `minhash_candidate_pairs` (seeded xxhash64) stays the
    Spark-only production default.

    impl="batch" (default): the SAME md5/KM arithmetic computed in one
    Arrow UDF per doc — hashlib.md5 is bit-identical to Spark's and
    DuckDB's md5, and the (shingles × perms) min happens as one numpy
    broadcast instead of a |docs|×|shingles|×num_perm exploded
    shuffle (measured 6.2 s → ~1.5 s at sf0.1; the exploded codegen
    form shuffles 16.6M rows there). impl="expr" keeps the all-codegen
    plan: explode(shingles) → ONE md5 split into (h1, h2) →
    explode(perms) → map-side-combined min groupBy (doc, perm).
    Both produce identical band buckets — including for NULL text,
    where both yield an all-null signature whose bands join to the ""
    bucket (NULL docs pair with NULL docs, never with empty-string
    docs); the oracle re-derives them.
    """
    r = num_perm // bands
    _M = 1 << 40  # KM modulus: h1 + 63*h2 < 2^46, BIGINT-safe everywhere
    if impl == "batch":
        import hashlib

        from pyspark.sql import types as T

        import re as _re

        tok_re = _re.compile(r"[^a-z0-9]+")

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _sig(texts: pd.Series) -> pd.Series:
            perms = np.arange(num_perm, dtype=np.int64)
            out = []
            for t in texts:
                if t is None:
                    # expression parity: NULL text yields min(NULL)=NULL
                    # per perm, and the shared banding's array_join
                    # skips nulls -> bucket "" for every band (NULL
                    # docs pair with NULL docs, never with ''-docs)
                    out.append([None] * num_perm)
                    continue
                toks = [x for x in tok_re.split(t.lower()) if x]
                if len(toks) >= shingle_n:
                    sh = set(
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    )
                else:
                    sh = {" ".join(toks)}
                h1 = np.empty(len(sh), dtype=np.int64)
                h2 = np.empty(len(sh), dtype=np.int64)
                for j, s in enumerate(sh):
                    hx = hashlib.md5(s.encode()).hexdigest()
                    h1[j] = int(hx[:10], 16)
                    h2[j] = int(hx[10:20], 16) | 1  # odd: unit mod 2^40
                sig = ((h1[:, None] + perms[None, :] * h2[:, None]) % _M).min(
                    axis=0
                )
                out.append([int(x) for x in sig])
            return pd.Series(out)

        sig_df = df.select(
            F.col(id_col).alias("id"), _sig(F.col(text_col)).alias("sig")
        )
        banded = sig_df.select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * r + 1, r),
                            lambda m: m.cast("string"),
                        ),
                        ",",
                    ),
                )
            ).alias("band", "bucket"),
        )
    elif impl == "expr":
        sh = df.select(
            F.col(id_col).alias("id"),
            F.explode(
                word_shingles(F.col(text_col), shingle_n)
            ).alias("shingle"),
        )
        hv = sh.select(
            "id",
            F.conv(F.substring(F.md5("shingle"), 1, 10), 16, 10)
            .cast("long").alias("h1"),
            # h2 forced odd: with the 2^40 power-of-two modulus an even
            # h2 (worst case h2=0) would collapse derived permutations
            # onto shared low-bit structure; odd h2 is a unit mod 2^40,
            # keeping the KM permutations distinct (oracle applies `|1`)
            F.conv(F.substring(F.md5("shingle"), 11, 10), 16, 10)
            .cast("long").bitwiseOR(F.lit(1)).alias("h2"),
        ).select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm"),
            "h1",
            "h2",
        ).select(
            "id",
            "perm",
            ((F.col("h1") + F.col("perm") * F.col("h2")) % F.lit(_M)).alias("hv"),
        )
        sig = hv.groupBy("id", "perm").agg(F.min("hv").alias("mh"))
        banded = (
            sig.withColumn("band", (F.col("perm") / r).cast("int"))
            .groupBy("id", "band")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("perm", "mh"))),
                        lambda s: s["mh"].cast("string"),
                    ),
                    ",",
                ).alias("bucket")
            )
        )
    else:
        raise ValueError(f"unknown impl {impl!r}")
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bs", F.count("*").over(wb))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.hint("SHUFFLE_HASH")
        .join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster closure: candidate pairs → connected components.
#
# Pair enumeration (minhash/simhash/jaccard) finds EDGES; an actual
# dedup pass needs COMPONENTS — "keep one doc per duplicate cluster"
# is wrong if A~B and B~C land in different pair-rows and both B and C
# survive. Min-label propagation: every node repeatedly adopts the
# smallest label among itself and its neighbors; converges to
# min(component) in O(diameter) rounds. Each round is one shuffle-on-key
# join + groupBy — no driver-side graph state, so 10^10 edges work the
# same as 10^3 (the driver only sees a converged-yet? count per round).
# Diameter of near-dup clusters is tiny (dup clusters are dense), so
# 3-5 rounds in practice; `max_iter` bounds pathological chains, and
# localCheckpoint truncates the growing lineage each round.
# ---------------------------------------------------------------------------

def dup_clusters(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    edge_a: str = "id_a",
    edge_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Assign every node a duplicate-cluster id (= min node id reachable
    through candidate-pair edges). Returns (id_col, cluster_id,
    is_canonical); singleton docs are their own cluster. Downstream:
    `filter(is_canonical)` IS the near-dedup'd corpus."""
    sym = (
        edges.select(F.col(edge_a).alias("src"), F.col(edge_b).alias("dst"))
        .union(edges.select(F.col(edge_b).alias("src"), F.col(edge_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a new batch against an existing corpus index.
# The production shape at 100 TB — the historical corpus is never
# re-scanned; the batch joins against a (small-relative) fingerprint
# index, and the index grows append-only.
# ---------------------------------------------------------------------------

def incremental_exact_dedup(
    batch: DataFrame,
    index: DataFrame,
    key: Column,
    id_col: str = "doc_id",
    index_key_col: str = "fp",
) -> tuple[DataFrame, DataFrame]:
    """Exact-dedup a new batch against a historical fingerprint index.

    Returns (kept, new_index_rows): `kept` = batch rows whose key is
    absent from the index AND first (lowest id) within the batch;
    `new_index_rows` = their (fp) rows to append to the index.

    Scale: within-batch dedup shuffles the batch on its key;
    the history check is a left-anti equi-join on the same key — when
    both sides are bucketed on fp it is shuffle-free on the index side,
    and the index never rewrites (append-only).
    """
    keyed = batch.withColumn("__fp", key)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    first_in_batch = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    kept = first_in_batch.join(
        index.select(F.col(index_key_col).alias("__fp")), on="__fp", how="left_anti"
    )
    new_index_rows = kept.select(F.col("__fp").alias(index_key_col))
    return kept.drop("__fp"), new_index_rows


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted shingle index (no cross join).
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairwise Jaccard over distinct word n-grams for every pair
    sharing ≥1 shingle. Returns (id_a, id_b, jaccard).

    Scale: |pairs| bounded by shingle co-occurrence — ONE boilerplate
    shingle shared by 10^5 docs generates 10^10/2 pairs, so at scale
    set ``max_shingle_df``: shingles appearing in more docs than the
    cap are dropped from the posting list BEFORE the self-join (one
    extra window over the posting shuffle). Intersections then count
    only sub-cap shingles, making the reported jaccard a LOWER BOUND —
    the safe direction for a dedup verifier (never over-merges), and a
    hot shingle is by definition near-useless similarity evidence.
    Default None keeps the exact semantics; pair generation at 100 TB
    should anyway be preceded by minhash banding, with this operator as
    the verifier.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles_batch(shingle_n)(F.col(text_col)).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    # barrier: the posting feeds BOTH self-join sides; materializing
    # the arrays once lets ReusedExchange share them (same
    # CollapseProject/branch re-evaluation economics as
    # set_similarity_join — the Arrow UDF is also ~5× cheaper per
    # evaluation than the interpreted word_shingles expression)
    sh = sh.repartition("id")
    posting = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        wdf = Window.partitionBy("shingle")
        posting = (
            posting.withColumn("__df", F.count("*").over(wdf))
            .filter(F.col("__df") <= max_shingle_df)
            .drop("__df")
        )
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) + hamming-ball candidate pairs via chunk pigeonhole.
# ---------------------------------------------------------------------------

def simhash(text: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash of the token set, as a 64-char '0'/'1' string
    (MSB first).

    Position j = sign of Σ_tokens (±1 by bit j of xxhash64(token)).
    Pure expressions: token hash → two's-complement bit string via
    bin(), ±1 accumulation with an int-array `aggregate`, sign →
    characters. A string (vs bigint) keeps the banding/hamming steps
    free of 64-bit shift arithmetic while staying fixed-width for
    shuffle.
    """
    toks = tokenize(text)
    bit_chars = lambda t: F.split(  # noqa: E731 — 64-element ['0'|'1']
        F.lpad(F.bin(F.xxhash64(t)), bits, "0"), ""
    )
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("int"), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.slice(bit_chars(t), 1, bits),
            lambda x, c: x + F.when(c == "1", 1).otherwise(-1),
        ),
    )
    return F.array_join(
        F.transform(counts, lambda cnt: F.when(cnt > 0, "1").otherwise("0")), ""
    )


def simhash_batch(bits: int = 64):
    """Vectorized SimHash as an Arrow pandas UDF (bulk path; same
    output contract as `simhash` — a fixed-width bit string — but using
    a crc32-derived 64-bit token hash, numpy sign-sum per doc)."""
    import re
    from zlib import crc32

    from pyspark.sql import types as T

    tok_re = re.compile(r"[^a-z0-9]+")
    shifts = np.arange(bits, dtype=np.uint64)

    @F.pandas_udf(T.StringType())
    def _sh(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            toks = [x for x in tok_re.split((t or "").lower()) if x]
            if not toks:
                out.append("0" * bits)
                continue
            hs = np.empty(len(toks), dtype=np.uint64)
            for i, tok in enumerate(toks):
                h = memo.get(tok)
                if h is None:
                    lo = crc32(tok.encode())
                    hi = crc32((tok + "#").encode())
                    h = memo[tok] = (hi << 32) | lo
                hs[i] = h
            bit_matrix = ((hs[:, None] >> shifts[None, :]) & 1).astype(np.int64)
            v = (bit_matrix * 2 - 1).sum(axis=0)
            # MSB first to match simhash()'s bin() layout
            out.append("".join("1" if x > 0 else "0" for x in v[::-1]))
        return pd.Series(out)

    return _sh


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between equal-length bit strings."""
    za = F.slice(F.split(_c(a), ""), 1, 64)
    zb = F.slice(F.split(_c(b), ""), 1, 64)
    return F.size(F.filter(F.zip_with(za, zb, lambda x, y: x != y), lambda d: d))


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    impl: str = "batch",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into (max_hamming+1) chunks; any
    pair within the ball shares ≥1 exact chunk → equi-join per chunk,
    then exact hamming filter. Same inverted-index scaling argument as
    minhash banding; same SHUFFLE_HASH pin so the signature stage is
    computed once and its exchange reused across both join sides.

    max_bucket_size: same hot-bucket pair-blowup guard as
    minhash_candidate_pairs (O(m²) pairs per m-member chunk bucket);
    over-cap buckets are saturated duplicate clusters — dedup them
    exactly, don't enumerate them.
    """
    sh_col = (
        simhash_batch()(F.col(text_col)) if impl == "batch" else simhash(F.col(text_col))
    )
    df = _widen(df)
    sig = df.select(F.col(id_col).alias("id"), sh_col.alias("sh"))
    return hamming_ball_pairs(sig, max_hamming=max_hamming, max_bucket_size=max_bucket_size)


def hamming_ball_pairs(
    sig_df: DataFrame,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All pairs (id_a, id_b, hamming) with hamming ≤ max_hamming from an
    (id, sh) frame where `sh` is a 64-char '0'/'1' bit string — the
    signature-agnostic core of simhash_candidate_pairs, reused for any
    64-bit perceptual signature (text simhash, image aHash/pHash).

    Pigeonhole banding: split 64 bits into (max_hamming+1) chunks; a
    pair inside the ball has ≤ max_hamming differing bits, so at least
    one chunk is difference-free → equi-join per chunk, then exact
    hamming filter. (With 64 % n_chunks leftover bits uncovered the
    argument still holds: differences inside covered chunks ≤
    max_hamming < n_chunks.)
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    # Parse the bit string into two 32-bit ints ONCE per row so the
    # per-pair hamming is two XOR+bit_count integer ops (a per-pair
    # 64-element array zip is interpreted and dominates at high
    # candidate counts).
    sh = sig_df.select(
        "id",
        "sh",
        F.conv(F.substring("sh", 1, 32), 2, 10).cast("long").alias("h_hi"),
        F.conv(F.substring("sh", 33, 32), 2, 10).cast("long").alias("h_lo"),
    )
    chunked = sh.select(
        "id",
        "h_hi",
        "h_lo",
        F.posexplode(
            F.array(
                *[
                    F.substring(F.col("sh"), c * chunk_bits + 1, chunk_bits)
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("chunk_id", "chunk_val")
        chunked = (
            chunked.withColumn("__bs", F.count("*").over(wb))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(
        F.col("a.h_hi").bitwiseXOR(F.col("b.h_hi"))
    ) + F.bit_count(F.col("a.h_lo").bitwiseXOR(F.col("b.h_lo")))
    return (
        a.hint("SHUFFLE_HASH").join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact verify; ANN pre-filter in similarity.py).
# ---------------------------------------------------------------------------

def sign_lsh_bucket(vec_col, n_planes: int = 4):
    """Random-hyperplane LSH bucket from the signs of the first
    n_planes components (axis-aligned planes — deterministic and
    SQL-portable; for isotropic embeddings use a seeded projection).
    2^n_planes buckets; cosine-similar vectors collide with high
    probability, so the near-dup join becomes an equi-join."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat(
        *[F.when(c[i] >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(n_planes)]
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    group_col: str | None = None,
    allow_all_pairs: bool = False,
    impl: str = "expr",
    block_rows: int = 1024,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. If group_col is given, only pairs
    within a group are compared (use an LSH/IVF bucket as the group —
    sign_lsh_bucket or similarity.ivf_assign). Without a group the
    comparison is all-pairs O(n²): a scale-killer, so it must be
    explicitly requested with allow_all_pairs=True (small-set verify).

    impl='expr': pair equi-join + HOF cosine expression — the
    dependency-light oracle-matching form. Fine up to ~10^5 candidate
    pairs, but the interpreted per-pair lambda (~15 µs at dim 64)
    dominates beyond that, and the join materializes EVERY candidate
    pair through the shuffle. (Unrolling the cosine into flat codegen
    was measured SLOWER here — the ~200-term method trips the
    whole-stage-codegen size fallback and the entire join stage drops
    to interpreted.)

    impl='block': the 100 TB path — shuffle only the ROWS by group
    (applyInPandas), score each bucket as a normalized gram matmul in
    numpy (BLAS), emit only surviving pairs. Arrow moves O(rows), not
    O(pairs); per-bucket memory is bounded by scoring `block_rows`-row
    strips against the bucket. Combine with minhash's max_bucket_size
    logic upstream if buckets can saturate."""
    if group_col is None and not allow_all_pairs:
        raise ValueError(
            "embedding_near_dup_pairs without group_col is an O(n^2) "
            "all-pairs join; pass group_col (LSH/IVF bucket) or opt in "
            "explicitly with allow_all_pairs=True"
        )
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if group_col:
        cols.append(F.col(group_col).alias("g"))
    else:
        cols.append(F.lit(0).alias("g"))
    base = df.select(*cols)
    if impl == "block":
        thr = float(threshold)

        def _score(pdf: pd.DataFrame) -> pd.DataFrame:
            x = np.asarray(pdf["v"].tolist(), dtype="float64")
            ids = pdf["id"].to_numpy()
            n = x.shape[0]
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                    {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
                )
            with np.errstate(invalid="ignore", divide="ignore"):
                u = x / np.linalg.norm(x, axis=1, keepdims=True)
            frames = []
            for s in range(0, n, block_rows):
                strip = u[s : s + block_rows]
                sims = strip @ u.T  # (strip, n)
                ia, ib = np.nonzero(sims >= thr)
                ia += s
                keep = ids[ia] < ids[ib]  # dedupe + self-pairs
                if keep.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "id_a": np.minimum(ids[ia][keep], ids[ib][keep]),
                                "id_b": np.maximum(ids[ia][keep], ids[ib][keep]),
                                "cosine": sims[ia - s, ib][keep],
                            }
                        )
                    )
            if not frames:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                    {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
                )
            return pd.concat(frames, ignore_index=True)

        return base.groupBy("g").applyInPandas(
            _score, "id_a long, id_b long, cosine double"
        )

    a, b = base.alias("a"), base.alias("b")
    # equality key first → planner picks a hash/sort-merge join on g
    # with id< as a post-join filter (no nested loop); without a real
    # group g is constant and this degenerates to the opt-in all-pairs
    joined = a.join(
        b, on=(F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id"))
    )
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_similarity(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    group_col: str | None = None,
    impl: str = "block",
    allow_all_pairs: bool = False,
) -> DataFrame:
    """SemDeDup-style keep-first semantic dedup: drop every row whose
    embedding is cosine-≥-threshold similar to ANY lower-id row in its
    bucket (Abbas et al. 2023 keep-one-per-cluster, with the id order
    as the deterministic representative choice).

    Composition: bucketed near-dup pairs (impl='block' scores each
    bucket as one BLAS matmul, moving rows not pairs) → distinct id_b
    (every pair's higher id is a duplicate) → left_anti join back.
    Scale: the dupe-id set is ≤ corpus size, hash-join on the id;
    at 100 TB pass an LSH/IVF bucket as group_col so pair enumeration
    stays O(candidates)."""
    pairs = embedding_near_dup_pairs(
        df,
        vec_col,
        id_col,
        threshold=threshold,
        group_col=group_col,
        impl=impl,
        # the O(n^2) guard propagates: ungrouped semantic dedup needs
        # the same explicit opt-in as the pair enumerator it wraps
        allow_all_pairs=allow_all_pairs,
    )
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")


def simhash_portable_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Engine-portable SimHash signature (one BIGINT per doc).

    Token hash = first 8 hex digits of md5 (32 bits, bit-identical in
    Spark/DuckDB/Postgres/Python); signature bit b is the sign of the
    sum over token OCCURRENCES of (2*bit_b(h)-1) — occurrence
    multiplicity is the classic frequency weighting. Returns
    (id_col, simhash).

    Plan: explode(tokens) × explode(bits) → shiftright/&1 → two-level
    groupBy, all codegen. The bits× blowup rows never shuffle at full
    width: partial aggregation reduces to |docs|×bits rows before the
    exchange. This is the audit twin of `simhash_batch` (crc32 + numpy,
    no row blowup), same role q73 plays for q24.
    """
    from postgresml_spark.functions import text as TX

    if bits > 60:
        raise ValueError(
            f"portable simhash supports at most 60 bits (15-hex md5 "
            f"prefix stays BIGINT-safe in every engine), got {bits}"
        )
    nhex = (bits + 3) // 4
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(TX.tokenize(F.col(text_col))).alias("tok"),
    )
    hv = toks.select(
        "id",
        F.conv(F.substring(F.md5("tok"), 1, nhex), 16, 10).cast("long").alias("hv"),
    )
    per_bit = (
        hv.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
            "hv",
        )
        .select(
            "id",
            "b",
            # F.shiftright's numBits must be a python int; the SQL
            # function takes an expression — same codegen either way
            (F.expr("shiftright(hv, b) & 1") * 2 - 1).alias("contrib"),
        )
        .groupBy("id", "b")
        .agg(F.sum("contrib").alias("s"))
    )
    return per_bit.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .otherwise(F.lit(0))
        ).alias("simhash")
    ).select(F.col("id").alias(id_col), "simhash")


def simhash_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming-ball pairs over portable SimHash signatures, via
    pigeonhole LSH banding: with ``bands`` equal slices of the
    signature, any pair within ``max_hamming < bands`` bits must agree
    on at least one whole slice — so the band equi-join has PERFECT
    recall, and the all-pairs form is purely the oracle's spec, never
    the executed plan. Join on (band, slice-value), verify exact
    hamming with xor+bit_count, distinct pairs.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole recall needs max_hamming < bands, got {max_hamming} >= {bands}"
        )
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash_portable_signatures(df, text_col, id_col, bits)
    banded = sig.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "slice",
        F.expr(f"shiftright(simhash, band * {width}) & {mask}"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            <= max_hamming
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Duplicate-span detection (ExactSubstr-style, Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better").
# The single-node reference builds a suffix array; the distributed
# shape is positional n-gram posting lists — linear in corpus tokens,
# shuffled on the gram key, no global structure.
# ---------------------------------------------------------------------------

def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_occurrences: int = 2,
    min_span_tokens: int | None = None,
) -> DataFrame:
    """Token spans whose every length-``n`` gram repeats elsewhere in
    the corpus (≥ ``min_occurrences`` total occurrences) — the signal
    ExactSubstr dedup cuts out of training text. Returns one row per
    maximal span: (id_col, span_start, span_end, span_tokens) with
    0-based token offsets, span_end exclusive.

    Pipeline (all relational, scales linearly in corpus tokens):
    1. positional grams: posexplode of the token stream — (doc, pos,
       gram), corpus_tokens rows;
    2. gram frequency: groupBy(gram) count, keep grams with count ≥
       min_occurrences — map-side partial agg, the shuffle carries
       |distinct grams| rows;
    3. duplicated positions: semi-join positions ⋈ hot grams on the
       gram key (shuffle join at scale; the hot-gram side is the
       smaller one after the frequency cut);
    4. maximal spans: consecutive duplicated positions merge via the
       islands trick — pos − row_number() is constant within a run —
       one window partitioned by doc, never global;
    5. a span of consecutive duplicated gram STARTS [a..b] covers
       tokens [a, b + n).

    A suffix array finds duplicates of ANY length ≥ n in one pass;
    gram granularity quantizes span boundaries to n-token starts —
    the standard relational approximation (same recall for spans ≥ n).
    """
    from postgresml_spark.functions import text as TX

    toks = df.select(
        F.col(id_col).alias("id"), TX.tokenize(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= n)
    grams = toks.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, n), " "),
            )
        ).alias("pos", "gram"),
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
        .select("gram")
    )
    dup_pos = grams.join(hot, "gram", "left_semi").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    islands = dup_pos.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    spans = (
        islands.groupBy("id", "island")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + n).alias("span_end"))
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
    if min_span_tokens is not None:
        spans = spans.filter(F.col("span_tokens") >= min_span_tokens)
    return spans


def corpus_line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    line_col: str = "line",
    min_df: int = 3,
    normalize: bool = True,
    delimiter: str = "\n",
) -> DataFrame:
    """C4-style corpus-level boilerplate removal (Raffel et al. 2020
    §2.2: drop any line occurring in ≥N documents — nav bars, cookie
    banners, license footers survive every document-level dedup pass
    because the *documents* differ).

    Input is an exploded (id, pos, line) frame (split on newline,
    sentence, or fixed window upstream); output is one row per document
    that retains ≥1 line: (id, clean_text, n_kept), lines rejoined in
    original order with ``delimiter``.

    Scale shape: one groupBy on the normalized line key computes
    document frequency (map-side partial agg collapses repeats early);
    the boilerplate set joins back LEFT ANTI on the same key — both
    stages shuffle on the line key, so hot boilerplate lines are also
    the most-collapsed ones. Reassembly groups by document id (second
    shuffle) and sorts each doc's surviving lines inside the aggregated
    array — no per-document window, no global sort, no driver state.
    """
    key = (
        F.lower(F.trim(F.col(line_col))) if normalize else F.col(line_col)
    )
    keyed = lines.withColumn("__k", key)
    boiler = (
        keyed.groupBy("__k")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("__k")
    )
    kept = keyed.join(boiler, "__k", "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(pos_col, line_col))),
                lambda s: s[line_col],
            ),
            delimiter,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every ``n``-token gram,
    slide a window of ``w`` consecutive gram hashes, record the minimum
    of each window, dedupe.  Guarantees: any shared token run of length
    ≥ n + w - 1 yields at least one shared fingerprint, and the selected
    set is ~2/(w+1) of all grams — a density/recall dial that neither
    full shingling (stores everything) nor MinHash (fixed-size, loses
    locality) offers.  Output: (id_col, fp) distinct rows.

    Engine-portable: gram hash = md5 hex slice → 60-bit int, window min
    is a plain SQL window frame — DuckDB re-derives the identical
    fingerprint set (oracle-gateable, unlike seeded xxhash winnowing).

    Scale: grams are corpus_tokens rows; the window min is partitioned
    BY DOCUMENT (never global) so it parallelizes per doc; the distinct
    shuffles ~2/(w+1) of gram volume.  Fingerprints then behave like any
    posting list: self-join on fp for pair candidates, anti-join an
    index for incremental screening."""
    from postgresml_spark.functions import text as TX

    toks = df.select(
        F.col(id_col).alias("id"), TX.tokenize(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= n + w - 1)
    grams = toks.select(
        "id",
        (F.size("t") - n + 1).alias("n_grams"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, n), " "),
            )
        ).alias("pos", "gram"),
    ).select(
        "id",
        "pos",
        "n_grams",
        F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select(F.col("id").alias(id_col), "fp")
        .distinct()
    )


def winnow_similar_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    bucket_cap: int = 50,
) -> DataFrame:
    """Candidate near-duplicate pairs from winnowing fingerprints:
    self-join the fingerprint posting list on fp, count shared
    fingerprints per pair.  ``bucket_cap`` drops degenerate fingerprints
    shared by more than ``bucket_cap`` docs (boilerplate) before the
    self-join — the same O(m²)-hot-bucket kill switch the MinHash band
    join uses.  Output: (id_a, id_b, shared) with id_a < id_b."""
    sized = fps.withColumn(
        "__df", F.count("*").over(Window.partitionBy("fp"))
    ).filter(F.col("__df") <= bucket_cap)
    a = sized.select(F.col(id_col).alias("id_a"), "fp")
    b = sized.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def set_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact set-similarity self-join via PREFIX FILTERING (PPJoin,
    Xiao et al. WWW 2008): all pairs with Jaccard(shingle sets) ≥
    threshold, NO false negatives and no LSH tuning — the exact
    complement to banded MinHash (probabilistic recall) and q23's plain
    inverted-index join (which joins on EVERY shingle).

    Prefix principle: order each set's shingles by ascending global
    document frequency (rarest first, ties by shingle); two sets with
    Jaccard ≥ t MUST share a shingle within each other's first
    |s| − ⌈t·|s|⌉ + 1 shingles (pigeonhole), so the candidate join runs
    on the PREFIX posting list only — rare shingles, small buckets —
    plus a length filter (|b| ≥ t·|a|).  Survivors verify exactly with
    one array_intersect.

    Scale: the df-rank is one groupBy + one per-doc window (bounded by
    doc length); the candidate join shuffles prefix postings (a
    (1−t)-fraction of shingle volume, biased to the rarest shingles);
    the verify join moves only candidate pairs.  Output:
    (id_a, id_b, jaccard)."""
    # Parallelize-then-materialize (round 10, guide §1.2 + §4): the
    # r9 form repartition("id")-barriered the shingle UDF, betting on
    # runtime exchange reuse — but the five downstream references are
    # column-pruned DIFFERENTLY, so the exchanges never canonicalize
    # and the final AQE plan evaluated the UDF subtree SIX times
    # (three distinct branches × the §4.4 under-filter duplication
    # that `Generate explode(s)`'s inferred `size(s) > 0` causes).
    # Worse, the UDF ran below the exchange at SCAN parallelism — one
    # task for a single-file corpus. Now: repartition the raw (id,
    # text) FIRST (explicit numPartitions pins the UDF stage's
    # parallelism at the session's cores; AQE never coalesces an
    # explicit-n repartition), evaluate the UDF once on top, and
    # localCheckpoint the arrays so every consumer reads materialized
    # blocks — one UDF evaluation total, partition-parallel.
    # localCheckpoint (not persist): fresh per DataFrame, so repeated
    # bench reps recompute honestly instead of hitting the
    # CacheManager, and blocks free with the plan.
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .repartition(par, F.col("id"))
        .select(
            "id", word_shingles_batch(shingle_n)(F.col("__t")).alias("s")
        )
        .withColumn("n", F.size("s"))
        .localCheckpoint()
    )
    posting = sh.select("id", "n", F.explode("s").alias("shingle"))
    gdf = posting.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = posting.join(gdf, "shingle").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("id").orderBy("df", "shingle")
        ),
    )
    prefix_len = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    # prefix feeds BOTH sides of the candidate self-join but is NOT
    # checkpointed: both branches prune the same 4 columns, so the
    # df-rank window's exchange canonicalizes and ReusedExchange
    # dedupes the sort+row_number at runtime — measured A/B (warm,
    # sf0.1): checkpointing prefix too ran 7.3-7.6 s (the LogicalRDD
    # hides stats from the candidate-join planner) vs 3.4 s with only
    # `sh` materialized (OPTIMIZATION_r10.md q203).
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "id", "n", "pos", "shingle"
    )
    a = prefix.select(
        F.col("id").alias("id_a"),
        F.col("n").alias("n_a"),
        F.col("pos").alias("pos_a"),
        "shingle",
    )
    b = prefix.select(
        F.col("id").alias("id_b"),
        F.col("n").alias("n_b"),
        F.col("pos").alias("pos_b"),
        "shingle",
    )
    # PPJoin positional filter: overlap ≥ ⌈t/(1+t)·(|a|+|b|)⌉ is needed
    # for Jaccard ≥ t, and a match at prefix positions (i, j) caps the
    # achievable overlap at 1 + min(|a|−i, |b|−j) — candidates that
    # can't reach the bound are pruned BEFORE the distinct/verify
    # shuffle (result-identical: only unreachable pairs drop)
    required = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
    )
    ubound = 1 + F.least(
        F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b")
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
            & (ubound >= required)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("s_a", "s_b"))
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("s_a") + F.size("s_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )
