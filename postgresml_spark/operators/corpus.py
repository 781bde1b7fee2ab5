"""Training-corpus assembly operators: deterministic shuffle, weighted
source mixing, quality gating, and sequence packing.

The reference's data story stops at snapshot/dataset building
(pgml-extension/src/orm/snapshot.rs:496-629 builds an ordered training
relation; sampling.rs picks the split strategy). Assembling a
pretraining corpus at 100 TB additionally needs the four operators
here, which every large-scale LLM data pipeline runs between "raw
documents" and "tokenizer":

- **deterministic_shuffle** — a stable pseudo-random global order for
  training-data delivery. Epoch-reproducible (seed-keyed), and
  scale-safe: the order key is a hash expression and the global rank
  comes from range-repartition + per-partition offsets, never a
  single-partition window.
- **weighted_sample** — per-source mixing ("datamix"): each domain is
  down-sampled (rate < 1) or up-sampled (rate > 1 emits floor + a
  Bernoulli extra copy) with hash-derived, seed-keyed determinism.
- **gopher_quality_flags** — the public Gopher/C4-style cheap quality
  rules (word count band, mean word length band, alpha-word ratio,
  stopword presence, symbol ratio) as pure codegen expressions.
- **pack_sequences** — concat-and-chunk token accounting: documents are
  concatenated per stream (group) in a deterministic order and cut into
  fixed token-budget packs; each document learns which packs it spans.
  Window is partitioned by the stream column — no global sort.
- **greedy_pack** — first-fit-in-order bin packing (documents never
  split; a new pack starts when the current one would overflow) via
  applyInPandas per stream.

All hashing is md5-derived so every operator is DuckDB-oracle-checkable
(Spark's xxhash64/hash are not portable across engines).
"""

from __future__ import annotations

from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgresml_spark.functions import text as TX

__all__ = [
    "hash_key",
    "uniform_unit",
    "deterministic_shuffle",
    "weighted_sample",
    "stratified_take",
    "weighted_take",
    "gopher_quality_flags",
    "repetition_flags",
    "pack_sequences",
    "greedy_pack",
    "unigram_lm_scores",
    "kn_bigram_scores",
    "heavy_hitters",
    "mg_fold",
]


def _cols(cols: Iterable[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _md5_of(seed: int | str, cols: list[Column]) -> Column:
    parts: list[Column] = [F.lit(str(seed))]
    for c in cols:
        parts.extend([F.lit(":"), c.cast("string")])
    return F.md5(F.concat(*parts))


def hash_key(seed: int | str, *cols: Column | str) -> Column:
    """Deterministic 60-bit pseudo-random bigint from seed + key columns.

    md5 prefix, so bit-identical in DuckDB:
    ``CAST(('0x' || substr(md5(seed||':'||col), 1, 15)) AS BIGINT)``.
    """
    h = _md5_of(seed, _cols(cols))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def uniform_unit(seed: int | str, *cols: Column | str) -> Column:
    """Deterministic uniform double in [0, 1) from seed + key columns
    (first 32 md5 bits / 2^32). DuckDB twin:
    ``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT) / 4294967296.0``.
    """
    h = _md5_of(seed, _cols(cols))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    seed: int | str = 0,
    rank_col: str = "shuffle_rank",
    key_out: str | None = "shuffle_key",
) -> DataFrame:
    """Stable pseudo-random global ordering for training delivery.

    Adds a seed-keyed hash order key and its global 1-based rank.
    Same seed → identical order across runs/cluster sizes (epoch
    reproducibility); different seed → an independent permutation.

    Scale: rank uses range-repartition + partition-local row_number +
    broadcast per-partition offsets (preprocess.snapshot._global_rank),
    so no single-partition WindowExec at any size. Writing the result
    sorted by ``rank_col`` yields the shuffled training order with
    ordered, non-overlapping files.
    """
    from postgresml_spark.preprocess.snapshot import _global_rank

    keyed = df.withColumn("__sk", hash_key(seed, *key_cols))
    # md5 collisions are ~2^-60; the key columns break any tie exactly
    # as the oracle's ORDER BY does.
    ranked = _global_rank(keyed, [F.col("__sk")] + _cols(key_cols))
    out = ranked.withColumnRenamed("__rn", rank_col)
    if key_out:
        return out.withColumnRenamed("__sk", key_out)
    return out.drop("__sk")


def weighted_sample(
    df: DataFrame,
    domain_col: str,
    weights: Mapping[str, float],
    key_cols: list[str],
    seed: int | str = 0,
    default_rate: float = 0.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Per-domain corpus mixing with deterministic down/up-sampling.

    Each row's domain has a rate r: rows are kept floor(r) times plus
    one more when the row's seed-keyed uniform < frac(r) — so r=0.25
    keeps a deterministic quarter of the domain and r=2.5 emits 2 or 3
    copies per row. Output gains ``copy_col`` (1-based copy index) so
    replicated rows stay distinct for downstream shuffling.

    Scale: the rate table is a broadcast join (domains are few); the
    Bernoulli draw is a pure hash expression — no sampling state, no
    driver participation, reproducible under any partitioning.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(str(k), float(v)) for k, v in weights.items()],
        f"{domain_col} string, __rate double",
    )
    u = uniform_unit(seed, *key_cols)
    n_copies = (
        F.floor(F.col("__rate"))
        + F.when(u < F.col("__rate") - F.floor(F.col("__rate")), 1).otherwise(0)
    ).cast("int")
    return (
        df.join(F.broadcast(wdf), domain_col, "left")
        .withColumn("__rate", F.coalesce(F.col("__rate"), F.lit(float(default_rate))))
        .withColumn("__n", n_copies)
        .where(F.col("__n") >= 1)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__rate", "__n")
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_word_ratio: float = 0.6,
    min_stopword_hits: int = 2,
    max_symbol_ratio: float = 0.25,
) -> DataFrame:
    """Gopher-style (Rae et al. 2021, §A1.1) cheap quality rules as
    pure codegen expressions; emits one boolean per rule plus ``keep``.

    Rules (defaults tuned lenient for short synthetic docs; production
    values are min_words=50, max_symbol_ratio=0.1):
    - word count within [min_words, max_words]
    - mean word length within [min_mean_word_len, max_mean_word_len]
    - fraction of words containing an alphabetic char ≥ threshold
    - at least min_stopword_hits distinct english stopwords present
    - punctuation/symbol char ratio ≤ threshold

    Everything is regexp_count/length arithmetic — whole-stage codegen,
    no higher-order-function lambdas on the hot path, and each rule has
    an exact DuckDB-SQL twin (oracle q62).
    """
    t = F.col(text_col)
    n_words = F.regexp_count(t, F.lit(r"\S+")).cast("bigint")
    word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_word_len = word_chars.cast("double") / F.greatest(n_words, F.lit(1)).cast(
        "double"
    )
    alpha_words = F.regexp_count(t, F.lit(r"(^|\s)[^\s]*[A-Za-z]")).cast("bigint")
    alpha_ratio = alpha_words.cast("double") / F.greatest(n_words, F.lit(1)).cast(
        "double"
    )
    # distinct stopword presence: |tokens ∩ markers| via one
    # array_intersect (dedups by definition). Semantically identical to
    # probing " w " containment per marker, but ONE expression instead
    # of a 32-term when-chain — the chain version alone added ~2s of
    # whole-stage-codegen compile per plan.
    stop_hits = F.when(t.isNull(), F.lit(0)).otherwise(
        F.size(
            F.array_intersect(
                TX.tokenize(t), F.array(*[F.lit(w) for w in TX.STOPWORDS[:32]])
            )
        )
    )
    symbol_ratio = TX.punct_ratio(t)

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
        .withColumn("alpha_word_ratio", F.round(alpha_ratio, 4))
        .withColumn("stopword_hits", stop_hits.cast("bigint"))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 4))
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("stopword_hits") >= min_stopword_hits)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
    )
    return out.withColumn("keep", keep)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    group_col: str,
    budget: int,
    prefix: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing accounting (GPT-style pretraining
    batches): documents are concatenated per ``group_col`` stream in
    ``order_col`` order and the token stream is cut every ``budget``
    tokens. Each document learns its start offset and the first/last
    pack it lands in (a long document spans several packs; short ones
    share a pack).

    Adds: ``{prefix}_start`` (0-based token offset in the stream),
    ``{prefix}_first``, ``{prefix}_last``, ``{prefix}_count``.

    Scale: one window partitioned by the stream column — each stream's
    running sum is independent, so this is a single hash-partition
    shuffle with no global ordering. Streams are how production
    pipelines bound this anyway (per-domain/per-shard token streams).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(token_col).cast("bigint")
    start = F.sum(tok).over(w) - tok
    first = F.floor(start / budget).cast("bigint")
    last = F.greatest(
        F.floor((start + tok - F.lit(1)) / budget).cast("bigint"), first
    )
    return (
        df.withColumn(f"{prefix}_start", start)
        .withColumn(f"{prefix}_first", first)
        .withColumn(f"{prefix}_last", last)
        .withColumn(f"{prefix}_count", (last - first + F.lit(1)).cast("bigint"))
    )


def greedy_pack(
    df: DataFrame,
    token_col: str,
    order_col: str,
    group_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """First-fit-in-order bin packing: walk each stream in order,
    accumulate documents into the current pack, and start a new pack
    when adding the next document would exceed ``budget``. Documents
    are never split; a document larger than the budget gets a pack of
    its own. Output adds ``pack_col`` (0-based per stream).

    The sequential scan is inherently order-dependent, so it runs as
    applyInPandas per stream group — one Arrow batch per stream,
    vectorized cumulative logic inside. Parallelism = number of
    streams, which is how production packers shard anyway.
    """
    from pyspark.sql import types as T

    # copy — StructType.add mutates in place, corrupting df's cached schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(pack_col, T.LongType())]
    )
    tok_name, ord_name = token_col, order_col

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_name, kind="mergesort").reset_index(drop=True)
        packs = []
        pack, acc = 0, 0
        for t in pdf[tok_name].astype("int64"):
            if acc > 0 and acc + t > budget:
                pack += 1
                acc = 0
            packs.append(pack)
            acc += t
        pdf[pack_col] = pd.Series(packs, dtype="int64")
        return pdf

    return df.groupBy(group_col).applyInPandas(_pack, schema=out_schema)


def repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
    max_dup_line_frac: float = 0.30,
    max_dup_ngram_frac: float = 0.30,
    max_top2gram_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, the
    "repetitious text" half that gopher_quality_flags leaves out):

    - dup_line_frac      — fraction of lines that repeat an earlier
                           line (per-row: 1 - distinct/total; split +
                           array_remove + array_distinct, all codegen).
    - dup_ngram_frac     — fraction of word n-grams (default n=5) that
                           are repeats.
    - top2gram_char_frac — fraction of word-characters covered by the
                           maximal-coverage (count × chars) word
                           2-gram.
    - keep_repetition    — all three under their thresholds (published
                           Gopher values 0.30/0.30/0.20).

    Scale shape: grams are built CODEGEN-only — posexplode the tokens
    once, then window `lead` over (doc, pos) assembles consecutive
    n-grams (a per-row higher-order-function transform measured
    ~2 ms/row interpreted at 600 tokens — 14 s for 5k docs; this form
    is 20×). The shuffles are the window by doc and the (doc, gram)
    frequency counts — uniform keys, linear rows."""
    t = F.col(text_col)
    lines = F.array_remove(F.split(t, "\n"), "")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    base = df.withColumn("dup_line_frac", F.round(dup_line, 4))

    tok = df.select(
        F.col(id_col), F.posexplode(TX.tokenize(t)).alias("pos", "tok")
    )
    # word chars straight off the exploded tokens — no window needed
    chars = tok.groupBy(id_col).agg(
        F.sum(F.length("tok")).alias("all_chars")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, ngram_n)]
    # concat_ws skips nulls, so gate each gram on its LAST member —
    # otherwise the tail of the doc emits truncated grams
    g2 = F.when(leads[0].isNotNull(), F.concat_ws(" ", F.col("tok"), leads[0]))
    gn = F.when(
        leads[ngram_n - 2].isNotNull(),
        F.concat_ws(" ", F.col("tok"), *leads[: ngram_n - 1]),
    )
    # the windowed (sorted) pass is the expensive stage — consume it
    # ONCE: unpivot both gram kinds into rows, one (id, kind, gram)
    # frequency count, one conditional per-doc rollup. (The first cut
    # ran three separate aggregations over the window output and the
    # per-doc sort executed three times: 6× wall at 4× data.)
    grams = tok.select(F.col(id_col), g2.alias("g2"), gn.alias("gn"))
    pairs = (
        grams.select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.struct(F.lit("g2").alias("kind"), F.col("g2").alias("gram")),
                    F.struct(F.lit("gn").alias("kind"), F.col("gn").alias("gram")),
                )
            ).alias("kg"),
        )
        .select(F.col(id_col), F.col("kg.kind").alias("kind"), F.col("kg.gram").alias("gram"))
        .where(F.col("gram").isNotNull())
    )
    counts = pairs.groupBy(id_col, "kind", "gram").count()
    stats = counts.groupBy(id_col).agg(
        F.sum(F.when(F.col("kind") == "gn", F.col("count"))).alias("n_grams_total"),
        F.count(F.when(F.col("kind") == "gn", F.lit(1))).alias("n_grams_distinct"),
        F.max(
            F.when(
                F.col("kind") == "g2", F.col("count") * (F.length("gram") - 1)
            )
        ).alias("top_chars"),
    )
    stats = chars.join(stats, id_col, "left")

    out = base.join(stats, id_col, "left")
    dup_ngram = F.when(
        F.col("n_grams_total") > 0,
        1.0
        - F.col("n_grams_distinct").cast("double")
        / F.col("n_grams_total").cast("double"),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("all_chars") > 0,
        F.coalesce(F.col("top_chars"), F.lit(0)).cast("double")
        / F.col("all_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    out = (
        out.withColumn("dup_ngram_frac", F.round(dup_ngram, 4))
        .withColumn("top2gram_char_frac", F.round(top_frac, 4))
        .drop("all_chars", "n_grams_total", "n_grams_distinct", "top_chars")
    )
    keep = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_ngram_frac") <= max_dup_ngram_frac)
        & (F.col("top2gram_char_frac") <= max_top2gram_frac)
    )
    return out.withColumn("keep_repetition", keep)


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (CCNet-style quality bucketing).
#
# CCNet (Wenzek et al. 2020) filters CommonCrawl by language-model
# perplexity and splits the corpus into head/middle/tail quality
# buckets. The public recipe uses a KenLM 5-gram; the unigram variant
# here keeps the same pipeline shape (train LM on a reference corpus →
# score every document → percentile-bucket) with an exactly
# SQL-portable model, so the whole operator sits under the DuckDB
# oracle gate.
# ---------------------------------------------------------------------------

def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref: DataFrame | None = None,
    vocab_cap: int | None = None,
) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood (nats/token).

    Model: add-one smoothing over the reference vocabulary with a
    single OOV bucket — p(w) = (c(w)+1)/(N+V+1), p(OOV) = 1/(N+V+1),
    where N = total reference tokens and V = |vocabulary|. Score =
    mean over the document's tokens of -ln p(token); exp(score) is the
    perplexity. Returns ``df`` + ``n_tokens`` (bigint) + ``nll``
    (double, unrounded — round at the edge).

    ``ref`` is the LM training corpus (defaults to ``df`` itself —
    self-scoring, which is what CCNet's tail-bucket detection reduces
    to when no curated reference exists). ``vocab_cap`` keeps only the
    top-K most frequent reference types (ties broken by token) and
    folds the rest into OOV — at 100 TB the full type inventory is
    web-scale junk (~billions), while the top ~1M types cover >99% of
    tokens; the cap is what makes the model broadcastable.

    Plan shape (three shuffles, none over raw text):
    1. vocab: explode(ref tokens) → groupBy(token) count — map-side
       partial agg, shuffle is |types| not |tokens|; optional top-K is
       a TakeOrdered, not a global sort.
    2. model constants (N, V): single-row agg, broadcast via crossJoin.
    3. scoring: explode(df tokens) ⋈ broadcast(vocab) — map-side hash
       join, no shuffle of the token stream — then groupBy(id) mean.
    The token stream is never shuffled; only (id, partial-sum) rows
    move. OOV hits the smoothed floor via the left join's null path.
    """
    src = ref if ref is not None else df
    tok_ref = src.select(F.explode(TX.tokenize(F.col(text_col))).alias("tok"))
    vocab = tok_ref.groupBy("tok").agg(F.count("*").alias("c"))
    if vocab_cap is not None:
        vocab = vocab.orderBy(F.desc("c"), F.asc("tok")).limit(int(vocab_cap))
    consts = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(TX.tokenize(F.col(text_col))).alias("tok"),
    )
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "__id",
            (
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("n_total") + F.col("v_size") + F.lit(1)).cast("double")
                )
            ).alias("__nll"),
        )
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("__nll").alias("nll"),
        )
    )
    return df.join(
        scored,
        F.col(id_col) == F.col("__id"),
        "left",
    ).drop("__id").withColumn(
        "n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint")
    )


def stratified_take(
    df: DataFrame,
    group_col: str,
    k: int,
    key_cols: list[str],
    seed: int | str = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic exactly-k-per-group sample ("give me k documents
    per source/language/domain") — the curation counterpart of
    `weighted_sample`'s rate-based mixing.

    Rows are ranked inside each group by a seed-keyed md5 hash of
    ``key_cols`` (ties broken by the keys themselves) and the first k
    survive. Same seed → same sample on any cluster size or layout;
    different seed → an independent redraw. Optionally exposes the
    1-based in-group rank as ``rank_col``.

    Scale: ONE hash-shuffle on ``group_col`` + a partition-local
    window — never a global sort. Skew note: a group 1000× bigger than
    the rest bounds the stage (row_number must see the whole group);
    for pathological groups pre-thin with a hash-prefix filter
    (keep ~4k/|group| of rows first, then rank exactly).
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_key(seed, *key_cols), *_cols(key_cols)
    )
    out = df.withColumn("__gr", F.row_number().over(w)).filter(F.col("__gr") <= k)
    if rank_col:
        return out.withColumnRenamed("__gr", rank_col)
    return out.drop("__gr")


def weighted_take(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str],
    seed: int | str = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items, deterministic:
    the Efraimidis–Spirakis A-ES scheme — each row draws a seed-keyed
    uniform u and keeps key u^(1/w); the k largest keys are exactly a
    weighted sample without replacement. Pure expressions + one
    TakeOrdered top-k: no per-row state, no rejection loop,
    reproducible under any partitioning (the importance-weighted
    corpus subsample: w = quality score, token count, dedup cluster
    mass...).
    """
    u = uniform_unit(seed, *key_cols)
    es = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    # E-S requires w > 0: u^(1/w) for w<0 is >= 1 (negative rows would
    # deterministically win) and w=0 degenerates to key 0. Non-positive
    # weights mean "never sample" — filter, don't invert.
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("__es", es)
        .orderBy(F.desc("__es"), *_cols(key_cols))
        .limit(int(k))
        .drop("__es")
    )


def mg_fold(counts: dict, series, capacity: int) -> tuple[dict, int]:
    """Fold one batch of values into a Misra–Gries summary of at most
    ``capacity`` counters. Returns (summary, decrement) where
    ``decrement`` is the amount subtracted from every counter this
    fold (0 when no trim happened) — callers accumulate it for the
    undercount bound. Shared by the batch and streaming heavy-hitter
    operators so the trim arithmetic lives in exactly one place."""
    for v, c in series.value_counts().items():
        counts[v] = counts.get(v, 0) + int(c)
    cut = 0
    if len(counts) > capacity:
        cut = sorted(counts.values())[len(counts) - capacity - 1]
        for v in [v for v, c in counts.items() if c <= cut]:
            del counts[v]
        for v in counts:
            counts[v] -= cut
    return counts, cut


def heavy_hitters(
    items: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Exact top-k most frequent values with a bounded shuffle.

    A plain ``groupBy(col).count()`` shuffles one row per DISTINCT
    value per partition — at corpus scale (10^9+ word types) that
    shuffle dwarfs the answer. This runs the classic two-pass
    frequent-items scheme instead:

    1. **Candidate pass** — each partition keeps a Misra–Gries summary
       of ``capacity`` counters (Arrow-batched: per-batch value_counts
       folded via ``mg_fold``; on overflow the summary is decremented
       by the (size−capacity)-th smallest count, the batched form of
       the MG decrement). Emitted rows per partition ≤ capacity, so
       the candidate shuffle is ``partitions × capacity`` regardless
       of value cardinality.
    2. **Verify pass** — candidate values (deduped, broadcast) filter
       the item stream map-side; exact counts of the survivors come
       from a normal partial-agg groupBy bounded by |candidates|.

    Guarantee (MG bound, stated carefully): a partition's summary
    keeps every value whose LOCAL frequency exceeds
    N_p/(capacity+1), so a value can be lost only if its count in
    EVERY partition is below that partition's N_p/(capacity+1) —
    i.e. its GLOBAL share is below 1/(capacity+1). The result is
    therefore the exact top-k whenever the k-th true frequency
    exceeds N/(capacity+1). Sizing rule: capacity ≥ N/f_k, where
    f_k is the smallest frequency you must not miss — at the default
    4096, any value above ~0.025% of the corpus is safe; raise
    capacity (cheap: candidates stay partition-bounded) for longer
    tails. Values are compared as strings inside the sketch; the
    output column keeps the input type. Output: (``col``, cnt),
    ordered cnt desc then value, limited to k.
    """
    vals = items.select(F.col(col).cast("string").alias("__v"))

    def _mg(batches):
        counts: dict = {}
        for pdf in batches:
            counts, _ = mg_fold(counts, pdf["__v"], capacity)
        yield pd.DataFrame({"__v": list(counts.keys())})

    cand = vals.mapInPandas(_mg, "__v string").distinct()
    exact = (
        items.join(
            F.broadcast(cand), F.col(col).cast("string") == F.col("__v")
        )
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return exact.orderBy(F.desc("cnt"), F.asc(col)).limit(int(k))


def kn_bigram_scores(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM quality scoring: fit on a
    held-out reference corpus, score each target document's mean
    bigram negative log-likelihood (nats/bigram). The real-math step
    up from `unigram_lm_scores`' add-one model, and the honest twin of
    CCNet's KenLM stage (Wenzek et al. 2020) — absolute discounting
    with continuation probabilities, the textbook KN formulation:

        P(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
                 + (D·N1+(w1,•)/c(w1)) · N1+(•,w2)/B

    where N1+ are distinct-continuation counts and B the distinct
    bigram count. Unseen contexts back off to the continuation
    distribution alone; a zero-probability event (both bigram and w2
    unseen) floors at 1/(B+1) so log stays finite — deterministic and
    engine-portable, which is what lets the q191 DuckDB oracle rebuild
    the entire model from the same parquet.

    Scale shape: every statistic is a groupBy over BIGRAM TYPES
    (vocabulary²-bounded, Zipf-concentrated — not corpus-sized), and
    scoring joins the target's bigram stream against those stats
    tables on w1/w2 equi-keys; Catalyst/AQE broadcasts them while they
    fit and shuffle-joins beyond. Only (doc, partial-sum) rows reach
    the final per-doc aggregation. Docs with < 2 tokens are excluded
    (no bigrams to score).
    """
    D = float(discount)

    def bigrams(df: DataFrame) -> DataFrame:
        toks = TX.tokenize(F.col(text_col))
        big = df.where(F.size(toks) >= 2).select(
            F.col(id_col), F.posexplode(toks).alias("pos", "w1")
        )
        w = Window.partitionBy(id_col).orderBy("pos")
        return big.select(
            F.col(id_col), F.col("w1"), F.lead("w1").over(w).alias("w2")
        ).where(F.col("w2").isNotNull())

    tb = bigrams(train)
    c12 = tb.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1pf")
    )
    right = c12.groupBy("w2").agg(F.count("*").alias("n1pb"))
    b_total = c12.count()  # scalar: distinct bigram types

    sb = bigrams(score)
    joined = (
        sb.join(c12, ["w1", "w2"], "left")
        .join(left, "w1", "left")
        .join(right, "w2", "left")
    )
    c12d = F.coalesce(F.col("c12").cast("double"), F.lit(0.0))
    c1d = F.col("c1").cast("double")
    n1pfd = F.col("n1pf").cast("double")
    n1pbd = F.coalesce(F.col("n1pb").cast("double"), F.lit(0.0))
    bd = F.lit(float(b_total))
    cont = n1pbd / bd
    p_seen = (
        F.greatest(c12d - F.lit(D), F.lit(0.0)) / c1d
        + ((F.lit(D) * n1pfd) / c1d) * cont
    )
    p_raw = F.when(F.col("c1").isNotNull(), p_seen).otherwise(cont)
    p = F.when(p_raw > 0.0, p_raw).otherwise(F.lit(1.0) / (bd + F.lit(1.0)))
    return (
        joined.select(F.col(id_col), (-F.log(p)).alias("nll"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("nll").alias("kn_nll"),
        )
    )
