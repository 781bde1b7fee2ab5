"""Physical-layout operators: bucketing, partition-pruned stores, skew salting.

These are the 100 TB levers (SURVEY §4): the reference gets physical
locality from Postgres indexes (HNSW/GIN/btree); Spark gets it from
layout — bucketed tables co-locate join keys (no shuffle at read), a
partitioned store prunes non-matching partitions at the source, and
salting splits hot keys across reducers. Everything here is plain
public Spark API arranged for those effects.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "skew_report",
    "write_bucketed",
    "bucketed_join_ready",
    "write_ivf_store",
    "read_ivf_probe",
    "salted_join",
    "morton_code",
    "zorder_write",
]


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, sort: bool = True
) -> None:
    """Persist hash-bucketed (and bucket-sorted) by the join key.

    Two tables bucketed identically on their join key sort-merge-join
    WITHOUT a shuffle (Catalyst recognizes the output partitioning) —
    at 100 TB this turns every fact⋈fact join on the bucketing key into
    a local merge per bucket.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, key: str):
    """Join two identically-bucketed tables; returns (df, shuffle_free)
    where shuffle_free reports whether the physical plan contains no
    Exchange on the join path (assertable in tests)."""
    ldf = spark.table(left)
    rdf = spark.table(right)
    joined = ldf.join(rdf, key)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, ("Exchange" not in plan)


def write_ivf_store(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    centroid_col: str = "centroid_id",
) -> None:
    """Materialize an IVF index as a centroid-partitioned parquet store
    (pgvector-ivfflat analog, SURVEY §4 'ANN index'): directory layout
    `centroid_id=K/` so a probe reads only nprobe/nlist of the bytes —
    partition pruning happens in the file listing, before any I/O.
    """
    from postgresml_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(df, centroids, vec_col=vec_col, out_col=centroid_col)
    assigned.write.mode("overwrite").partitionBy(centroid_col).parquet(path)


def append_ivf_store(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    centroid_col: str = "centroid_id",
) -> None:
    """Incremental IVF maintenance: assign NEW vectors against the
    FROZEN centroids and append them into their `centroid_id=K/`
    partitions — no refit, no rewrite of existing lists (the
    append-only posting discipline of the text index, applied to the
    vector index; pgvector-ivfflat likewise inserts into existing
    lists without retraining). Probes see appended vectors
    immediately because pruning is directory-listing-based.

    Centroid drift is the retrain trigger, not a correctness issue:
    recall degrades only as the appended distribution drifts from the
    fitted one — monitor with the same PSI/KS drift ops the serving
    layer uses, and rebuild with write_ivf_store when flagged."""
    from postgresml_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(df, centroids, vec_col=vec_col, out_col=centroid_col)
    assigned.write.mode("append").partitionBy(centroid_col).parquet(path)


def read_ivf_probe(
    spark: SparkSession,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_col: str = "centroid_id",
) -> DataFrame:
    """Probe the IVF store: rank centroids driver-side, scan only the
    nprobe closest partitions (pushed as a partition filter), exact
    re-rank inside. Returns top-k (id, score)."""
    from postgresml_spark.operators.similarity import knn_exact

    def l2(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    order = sorted(range(len(centroids)), key=lambda i: l2(centroids[i], query_vec))
    probe = order[:nprobe]
    df = spark.read.parquet(path).filter(F.col(centroid_col).isin(probe))
    return knn_exact(df, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's hot keys across `salt`
    sub-keys and replicate the small side once per salt value. Use when
    one key dominates (AQE's skew-join handles moderate skew; salting
    is the explicit fix for pathological keys). Result = plain join
    result (salt columns dropped)."""
    big_s = big.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = big_s.join(small_s, [key, "__salt"])
    return out.drop("__salt")


def skew_report(df, key, top_n: int = 10):
    """Pre-flight join/agg skew diagnostic: per-key row counts reduced
    to the decision numbers — total rows, distinct keys, max/p99 key
    share, top-N heaviest keys. One partial-aggregated shuffle of
    |distinct keys| rows; the output is what picks the strategy
    (broadcast the other side / AQE skew join / explicit salting /
    nothing). Returns (summary_df, top_keys_df)."""
    from pyspark.sql import functions as F

    kc = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(kc.alias("key")).agg(F.count("*").alias("n"))
    counts = counts.localCheckpoint()
    summary = counts.agg(
        F.sum("n").cast("bigint").alias("total_rows"),
        F.count("*").cast("bigint").alias("distinct_keys"),
        F.max("n").cast("bigint").alias("max_key_rows"),
        F.round(
            (F.max("n") / F.sum("n")).cast("double"), 6
        ).alias("max_key_share"),
        F.round(
            F.expr("percentile(n, 0.99)"), 2
        ).alias("p99_key_rows"),
    )
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_n).select(
        "key", F.col("n").cast("bigint").alias("n")
    )
    return summary, top


def morton_code(
    x,
    y,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    bits: int = 8,
) -> "F.Column":
    """Z-order (Morton) key: quantize two columns to ``bits``-bit cells
    over EXPLICIT bounds and interleave their bits (x gets the even bit
    positions). Explicit bounds keep the code a pure deterministic
    expression — no data-dependent min/max pass, and the same literal
    arithmetic runs on any engine.

    Why: sorting by a Morton key clusters BOTH dimensions at once, so
    parquet row-group min/max stats become selective for predicates on
    either (or both) columns — the open-table-format Z-ORDER feature as
    plain Spark expressions. The interleave is an unrolled OR of
    2·bits codegen terms (no UDF, no loop at runtime).
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y

    def quant(c, lo, hi):
        cells = (1 << bits) - 1
        q = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * (cells + 1))
        return F.least(F.greatest(q, F.lit(0)), F.lit(cells)).cast("long")

    qx, qy = quant(xc, x_min, x_max), quant(yc, y_min, y_max)
    code = F.lit(0).cast("long")
    for i in range(bits):
        # Column.bitwiseOR, not `|` (PySpark overloads `|` as boolean OR)
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(qx, i) % 2, 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(qy, i) % 2, 2 * i + 1))
    return code


def zorder_write(
    df: DataFrame,
    path: str,
    code,
    num_files: int = 16,
) -> None:
    """Write ``df`` clustered by a Morton key: range-repartition into
    ``num_files`` code ranges + sort inside each — every output file
    covers a compact Z-curve segment, i.e. a small rectangle in
    (x, y) space, so file- and row-group-level min/max pruning works
    for both dimensions. The cheap stand-in for Delta/Iceberg Z-ORDER
    on a plain parquet store."""
    (
        df.withColumn("__z", code)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rendezvous_bucket(key_col, n_buckets: int):
    """Highest-random-weight (rendezvous) bucket assignment: the key
    routes to argmax over buckets of md5(key ':' bucket).

    Why not hash(key) % n: under modulo routing a bucket-count change
    remaps ~(1 - 1/n) of ALL keys — at 100 TB that is a full-store
    rewrite to grow the bucketed document store. Under rendezvous
    routing only the keys whose new argmax IS the added bucket move:
    ~1/(n+1) of them, and every mover lands on the new bucket, so a
    reshard is an O(moved) partial rewrite through the same
    BucketedVersionedTable machinery. Deterministic md5 scores make
    assignments reproducible across engines (SQL-portable twin:
    row_number over md5 per key) and across cluster topologies.

    Pure codegen expression (an array of structs + array_max — struct
    comparison is lexicographic, hash then bucket id, and md5 ties are
    impossible); no shuffle, no UDF. n_buckets is bounded by plan
    size — for thousands of shards move the argmax into a pandas UDF.
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    scored = F.array(
        *[
            F.struct(
                F.md5(F.concat(c.cast("string"), F.lit(f":{i}"))).alias("h"),
                F.lit(i).alias("b"),
            )
            for i in range(n_buckets)
        ]
    )
    return F.array_max(scored)["b"]
