"""Mergeable data sketches, engine-portable by construction.

PostgresML ships on Postgres, whose analytics ecosystem leans on
sketches for cardinality / frequency / quantile estimation at scale
(HLL via the `hll` extension postgres ecosystem, CMS/quantiles via
`datasketches`).  Spark has built-ins for two of the three
(approx_count_distinct = HLL++, percentile_approx = GK-ish), but their
register/centroid layouts are implementation-defined, so results can
never be oracle-compared across engines — and their sketch STATE can't
be persisted and merged by other systems.  These implementations trade
a little constant-factor speed for determinism: every hash is an
md5-derived integer and every estimator is closed-form arithmetic, so
DuckDB (and Postgres) can re-derive the identical sketch from the same
rows.  That is what makes them oracle-gateable — and what makes the
sketch state itself portable between engines.

Scale posture (the 100 TB question):

- **HLL**: the register table is `groups × m` rows regardless of input
  size; building it is one map-side-combinable groupBy.  Merging two
  epochs' sketches is `UNION ALL → max(reg)` — never re-scan history.
- **Count-Min**: the sketch is `d × w` counters per group; building it
  is linear and map-side combinable (sums are associative).  Merge =
  cell-wise sum.  Point estimates join probes against `d` cells each.
- **Bottom-k sample**: per group keep the k rows with the smallest
  content-keyed hash — a uniform sample that is REPRODUCIBLE across
  partitionings and engines (same trick as Efraimidis–Spirakis
  weighted sampling in corpus.py).  Merge = union → re-take bottom-k.
  Quantiles read off the sample are mergeable quantile estimates with
  standard bottom-k error bounds.

References: Flajolet et al. 2007 (HyperLogLog), Cormode & Muthukrishnan
2005 (Count-Min), Schleimer et al. 2003 §4 cites min-hash sampling.
Reference parity: pgml has no first-class sketch SQL, but its
snapshot/statistics layer (pgml-extension/src/orm/snapshot.rs ventile
stats) is the same "summarize a column you cannot hold" need; these
generalize it to mergeable, engine-portable form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "md5_long",
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "cm_sketch",
    "cm_merge",
    "cm_lookup",
    "bottomk_sample",
]


def md5_long(col: Column, start: int = 1, length: int = 15) -> Column:
    """Deterministic 60-bit-max integer from an md5 hex slice.

    15 hex chars = 60 bits < 2^63, so the conv() result is an exact
    BIGINT in every engine (DuckDB idiom:
    ``CAST(('0x' || substr(md5(x), start, len)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), m=64 registers, engine-portable.
# ---------------------------------------------------------------------------

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}  # α_m below the 128+ formula


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """The HLL register table: one row per (group, bucket) with the max
    rank (position of the first 1-bit of a 60-bit hash, 1-based).

    This IS the sketch state — at most ``groups × m`` rows whatever the
    input size, built by one map-side-combinable max-aggregate.  Bucket
    comes from the first 2 hex chars of md5 (8 bits) mod m; rank from
    the next 15 hex chars (60 bits): rank = 61 - bit_length(h2), i.e.
    the number of leading zeros in the 60-bit field plus one.  Both
    pieces are portable integer arithmetic (``bin()`` exists in Spark
    and DuckDB and both strip leading zeros)."""
    h = F.md5(F.col(value_col).cast("string"))
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m).alias(
        "bucket"
    )
    h2 = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rank = F.when(h2 == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(h2))
    )
    return (
        df.select(*group_cols, bucket, rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables (e.g. per-epoch sketches UNION ALLed, or a
    re-grouping that coarsens group_cols): register-wise max."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    regs: DataFrame, group_cols: list[str], m: int = 64
) -> DataFrame:
    """Closed-form HLL estimate from a register table, with the
    small-range linear-counting correction (E ≤ 2.5m and empty
    registers exist → m·ln(m/V)).  Empty registers contribute
    2^0 = 1 to the denominator, accounted via (m - nonzero).  The
    estimate is rounded to 1 dp so sub-ulp float-sum ordering
    differences between engines vanish."""
    alpha = _HLL_ALPHA[m]
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("reg"))).alias("denom"),
        F.count("*").alias("nonzero"),
    )
    raw = F.lit(alpha * m * m) / (F.col("denom") + (m - F.col("nonzero")))
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / (m - F.col("nonzero")))
    est = F.when((raw <= 2.5 * m) & (F.col("nonzero") < m), lin).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 1).alias("hll_estimate"))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005), d rows × w columns.
# ---------------------------------------------------------------------------


def _cm_bucket(key: Column, j: int, w: int) -> Column:
    """Row-j bucket for a key: md5 of the row-salted key, mod w."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}-"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cm_sketch(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Build the d×w Count-Min counter table from keyed counts.

    CM is linear, so building from pre-aggregated (key, count) rows is
    identical to hashing raw rows — and moves |keys|×d rows instead of
    |rows|×d.  Output: (j, bucket, cell) with exactly d×w rows max.
    Merge of two sketches = UNION ALL → sum(cell)."""
    key = F.col(key_col)
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_bucket(key, j, w).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("rb"),
        F.col(count_col).alias("cnt"),
    )
    return (
        rows.select("rb.j", "rb.bucket", "cnt")
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )


def cm_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    d: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """Merge CM sketch tables (per-epoch sketches UNION ALLed):
    cell-wise sum — CM is linear, so merge(e1, e2) ≡ rebuild(e1 ∪ e2)
    exactly, never approximately.  ``group_cols`` carries any extra
    grouping (e.g. a tenant column persisted alongside the sketch).

    Summing cells only makes sense when every input sketch was built
    with the SAME (d, w, hash) config — a silent union of mismatched
    widths produces a garbage sketch that cm_lookup happily probes.
    Pass the intended ``d``/``w`` and the merge plan embeds an
    assert_true bounds guard (any row with j >= d or bucket >= w —
    i.e. a sketch built wider/deeper than declared — fails the job at
    evaluation time, no extra action).  Config identity beyond the
    bounds check (e.g. two sketches both narrower than declared)
    remains the persister's contract: store d/w next to the sketch
    epoch and pass them here."""
    if d is not None or w is not None:
        ok = F.lit(True)
        if d is not None:
            ok = ok & (F.col("j") >= 0) & (F.col("j") < int(d))
        if w is not None:
            ok = ok & (F.col("bucket") >= 0) & (F.col("bucket") < int(w))
        sketches = sketches.filter(
            F.assert_true(
                ok,
                F.concat(
                    F.lit("cm_merge: sketch row (j="),
                    F.col("j").cast("string"),
                    F.lit(", bucket="),
                    F.col("bucket").cast("string"),
                    F.lit(f") outside declared config d={d}, w={w} — "
                          "inputs were built with a different CM config"),
                ),
            ).isNull()
        )
    keys = (group_cols or []) + ["j", "bucket"]
    return sketches.groupBy(*keys).agg(F.sum("cell").alias("cell"))


def cm_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-estimate probe keys against a CM sketch: min over the d
    salted-hash cells.  The estimate never undercounts (cells only ever
    add).  Broadcasts the sketch — it is ≤ d×w rows by construction.

    Absent cells count as ZERO: a probe key hashing into a bucket the
    build data never touched has a true count of 0 in that row, so the
    join is a LEFT join with coalesce(cell, 0) — an inner join would
    either drop the probe (all d cells empty) or overestimate (min over
    only the present cells)."""
    key = F.col(key_col)
    exploded = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_bucket(key, j, w).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("rb"),
    ).select("*", "rb.j", "rb.bucket")
    keep = [c for c in probes.columns]
    return (
        exploded.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# Bottom-k content-keyed uniform sample → mergeable quantile sketch.
# ---------------------------------------------------------------------------


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    id_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per group, the k rows with the smallest md5 hash of the row id —
    a uniform sample that is deterministic across engines AND
    partitionings (the hash depends only on row content).  Merge of two
    epochs = union → re-take bottom-k.  Quantiles computed on the
    sample are the classic bottom-k quantile estimate.

    Scale: two-stage winnow.  Stage 1 takes the bottom-k within
    (group, input-partition) — partition-bounded sorts, never a
    group-wide one (with few groups, e.g. 3 return flags over 100 TB, a
    single-stage per-group row_number would sort a third of the corpus
    in one partition).  Stage 2 re-takes the bottom-k of the ≤
    k × partitions survivors.  The global k smallest each survive their
    local cut, so the result is EXACTLY the single-stage bottom-k —
    independent of partition assignment, since selection keys are
    content hashes.

    Determinism precondition: id_cols should uniquely identify rows.
    If they don't, exact duplicate ids share one __prio; both window
    orderings break ties on the id columns themselves, so the SET of
    selected (group, id) values is still partition-invariant — but
    which physical row of an exact-duplicate pair survives is
    arbitrary (they are indistinguishable by id, so any non-id payload
    columns may differ between runs)."""
    from pyspark.sql import Window

    prio = md5_long(
        F.concat_ws("-", *[F.col(c).cast("string") for c in id_cols])
    ).alias("__prio")
    staged = df.select("*", prio).withColumn(
        "__pid", F.spark_partition_id()
    )
    ties = [F.col(c) for c in id_cols]
    w1 = Window.partitionBy(*group_cols, "__pid").orderBy("__prio", *ties)
    local = (
        staged.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__pid")
    )
    w2 = (
        Window.partitionBy(*group_cols).orderBy("__prio", *ties)
        if group_cols
        else Window.orderBy("__prio", *ties)
    )
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__prio")
    )
