"""Time-series gap-filling (TimescaleDB ``time_bucket_gapfill`` +
``locf()`` analog, beyond the reference's surface).

The reference leans on Postgres for time handling; a metrics/feature
pipeline over event streams additionally needs dense, regularly
spaced series — ML feature windows and monitoring rollups both break
on missing buckets. ``gapfill_locf`` turns a sparse per-group bucket
aggregate into a dense one: absent buckets appear with count 0 and the
last observed value carried forward.

Scale shape: the scaffold is |groups| × |buckets| rows built from a
distinct-groups frame crossJoined with one broadcast exploded
``sequence()`` literal — no data shuffle builds it; the actual
aggregate left-joins onto it (one shuffle on (group, bucket)); LOCF is
a per-group ordered window (partitioned — never global).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_locf", "asof_join"]


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    value_col: str,
    start: str,
    end: str,
    bucket: str = "1 hour",
    trunc_unit: str = "hour",
    exact_avg: bool = False,
) -> DataFrame:
    """Dense per-``group_col`` series of ``trunc_unit`` buckets from
    ``start`` to ``end`` inclusive: (group, bucket_ts, n, value_avg,
    value_locf, filled) where missing buckets get n=0, value_avg=NULL,
    value_locf = last non-null bucket average carried forward (NULL
    until a group's first observation), filled=true.

    ``exact_avg`` computes the bucket average as an exact decimal(18,4)
    sum divided ONCE in float64 — float avg accumulates in partition
    order, so at large row-per-bucket counts two engines legitimately
    disagree in the last ulp and a downstream round() at a .5 boundary
    diverges (caught by the sf1 sweep); the decimal sum makes the
    average a deterministic function of the SET of values.
    """
    avg_expr = (
        (
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            / F.count("*")
        )
        if exact_avg
        else F.avg(F.col(value_col))
    )
    agg = (
        df.withColumn("__b", F.date_trunc(trunc_unit, F.col(ts_col)))
        .groupBy(group_col, "__b")
        .agg(
            F.count("*").alias("__n"),
            avg_expr.alias("__avg"),
        )
    )
    # match the scaffold's timestamp flavor to the input column's
    # (an LTZ scaffold joined to an NTZ aggregate would need casts and
    # silently depend on the session zone)
    from pyspark.sql import types as T

    tname = (
        "timestamp_ntz"
        if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType)
        else "timestamp"
    )
    buckets = F.explode(
        F.sequence(
            F.lit(start).cast(tname),
            F.lit(end).cast(tname),
            F.expr(f"INTERVAL {bucket}"),
        )
    ).alias("__b")
    scaffold = df.select(group_col).distinct().select(group_col, buckets)
    w = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scaffold.join(agg, [group_col, "__b"], "left")
        .select(
            group_col,
            F.col("__b").alias("bucket_ts"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n"),
            F.col("__avg").alias("value_avg"),
            F.last("__avg", ignorenulls=True).over(w).alias("value_locf"),
            F.col("__n").isNull().alias("filled"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the single right row per key that
    is nearest in ``on`` — ``backward`` (latest right ≤ left, the
    kdb/pandas default and the q35 inline pattern), ``forward``
    (earliest right ≥ left), or ``nearest`` (closer of the two; exact
    ties resolve backward). ``tolerance`` voids matches farther than an
    interval string ('30 minutes') for time columns or a number for
    numeric ones — the pandas ``merge_asof`` surface, built scale-first.

    Output: every left row (all columns) plus ``{on}{suffix}`` (the
    matched right time, NULL when unmatched/out-of-tolerance) and each
    value column as ``{c}{suffix}``.

    Plan shape: union the two sides, ONE hash exchange on ``by``, and
    per-key sorted window passes — never a range-explosion join, never
    a global sort. ``nearest`` needs both scan directions; the two
    windows share the exchange (same partitioning) and differ only in
    sort, so the cost is one extra per-partition sort, not a shuffle.

    Right rows should be unique per (by, on): equal-time right rows
    sort by their payload struct, so results stay deterministic, but
    which duplicate wins is a struct-order artifact — dedupe upstream
    (e.g. min id per key/time) when it matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    rvals = value_cols or [c for c in right.columns if c not in (*by, on)]

    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rpay = F.struct(
        F.col(on).alias("__rt"), *[F.col(c) for c in rvals]
    ).alias("__r")
    # each side carries the other's payload as a typed null so the
    # union lines up
    ltype = left.select(lpay).schema["__l"].dataType
    rtype = right.select(rpay).schema["__r"].dataType
    lpart = left.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(by)],
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        lpay,
        F.lit(None).cast(rtype).alias("__rp"),
    )
    rpart = right.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(by)],
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(ltype).alias("__l"),
        rpay.alias("__rp"),
    )
    u = lpart.unionByName(rpart)

    keys = [F.col(f"__k{i}") for i in range(len(by))]
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]

    def _pick(matched: Column) -> list[Column]:
        t_r = matched["__rt"]
        if tolerance is not None:
            if isinstance(tolerance, (int, float)):
                dist = F.abs(F.col("__t") - t_r)
                ok = dist <= F.lit(float(tolerance))
            else:
                dist = F.when(t_r <= F.col("__t"), F.col("__t") - t_r).otherwise(
                    t_r - F.col("__t")
                )
                ok = dist <= F.expr(f"INTERVAL {tolerance}")
            matched = F.when(ok, matched)
            t_r = matched["__rt"]
        return [t_r.alias(f"{on}{suffix}")] + [
            matched[c].alias(f"{c}{suffix}") for c in rvals
        ]

    if direction in ("backward", "forward"):
        if direction == "backward":
            # right rows sort BEFORE left at equal __t → `<=` semantics
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rp").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            matched = F.last("__rp", ignorenulls=True).over(w)
        else:
            # left rows sort BEFORE right at equal __t → `>=` semantics
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col("__t").asc(), F.col("__is_left").desc(), F.col("__rp").asc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            matched = F.first("__rp", ignorenulls=True).over(w)
        return (
            u.withColumn("__m", matched)
            .filter(F.col("__is_left") == 1)
            .select(*out_cols, *_pick(F.col("__m")))
        )

    # nearest: both scans over the SAME partitioning (exchange reuse)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_left").desc(), F.col("__rp").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    two = (
        u.withColumn("__b", F.last("__rp", ignorenulls=True).over(wb))
        .withColumn("__f", F.first("__rp", ignorenulls=True).over(wf))
        .filter(F.col("__is_left") == 1)
    )
    bt, ft = F.col("__b.__rt"), F.col("__f.__rt")
    use_b = (
        F.col("__f").isNull()
        | (
            F.col("__b").isNotNull()
            & ((F.col("__t") - bt) <= (ft - F.col("__t")))
        )
    )
    chosen = F.when(use_b, F.col("__b")).otherwise(F.col("__f"))
    return two.select(*out_cols, *_pick(chosen))
