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

__all__ = ["gapfill_locf"]


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    value_col: str,
    start: str,
    end: str,
    bucket: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Dense per-``group_col`` series of ``trunc_unit`` buckets from
    ``start`` to ``end`` inclusive: (group, bucket_ts, n, value_avg,
    value_locf, filled) where missing buckets get n=0, value_avg=NULL,
    value_locf = last non-null bucket average carried forward (NULL
    until a group's first observation), filled=true.
    """
    agg = (
        df.withColumn("__b", F.date_trunc(trunc_unit, F.col(ts_col)))
        .groupBy(group_col, "__b")
        .agg(
            F.count("*").alias("__n"),
            F.avg(F.col(value_col)).alias("__avg"),
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
