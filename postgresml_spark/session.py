"""SparkSession factory + testdata table loading.

Scale notes: these configs are tuned so the same plans that pass the
sf0.01 correctness gate survive a 1000-executor / 100 TB deployment —
AQE for runtime re-planning (partition coalescing, skew-join splitting),
broadcast threshold for dimension tables, and Arrow for every
Python-boundary crossing. `shuffle_partitions` defaults to the local
core count; on a real cluster it should be ~2-3x total executor cores
(or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always broadcast-join candidates at any SF.
DIM_TABLES = ("region", "nation", "supplier", "customer", "part")


def get_spark(
    app_name: str = "postgresml_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # advisory partition size: the guide §9 batch-ETL baseline —
        # at 100 TB it sizes post-shuffle reducers into the §2.2
        # 100 MB-1 GB band. parallelismFirst stays at its DEFAULT
        # (true): an r10 experiment set it to false so tiny shuffles
        # coalesce to the advisory, and the measured result was a
        # REGRESSION — at sf0.1 many reducers are compute-bound, not
        # byte-bound (sketch merges, stat aggregations, similarity
        # scoring), and coalescing them to 1 partition serializes the
        # work: warm A/B q196 3.61->6.04 s, q212 2.16->2.91 s,
        # q210 0.69->0.90 s, q203 8.59->13.24 s (OPTIMIZATION_r10.md).
        # With parallelismFirst=true the advisory only governs once
        # bytes/cores exceed it — exactly the data-dominated regime
        # it is meant for.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # bounded collects (detection limits, top-k takes) scan 1
        # partition first by default and re-launch with 4x more until
        # the limit fills — 2-3 scheduling round-trips per serve-path
        # collect. Start at the session's parallelism: one job, all
        # local. Capped at 64 (VERDICT r9 next #6): on a 2000-core
        # cluster an uncapped executeTake would scan 2000 partitions
        # up front for a limit(10) — the inverse waste of the 1->4x
        # relaunch ladder it removes; 64 keeps the common bounded
        # collect a single round-trip without a cluster-wide scan.
        .config("spark.sql.limit.initialNumPartitions", str(min(cpus, 64)))
        .config("spark.ui.enabled", "false")
        # testdata events.parquet stores TIMESTAMP(NANOS) which the Spark
        # reader rejects; read as long and convert (see load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Silence WindowExec's no-partition warning ONLY: every remaining
    # global window in this engine runs over a provably bounded frame
    # (top-N result lists, aggregated time axes ≤ |distinct keys|) —
    # the corpus-sized cases were restructured (see preprocess/snapshot
    # train_test_split). Class-targeted so genuine new offenders in
    # user code still surface at WARN via their own loggers.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments: keep the warning
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan, pushdown-capable).

    Nanosecond-timestamp columns (events.ts) arrive as long (ns since
    epoch) under nanosAsLong and are converted to microsecond
    timestamps — the same truncation DuckDB applies.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        # Runtime-settable SQL conf — required even when the caller's
        # session (e.g. the verify driver's) wasn't built by get_spark.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all testdata tables and register them as temp views."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs
