"""JSONL corpus interchange — the standard LLM-training-data format.

The reference ingests documents from files and HuggingFace datasets
(pgml-extension/src/api.rs:561-587, pgml-sdks collection.rs:1413-1502);
a Spark-native pipeline additionally needs bulk corpus import/export in
newline-delimited JSON: sharded, compressed, schema-enforced, with
explicit handling of corrupt lines (web-scraped corpora always have
some).

Design notes for 100 TB:
- `write_jsonl` shards by `maxRecordsPerFile` (bounds file size without
  repartitioning) and compresses per file — the layout every tokenizer/
  loader fleet expects. Writers never funnel through the driver.
- `read_jsonl` REQUIRES an explicit schema in strict pipelines:
  schema inference is a full extra pass over 100 TB and type-flaps on
  dirty data. PERMISSIVE mode captures undecodable lines in
  `_corrupt_record` instead of failing the job; `drop_corrupt=True`
  filters them out after counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    compression: str = "gzip",
) -> None:
    """Export a DataFrame as sharded (optionally gzipped) JSONL."""
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    drop_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with an explicit schema (inference only when schema
    is None — acceptable for exploration, not pipelines). With a
    schema, undecodable lines land in `_corrupt_record` (PERMISSIVE);
    `drop_corrupt` removes them (and the column) after the fact.
    """
    r = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if drop_corrupt or "_corrupt_record" not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField("_corrupt_record", T.StringType(), True)]
            )
        r = r.schema(schema).option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
        out = r.json(path)
        if drop_corrupt:
            # Spark disallows plans whose scan references ONLY the
            # internal corrupt column (e.g. a count() after this
            # filter); caching first is the documented workaround.
            out = out.cache()
            out = out.filter(F.col("_corrupt_record").isNull()).drop(
                "_corrupt_record"
            )
        return out
    return r.json(path)


def corrupt_line_count(df: DataFrame) -> int:
    """Count lines captured as corrupt by a schema-enforced read."""
    if "_corrupt_record" not in df.columns:
        return 0
    # Spark requires caching before filtering on _corrupt_record alone
    df = df.cache()
    try:
        return df.filter(F.col("_corrupt_record").isNotNull()).count()
    finally:
        df.unpersist()
