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
        if "_corrupt_record" not in schema.fieldNames():
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


def read_tar_shards(
    spark: SparkSession,
    path: str,
    key_from_name: bool = True,
) -> DataFrame:
    """Read WebDataset-style tar shards into (shard, key, member, data)
    rows — the standard multimodal-corpus layout (each sample is a
    group of same-stem members: 000123.jpg / 000123.json / 000123.txt).

    Plan shape: `binaryFile` scan distributes WHOLE shards to
    executors (one task per shard — shards are the parallelism unit,
    exactly how WebDataset loaders consume them), and a mapInPandas
    iterator expands members with stdlib tarfile — no driver hop, no
    non-stdlib codec. Pair with operators/multimodal.py decoders for
    the decode/extract stages.

    key = member stem (sample grouping key), member = extension.
    """
    import io
    import os
    import tarfile
    from collections.abc import Iterator

    import pandas as pd

    shards = spark.read.format("binaryFile").load(path)

    out_schema = "shard string, key string, member string, data binary"

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                shard = os.path.basename(row["path"])
                rows = []
                with tarfile.open(
                    fileobj=io.BytesIO(row["content"]), mode="r:*"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        stem, ext = os.path.splitext(m.name)
                        rows.append(
                            (
                                shard,
                                stem if key_from_name else m.name,
                                ext.lstrip("."),
                                tf.extractfile(m).read(),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=["shard", "key", "member", "data"]
                )

    return shards.select("path", "content").mapInPandas(
        expand, schema=out_schema
    )


def write_tar_shards(
    df: DataFrame,
    path: str,
    samples_per_shard: int = 1000,
) -> int:
    """Write (key, member, data) rows as WebDataset tar shards, one
    shard per output partition (repartitioned so each holds ~
    samples_per_shard whole samples; rows of one key hash to the same
    shard). Returns the number of shards written.

    Executors write shards directly to `path` — suitable for a shared
    filesystem; at cluster scale point this at the mounted object
    store. Not transactional (no _SUCCESS semantics) — corpus export,
    not a table format."""
    import math
    import os
    import tarfile
    from collections.abc import Iterator

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    n_samples = df.select("key").distinct().count()
    n_shards = max(1, math.ceil(n_samples / samples_per_shard))

    out_schema = "shard string, n_members long"

    def write_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        buf: dict[str, list[tuple[str, bytes]]] = {}
        for pdf in batches:
            for _, row in pdf.iterrows():
                buf.setdefault(row["key"], []).append(
                    (f"{row['key']}.{row['member']}", bytes(row["data"]))
                )
        if not buf:
            yield pd.DataFrame([], columns=["shard", "n_members"])
            return
        name = f"shard-{uuid.uuid4().hex[:12]}.tar"
        n = 0
        with tarfile.open(os.path.join(path, name), "w") as tf:
            for key in sorted(buf):
                for member_name, data in sorted(buf[key]):
                    import io as _io

                    ti = tarfile.TarInfo(member_name)
                    ti.size = len(data)
                    tf.addfile(ti, _io.BytesIO(data))
                    n += 1
        yield pd.DataFrame([(name, n)], columns=["shard", "n_members"])

    written = (
        df.repartition(n_shards, "key")
        .mapInPandas(write_shard, schema=out_schema)
        .collect()
    )
    return sum(1 for r in written if r["n_members"] > 0)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    drop_corrupt: bool = False,
    **options,
) -> DataFrame:
    """CSV twin of read_jsonl: schema-enforced, PERMISSIVE, corrupt
    lines captured in `_corrupt_record`. Defaults cover real corpus
    dumps: header, quoted multiline fields, escaped quotes."""
    opts = {
        "mode": "PERMISSIVE",
        "header": "true",
        "multiLine": "true",
        "escape": '"',
    }
    opts.update(options)
    r = spark.read.options(**opts)
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if "_corrupt_record" not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField("_corrupt_record", T.StringType(), True)]
            )
        r = r.schema(schema).option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
        out = r.csv(path)
        if drop_corrupt:
            out = out.cache()
            out = out.filter(F.col("_corrupt_record").isNull()).drop(
                "_corrupt_record"
            )
        return out
    return r.csv(path)
