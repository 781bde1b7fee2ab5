"""Versioned parquet tables with merge/delete (Delta-less MERGE emulation).

The reference mutates Postgres tables in place (MERGE-style upserts,
queries.rs:146-169). Without Delta jars in this image, each logical
table is a directory of immutable parquet versions plus a `_current`
pointer file; writers materialize the new state to `v_<n+1>` and flip
the pointer (write-ahead, last-writer-wins — the same pattern Delta's
transaction log formalizes). Readers always see a complete version.
At cluster scale the pointer flip would live in a real table format
(Delta/Iceberg); every caller goes through this module, so swapping
the backend is one file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str, schema: str):
        self.spark = spark
        self.path = path
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def _current_version(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def exists(self) -> bool:
        return self._current_version() > 0

    def read(self) -> DataFrame:
        v = self._current_version()
        if v == 0:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(os.path.join(self.path, f"v_{v}"))

    def overwrite(self, df: DataFrame, keep_versions: int = 2) -> None:
        v = self._current_version() + 1
        out = os.path.join(self.path, f"v_{v}")
        df.write.mode("overwrite").parquet(out)
        with open(self._pointer(), "w") as f:
            f.write(str(v))
        self.vacuum(keep_versions)

    def vacuum(self, keep_versions: int = 2) -> None:
        """Drop versions older than the newest `keep_versions` (storage
        hygiene — at 100 TB stale versions are real money; keeping one
        prior version preserves reader-in-flight safety for this
        single-writer design)."""
        import shutil

        cur = self._current_version()
        for name in os.listdir(self.path):
            if name.startswith("v_"):
                try:
                    ver = int(name[2:])
                except ValueError:
                    continue
                if ver <= cur - keep_versions:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def append(self, df: DataFrame) -> None:
        cur = self.read()
        self.overwrite(cur.unionByName(df, allowMissingColumns=True))

    def drop(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
