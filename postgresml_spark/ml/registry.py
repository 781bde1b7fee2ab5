"""Model/project/deployment registry as warehouse tables.

Reference catalog (pgml-extension/sql/schema.sql): pgml.projects
(:49-57), pgml.snapshots (:63-75), pgml.models (:82-102),
pgml.deployments (:108-119), pgml.files (:124-135), plus the views
pgml.overview / trained_models / deployed_models (:141-207).

Spark translation: small parquet-backed tables under a warehouse dir
(one subdir per table, append = write of a one-row DataFrame; the
tables are catalog-sized, not data-sized). Model bytes (pgml.files'
BYTEA chunks) become MLlib's native model.save() directories next to
them. On a cluster the warehouse dir lives on the object store; the
deployed-model map (reference: shared memory, project.rs:78-94) is
read per job — model artifacts are loaded lazily and cached
per-process like the reference's DEPLOYED_MODELS_BY_ID (model.rs:435-448).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

_SCHEMAS = {
    "projects": "id long, name string, task string, created_at double",
    "snapshots": (
        "id long, relation string, y_column string, test_size double, "
        "sampling string, columns string, created_at double"
    ),
    "models": (
        "id long, project_id long, snapshot_id long, algorithm string, "
        "runtime string, hyperparams string, metrics string, status string, "
        "artifact_path string, created_at double"
    ),
    "deployments": "id long, project_id long, model_id long, strategy string, created_at double",
}


class Registry:
    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.warehouse = warehouse or os.environ.get(
            "PGML_SPARK_WAREHOUSE", os.path.join(os.getcwd(), ".pgml_warehouse")
        )
        os.makedirs(self.warehouse, exist_ok=True)

    # -- storage ------------------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def read(self, table: str) -> DataFrame:
        p = self._path(table)
        if not os.path.exists(p):
            return self.spark.createDataFrame([], _SCHEMAS[table])
        return self.spark.read.parquet(p)

    def _append(self, table: str, row: dict) -> None:
        df = self.spark.createDataFrame([Row(**row)], _SCHEMAS[table])
        df.write.mode("append").parquet(self._path(table))

    def _next_id(self, table: str) -> int:
        df = self.read(table)
        if df.isEmpty():
            return 1
        return df.agg(F.max("id")).head()[0] + 1

    # -- projects -----------------------------------------------------------

    def find_or_create_project(self, name: str, task: str) -> int:
        df = self.read("projects").filter(F.col("name") == name)
        row = df.head()
        if row:
            if task and row["task"] != task:
                # api.rs:163-183 — task consistency check
                raise ValueError(
                    f"project {name!r} exists with task {row['task']!r}, not {task!r}"
                )
            return row["id"]
        pid = self._next_id("projects")
        self._append(
            "projects",
            {"id": pid, "name": name, "task": task, "created_at": time.time()},
        )
        return pid

    def get_project(self, name: str) -> Row | None:
        return self.read("projects").filter(F.col("name") == name).head()

    # -- snapshots / models / deployments ------------------------------------

    def add_snapshot(self, relation: str, y_column: str, test_size: float,
                     sampling: str, columns: dict) -> int:
        sid = self._next_id("snapshots")
        self._append("snapshots", {
            "id": sid, "relation": relation, "y_column": y_column,
            "test_size": float(test_size), "sampling": sampling,
            "columns": json.dumps(columns, default=str), "created_at": time.time(),
        })
        return sid

    def add_model(self, project_id: int, snapshot_id: int, algorithm: str,
                  runtime: str, hyperparams: dict, metrics: dict,
                  artifact_path: str, model_id: int | None = None) -> int:
        mid = model_id if model_id is not None else self._next_id("models")
        self._append("models", {
            "id": mid, "project_id": project_id, "snapshot_id": snapshot_id,
            "algorithm": algorithm, "runtime": runtime,
            "hyperparams": json.dumps(hyperparams), "metrics": json.dumps(metrics),
            "status": "successful", "artifact_path": artifact_path,
            "created_at": time.time(),
        })
        return mid

    def add_deployment(self, project_id: int, model_id: int, strategy: str) -> int:
        did = self._next_id("deployments")
        self._append("deployments", {
            "id": did, "project_id": project_id, "model_id": model_id,
            "strategy": strategy, "created_at": time.time(),
        })
        # invalidate the hot-path deployment map (shared-memory update in
        # the reference, project.rs:152-165)
        from postgresml_spark.ml.predict import invalidate_deployment_cache

        invalidate_deployment_cache(self.warehouse)
        return did

    def deployed_model_id(self, project_name: str) -> int | None:
        """Latest deployment for the project (schema.sql:199-205 view)."""
        proj = self.get_project(project_name)
        if proj is None:
            return None
        row = (
            self.read("deployments")
            .filter(F.col("project_id") == proj["id"])
            .orderBy(F.col("id").desc())
            .head()
        )
        return row["model_id"] if row else None

    def model_row(self, model_id: int) -> Row | None:
        return self.read("models").filter(F.col("id") == model_id).head()

    def model_metric(self, model_id: int, metric: str) -> float | None:
        row = self.model_row(model_id)
        if row is None:
            return None
        return json.loads(row["metrics"]).get(metric)

    # -- views (schema.sql:141-207) ------------------------------------------

    def overview(self) -> DataFrame:
        p, m, d = self.read("projects"), self.read("models"), self.read("deployments")
        latest = (
            d.groupBy("project_id").agg(F.max("id").alias("deployment_id"))
            .join(d.select(F.col("id").alias("deployment_id"), "model_id"), "deployment_id")
        )
        return (
            p.select(F.col("id").alias("project_id"), "name", "task")
            .join(latest, "project_id", "left")
            .join(
                m.select(F.col("id").alias("model_id"), "algorithm", "metrics"),
                "model_id",
                "left",
            )
        )

    def artifact_dir(self, model_id: int) -> str:
        return os.path.join(self.warehouse, "artifacts", f"model_{model_id}")

    # -- dump/load (pgml.dump_all / load_all, api.rs:1028-1074) ---------------

    def dump_all(self, path: str) -> list[str]:
        """COPY catalog tables to CSV under `path`."""
        out = []
        os.makedirs(path, exist_ok=True)
        for t in _SCHEMAS:
            df = self.read(t)
            dst = os.path.join(path, t)
            df.coalesce(1).write.mode("overwrite").option("header", True).csv(dst)
            out.append(dst)
        return out

    def load_all(self, path: str) -> dict[str, int]:
        """Restore catalog tables from a dump_all directory."""
        counts = {}
        for t, schema in _SCHEMAS.items():
            src = os.path.join(path, t)
            if not os.path.exists(src):
                continue
            df = self.spark.read.schema(schema).option("header", True).csv(src)
            df.write.mode("overwrite").parquet(self._path(t))
            counts[t] = df.count()
        return counts
