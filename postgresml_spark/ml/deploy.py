"""pgml.deploy: change the live model for a project.

Strategies (api.rs:332-437; orm/strategy.rs:6-13): new_score (only via
train's auto-deploy), best_score, most_recent, rollback, specific.
Metric direction per task from task.rs:91-103 (TASK_METRIC).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from postgresml_spark.ml.algorithms import TASK_METRIC
from postgresml_spark.ml.registry import Registry


def deploy(
    spark: SparkSession,
    project: str,
    strategy: str = "best_score",
    algorithm: str | None = None,
    model_id: int | None = None,
    registry: Registry | None = None,
) -> dict:
    registry = registry or Registry(spark)
    proj = registry.get_project(project)
    if proj is None:
        raise ValueError(f"unknown project {project!r}")
    models = registry.read("models").filter(F.col("project_id") == proj["id"])
    if algorithm:
        models = models.filter(F.col("algorithm") == algorithm)

    if strategy == "specific":
        if model_id is None:
            raise ValueError("strategy='specific' requires model_id")
        chosen = model_id
    elif strategy == "most_recent":
        row = models.orderBy(F.col("id").desc()).head()
        if row is None:
            raise ValueError("no models to deploy")
        chosen = row["id"]
    elif strategy == "rollback":
        deps = (
            registry.read("deployments")
            .filter(F.col("project_id") == proj["id"])
            .orderBy(F.col("id").desc())
            .head(2)
        )
        if len(deps) < 2:
            raise ValueError("no previous deployment to roll back to")
        chosen = deps[1]["model_id"]
    elif strategy == "best_score":
        metric, higher = TASK_METRIC[proj["task"]]
        rows = models.collect()
        if not rows:
            raise ValueError("no models to deploy")
        scored = [(json.loads(r["metrics"]).get(metric), r["id"]) for r in rows]
        scored = [(s, i) for s, i in scored if s is not None]
        chosen = (max if higher else min)(scored)[1]
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    registry.add_deployment(proj["id"], chosen, strategy)
    return {"project": project, "strategy": strategy, "model_id": chosen}
