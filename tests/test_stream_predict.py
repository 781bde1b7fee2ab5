"""Continuous inference on a stream with the deployed model.

The distinctive contract (reference: shared-memory deployment map,
project.rs:78-165): a `pgml.deploy` between micro-batches takes effect
on the NEXT batch without restarting the streaming query.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgresml_spark.ml.deploy import deploy
from postgresml_spark.ml.predict import predict
from postgresml_spark.ml.registry import Registry
from postgresml_spark.ml.train import train
from postgresml_spark.streaming.streams import stream_predict


def _mk_training(spark, slope: float):
    rows = [(float(i), slope * i + 0.0) for i in range(100)]
    return spark.createDataFrame(rows, "x double, y double")


@pytest.fixture()
def registry(spark, tmp_path):
    return Registry(spark, warehouse=str(tmp_path / "wh"))


def test_stream_predict_and_live_deploy_swap(spark, tmp_path, registry):
    # model A: y = 2x; model B: y = -3x (distinguishable by sign)
    a = train(
        spark, "StreamPred", "regression", _mk_training(spark, 2.0), "y",
        algorithm="linear", test_sampling="random", registry=registry,
    )
    b = train(
        spark, "StreamPred", "regression", _mk_training(spark, -3.0), "y",
        algorithm="linear", test_sampling="random", registry=registry,
    )
    deploy(spark, "StreamPred", strategy="specific",
           model_id=a["model_id"], registry=registry)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    batch1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "row_id long, x double")
    batch1.write.mode("append").parquet(src)

    stream = spark.readStream.schema("row_id long, x double").parquet(src)
    q = stream_predict(stream, "StreamPred", out, ckpt, registry=registry)
    try:
        q.processAllAvailable()
        got1 = {r["row_id"]: r["prediction"] for r in spark.read.parquet(out).collect()}
        assert got1[1] == pytest.approx(20.0, abs=1e-6)
        assert got1[2] == pytest.approx(40.0, abs=1e-6)

        # swap the live model between micro-batches — no query restart
        deploy(spark, "StreamPred", strategy="specific",
               model_id=b["model_id"], registry=registry)
        batch2 = spark.createDataFrame([(3, 10.0)], "row_id long, x double")
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = {r["row_id"]: r["prediction"] for r in spark.read.parquet(out).collect()}
        assert got2[3] == pytest.approx(-30.0, abs=1e-6)
        # earlier rows keep model A's predictions (append-only sink)
        assert got2[1] == pytest.approx(20.0, abs=1e-6)
    finally:
        q.stop()

    # streaming output matches batch predict under the same deployment
    batch_pred = {
        r["row_id"]: r["prediction"]
        for r in predict(
            spark, "StreamPred",
            spark.createDataFrame([(3, 10.0)], "row_id long, x double"),
            registry=registry,
        ).collect()
    }
    assert batch_pred[3] == pytest.approx(got2[3], abs=1e-9)
