"""sklearn runtime for the long-tail algorithm matrix.

Reference dispatch (pgml-extension/src/orm/model.rs:450-555) sends the
30-regressor / 19-classifier / 7-clusterer long tail to sklearn
IN-PROCESS on the Postgres server — single-node fit is the reference's
own contract, not a Spark concession. The Spark-faithful shape is
therefore: fit collects the train partition's (features, label) to the
driver once and fits the real sklearn estimator there, while batch
inference stays DISTRIBUTED — the fitted model is serialized with
cloudpickle, broadcast, and applied through an Arrow-batched pandas
UDF (one deserialization per python worker, vectorized predict per
batch). `predict_one` serves from the driver-cached model without a
Spark job, same as the MLlib path.

Import-gated: this container has no sklearn (`sklearn_available()` is
False), so `make_estimator` falls back to the documented MLlib analogs
(`runtime=fallback`). When sklearn IS importable the same call returns
(`SkEstimator`, "sklearn") and the whole lifecycle — dispatch, fit,
transform, predict_proba, artifact save/load, registry metric flow —
runs through this module; a faked-module seam test pins that path so
only the genuine library call is unexercised (mirror of tune.py's
faked-torch test).

Hyperparameters pass through to the sklearn constructor VERBATIM (the
reference forwards its JSONB hyperparams unmodified, model.rs:450-470)
— no MLlib param aliasing on this runtime.
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints must resolve

from postgresml_spark.ml.algorithms import (
    TASK_CLASSIFICATION,
    TASK_CLUSTERING,
    TASK_REGRESSION,
)

# reference algorithm name -> sklearn (module, class), per task
# (algorithm.rs:6-52 names; model.rs:473-555 class table)
SK_TABLE: dict[tuple[str, str], tuple[str, str]] = {
    # regression long tail
    (TASK_REGRESSION, "extra_trees"): ("sklearn.ensemble", "ExtraTreesRegressor"),
    (TASK_REGRESSION, "bagging"): ("sklearn.ensemble", "BaggingRegressor"),
    (TASK_REGRESSION, "ada_boost"): ("sklearn.ensemble", "AdaBoostRegressor"),
    (TASK_REGRESSION, "hist_gradient_boosting"): (
        "sklearn.ensemble", "HistGradientBoostingRegressor",
    ),
    (TASK_REGRESSION, "stochastic_gradient_descent"): (
        "sklearn.linear_model", "SGDRegressor",
    ),
    (TASK_REGRESSION, "bayesian_ridge"): ("sklearn.linear_model", "BayesianRidge"),
    (TASK_REGRESSION, "kernel_ridge"): ("sklearn.kernel_ridge", "KernelRidge"),
    (TASK_REGRESSION, "least_angle"): ("sklearn.linear_model", "Lars"),
    (TASK_REGRESSION, "lasso_least_angle"): ("sklearn.linear_model", "LassoLars"),
    (TASK_REGRESSION, "orthogonal_matching_pursuit"): (
        "sklearn.linear_model", "OrthogonalMatchingPursuit",
    ),
    (TASK_REGRESSION, "automatic_relevance_determination"): (
        "sklearn.linear_model", "ARDRegression",
    ),
    (TASK_REGRESSION, "passive_aggressive"): (
        "sklearn.linear_model", "PassiveAggressiveRegressor",
    ),
    (TASK_REGRESSION, "ransac"): ("sklearn.linear_model", "RANSACRegressor"),
    (TASK_REGRESSION, "theil_sen"): ("sklearn.linear_model", "TheilSenRegressor"),
    (TASK_REGRESSION, "quantile"): ("sklearn.linear_model", "QuantileRegressor"),
    (TASK_REGRESSION, "svm"): ("sklearn.svm", "SVR"),
    (TASK_REGRESSION, "nu_svm"): ("sklearn.svm", "NuSVR"),
    (TASK_REGRESSION, "gaussian_process"): (
        "sklearn.gaussian_process", "GaussianProcessRegressor",
    ),
    # classification long tail
    (TASK_CLASSIFICATION, "extra_trees"): (
        "sklearn.ensemble", "ExtraTreesClassifier",
    ),
    (TASK_CLASSIFICATION, "bagging"): ("sklearn.ensemble", "BaggingClassifier"),
    (TASK_CLASSIFICATION, "ada_boost"): ("sklearn.ensemble", "AdaBoostClassifier"),
    (TASK_CLASSIFICATION, "hist_gradient_boosting"): (
        "sklearn.ensemble", "HistGradientBoostingClassifier",
    ),
    (TASK_CLASSIFICATION, "stochastic_gradient_descent"): (
        "sklearn.linear_model", "SGDClassifier",
    ),
    (TASK_CLASSIFICATION, "perceptron"): ("sklearn.linear_model", "Perceptron"),
    (TASK_CLASSIFICATION, "passive_aggressive"): (
        "sklearn.linear_model", "PassiveAggressiveClassifier",
    ),
    (TASK_CLASSIFICATION, "ridge"): ("sklearn.linear_model", "RidgeClassifier"),
    (TASK_CLASSIFICATION, "svm"): ("sklearn.svm", "SVC"),
    (TASK_CLASSIFICATION, "nu_svm"): ("sklearn.svm", "NuSVC"),
    (TASK_CLASSIFICATION, "gaussian_process"): (
        "sklearn.gaussian_process", "GaussianProcessClassifier",
    ),
    # clustering long tail
    (TASK_CLUSTERING, "dbscan"): ("sklearn.cluster", "DBSCAN"),
    (TASK_CLUSTERING, "optics"): ("sklearn.cluster", "OPTICS"),
    (TASK_CLUSTERING, "spectral"): ("sklearn.cluster", "SpectralClustering"),
    (TASK_CLUSTERING, "affinity_propagation"): (
        "sklearn.cluster", "AffinityPropagation",
    ),
    (TASK_CLUSTERING, "mean_shift"): ("sklearn.cluster", "MeanShift"),
    # boosted-tree runtimes: the reference dispatches these to their
    # OWN libraries (model.rs:450-470 Runtime::{xgboost,lightgbm}),
    # all of which expose the sklearn estimator API (fit/predict/
    # predict_proba), so the whole SkEstimator/SkModel lifecycle —
    # driver fit, broadcast + Arrow-batched distributed transform,
    # artifact pickle — serves them unchanged; only the availability
    # gate is per-library
    (TASK_REGRESSION, "xgboost"): ("xgboost", "XGBRegressor"),
    (TASK_REGRESSION, "xgboost_random_forest"): ("xgboost", "XGBRFRegressor"),
    (TASK_REGRESSION, "lightgbm"): ("lightgbm", "LGBMRegressor"),
    (TASK_REGRESSION, "catboost"): ("catboost", "CatBoostRegressor"),
    (TASK_CLASSIFICATION, "xgboost"): ("xgboost", "XGBClassifier"),
    (TASK_CLASSIFICATION, "xgboost_random_forest"): (
        "xgboost", "XGBRFClassifier",
    ),
    (TASK_CLASSIFICATION, "lightgbm"): ("lightgbm", "LGBMClassifier"),
    (TASK_CLASSIFICATION, "catboost"): ("catboost", "CatBoostClassifier"),
}


def _root_module(task: str, algorithm: str) -> str:
    return SK_TABLE[(task, algorithm)][0].split(".")[0]


def _module_available(root: str) -> bool:
    try:
        importlib.import_module(root)
        return True
    except ImportError:
        return False


def sklearn_available() -> bool:
    return _module_available("sklearn")


def sk_supported(task: str, algorithm: str) -> bool:
    return (task, algorithm) in SK_TABLE


def _cloudpickle():
    # pyspark vendors cloudpickle; use the same one the UDF machinery
    # uses so by-value registration in tests covers both layers
    from pyspark import cloudpickle

    return cloudpickle


class SkEstimator:
    """Duck-types the one MLlib Estimator method train.py calls:
    `fit(df) -> model`. Construction is lazy — the sklearn class is
    imported at fit time, keeping `make_estimator` import-free."""

    def __init__(self, task: str, algorithm: str, hyperparams: dict | None = None):
        if (task, algorithm) not in SK_TABLE:
            raise ValueError(f"no sklearn mapping for {task!r}/{algorithm!r}")
        self.task = task
        self.algorithm = algorithm
        self.hyperparams = dict(hyperparams or {})

    def fit(self, df) -> "SkModel":
        mod, cls_name = SK_TABLE[(self.task, self.algorithm)]
        cls = getattr(importlib.import_module(mod), cls_name)
        hp = dict(self.hyperparams)
        if mod.split(".")[0] == "catboost":
            # catboost prints per-iteration logs by default; the
            # reference's server-side fit runs silent too
            hp.setdefault("verbose", False)
        est = cls(**hp)
        cols = ["features"]
        supervised = self.task in (TASK_REGRESSION, TASK_CLASSIFICATION)
        if supervised:
            cols.append("label")
        pdf = df.select(*cols).toPandas()
        X = np.asarray(pdf["features"].tolist(), dtype=np.float64)
        nn_X = nn_y = None
        if supervised:
            est.fit(X, pdf["label"].to_numpy())
        else:
            est.fit(X)
            if not hasattr(est, "predict"):
                # transductive clusterers (DBSCAN/OPTICS/Spectral) have
                # no predict(); extend inductively by 1-NN against the
                # fitted points (core samples for DBSCAN — the standard
                # out-of-sample rule)
                labels = np.asarray(est.labels_)
                if hasattr(est, "components_") and hasattr(
                    est, "core_sample_indices_"
                ):
                    nn_X = np.asarray(est.components_, dtype=np.float64)
                    nn_y = labels[np.asarray(est.core_sample_indices_)]
                else:
                    nn_X, nn_y = X, labels
        return SkModel(est, self.task, self.algorithm, nn_X=nn_X, nn_y=nn_y)


class SkModel:
    """Duck-types the MLlib Model surface the lifecycle touches:
    `transform(df)` (distributed, Arrow-batched), `predict(vector)`
    (driver-local hot path), `write().overwrite().save(path)` and
    classmethod `load(path)` (artifact contract of predict._load_artifact).
    """

    def __init__(self, est, task: str, algorithm: str, nn_X=None, nn_y=None):
        self.est = est
        self.task = task
        self.algorithm = algorithm
        self.nn_X = nn_X
        self.nn_y = nn_y

    # -- local inference ---------------------------------------------------

    def _predict_np(self, X: np.ndarray) -> np.ndarray:
        if hasattr(self.est, "predict"):
            return np.asarray(self.est.predict(X), dtype=np.float64)
        d = X @ self.nn_X.T
        d = (
            (X * X).sum(1, keepdims=True)
            - 2.0 * d
            + (self.nn_X * self.nn_X).sum(1)[None, :]
        )
        return np.asarray(self.nn_y, dtype=np.float64)[np.argmin(d, axis=1)]

    def predict(self, features) -> float:
        arr = features.toArray() if hasattr(features, "toArray") else features
        X = np.asarray(arr, dtype=np.float64)[None, :]
        return float(self._predict_np(X)[0])

    # -- distributed inference ---------------------------------------------

    def transform(self, df):
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, DoubleType

        payload = _cloudpickle().dumps(
            (self.est, self.task, self.nn_X, self.nn_y)
        )
        bc = df.sparkSession.sparkContext.broadcast(payload)

        def _local():
            est, task, nn_X, nn_y = _cloudpickle().loads(bc.value)
            return SkModel(est, task, "", nn_X=nn_X, nn_y=nn_y)

        @F.pandas_udf(DoubleType())
        def _pred(feats: pd.Series) -> pd.Series:
            m = _local()
            X = np.asarray(feats.tolist(), dtype=np.float64)
            return pd.Series(m._predict_np(X))

        out = df.withColumn("prediction", _pred(F.col("features")))
        if self.task == TASK_CLASSIFICATION and hasattr(
            self.est, "predict_proba"
        ):
            from pyspark.ml.functions import array_to_vector

            @F.pandas_udf(ArrayType(DoubleType()))
            def _proba(feats: pd.Series) -> pd.Series:
                m = _local()
                X = np.asarray(feats.tolist(), dtype=np.float64)
                p = np.asarray(m.est.predict_proba(X), dtype=np.float64)
                return pd.Series(list(p))

            # vector-typed like MLlib's probability column, so
            # predict_proba / log_loss / roc_auc flow unchanged
            out = out.withColumn(
                "probability", array_to_vector(_proba(F.col("features")))
            )
        return out

    # -- artifact contract -------------------------------------------------

    def write(self) -> "_SkWriter":
        return _SkWriter(self)

    @classmethod
    def load(cls, path: str) -> "SkModel":
        with open(os.path.join(path, "sk_meta.json")) as f:
            meta = json.load(f)
        with open(os.path.join(path, "model.pkl"), "rb") as f:
            est, nn_X, nn_y = _cloudpickle().loads(f.read())
        return cls(est, meta["task"], meta["algorithm"], nn_X=nn_X, nn_y=nn_y)


class _SkWriter:
    def __init__(self, model: SkModel):
        self.model = model

    def overwrite(self) -> "_SkWriter":
        return self

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "model.pkl"), "wb") as f:
            f.write(
                _cloudpickle().dumps(
                    (self.model.est, self.model.nn_X, self.model.nn_y)
                )
            )
        with open(os.path.join(path, "sk_meta.json"), "w") as f:
            json.dump(
                {"task": self.model.task, "algorithm": self.model.algorithm}, f
            )


def maybe_sklearn_estimator(
    task: str, algorithm: str, hyperparams: dict | None
) -> tuple[Any, str] | None:
    """Dispatch hook for make_estimator: the real library runtime
    (sklearn, or xgboost/lightgbm/catboost for the boosted names —
    the registry's runtime tag records which engine fit the model,
    like the reference's Runtime column) when the mapped library is
    importable, else None (caller falls back to the MLlib analog with
    runtime=fallback)."""
    if not sk_supported(task, algorithm):
        return None
    root = _root_module(task, algorithm)
    if not _module_available(root):
        return None
    return SkEstimator(task, algorithm, hyperparams), (
        "sklearn" if root == "sklearn" else root
    )
