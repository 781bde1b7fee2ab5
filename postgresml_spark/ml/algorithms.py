"""Algorithm registry: reference algorithm names → MLlib estimators.

Reference enum: pgml-extension/src/orm/algorithm.rs:6-52 (47 entries);
dispatch model.rs:450-555. MLlib-native coverage below; names with an
asterisked fallback train a closely-related MLlib estimator and record
`runtime: fallback` in the registry (the container has no
xgboost4j/synapseml/sklearn — gated behind import-try).

Hyperparameter names accept the reference's sklearn-ish spellings and
map to MLlib params (e.g. n_estimators → numTrees/maxIter, alpha →
regParam, l1_ratio → elasticNetParam, max_depth → maxDepth).
"""

from __future__ import annotations

from typing import Any

TASK_REGRESSION = "regression"
TASK_CLASSIFICATION = "classification"
TASK_CLUSTERING = "clustering"
TASK_DECOMPOSITION = "decomposition"

# task → (default target metric, higher_is_better) — orm/task.rs:46-103
TASK_METRIC = {
    TASK_REGRESSION: ("r2", True),
    TASK_CLASSIFICATION: ("f1", True),
    TASK_CLUSTERING: ("silhouette", True),
    TASK_DECOMPOSITION: ("cumulative_explained_variance", True),
}

_PARAM_ALIASES = {
    "n_estimators": ("numTrees", "maxIter"),
    "max_depth": ("maxDepth",),
    "learning_rate": ("stepSize",),
    "alpha": ("regParam",),
    "l1_ratio": ("elasticNetParam",),
    "max_iter": ("maxIter",),
    "tol": ("tol",),
    "reg_param": ("regParam",),
    "subsample": ("subsamplingRate",),
    "n_clusters": ("k",),
    "n_components": ("k",),
    "seed": ("seed",),
}


def _apply_params(est, hyperparams: dict[str, Any]):
    valid = {p.name for p in est.params}
    for k, v in (hyperparams or {}).items():
        names = _PARAM_ALIASES.get(k, (k,))
        applied = False
        for n in names:
            if n in valid:
                est.set(est.getParam(n), v)
                applied = True
                break
        if not applied:
            raise ValueError(f"unknown hyperparameter {k!r} for {type(est).__name__}")
    if "seed" in valid and "seed" not in (hyperparams or {}):
        est.set(est.getParam("seed"), 42)
    return est


def make_estimator(task: str, algorithm: str, hyperparams: dict | None = None):
    """Return (estimator, runtime_tag). features col: 'features_vec',
    label col: 'label'."""
    from pyspark.ml import classification as C
    from pyspark.ml import clustering as CL
    from pyspark.ml import feature as FE
    from pyspark.ml import regression as R

    hp = dict(hyperparams or {})
    fcol, lcol = "features_vec", "label"
    runtime = "mllib"

    def reg_linear(**kw):
        return R.LinearRegression(featuresCol=fcol, labelCol=lcol, **kw)

    if task == TASK_REGRESSION:
        table = {
            "linear": lambda: reg_linear(regParam=0.0),
            "ridge": lambda: reg_linear(regParam=hp.pop("alpha", 1.0), elasticNetParam=0.0),
            "lasso": lambda: reg_linear(regParam=hp.pop("alpha", 1.0), elasticNetParam=1.0),
            "elastic_net": lambda: reg_linear(
                regParam=hp.pop("alpha", 1.0), elasticNetParam=hp.pop("l1_ratio", 0.5)
            ),
            "random_forest": lambda: R.RandomForestRegressor(featuresCol=fcol, labelCol=lcol),
            "gradient_boosting_trees": lambda: R.GBTRegressor(featuresCol=fcol, labelCol=lcol),
            "decision_tree": lambda: R.DecisionTreeRegressor(featuresCol=fcol, labelCol=lcol),
            "isotonic": lambda: R.IsotonicRegression(featuresCol=fcol, labelCol=lcol),
            "huber": lambda: reg_linear(loss="huber", epsilon=hp.pop("epsilon", 1.35)),
            "fm": lambda: R.FMRegressor(featuresCol=fcol, labelCol=lcol),
        }
        fallbacks = {  # closest MLlib analog; recorded as runtime=fallback
            "xgboost": "gradient_boosting_trees",
            "lightgbm": "gradient_boosting_trees",
            "catboost": "gradient_boosting_trees",
            "xgboost_random_forest": "random_forest",
            "extra_trees": "random_forest",
            "bagging": "random_forest",
            "ada_boost": "gradient_boosting_trees",
            "hist_gradient_boosting": "gradient_boosting_trees",
            "stochastic_gradient_descent": "linear",
            "bayesian_ridge": "ridge",
            "kernel_ridge": "ridge",
            "least_angle": "linear",
            "lasso_least_angle": "lasso",
            "orthogonal_matching_pursuit": "linear",
            "automatic_relevance_determination": "ridge",
            "passive_aggressive": "linear",
            "ransac": "huber",
            "theil_sen": "huber",
            "quantile": "linear",
            "svm": "fm",
            "nu_svm": "fm",
            "linear_svm": "linear",
            "gaussian_process": "ridge",
        }
    elif task == TASK_CLASSIFICATION:
        table = {
            "logistic": lambda: C.LogisticRegression(featuresCol=fcol, labelCol=lcol),
            "linear_svm": lambda: C.LinearSVC(featuresCol=fcol, labelCol=lcol),
            "random_forest": lambda: C.RandomForestClassifier(featuresCol=fcol, labelCol=lcol),
            "gradient_boosting_trees": lambda: C.GBTClassifier(featuresCol=fcol, labelCol=lcol),
            "decision_tree": lambda: C.DecisionTreeClassifier(featuresCol=fcol, labelCol=lcol),
            "naive_bayes": lambda: C.NaiveBayes(featuresCol=fcol, labelCol=lcol),
            "fm": lambda: C.FMClassifier(featuresCol=fcol, labelCol=lcol),
            "mlp": lambda: C.MultilayerPerceptronClassifier(featuresCol=fcol, labelCol=lcol),
        }
        fallbacks = {
            "xgboost": "gradient_boosting_trees",
            "lightgbm": "gradient_boosting_trees",
            "catboost": "gradient_boosting_trees",
            "xgboost_random_forest": "random_forest",
            "extra_trees": "random_forest",
            "bagging": "random_forest",
            "ada_boost": "gradient_boosting_trees",
            "hist_gradient_boosting": "gradient_boosting_trees",
            "stochastic_gradient_descent": "logistic",
            "perceptron": "logistic",
            "passive_aggressive": "logistic",
            "ridge": "logistic",
            "svm": "fm",
            "nu_svm": "fm",
            "gaussian_process": "logistic",
            "linear": "logistic",
        }
    elif task == TASK_CLUSTERING:
        table = {
            "kmeans": lambda: CL.KMeans(featuresCol=fcol),
            "mini_batch_kmeans": lambda: CL.KMeans(featuresCol=fcol),
            "birch": lambda: CL.BisectingKMeans(featuresCol=fcol),
            "gaussian_mixture": lambda: CL.GaussianMixture(featuresCol=fcol),
            "mean_shift": lambda: CL.KMeans(featuresCol=fcol),
        }
        # affinity_propagation: PowerIterationClustering is not an
        # Estimator (graph API, no fit/transform) — exemplar-style
        # clustering degrades to KMeans like the other density methods.
        fallbacks = {
            "dbscan": "kmeans",
            "optics": "kmeans",
            "spectral": "kmeans",
            "affinity_propagation": "kmeans",
        }
    elif task == TASK_DECOMPOSITION:
        table = {
            "pca": lambda: FE.PCA(
                inputCol=fcol, outputCol="pca_features", k=hp.pop("n_components", 2)
            ),
        }
        fallbacks = {}
    else:
        raise ValueError(f"unknown task {task!r}")

    name = algorithm
    if name not in table and name in fallbacks:
        # prefer the REAL sklearn runtime for the long tail when the
        # library is importable (reference model.rs:450-555); this
        # container lacks sklearn, so CI exercises the path through a
        # faked-module seam test and lands on the MLlib analog here
        from postgresml_spark.ml.sklearn_runtime import maybe_sklearn_estimator

        sk = maybe_sklearn_estimator(task, algorithm, hp)
        if sk is not None:
            return sk
        name, runtime = fallbacks[name], "fallback"
    if name not in table:
        raise ValueError(f"algorithm {algorithm!r} not supported for task {task!r}")
    est = table[name]()
    return _apply_params(est, hp), runtime
