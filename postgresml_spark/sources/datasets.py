"""pgml.load_dataset analog (api.rs:561-587).

The reference ships gzipped CSVs of the classic sklearn toy datasets
(pgml-extension/src/orm/datasets/*.csv.gz) and loads any HuggingFace
dataset via Python bindings (bindings/transformers/mod.rs:322). This
container has neither sklearn nor datasets, so the classic sets are
generated deterministically (seed=42) with the same shapes/column
names; the HF path is gated behind an import-try.

Returned values: (DataFrame registered as a temp view, row count) —
matching load_dataset's (table_name, rows) contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_SEED = 42


def _diabetes(n: int = 442):
    """10 standardized features, continuous target 25-346 (dataset.rs:403-436)."""
    rng = np.random.default_rng(_SEED)
    X = rng.standard_normal((n, 10)) * 0.047
    coef = np.array([30, -240, 520, 320, -790, 470, 100, 180, 740, 70], dtype=float)
    y = 150 + X @ coef + rng.standard_normal(n) * 30
    y = np.clip(y, 25, 346)
    cols = ["age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4", "s5", "s6"]
    return X, y, cols, "target"


def _breast_cancer(n: int = 569):
    """30 features, boolean label 'malignant' (dataset.rs:209-262)."""
    rng = np.random.default_rng(_SEED)
    y = (rng.random(n) < 0.37).astype(float)
    base = rng.standard_normal((n, 30))
    shift = np.linspace(0.5, 2.0, 30)
    X = base + np.outer(y, shift)  # separable-ish
    cols = [f"feature_{i:02d}" for i in range(30)]
    return X, y, cols, "malignant"


def _digits(n: int = 1797):
    """64 array features (8x8), 10 classes (dataset.rs:468-487)."""
    rng = np.random.default_rng(_SEED)
    y = rng.integers(0, 10, n).astype(float)
    centers = rng.random((10, 64)) * 16
    X = np.clip(centers[y.astype(int)] + rng.standard_normal((n, 64)) * 2, 0, 16)
    cols = [f"px_{i:02d}" for i in range(64)]
    return X, y, cols, "target"


def _iris(n: int = 150):
    rng = np.random.default_rng(_SEED)
    y = np.repeat([0.0, 1.0, 2.0], n // 3)
    centers = np.array([[5.0, 3.4, 1.5, 0.2], [5.9, 2.8, 4.3, 1.3], [6.6, 3.0, 5.6, 2.0]])
    X = centers[y.astype(int)] + rng.standard_normal((n, 4)) * 0.3
    cols = ["sepal_length", "sepal_width", "petal_length", "petal_width"]
    return X, y, cols, "species"


_GENERATORS = {
    "diabetes": _diabetes,
    "breast_cancer": _breast_cancer,
    "digits": _digits,
    "iris": _iris,
}


def load_dataset(
    spark: SparkSession, source: str, limit: int | None = None
) -> tuple[DataFrame, int]:
    if source in _GENERATORS:
        X, y, cols, ycol = _GENERATORS[source]()
        if limit:
            X, y = X[:limit], y[:limit]
        import pandas as pd

        pdf = pd.DataFrame(X, columns=cols)
        pdf[ycol] = y
        pdf.insert(0, "row_id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        df.createOrReplaceTempView(f"pgml_{source}")
        return df, len(pdf)
    # HuggingFace path (reference: load_dataset('squad') etc.)
    try:
        import datasets  # type: ignore  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"dataset {source!r}: HF `datasets` not available in this environment"
        ) from e
    raise NotImplementedError(f"HF dataset loading for {source!r} not wired yet")
