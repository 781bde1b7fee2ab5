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


def _linnerud(n: int = 20):
    """3 exercise features, 3 physiological targets — the reference's
    multi-target set (dataset.rs:569-616: chins situps jumps weight
    waist pulse). Returns a full frame (no single label column)."""
    import pandas as pd

    rng = np.random.default_rng(_SEED)
    chins = rng.integers(1, 18, n).astype(float)
    situps = rng.integers(50, 250, n).astype(float)
    jumps = rng.integers(25, 250, n).astype(float)
    weight = 247.0 - 5.0 * chins - 0.1 * situps + rng.standard_normal(n) * 15
    waist = 38.0 - 0.35 * chins + rng.standard_normal(n) * 2
    pulse = 56.0 + 0.02 * situps + rng.standard_normal(n) * 6
    return pd.DataFrame(
        {"chins": chins, "situps": situps, "jumps": jumps,
         "weight": weight, "waist": waist, "pulse": pulse}
    )


def _wine(n: int = 178):
    """13 features, 3 classes (dataset.rs:618-660 column names)."""
    rng = np.random.default_rng(_SEED)
    y = rng.integers(0, 3, n).astype(float)
    centers = rng.random((3, 13)) * 4 + 1
    X = centers[y.astype(int)] + rng.standard_normal((n, 13)) * 0.4
    cols = [
        "alcohol", "malic_acid", "ash", "alcalinity_of_ash", "magnesium",
        "total_phenols", "flavanoids", "nonflavanoid_phenols",
        "proanthocyanins", "hue", "color_intensity",
        "od280_od315_of_diluted_wines", "proline",
    ]
    return X, y, cols, "target"


_GENERATORS = {
    "diabetes": _diabetes,
    "breast_cancer": _breast_cancer,
    "digits": _digits,
    "iris": _iris,
    "linnerud": _linnerud,
    "wine": _wine,
}


def load_dataset(
    spark: SparkSession, source: str, limit: int | None = None
) -> tuple[DataFrame, int]:
    if source in _GENERATORS:
        res = _GENERATORS[source]()
        if isinstance(res, tuple):
            X, y, cols, ycol = res
            if limit:
                X, y = X[:limit], y[:limit]
            import pandas as pd

            pdf = pd.DataFrame(X, columns=cols)
            pdf[ycol] = y
        else:
            pdf = res if not limit else res.head(limit)  # full-frame set
        pdf = pdf.copy()
        pdf.insert(0, "row_id", range(len(pdf)))
        df = spark.createDataFrame(pdf)
        df.createOrReplaceTempView(f"pgml_{source}")
        return df, len(pdf)
    # HuggingFace path (reference bindings/transformers/mod.rs:322 —
    # pgml.load_dataset('squad') materializes the train split as a
    # table). Import-gated: the library is absent from this image, but
    # the full flow below is exercised by a faked-module contract test
    # (tests/test_ml_lifecycle.py), so the only unexercised line when
    # `datasets` appears is the hub download itself.
    try:
        import datasets  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            f"dataset {source!r}: HF `datasets` not available in this environment"
        ) from e
    ds = datasets.load_dataset(source, split="train")
    if limit:
        ds = ds.select(range(min(int(limit), len(ds))))
    pdf = ds.to_pandas()
    pdf = pdf.copy()
    pdf.insert(0, "row_id", range(len(pdf)))
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView(f"pgml_{source.replace('-', '_').replace('/', '_')}")
    return df, len(pdf)
