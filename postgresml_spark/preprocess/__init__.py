"""Declarative per-column preprocessing with reference semantics (§2.J)."""

from postgresml_spark.preprocess.snapshot import (  # noqa: F401
    Snapshot,
    analyze_columns,
    fit_preprocessor,
    train_test_split,
)
