"""postgresml_spark — a PySpark-native analytics/ML engine.

A from-scratch rebuild of the capabilities of postgresml/postgresml
(reference snapshot at /root/reference, studied for WHAT to compute, not
HOW): the ML lifecycle (train/predict/deploy over any table with
declarative preprocessing), a vector/array math function library, text
chunking/analysis operators, a document-collection layer with metadata
filter DSL + hybrid semantic/full-text search, and the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
plumbing) — all expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, pandas UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"

from postgresml_spark.session import get_spark, load_tables  # noqa: F401
