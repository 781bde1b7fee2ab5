"""Document collections: schemaless docs, ingest pipelines, hybrid search.

The SDK layer of the reference (pgml-sdks/pgml/src/) re-expressed as
DataFrame programs over parquet table families.
"""

from postgresml_spark.collections.collection import Collection  # noqa: F401
from postgresml_spark.collections.pipeline import Pipeline  # noqa: F401
