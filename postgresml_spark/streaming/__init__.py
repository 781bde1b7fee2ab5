"""Structured Streaming surfaces (reference §2.O).

The reference's only streaming constructs are LLM token streaming
(pgml.transform_stream, api.rs:753-824) and incremental pipeline sync
(pipeline.rs:591-775). Spark adds real stream processing on top:
watermarked windowed aggregation and foreachBatch-driven continuous
collection sync.
"""

from postgresml_spark.streaming.streams import (  # noqa: F401
    stream_documents_into_collection,
    streaming_dedup,
    transform_stream,
    windowed_event_aggregation,
)
