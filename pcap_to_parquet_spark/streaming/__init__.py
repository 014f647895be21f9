"""Structured Streaming surface (SURVEY §2 Part B, streaming table).

The reference has no streaming at all (single-threaded batch CLI,
/root/reference/src/main.rs:59-122); this package provides the
engine's streaming operators via Spark Structured Streaming:

- tumbling / sliding / session window aggregation
- watermarks + late-data semantics
- streaming deduplication (``dropDuplicatesWithinWatermark``)
- arbitrary stateful processing (``applyInPandasWithState``)

Demonstration harness: the driver's oracle is batch-only, so every
query here reads the events table as a *file-source stream*
(``readStream`` + ``availableNow`` trigger), materializes through a
memory sink, and returns the result as a batch DataFrame. On a real
cluster the same plans run unchanged against Kafka/files with
``maxFilesPerTrigger`` rate control and checkpointed exactly-once
sinks — only the source/sink lines differ.
"""

from pcap_to_parquet_spark.streaming import stream_queries  # noqa: F401
