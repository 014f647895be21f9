"""pcap_to_parquet_spark — a PySpark-native analytics engine.

A from-scratch engine with the capabilities of the reference
``ptiza/pcap-to-parquet`` (a pcap → Parquet ETL proof-of-concept,
/root/reference/src/main.rs) re-expressed Spark-first, plus the full
relational / window / LLM-data-pipeline operator surface declared in
SURVEY.md §2.

Layout
------
- ``schema.py``     explicit StructType constants (PACKET_SCHEMA, testdata)
- ``session.py``    SparkSession builder + runtime tuning helper
- ``registry.py``   the queries()/oracle_sql() registry the driver consumes
- ``sources/``      table loaders + the pcap source (reference Part A)
- ``operators/``    every query operator, one thin DataFrame composition each
- ``functions/``    reusable column-expression helpers (vector math, text)
- ``plans/``        plan-inspection utilities (explain/shuffle audits)
- ``streaming/``    Structured Streaming demonstrations
"""

from pcap_to_parquet_spark.registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]
