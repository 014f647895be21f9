"""Operator surface: importing this package registers every query.

Each module is a family from SURVEY.md §2 Part B; the pcap pipeline
(Part A) lives in sources/pcap.py with its query in pcap_query.py.
"""

from pcap_to_parquet_spark.operators import (  # noqa: F401
    aggregates,
    behavior,
    evaluation,
    flagship,
    joins,
    llm,
    multimodal,
    pcap_query,
    pipeline_ops,
    relational,
    scalar_funcs,
    scale_patterns,
    sessionize,
    sketches,
    sql_api,
    text_pipeline,
    udtf_udaf,
    windows,
)
from pcap_to_parquet_spark import streaming  # noqa: E402,F401  (streaming queries)
from pcap_to_parquet_spark.sources import text_formats  # noqa: E402,F401  (q_text_source)
