"""Query registry: the single source of truth behind __spark_entry__.py.

Every operator module registers its queries with the :func:`query`
decorator; importing :mod:`pcap_to_parquet_spark.operators` populates
``QUERIES`` and ``ORACLES``.

Contract (driver-defined, see __spark_entry__.py docstring):
- ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``.
- ``ORACLES[name]`` is equivalent DuckDB SQL over views named
  ``region nation customer supplier part orders lineitem events
  documents embeddings``; column names must match the DataFrame's
  exactly (the driver sorts columns by name before value-hashing).
- Queries without an oracle get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``, optionally with DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
