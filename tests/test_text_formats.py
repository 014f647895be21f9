"""CSV/JSON/ORC round-trips with explicit schemas."""

from __future__ import annotations

from pcap_to_parquet_spark.sources.tables import load_table
from pcap_to_parquet_spark.sources.text_formats import (
    read_csv,
    read_json,
    read_orc,
    table_schema,
    write_csv,
    write_json,
    write_orc,
)
from tests.conftest import SF0001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF0001, "nation")
    p = str(tmp_path / "nation_csv")
    write_csv(nation, p)
    back = read_csv(spark, p, table_schema("nation"))
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_json_roundtrip(spark, tmp_path):
    supplier = load_table(spark, SF0001, "supplier")
    p = str(tmp_path / "supplier_json")
    write_json(supplier, p)
    back = read_json(spark, p, table_schema("supplier"))
    assert _rows(back) == _rows(supplier)


def test_orc_roundtrip(spark, tmp_path):
    """ORC round-trip (zstd) with self-described schema, plus filter
    pushdown reaching the ORC scan."""
    customer = load_table(spark, SF0001, "customer")
    p = str(tmp_path / "customer_orc")
    write_orc(customer, p)
    back = read_orc(spark, p)
    assert back.schema == customer.schema
    assert _rows(back) == _rows(customer)
    plan = back.filter(back.c_custkey == 7)._jdf.queryExecution().executedPlan().toString()
    assert "c_custkey" in plan and "PushedFilters" in plan
