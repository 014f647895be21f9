"""Registry contract: every query runs at sf0.001 with a stable schema.

Value-level correctness is the oracle harness's job
(tools/check_oracle.py, mirroring the driver's CORRECTNESS gate);
this suite guards the contract shape and cheap invariants so a
broken operator fails fast in pytest.
"""

from __future__ import annotations

import pytest

import pcap_to_parquet_spark.operators  # noqa: F401
from pcap_to_parquet_spark.registry import ORACLES, QUERIES
from tests.conftest import SF0001

# whole-registry smoke sweep (~6.5 min) - full-suite/release gate, r16
pytestmark = pytest.mark.slow


def test_registry_shape():
    assert len(QUERIES) >= 115
    assert set(ORACLES) <= set(QUERIES)
    # the vast majority must be oracle-checkable (SURVEY §2 Part B tables)
    assert len(ORACLES) >= 100


def test_entry_contract():
    import __spark_entry__ as m

    assert set(m.queries()) == set(QUERIES)
    assert set(m.oracle_sql()) == set(ORACLES)


def test_gate_front_names_exist():
    """A typo in the gate-order list would silently drop a query from
    the driver's 50-entry correctness window."""
    import __spark_entry__ as m

    missing = [n for n in m._GATE_FRONT if n not in QUERIES]
    assert not missing, missing
    # the front of the list must land inside the driver's 50-row
    # window; entries past 50 are the documented next-round rotation
    first50 = list(m.queries())[:50]
    assert all(n in first50 for n in m._GATE_FRONT[:50])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF0001)
    assert df.columns, name
    # cheap full-execution check; count() exercises the whole plan
    assert df.count() >= 0


def test_approx_distinct_error_bound(spark):
    """HLL estimate must land within 5% of the exact distinct count
    (rsd default 0.05) — the rows-only check can't see accuracy."""
    from pyspark.sql import functions as F

    from pcap_to_parquet_spark.sources.tables import load_table

    o = load_table(spark, SF0001, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey")).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_flagship_entry(spark):
    import __spark_entry__ as m

    rows = m.entry(spark).collect()
    assert len(rows) > 0
    assert set(rows[0].asDict()) == {"nation", "revenue", "n_items"}
