"""Shared fixtures: one local SparkSession for the whole test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pcap_to_parquet_spark.session import get_spark

    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_docs_dir(spark, tmp_path_factory):
    """A minimal sf_dir with a planted-duplicate documents table:

    - docs 0 and 1: identical text (exact + near dup)
    - doc 2: one word changed out of 30 (near dup of 0/1, not exact)
    - doc 3: unrelated text
    - doc 4: short (< 3 tokens → zero shingles)
    """
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(("CHANGED" if i == 7 else f"w{i}") for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    rows = [
        (0, base, "en", "srcA", len(base)),
        (1, base, "en", "srcB", len(base)),
        (2, near, "en", "srcA", len(near)),
        (3, other, "en", "srcA", len(other)),
        (4, "too short", "en", "srcA", 9),
    ]
    d = tmp_path_factory.mktemp("tinysf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)
