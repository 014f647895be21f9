"""Plan inspection utilities (used by tests and tools/explain_all.py)."""

from pcap_to_parquet_spark.plans.inspect import plan_profile, plan_string  # noqa: F401

__all__ = ["plan_profile", "plan_string"]
