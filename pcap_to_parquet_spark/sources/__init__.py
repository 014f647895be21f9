from pcap_to_parquet_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]
