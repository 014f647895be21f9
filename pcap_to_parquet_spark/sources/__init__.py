from pcap_to_parquet_spark.sources.tables import (
    fan_out,
    keyed_tmp_dirs,
    load_table,
    load_tables,
)

__all__ = ["fan_out", "keyed_tmp_dirs", "load_table", "load_tables"]
