from pcap_to_parquet_spark.functions.vectors import cosine_similarity, dot, l2_norm
from pcap_to_parquet_spark.functions.text import shingles, whitespace_tokens

__all__ = ["cosine_similarity", "dot", "l2_norm", "shingles", "whitespace_tokens"]
