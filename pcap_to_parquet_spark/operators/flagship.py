"""Flagship query: revenue by nation.

lineitem ⋈ orders ⋈ customer ⋈ nation → groupBy → orderBy → limit.
Exercises scan, two shuffle joins, two broadcast joins, partial+final
aggregation, and TakeOrderedAndProject in one plan (SURVEY §7 step 0).

Scale notes: nation (25 rows, bounded forever) carries an explicit
broadcast hint. customer deliberately does NOT — at 100 TB customer is
itself a fact-sized table, so the right physical join is whatever AQE
picks from runtime stats: broadcast at bench scale (it fits under
autoBroadcastJoinThreshold), shuffle join at cluster scale. Hard-coding
the hint would pin the small-scale plan onto the big-scale run. The
lineitem⋈orders join shuffles on orderkey once; AQE coalesces its
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_tables

FLAGSHIP_ORACLE = """
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, nation
LIMIT 10
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
        .limit(10)
    )


query("q_flagship_revenue", FLAGSHIP_ORACLE)(revenue_by_nation)
