"""SQL-text API surface: the same engine through ``spark.sql()``.

Everything else in ``operators/`` declares plans with the DataFrame
API; a user coming from the reference's workflow (`SELECT … FROM
'out.parquet'` in DuckDB, README.md:20-40) writes SQL strings. These
queries register the testdata tables as temp views and run classic
TPC-H-shaped analytics as pure SQL text — same Catalyst planning, same
physical plans, same oracle gate as their DataFrame twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table

_VIEW_TABLES = ("customer", "orders", "lineitem", "supplier", "nation", "region", "part")


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views over the sf_dir tables (createOrReplace: the last
    registration wins, which is correct for sequential per-sf runs)."""
    for t in _VIEW_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# TPC-H Q3 shape (shipping priority): top open-order revenue in a
# segment before the cutoff. o_orderpriority stands in for
# l_shipdate>cutoff/o_shippriority (testdata has no shippriority).
_Q3_BODY = """
SELECT o.o_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       {datefmt} AS order_date,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
GROUP BY o.o_orderkey, {datefmt}, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""

SQL_SHIPPING_ORACLE = _Q3_BODY.format(datefmt="STRFTIME(o.o_orderdate, '%Y-%m-%d')")


@query("q_sql_shipping_priority", SQL_SHIPPING_ORACLE)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape, submitted as SQL TEXT via ``spark.sql`` — the
    plan Catalyst produces is the same broadcast-dim + single-shuffle
    + TakeOrderedAndProject shape the DataFrame twin (flagship) gets;
    the SQL front-end adds zero cost. Dates are projected to strings
    for oracle hash parity (never raw timestamps)."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q3_BODY.format(datefmt="date_format(o.o_orderdate, 'yyyy-MM-dd')"))


# TPC-H Q10 shape (returned items): revenue lost to returns per customer.
_Q10_BODY = """
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS lost_revenue,
       ROUND(c.c_acctbal, 2) AS acctbal,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


@query("q_sql_returned_items", _Q10_BODY)
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape as SQL text: the returned-items revenue report.
    The l_returnflag filter reaches the parquet scan (PushedFilters)
    exactly as with the DataFrame API — predicate pushdown is a
    Catalyst property, not an API property."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q10_BODY)


# TPC-H Q1 shape (pricing summary): the canonical full-scan aggregate.
# One SQL text for BOTH engines — the query is dialect-neutral.
_Q1_BODY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_sql_pricing_summary", _Q1_BODY)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report) as SQL text — the
    canonical scan-dominated aggregation benchmark. The plan is the
    ideal 100 TB shape: vectorized parquet scan with the shipdate
    filter pushed down, whole-stage-codegen'd partial HashAggregate
    (map-side combine carries 4-6 groups per partition), one Exchange
    of a few rows, final aggregate. Identical SQL text runs on both
    engines."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q1_BODY)


# TPC-H Q15 shape (top supplier): aggregate + scalar-subquery max.
_Q15_BODY = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q_sql_top_supplier", _Q15_BODY)
def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier) as SQL text: revenue-per-supplier
    aggregation, a scalar subquery over the SAME aggregate for the max,
    and an equality join back to the supplier dimension. Catalyst plans
    the scalar subquery as a one-row broadcast; revenue is computed
    once per reference (the CTE is inlined twice — at 100 TB, cache the
    CTE or let AQE reuse the exchange). Revenue is rounded to cents in
    both engines BEFORE the max-equality compare, so the float
    comparison is parity-safe."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q15_BODY)


# TPC-H Q5 shape (local supplier volume): the deepest join tree in the
# suite — region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier,
# with the non-tree edge s_nationkey = c_nationkey.
_Q5_BODY = """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""


@query("q_sql_local_volume", _Q5_BODY)
def sql_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume) as SQL text: six tables,
    five join edges plus the non-tree s_nationkey = c_nationkey
    constraint — the join-ORDERING stress test. Catalyst reorders the
    tree so the r_name filter prunes region→nation→customer before the
    fact tables join, and every dimension broadcasts; the only real
    shuffle is lineitem⋈orders. Identical SQL text runs on both
    engines."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q5_BODY)


# TPC-H Q19 shape (discounted revenue): three DISJOINT predicate arms
# OR-ed across the join — the disjunctive-pushdown stress case.

_Q19_SQL = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_type = 'ECONOMY' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 40)
   OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""


@query("q_sql_disjunctive", _Q19_SQL)
def sql_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an equi-join whose filter is a disjunction of
    per-arm conjunctions mixing both sides' columns. What Catalyst
    must get right: the single-side implications of the OR (p_size
    bounds, l_quantity bounds) are extracted and pushed BELOW the join
    on each side, while the cross-side residual stays in the join
    filter — a disjunction handled naively forces the full join first.
    The part side still broadcasts; one aggregate row comes back."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)


# LATERAL join: per-row dependent subquery (top-2 customers per nation)

_LATERAL_SQL = """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n, LATERAL (
    SELECT c_name, c_acctbal FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) c
"""


@query("q_sql_lateral", _LATERAL_SQL)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: for every nation row, the top-2
    customers of THAT nation — the dependent-join surface SQL users
    reach for before discovering window functions. Catalyst decorrelates
    it into the same ranked-window/limit shape as q_topk_per_group
    rather than executing a per-row subquery; deterministic by the
    (acctbal, custkey) tiebreak."""
    _register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# WITH RECURSIVE: bounded-depth BFS over the co-order graph

_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
reach(part, depth) AS (
    SELECT CAST(1 AS BIGINT) AS part, 0 AS depth
    UNION ALL
    SELECT e.pb, r.depth + 1
    FROM reach r JOIN edges e ON e.pa = r.part
    WHERE r.depth < 2
)
SELECT part, MIN(depth) AS min_depth FROM reach GROUP BY part
"""


@query("q_sql_recursive", _RECURSIVE_SQL)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4): two-hop BFS from part 1 over the
    co-order graph, min arrival depth per reached part. Each recursion
    step is one co-partitioned equi-join of the frontier against the
    edge list, and the depth cap bounds the iteration — the SQL-text
    twin of the iterative DataFrame loop in q_dedup_clusters (which
    remains the shape of choice for unbounded-depth convergence, where
    checkpointing controls plan growth)."""
    _register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# TPC-H Q17 shape: correlated scalar-aggregate subquery (small-quantity
# revenue per brand)

_Q17_SQL = """
SELECT p.p_brand,
       COUNT(*) AS n_small,
       ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@query("q_sql_small_qty", _Q17_SQL)
def sql_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the per-row correlated scalar AVG subquery.
    Catalyst decorrelates it into ONE per-partkey aggregate joined back
    to the fact scan — the naive reading (re-aggregate lineitem once
    per outer row) would be O(n²) and never runs; the plan shows two
    scans of lineitem, one Aggregate, one join, exactly what you'd
    hand-write. The same rewrite is why this is safe at 100 TB: the
    subquery costs one extra aggregation, not a nested loop."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# TPC-H Q21 shape: EXISTS + NOT EXISTS double decorrelation (sole
# at-fault supplier in a multi-supplier order)

_Q21_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@query("q_sql_waiting_supplier", _Q21_SQL)
def sql_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest decorrelation in the benchmark —
    a correlated EXISTS (another supplier touched the order) AND a
    correlated NOT EXISTS (no other supplier's item was returned),
    both on the same key. Catalyst turns the EXISTS into a left-semi
    and the NOT EXISTS into a left-anti join on l_orderkey, so the
    whole query is three co-partitioned shuffles on the order key plus
    the broadcast supplier dim — no per-row subquery execution. The
    anti join is the load-bearing operator: getting it wrong (e.g. a
    NOT IN null-trap rewrite into a cartesian) is the classic engine
    bug this query exists to catch."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


# TPC-H Q13 shape: customer order-count distribution (the outer-join
# histogram — COUNT over a LEFT JOIN, then a histogram of the counts)

_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q_sql_custdist", _Q13_SQL)
def sql_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two stacked aggregations over a filtered LEFT
    join — customers with zero (non-urgent) orders must appear in the
    c_count=0 bucket, which is why the filter lives in the JOIN
    CONDITION, not a WHERE (a WHERE would silently turn the outer join
    inner: the classic outer-join-filter bug this query exists to
    catch). COUNT(o_orderkey) counts matches only (NULL-skipping), so
    unmatched customers aggregate to 0."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


# TPC-H Q18 shape: large-volume customers via IN <grouped subquery>

_Q18_SQL = """
SELECT c.c_name, o.o_orderkey,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


@query("q_sql_big_orders", _Q18_SQL)
def sql_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped HAVING subquery. The
    subquery re-aggregates the same fact table; Catalyst plans it as
    an aggregate + LEFT SEMI join on the order key co-partitioned with
    the main lineitem shuffle — the fact table is scanned twice but
    shuffled on the same key, so the semi probe is cheap. The LIMIT
    rides the final order as TakeOrderedAndProject."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


# TPC-H Q22 shape: anti join + uncorrelated scalar subquery

_Q22_SQL = """
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
ORDER BY segment
"""


@query("q_sql_idle_customers", _Q22_SQL)
def sql_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: an uncorrelated scalar subquery (the global
    average becomes a literal once computed — one extra tiny job, then
    a pushable filter) combined with NOT EXISTS (left-anti join on the
    customer key against the urgent slice of orders — the predicate
    lives INSIDE the subquery so the anti join's build side is small).
    Wealthy customers with no urgent orders, per market segment
    (every test-SF customer has some order, so the unqualified
    NOT EXISTS would be vacuously empty; Q2H's name-derived country
    code collapses to one group in this testdata)."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# TPC-H Q4 shape: correlated EXISTS with a date-arithmetic predicate

_Q4_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q_sql_late_orders", _Q4_SQL)
def sql_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in one quarter
    with at least one line shipped > 90 days after ordering (the
    testdata has no commit/receipt dates, so order-to-ship lateness
    stands in for commit-vs-receipt). The correlated EXISTS plans as a
    LEFT SEMI join on the order key — the quarter filter on orders is
    pushed to the scan, so the semi join's probe side is already
    pruned; the date-arithmetic predicate rides the join condition and
    never materializes a column."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


# TPC-H Q7 shape: bidirectional nation-pair volume by year

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q_sql_nation_volume", _Q7_SQL)
def sql_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): trade volume between a nation
    pair, both directions, by ship year. The disjunctive nation filter
    sits ABOVE the two nation joins, so Catalyst can still broadcast
    the 25-row nation table twice and evaluate the OR as a cheap
    post-join filter; lineitem is the only large input and shuffles
    once for the final aggregate. year() is cast to BIGINT on both
    engines (Spark year() is INT, DuckDB's is BIGINT — the driver's
    value hash is type-sensitive)."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


# TPC-H Q8 shape: market share = conditional sum over total, per year

_Q8_SQL = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n1.n_name AS nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q_sql_market_share", _Q8_SQL)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's import volume per year — the conditional-sum-over-total
    ratio computed in a single aggregate pass (never two scans). All
    six dimension joins broadcast (region/nation/supplier/customer/
    part are all dims); lineitem flows through one shuffle for the
    year grouping. The p_type filter prunes the part build side
    before broadcast."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


# TPC-H Q14 shape: promo revenue share within a month

_Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
"""


@query("q_sql_promo_share", _Q14_SQL)
def sql_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): percentage of one month's
    revenue from PROMO-type parts. A single global aggregate — the
    month filter reaches the lineitem scan (PushedFilters), part
    broadcasts, and the plan is scan → broadcast join → one partial +
    one final aggregate row. The CASE lives inside SUM so both the
    numerator and denominator come from the same pass."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)


# TPC-H Q9 shape: product-line profit by supplier nation and year

_Q9_SQL = """
SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
FROM (
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           l.l_extendedprice * (1 - l.l_discount)
             - 0.6 * p.p_retailprice * l.l_quantity AS amount
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year
"""


@query("q_sql_product_profit", _Q9_SQL)
def sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on a product line
    by supplier nation and order year, with 0.6 x retail price x
    quantity standing in for ps_supplycost (the testdata has no
    partsupp table). The LIKE filter prunes part BEFORE it broadcasts;
    the three remaining dims broadcast too, so the only shuffle is the
    (nation, year) aggregate over the surviving lineitem rows."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q9_SQL)


# TPC-H Q16 shape: supplier counts per part attribute, with NOT IN

_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (5, 11, 28, 37, 42)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@query("q_sql_parts_suppliers", _Q16_SQL)
def sql_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers ship each qualifying (brand, type, size) combo,
    with lineitem standing in for partsupp as the part-supplier link
    and negative-balance suppliers excluded via NOT IN (a null-aware
    anti join — s_suppkey is non-null here, so it plans as a plain
    broadcast anti join, not the O(n^2) null-aware fallback). COUNT
    DISTINCT over (brand, type, size) groups is a two-phase
    distinct-then-count aggregate on one shuffle."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


# TPC-H Q2 shape: min-cost supplier via a correlated MIN subquery

_Q2_SQL = """
WITH offers AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           ROUND(MIN(l_extendedprice / l_quantity), 4) AS cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
eligible AS (
    SELECT o.pk, o.sk, o.cost, ROUND(s.s_acctbal, 2) AS acctbal,
           s.s_name, n.n_name AS nation
    FROM offers o
    JOIN supplier s ON s.s_suppkey = o.sk
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
)
SELECT e.acctbal, e.s_name, e.nation, p.p_partkey, e.cost
FROM part p
JOIN eligible e ON e.pk = p.p_partkey
WHERE p.p_size = 11
  AND e.cost = (SELECT MIN(e2.cost) FROM eligible e2 WHERE e2.pk = e.pk)
ORDER BY e.acctbal DESC, e.nation, e.s_name, p.p_partkey
LIMIT 10
"""


@query("q_sql_min_cost_supplier", _Q2_SQL)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying
    part, only suppliers matching that part's REGIONAL MINIMUM unit
    cost survive — the correlated scalar-MIN subquery every optimizer
    decorrelates into an aggregate + self-join on the correlation key
    (pk). Unit cost derives from lineitem (price/qty per
    supplier-part pair) since the testdata carries no partsupp; the
    per-pair MIN is rounded BEFORE the equality so both engines
    compare identical doubles. Region/nation/supplier prune the offer
    side before the part join."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


# TPC-H Q20 shape: nested IN with a correlated threshold subquery

_Q20_SQL = """
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
    SELECT ps.sk FROM (
        SELECT l_suppkey AS sk, l_partkey AS pk, SUM(l_quantity) AS q
        FROM lineitem GROUP BY l_suppkey, l_partkey
    ) ps
    WHERE ps.pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps.q > (
        SELECT 0.2 * SUM(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = ps.pk
    )
)
ORDER BY s.s_name
"""


@query("q_sql_excess_supplier", _Q20_SQL)
def sql_excess_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-share suppliers): suppliers who shipped
    more than 20% of a red part's total volume — a THREE-DEEP nested
    predicate: IN over a grouped derived table, which itself filters
    by an IN (semi join on the part dim) AND a CORRELATED scalar-SUM
    threshold (decorrelated into a per-part aggregate joined back on
    the correlation key). Quantities are integral doubles, so every
    SUM is exact and the 0.2x threshold compare cannot drift between
    engines."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# TPC-H Q6 shape: the scan-bound forecasting filter-aggregate

_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q_sql_forecast_revenue", _Q6_SQL)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the purest
    scan-bound query in the suite — three pushable predicates, zero
    joins, one global aggregate. Its whole value is the PLAN: every
    filter must reach the parquet scan (PushedFilters) and the
    aggregate must be a partial+final pair over whatever rows survive
    row-group pruning; anything else would read 100 TB to add up a
    sliver."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


# TPC-H Q11 shape: group share over a global scalar (important stock)

_Q11_SQL = """
WITH v AS (
    SELECT l.l_partkey, ROUND(SUM(l.l_extendedprice), 2) AS value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_2'
    GROUP BY l.l_partkey
)
SELECT l_partkey, value FROM v
WHERE value > (SELECT 0.001 * SUM(value) FROM v)
ORDER BY value DESC, l_partkey
"""


@query("q_sql_important_stock", _Q11_SQL)
def sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose one-nation value
    exceeds a fraction of that nation's TOTAL — the
    group-vs-global-scalar HAVING. The CTE aggregates once; the scalar
    subquery re-reads the tiny aggregated result (part-cardinality
    rows, Catalyst reuses the exchange), so the fact table is scanned
    exactly once. lineitem value stands in for availqty x supplycost
    (no partsupp in the testdata)."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# TPC-H Q12 shape: priority counts per lateness bucket

_Q12_SQL = """
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            THEN 'late' ELSE 'on_time' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


@query("q_sql_shipmode_priority", _Q12_SQL)
def sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): line counts
    split by priority class within each lateness bucket, with
    order-to-ship lateness standing in for the absent
    shipmode/commit/receipt columns. The two conditional SUMs share
    one aggregation pass; the year filter is pushed to the lineitem
    scan and the orders join carries only the priority column
    (ReadSchema pruned to two fields)."""
    _register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)
