"""The remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q17/Q20
analogs), completing the full 22-query analytic surface together with
`relational` (Q1/Q4/Q6), `joins` (Q3/Q5), and `tpch_extra`
(Q10/Q12/Q14/Q16/Q18/Q19/Q21/Q22).

The fixture has no ``partsupp`` table, so the four queries that need
per-(part,supplier) supply data (Q2/Q9/Q11/Q20) derive it from
``lineitem``: supply cost = MIN(l_extendedprice), availability = total
shipped quantity. The *shapes* — correlated scalar-MIN subquery (Q2),
profit decomposition (Q9), HAVING-vs-global-fraction (Q11), nested IN
semi-join chain (Q20) — are preserved exactly.

Exactness notes (SURVEY.md §5): every aggregate goes through decimal
(`functions/exact.py`), every oracle decimal→double conversion through
`relational.dd` (VARCHAR round-trip); threshold predicates that TPC-H
states with division (Q17's ``0.2*avg``, Q20's ``0.5*sum``) are
rewritten division-free over integer quantity-cents so the predicate is
exact on both engines, not 1-ulp-sensitive at the boundary.

Scale notes: nation/region broadcast via explicit hints (bounded
dims); part/supplier grow with SF, so their joins broadcast only when
AQE's runtime sizes say so (static auto-broadcast is off engine-wide —
see session.tuning_conf); the ps-proxy
aggregations shuffle lineitem once on (l_partkey, l_suppkey) — the same
key a real partsupp join would use — and Q11/Q15's scalar subqueries are
one-row broadcasts, not driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query
from .relational import dd

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(7,4))"
)

#: integer quantity-cents: exact, overflow-free (sf0.1: 6e5 rows × 5000
#: cents → 3e9 « int64), and the basis for every division-free threshold
_QTY_C = "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           {dd("ps.supplycost")} AS supplycost
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
      AND p_size IN (5, 15, 25) AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps.supplycost = (
        SELECT MIN(ps2.supplycost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: cheapest EUROPE supplier per selected part. The oracle keeps
    the classic correlated scalar-MIN subquery; the engine evaluates the
    equivalent per-part window minimum instead: Spark inlines the ``ps``
    CTE into BOTH the outer block and the decorrelated subquery, so the
    correlated form aggregated lineitem TWICE (two full scans). Here the
    EUROPE-supplier cost relation is built once and the per-part minimum
    is MIN() OVER (PARTITION BY part) on that same relation — one
    lineitem aggregation, one window shuffle on the (part, supplier)
    grain, identical rows (the subquery's min ranges over exactly the
    EUROPE rows of the same part; ties at the min survive in both
    forms). Supplycost proxy = MIN lineitem price per (part, supplier)
    since the fixture has no partsupp."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        euro AS (
          SELECT /*+ BROADCAST(nation), BROADCAST(region) */
                 ps.l_partkey, ps.supplycost, s_acctbal, s_name, n_name
          FROM ps, supplier, nation, region
          WHERE s_suppkey = ps.l_suppkey
            AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE'
        ),
        best AS (
          SELECT *, MIN(supplycost) OVER (PARTITION BY l_partkey) AS min_cost
          FROM euro
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               CAST(supplycost AS DOUBLE) AS supplycost
        FROM part JOIN best ON p_partkey = l_partkey
        WHERE p_size IN (5, 15, 25) AND p_type = 'STANDARD'
          AND supplycost = min_cost
        """
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {dd(f"SUM({_REVENUE})")} AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: revenue between a nation pair, both directions, per ship
    year — double nation join with a symmetric pair predicate."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(n1), BROADCAST(n2) */
               n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM({_REVENUE}) AS DOUBLE) AS revenue
        FROM supplier, lineitem, orders, customer,
             nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        """
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {dd(f"SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume"
                f" ELSE CAST(0 AS DECIMAL(20,6)) END)")}
             / {dd("SUM(volume)")} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REVENUE} AS volume, n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's supplier share of ASIA-customer ECONOMY-part
    revenue per order year (conditional-sum ratio over a 8-way join)."""
    _views(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "part", "nation", "region",
    )
    return spark.sql(
        f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                             ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
          SELECT /*+ BROADCAST(n1), BROADCAST(n2), BROADCAST(region) */
                 CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 {_REVENUE} AS volume, n2.n_name AS supp_nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        """
    )


#: Q9 profit: revenue minus a supply-cost proxy of 0.4 × retail price ×
#: quantity (the fixture's stand-in for ps_supplycost × l_quantity).
_PROFIT = (
    f"{_REVENUE} - CAST(p_retailprice AS DECIMAL(6,2))"
    " * CAST(l_quantity AS DECIMAL(4,1)) * CAST(0.4 AS DECIMAL(2,1))"
)


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {dd(f"SUM({_PROFIT})")} AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit by supplier nation and order year for parts matching a
    name pattern — exact-decimal profit decomposition."""
    _views(spark, sf_dir, "lineitem", "orders", "supplier", "part", "nation")
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(nation) */
               n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM({_PROFIT}) AS DOUBLE) AS sum_profit
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
        """
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH val AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_key, {dd("v")} AS part_value
    FROM val
    WHERE {dd("v")} > 1e-3 * (SELECT {dd("SUM(v)")} FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose one-nation supply value exceeds a fraction of the
    global total (grouped HAVING against a scalar subquery). The
    threshold multiply runs in double on both engines from bit-identical
    inputs (dd-converted sums, 1e-3 double literal), so the boundary
    predicate is deterministic."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(
        """
        WITH val AS (
          SELECT /*+ BROADCAST(nation) */
                 l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
          FROM lineitem, supplier, nation
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_3'
          GROUP BY l_partkey
        )
        SELECT l_partkey AS p_key, CAST(v AS DOUBLE) AS part_value
        FROM val
        WHERE CAST(v AS DOUBLE) > 1e-3 * (SELECT CAST(SUM(v) AS DOUBLE) FROM val)
        """
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts (left outer join
    with an ON-clause residual filter, then a double aggregation)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        """
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REVENUE}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, {dd("total_rev")} AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — the
    view-vs-its-own-MAX shape; the equality runs on exact decimals."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, SUM({_REVENUE}) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_rev = (SELECT MAX(total_rev) FROM revenue)
        """
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pq AS (
      SELECT l_partkey AS pk, COUNT(*) AS n, SUM({_QTY_C}) AS tot_c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dd("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem, part, pq
    WHERE p_partkey = l_partkey AND pk = l_partkey
      AND p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND 5 * {_QTY_C} * n < tot_c
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue of below-one-fifth-of-average-quantity lines. The
    TPC-H ``l_quantity < 0.2 * AVG(l_quantity)`` correlated predicate is
    rewritten division-free as ``5 * qty_cents * n < total_cents`` over
    integer quantity-cents — exact on both engines, no float boundary."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        f"""
        WITH pq AS (
          SELECT l_partkey AS pk, COUNT(*) AS n, SUM({_QTY_C}) AS tot_c
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem, part, pq
        WHERE p_partkey = l_partkey AND pk = l_partkey
          AND p_brand = 'Brand#3' AND p_type = 'SMALL'
          AND 5 * {_QTY_C} * n < tot_c
        """
    )


@query(
    "q20_excess_availability_suppliers",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, COUNT(*) AS n,
             SUM({_QTY_C}) AS avail_c,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                      THEN {_QTY_C} ELSE 0 END) AS shipped97_c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey
      AND s_suppkey IN (
        SELECT l_suppkey FROM ps
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND n >= 3 AND 2 * shipped97_c > avail_c)
    """,
)
def q20_excess_availability_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers whose 1997 shipments of red parts exceeded half
    their lifetime volume — the nested IN semi-join chain, with the
    ``0.5 ×`` threshold division-free over integer quantity-cents
    (availability proxy = lifetime shipped quantity; no partsupp)."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation", "part")
    return spark.sql(
        f"""
        WITH ps AS (
          SELECT l_partkey, l_suppkey, COUNT(*) AS n,
                 SUM({_QTY_C}) AS avail_c,
                 SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                          THEN {_QTY_C} ELSE 0 END) AS shipped97_c
          FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT /*+ BROADCAST(nation) */ s_suppkey, s_name, n_name
        FROM supplier, nation
        WHERE s_nationkey = n_nationkey
          AND s_suppkey IN (
            SELECT l_suppkey FROM ps
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'red%')
              AND n >= 3 AND 2 * shipped97_c > avail_c)
        """
    )
