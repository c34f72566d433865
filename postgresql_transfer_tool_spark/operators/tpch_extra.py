"""Additional classic analytical query shapes (TPC-H-style Q10/Q12/Q14/
Q18/Q19/Q22 analogs, adapted to the fixture's columns).

These complete the "a PostgreSQL user could run every query they run
today" surface (SURVEY.md §0): multi-join top-k, conditional
aggregation, LIKE-driven revenue ratios, HAVING-gated semi-joins,
disjunctive multi-predicate scans, and anti-join + scalar-subquery
combinations — each with the exact-decimal discipline so results are
engine-stable at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import balance_scan, load_table
from ..functions.exact import dec
from .registry import query
from .relational import dd

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(7,4))"
)


def _revenue_col():
    return dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(1,0)") - dec("l_discount", 6, 4)
    ).cast("decimal(7,4)")


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dd(f"SUM({_REVENUE})")} AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND c_nationkey = n_nationkey
      AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue (4-way join + top-k)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
             AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
             AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (CASE-IN) aggregation over a join — the Q12 shape."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(is_high, 1)).alias("high_line_count"),
            F.count(F.when(~is_high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT {dd(f"SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE} END)")}
             / {dd(f"SUM({_REVENUE})")} * 100 AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share (conditional-sum ratio). No broadcast hint on
    the part side: part grows with SF (O(N) at 100 TB), so the join is
    a plain equi-join — AQE broadcasts it at runtime when genuinely
    small, and shuffles on p_partkey when not."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue_col()
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
                / F.sum(rev).cast("double")
                * 100
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
             AS total_qty
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above a quantity threshold (groupBy + HAVING over a join)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("_q"))
        .filter(F.col("_q") > 300)
        .select(
            "c_custkey", "c_name", "o_orderkey", F.col("_q").cast("double").alias("total_qty")
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dd(f"SUM({_REVENUE})")} AS revenue, COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 20)
        OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
            AND l_quantity >= 10 AND l_quantity <= 40)
        OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
            AND l_quantity >= 20 AND l_quantity <= 50))
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive brand/size/quantity bands (Q19 shape —
    Catalyst pushes the common l_partkey equi-join and evaluates the OR
    branches post-join; the part side broadcasts)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def band(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    cond = (
        band("Brand#1", 1, 15, 1, 20)
        | band("Brand#7", 10, 30, 10, 40)
        | band("Brand#13", 20, 50, 20, 50)
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_revenue_col()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q16_supplier_count_by_part_attrs",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per part attribute combo (Q16 shape:
    NOT-equal + IN-list filters, count-distinct over a join)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_multi_supplier_orders",
    oracle="""
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_shared_orders
    FROM supplier s, lineitem l1
    WHERE s.s_suppkey = l1.l_suppkey
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q21_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: orders it shares with at least one other supplier
    (Q21's correlated-EXISTS-on-the-same-table shape).

    r15 (guide §2.3/§2.4): Catalyst decorrelates the EXISTS into a
    lineitem⋈lineitem LEFT SEMI join on the order key — TWO full
    shuffles + sorts of lineitem. But the predicate "some other row of
    this order has a different suppkey" is a per-order set property:
    l1's EXISTS holds iff its order has ≥ 2 DISTINCT suppliers (l1's
    own suppkey is in the set, so another member exists exactly then).
    One collect_set pass over (orderkey, suppkey) — partial map-side,
    the _baskets idiom — replaces the self-semi-join, and the exploded
    survivors are already DISTINCT (order, supplier) pairs, so the
    COUNT(DISTINCT l_orderkey) by s_name stays exact (a NULL l2
    suppkey never witnesses the oracle's <> predicate, and collect_set
    drops NULLs — same rows). Supplier attaches AFTER the reduction,
    AQE-broadcast at this scale."""
    # keyed balance_scan: the partial collect_set would otherwise run
    # fused into the single-task scan stage of a single-row-group file;
    # hashing on the grouping key lets the groupBy reuse the gated
    # exchange, so the plan keeps exactly one exchange (§2.4/§2.5)
    lineitem = balance_scan(
        spark,
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"),
        sf_dir,
        "lineitem",
        "l_orderkey",
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    shared = (
        lineitem.groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("ss"))
        .filter(F.size("ss") >= 2)
        .select("l_orderkey", F.explode("ss").alias("l_suppkey"))
    )
    return (
        shared.join(supplier, shared.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("n_shared_orders"))
    )


@query(
    "q22_dormant_rich_customers",
    oracle=f"""
    SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode,
           COUNT(*) AS n_customers,
           {dd("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT {dd("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_custkey % 7
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent orders (scalar subquery +
    anti-join + grouped aggregate — the Q22 shape, with c_custkey%7 as
    the country-code analog the fixture lacks)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_q22")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q22")
    return spark.sql(
        """
        SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer_q22
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer_q22 WHERE c_acctbal > 0
          )
          AND NOT EXISTS (SELECT 1 FROM orders_q22 WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_custkey % 7
        """
    )
