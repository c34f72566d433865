"""Table statistics (ANALYZE) — the input every cost-based decision eats.

The engine's broadcast/shuffle/skew choices all key off relation sizes
and key cardinalities; a 100 TB deployment runs this per table/partition
on a schedule (Spark's own ``ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS`` feeds the same numbers to Catalyst's CBO). One pass computes
every column's null count, exact NDV, and min/max — all
partial-aggregable, so the scan parallelizes and merges like any other
aggregate. Output is long-form (one row per column) so the relation is
stable as schemas evolve.

NULL-semantics companion: ``not_in_null_semantics`` pins the
three-valued-logic corner every engine must agree on — ``x NOT IN
(subquery with NULL)`` is never TRUE — because a migration tool that
"validates" with NOT IN and gets engine-specific answers corrupts its
orphan checks (the reference's FK validation domain, C4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import balance_scan, load_table
from .registry import query

#: columns profiled by the registered query (orders table)
_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "analyze_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS col,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS ndv,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_v,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders`` in two cheap passes (the
    oracle's UNION ALL re-scans per column — fine for DuckDB, wrong at
    scale): a keyless counts/min/max aggregate and a long-form exact-NDV
    chain, joined on the column name. min/max stringify so one
    long-form relation carries mixed column types."""
    # r14 (guide §1.2/§2.3): the one-agg form planned the 4-way exact
    # multi-countDistinct as an Expand(×5 rows) feeding SortAggregates
    # (string min/max buffers are not hash-aggregable), i.e. two full
    # sorts of a 5× row stream on a 5-part key. Split instead into
    # (a) a keyless pass for counts/min/max — no Expand, no sort
    # (zero grouping keys need no ordering) — and (b) the exact NDVs
    # via a long-form (col, value) HashAggregate chain: stack each
    # column to its string image (injective for bigint, identity for
    # varchar, so COUNT DISTINCT is unchanged), reduce to distinct
    # pairs map-side, count per column. Every aggregate is hash-based
    # and partial; the only full-row exchange carries 2 narrow columns.
    aggs = []
    for c in _COLS:
        aggs += [
            F.count("*").alias(f"n_{c}"),
            (F.count("*") - F.count(c)).alias(f"nulls_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    one = load_table(spark, sf_dir, "orders").agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_{c}, nulls_{c}, min_{c}, max_{c}" for c in _COLS
    )
    wide = one.select(
        F.expr(
            f"stack({len(_COLS)}, {stack_args})"
            " AS (col, n_rows, n_nulls, min_v, max_v)"
        )
    )
    val_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _COLS
    )
    ndv = (
        load_table(spark, sf_dir, "orders")
        .select(F.expr(f"stack({len(_COLS)}, {val_args}) AS (col, v)"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .groupBy("col")
        .agg(F.count("*").alias("ndv"))
    )
    return (
        wide.join(ndv, "col", "left")
        .select(
            "col",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("ndv"), F.lit(0).cast("bigint")).alias("ndv"),
            "min_v",
            "max_v",
        )
    )


@query(
    "not_in_null_semantics",
    oracle="""
    WITH probe AS (
      SELECT c_custkey FROM customer WHERE c_custkey <= 20
    ),
    keys_with_null AS (
      SELECT o_custkey AS k FROM orders WHERE o_custkey <= 10
      UNION ALL SELECT NULL
    )
    SELECT
      (SELECT COUNT(*) FROM probe
       WHERE c_custkey NOT IN (SELECT k FROM keys_with_null)) AS n_not_in_with_null,
      (SELECT COUNT(*) FROM probe
       WHERE c_custkey NOT IN (SELECT k FROM keys_with_null WHERE k IS NOT NULL))
        AS n_not_in_clean,
      (SELECT COUNT(*) FROM probe
       WHERE c_custkey IN (SELECT k FROM keys_with_null)) AS n_in_with_null
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic parity: NOT IN over a set containing NULL is
    never TRUE (count 0); the NULL-filtered variant behaves like the
    anti-join the engine's FK orphan check uses. Expressed via
    spark.sql so the null-aware anti-join planning path itself is
    exercised, exactly as a SQL user would hit it."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("c_nn")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("o_nn")
    return spark.sql(
        """
        WITH probe AS (
          SELECT c_custkey FROM c_nn WHERE c_custkey <= 20
        ),
        keys_with_null AS (
          SELECT o_custkey AS k FROM o_nn WHERE o_custkey <= 10
          UNION ALL SELECT NULL
        )
        SELECT
          (SELECT COUNT(*) FROM probe
           WHERE c_custkey NOT IN (SELECT k FROM keys_with_null)) AS n_not_in_with_null,
          (SELECT COUNT(*) FROM probe
           WHERE c_custkey NOT IN (SELECT k FROM keys_with_null WHERE k IS NOT NULL))
            AS n_not_in_clean,
          (SELECT COUNT(*) FROM probe
           WHERE c_custkey IN (SELECT k FROM keys_with_null)) AS n_in_with_null
        """
    )


@query(
    "corr_quantity_price",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(8,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(8,2))
                 * CAST(l_quantity AS DECIMAL(8,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(8,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
            - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
             AS pearson_r
    FROM m
    """,
)
def corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between quantity and extended price per
    return flag — the ANALYZE-style column-correlation statistic a
    cost-based optimizer consumes (and the engine-portable alternative
    to ``F.corr``, whose streaming covariance accumulation is
    order-dependent). The five moments are exact decimal sums (one
    aggregation pass, map-side combined); the closing formula is a
    fixed sequence of correctly-rounded double ops — multiply, subtract,
    sqrt, divide in identical order in both engines — on
    identical decimal inputs, so the result is bit-identical. At 100 TB
    this is one narrow shuffle of five accumulators per group.

    The oracle's decimal→double conversions use the VARCHAR round-trip
    (relational.dd) on every moment before the closing arithmetic.

    r14 (guide §1.2/§2.5): the decimal casts and products are projected
    ONCE before the aggregate (aggregate-function arguments get no CSE
    across buffers), and ``balance_scan`` parallelizes the fold when the
    parquet layout would serialize the scan stage (no-op at scale)."""
    x = F.col("l_quantity").cast("decimal(8,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    p = balance_scan(
        spark,
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        ),
        sf_dir,
        "lineitem",
    ).select(
        "l_returnflag",
        x.alias("dx"),
        y.alias("dy"),
        (x * x).alias("dxx"),
        (y * y).alias("dyy"),
        (x * y).alias("dxy"),
    )
    m = (
        p.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("dx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum("dxx").alias("sxx"),
            F.sum("dyy").alias("syy"),
            F.sum("dxy").alias("sxy"),
        )
    )
    def d(c):  # decimal → double via VARCHAR (correctly-rounded, portable)
        return F.col(c).cast("string").cast("double")

    nd = F.col("n").cast("double")
    r = (nd * d("sxy") - d("sx") * d("sy")) / (
        F.sqrt(nd * d("sxx") - d("sx") * d("sx"))
        * F.sqrt(nd * d("syy") - d("sy") * d("sy"))
    )
    return m.select("l_returnflag", "n", r.alias("pearson_r"))


@query(
    "ols_quantity_price",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(8,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(8,2))
                 * CAST(l_quantity AS DECIMAL(8,2))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(8,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, slope,
           (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
            - slope * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE)
             AS intercept
    FROM (
      SELECT l_returnflag, n, sx, sy,
             (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
              - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
               AS slope
      FROM m
    ) s
    """,
)
def ols_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit price ~ quantity per return flag, from the same
    exact decimal moments as ``corr_quantity_price`` — the distributed
    regression recipe: one aggregation pass collects (n, Σx, Σy, Σxx,
    Σxy), the closed-form slope/intercept is a fixed double-op sequence
    on identical inputs in both engines. No iteration, no driver math —
    the shuffle carries five accumulators per group at any scale."""
    x = F.col("l_quantity").cast("decimal(8,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = (
        balance_scan(  # same fold shape as corr_quantity_price (r14)
            spark,
            load_table(spark, sf_dir, "lineitem").select(
                "l_returnflag", "l_quantity", "l_extendedprice"
            ),
            sf_dir,
            "lineitem",
        )
        .select(
            "l_returnflag",
            x.alias("dx"),
            y.alias("dy"),
            (x * x).alias("dxx"),
            (x * y).alias("dxy"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("dx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum("dxx").alias("sxx"),
            F.sum("dxy").alias("sxy"),
        )
    )
    def d(c):
        return F.col(c).cast("string").cast("double")

    nd = F.col("n").cast("double")
    slope = (nd * d("sxy") - d("sx") * d("sy")) / (
        nd * d("sxx") - d("sx") * d("sx")
    )
    s = m.select("l_returnflag", "n", "sx", "sy", slope.alias("slope"))
    intercept = (d("sy") - F.col("slope") * d("sx")) / nd
    return s.select("l_returnflag", "n", "slope", intercept.alias("intercept"))


@query(
    "mcv_orders_columns",
    oracle="""
    WITH long AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ), counted AS (
      SELECT col, val, COUNT(*) AS n FROM long GROUP BY col, val
    ), tot AS (
      SELECT col, SUM(n) AS total FROM counted GROUP BY col
    )
    SELECT col, val, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS frac, rk
    FROM (
      SELECT c.col, c.val, c.n, t.total,
             ROW_NUMBER() OVER (PARTITION BY c.col
                                ORDER BY c.n DESC, c.val) AS rk
      FROM counted c JOIN tot t ON c.col = t.col
    ) ranked WHERE rk <= 3
    """,
)
def mcv_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common-values statistic (the pg_stats ``most_common_vals`` /
    ``most_common_freqs`` pair) for the orders enumeration columns —
    completing the ANALYZE quartet next to NDV, equi-depth histograms,
    and column correlation. One stack pass puts both columns in long
    form, one aggregation counts them, and the per-column top-3 rank
    runs over the already-aggregated (tiny) value table — the scan is
    read once regardless of how many columns are profiled."""
    long = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority) AS (col, val)"
        )
    )
    counted = long.groupBy("col", "val").agg(F.count("*").alias("n"))
    tot = counted.groupBy("col").agg(F.sum("n").alias("total"))
    from pyspark.sql.window import Window

    rk = F.row_number().over(
        Window.partitionBy("col").orderBy(F.col("n").desc(), F.col("val"))
    )
    return (
        counted.join(F.broadcast(tot), "col")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            "col",
            "val",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "frac"
            ),
            "rk",
        )
    )


@query(
    "moments_value_by_type",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(value AS DECIMAL(10,4)) AS v,
             CAST(CAST(value AS DECIMAL(10,4))
                  * CAST(value AS DECIMAL(10,4)) AS DECIMAL(22,8)) AS v2
      FROM events
    ), m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(v) AS s1,
             SUM(v2) AS s2,
             SUM(CAST(v2 * v AS DECIMAL(34,12))) AS s3
      FROM q GROUP BY event_type
    )
    SELECT event_type, n, mean,
           (CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
            - mean * mean) AS variance,
           (CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
            - 3.0 * mean * (CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
            + 2.0 * mean * mean * mean)
           / (sqrt(CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                   - mean * mean)
              * sqrt(CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                     - mean * mean)
              * sqrt(CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                     - mean * mean)) AS skewness
    FROM (
      SELECT event_type, n, s1, s2, s3,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean
      FROM m
    ) b
    """,
)
def moments_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population mean / variance / skewness per event type from exact
    decimal power sums — the one-pass distributed moments recipe
    (Σx, Σx², Σx³ map-side combined, closed forms in double afterwards).
    Spark's built-in ``skewness()`` uses a streaming update whose FP
    error depends on row order; computing from exact sums makes the
    statistic deterministic AND engine-portable. The σ³ denominator
    is sd·sd·sd (three correctly-rounded multiplies) — libm pow(x, 3.0)
    differs by an ulp between engines and is avoided, like log()."""
    v = F.col("value").cast("decimal(10,4)")
    q = balance_scan(  # r14: parallelize the fold on narrow layouts
        spark,
        load_table(spark, sf_dir, "events").select("event_type", "value"),
        sf_dir,
        "events",
    ).select(
        "event_type",
        v.alias("v"),
        (v * v).cast("decimal(22,8)").alias("v2"),
    )
    # v3 projected pre-agg too (no CSE across aggregate buffers — r14)
    q = q.select(
        "event_type", "v", "v2",
        (F.col("v2") * F.col("v")).cast("decimal(34,12)").alias("v3"),
    )
    m = q.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum("v2").alias("s2"),
        F.sum("v3").alias("s3"),
    )
    def d(c):
        return F.col(c).cast("string").cast("double")

    nd = F.col("n").cast("double")
    b = m.select("event_type", "n", "s1", "s2", "s3", (d("s1") / nd).alias("mean"))
    mean = F.col("mean")
    m2 = d("s2") / nd
    variance = m2 - mean * mean
    sd = F.sqrt(variance)
    skew = (d("s3") / nd - F.lit(3.0) * mean * m2
            + F.lit(2.0) * mean * mean * mean) / (sd * sd * sd)
    return b.select("event_type", "n", "mean", variance.alias("variance"),
                    skew.alias("skewness"))


# ---------------------------------------------------------------------------
# One-pass correlation matrix — the multi-column generalization of
# corr_quantity_price. Both the Spark aggregation and the DuckDB oracle
# are generated from one column spec so the moment set and the closing
# arithmetic can never drift apart.
# ---------------------------------------------------------------------------

#: measure columns and their exact decimal shapes
_CM_COLS = {
    "l_quantity": (8, 2),
    "l_extendedprice": (12, 2),
    "l_discount": (4, 2),
    "l_tax": (4, 2),
}
_CM_PAIRS = [
    (a, b)
    for i, a in enumerate(_CM_COLS)
    for b in list(_CM_COLS)[i + 1 :]
]


def _cm_oracle() -> str:
    from .relational import dd

    def dc(c):
        p, s = _CM_COLS[c]
        return f"CAST({c} AS DECIMAL({p},{s}))"

    sums = ["COUNT(*) AS n"]
    for c in _CM_COLS:
        sums.append(f"SUM({dc(c)}) AS s_{c}")
        sums.append(f"SUM({dc(c)} * {dc(c)}) AS ss_{c}")
    for a, b in _CM_PAIRS:
        sums.append(f"SUM({dc(a)} * {dc(b)}) AS sp_{a}_{b}")
    selects = []
    for a, b in _CM_PAIRS:
        r = (
            f"(CAST(n AS DOUBLE) * {dd(f'sp_{a}_{b}')} - {dd(f's_{a}')} * {dd(f's_{b}')})"
            f" / (sqrt(CAST(n AS DOUBLE) * {dd(f'ss_{a}')} - {dd(f's_{a}')} * {dd(f's_{a}')})"
            f" * sqrt(CAST(n AS DOUBLE) * {dd(f'ss_{b}')} - {dd(f's_{b}')} * {dd(f's_{b}')}))"
        )
        selects.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, {r} AS pearson_r FROM m"
        )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(selects)
    )


@query("correlation_matrix_lineitem", oracle=_cm_oracle())
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between all four lineitem measures
    in ONE aggregation pass — the ANALYZE-style dependency profile a
    cost-based optimizer (or a feature-selection pass) consumes. The
    pass computes n + per-column exact decimal sums/sums-of-squares +
    per-pair cross-product sums (15 accumulators, map-side combined);
    every pairwise r then closes over the same moment row with a fixed
    sequence of correctly-rounded double ops, identical in both
    engines, so the whole matrix is bit-portable. Scale: one narrow
    shuffle of a constant-width accumulator row regardless of table
    size — adding a measure column adds O(k) accumulators, never
    another scan. Generalizes corr_quantity_price (same recipe, k
    columns); reference analog: none (X5 ANALYZE family).

    r14 shape (guide §1.2 per-task work, §2.5 input layout, §5 driver):
    - the decimal casts and the 10 pairwise products are projected ONCE
      before the aggregate — as aggregate-function arguments each cast
      was re-evaluated per function (no CSE across aggregate buffers),
      ~2× the per-row decimal work;
    - a balancing repartition fires ONLY when the parquet layout cannot
      parallelize the scan stage (row groups < session cores,
      ``table_scan_splits``) — the fold is otherwise serialized on one
      task by a single-row-group file; at warehouse scale the gate is
      a no-op and no exchange is added;
    - the closing arithmetic runs on the driver over the COLLECTED
      1-row constant-width moment row (the engine's bounded-scalar-read
      class, like the ANN centroid sample): shipping 6 near-identical
      big decimal expression trees through per-call planning plus a
      lazy localCheckpoint cost ~2.4 s/call of driver time at ANY data
      size, strictly more than the whole distributed pass. Every double
      op below mirrors the previous Spark expression sequence
      (float(Decimal) = decimal→string→double cast, both correctly
      rounded; explicit x*x; sqrt(neg)→NaN; /0→NULL), so results are
      bit-identical — proved by the oracle hash at sf0.01/sf0.1.

    EAGER-EXECUTION contract (r14 ADVICE #2): because the closing runs
    over that collected moment row, the distributed aggregation executes
    at DataFrame-BUILD time — calling this function runs the full pass
    even if the caller only explains or schema-checks the returned
    DataFrame (whose plan is just a Scan of the 6 local result rows).
    Plan-dump tooling should not mistake the cheap returned plan for
    the cost of the operator."""
    def dc(c):
        p, s = _CM_COLS[c]
        return F.col(c).cast(f"decimal({p},{s})")

    t = balance_scan(
        spark,
        load_table(spark, sf_dir, "lineitem").select(*_CM_COLS),
        sf_dir,
        "lineitem",
    )
    proj = [dc(c).alias(f"d_{c}") for c in _CM_COLS]
    p = t.select(*proj)
    aggs = [F.count("*").alias("n")]
    for c in _CM_COLS:
        aggs.append(F.sum(f"d_{c}").alias(f"s_{c}"))
        aggs.append(F.sum(F.col(f"d_{c}") * F.col(f"d_{c}")).alias(f"ss_{c}"))
    for a, b in _CM_PAIRS:
        aggs.append(F.sum(F.col(f"d_{a}") * F.col(f"d_{b}")).alias(f"sp_{a}_{b}"))
    row = p.agg(*aggs).collect()[0]
    return spark.createDataFrame(
        _cm_close_moments(row),
        "col_x string, col_y string, n bigint, pearson_r double",
    )


def _cm_close_moments(row) -> list[tuple]:
    """Close every pairwise Pearson r over the collected moment row with
    the exact double-op sequence the previous in-plan expression used
    (see correlation_matrix_lineitem docstring); pinned bit-identical to
    the Spark-expression form — including sqrt(negative)→NaN, double
    /0→NULL and NULL propagation — by tests/test_r14_optimizations.py."""
    import math

    def d(x):
        v = row[x]
        return None if v is None else float(v)

    def rsqrt(x):  # Spark sqrt: NaN stays NaN, negative -> NaN
        return float("nan") if (x != x or x < 0.0) else math.sqrt(x)

    n = row["n"]
    nd = float(n)
    data = []
    for a, b in _CM_PAIRS:
        sa, sb = d(f"s_{a}"), d(f"s_{b}")
        ssa, ssb, sp = d(f"ss_{a}"), d(f"ss_{b}"), d(f"sp_{a}_{b}")
        if None in (sa, sb, ssa, ssb, sp):  # NULL propagation (n = 0)
            data.append((a, b, n, None))
            continue
        num = nd * sp - sa * sb
        den = rsqrt(nd * ssa - sa * sa) * rsqrt(nd * ssb - sb * sb)
        # den == 0 -> NULL mirrors the DuckDB oracle (double /0 is NULL
        # there); the previous in-plan form would RAISE under Spark-4
        # ANSI Divide — unreachable on real measures (a zero den needs
        # zero variance across a whole column), where the two closings
        # are bit-identical.
        r = None if den == 0.0 else num / den
        data.append((a, b, n, r))
    return data
