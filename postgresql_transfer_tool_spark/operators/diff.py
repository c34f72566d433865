"""Snapshot diff and orderless table checksums — transfer verification.

The reference validates a copy by re-counting rows per table
(``transfer_data_script.py:116-117``: COUNT(*) on source and target).
That check passes when a row was *changed* in flight, or when one row
was dropped and another duplicated. These operators are the stronger
primitives a real migration needs:

- :func:`table_checksum` — an order-independent content hash of a whole
  relation. Each row renders to a canonical string, md5-hashes, and the
  32-bit hash prefixes SUM up. SUM is commutative/associative, so the
  checksum is partition-order invariant and *mergeable*: at 100 TB the
  partial sums combine map-side and only one (count, sum) pair per
  table crosses the wire. Source checksum == target checksum proves the
  copy byte-equivalent without ever co-locating the two datasets.
- :func:`snapshot_diff` — a keyed FULL OUTER JOIN classifying every row
  as added / removed / changed / unchanged between two snapshots of the
  same relation (the "what did the incremental sync miss" audit). One
  shuffle on the key for each side; the classification is a projection.

Cross-engine determinism: every rendered value goes through an exact
type (BIGINT, DECIMAL→VARCHAR, epoch microseconds) — never a raw
double→string, whose formatting is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: canonical NULL sentinel inside a row rendering (concat_ws would
#: otherwise silently skip NULLs and merge adjacent fields).
NULL_TOKEN = "∅"


def row_fingerprint(*rendered: Column) -> Column:
    """md5 of the canonical '|'-joined row rendering."""
    safe = [F.coalesce(c.cast("string"), F.lit(NULL_TOKEN)) for c in rendered]
    return F.md5(F.concat_ws("|", *safe))


def fingerprint_hash(*rendered: Column) -> Column:
    """32-bit integer hash of a row rendering (md5 prefix, engine-portable)."""
    return F.conv(F.substring(row_fingerprint(*rendered), 1, 8), 16, 10).cast(
        "bigint"
    )


def table_checksum(df: DataFrame, *rendered: Column) -> DataFrame:
    """(n_rows, content_checksum) — orderless, mergeable content hash."""
    return df.select(fingerprint_hash(*rendered).alias("h")).agg(
        F.count("*").alias("n_rows"),
        F.sum("h").cast("bigint").alias("content_checksum"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str],
) -> DataFrame:
    """Classify each key as added/removed/changed/unchanged.

    Emits the key columns, ``change_type``, and the old/new rendered
    comparison fingerprints. Equality is judged on the md5 of the
    *rendered* compare columns, so callers control numeric canonical
    form (pass exact-typed columns, not raw doubles).
    """
    o = old.select(
        *keys, row_fingerprint(*[F.col(c) for c in compare]).alias("_old_fp")
    )
    n = new.select(
        *keys, row_fingerprint(*[F.col(c) for c in compare]).alias("_new_fp")
    )
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .when(F.col("_new_fp").isNull(), F.lit("removed"))
        .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.withColumn("change_type", change)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

#: per-table canonical renderings (exact types only — ints as-is,
#: doubles via DECIMAL, timestamps via epoch micros). Spark expression
#: and the equivalent DuckDB SQL fragment stay side by side so the
#: oracle provably renders the same bytes.
_CHECKSUM_TABLES: dict[str, tuple[list[str], str]] = {
    "region": (
        ["CAST(r_regionkey AS STRING)", "r_name"],
        "CAST(r_regionkey AS VARCHAR), r_name",
    ),
    "nation": (
        ["CAST(n_nationkey AS STRING)", "n_name", "CAST(n_regionkey AS STRING)"],
        "CAST(n_nationkey AS VARCHAR), n_name, CAST(n_regionkey AS VARCHAR)",
    ),
    "customer": (
        [
            "CAST(c_custkey AS STRING)",
            "c_name",
            "CAST(c_nationkey AS STRING)",
            "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING)",
            "c_mktsegment",
        ],
        "CAST(c_custkey AS VARCHAR), c_name, CAST(c_nationkey AS VARCHAR), "
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR), c_mktsegment",
    ),
    "supplier": (
        [
            "CAST(s_suppkey AS STRING)",
            "s_name",
            "CAST(s_nationkey AS STRING)",
            "CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS STRING)",
        ],
        "CAST(s_suppkey AS VARCHAR), s_name, CAST(s_nationkey AS VARCHAR), "
        "CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR)",
    ),
    "part": (
        [
            "CAST(p_partkey AS STRING)",
            "p_name",
            "p_brand",
            "p_type",
            "CAST(p_size AS STRING)",
            "CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS STRING)",
        ],
        "CAST(p_partkey AS VARCHAR), p_name, p_brand, p_type, "
        "CAST(p_size AS VARCHAR), "
        "CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS VARCHAR)",
    ),
}


def _checksum_oracle() -> str:
    parts = []
    for table, (_, duck_cols) in _CHECKSUM_TABLES.items():
        parts.append(
            f"""
    SELECT '{table}' AS table_name,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST('0x' || substr(
                md5(concat_ws('|', {duck_cols})), 1, 8) AS BIGINT))
                AS BIGINT) AS content_checksum
    FROM {table}"""
        )
    return " UNION ALL ".join(parts)


@query("table_content_checksums", oracle=_checksum_oracle())
def table_content_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum per dimension table — the
    copy-verification upgrade over the reference's COUNT(*) check
    (``transfer_data_script.py:116-117``). Map-side partial SUM makes
    each table one aggregation pass; no data ever co-locates."""
    outs = []
    for table, (spark_cols, _) in _CHECKSUM_TABLES.items():
        df = load_table(spark, sf_dir, table)
        outs.append(
            table_checksum(df, *[F.expr(c) for c in spark_cols]).select(
                F.lit(table).alias("table_name"),
                "n_rows",
                "content_checksum",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


_DIFF_ORACLE = """
    WITH old AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN cents + 100 ELSE cents END AS cents
      FROM old WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000 AS o_orderkey, cents
      FROM old WHERE o_orderkey % 101 = 0
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.cents <> n.cents THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           COUNT(*) AS n,
           CAST(SUM(COALESCE(o.o_orderkey, n.o_orderkey)) AS BIGINT) AS key_sum,
           CAST(SUM(COALESCE(n.cents, 0) - COALESCE(o.cents, 0)) AS BIGINT)
             AS cents_delta
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    GROUP BY 1
"""


@query("snapshot_diff_orders", oracle=_DIFF_ORACLE)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff: orders vs a deterministically mutated copy
    (drop keys %97, reprice keys %89 by +$1, clone keys %101 under new
    ids) — the audit that catches what a row-count check cannot.

    Shape at scale: both sides shuffle once on the join key; the
    classification and the per-class rollup are projections on top. The
    mutated snapshot here stands in for "the target after an
    incremental sync"; :func:`snapshot_diff` is the general API.
    """
    cents = (
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    old = load_table(spark, sf_dir, "orders").select("o_orderkey", cents)
    key = F.col("o_orderkey")
    survivors = old.filter(key % 97 != 0).select(
        "o_orderkey",
        F.when(key % 89 == 0, F.col("cents") + 100)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    added = old.filter(key % 101 == 0).select(
        (key + 100000000).alias("o_orderkey"), "cents"
    )
    new = survivors.unionAll(added)

    o = old.withColumnRenamed("cents", "_old_cents")
    n = new.withColumnRenamed("cents", "_new_cents")
    joined = o.join(n, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("_old_cents").isNull(), F.lit("added"))
        .when(F.col("_new_cents").isNull(), F.lit("removed"))
        .when(F.col("_old_cents") != F.col("_new_cents"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change_type", change)
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            F.sum(
                F.coalesce(F.col("_new_cents"), F.lit(0))
                - F.coalesce(F.col("_old_cents"), F.lit(0))
            )
            .cast("bigint")
            .alias("cents_delta"),
        )
    )


_COLDIFF_ORACLE = """
    WITH old AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             o_orderstatus, o_orderpriority
      FROM orders
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN cents + 100 ELSE cents END AS cents,
             CASE WHEN o_orderkey % 83 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 79 = 0 THEN '9-RUSH' ELSE o_orderpriority END
               AS o_orderpriority
      FROM old WHERE o_orderkey % 97 <> 0
    ),
    j AS (
      SELECT o.o_orderkey,
             CASE WHEN o.cents <> n.cents THEN 1 ELSE 0 END AS d_price,
             CASE WHEN o.o_orderstatus <> n.o_orderstatus THEN 1 ELSE 0 END AS d_status,
             CASE WHEN o.o_orderpriority <> n.o_orderpriority THEN 1 ELSE 0 END AS d_priority
      FROM old o JOIN new n USING (o_orderkey)
    )
    SELECT col, n_changed, changed_key_sum FROM (
      SELECT 'o_totalprice' AS col, CAST(SUM(d_price) AS BIGINT) AS n_changed,
             CAST(SUM(d_price * o_orderkey) AS BIGINT) AS changed_key_sum FROM j
      UNION ALL
      SELECT 'o_orderstatus', CAST(SUM(d_status) AS BIGINT),
             CAST(SUM(d_status * o_orderkey) AS BIGINT) FROM j
      UNION ALL
      SELECT 'o_orderpriority', CAST(SUM(d_priority) AS BIGINT),
             CAST(SUM(d_priority * o_orderkey) AS BIGINT) FROM j
    ) t
    """


@query("snapshot_diff_columns", oracle=_COLDIFF_ORACLE)
def snapshot_diff_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level drill-down of the keyed snapshot diff: for keys
    present in BOTH snapshots, count per COLUMN how many rows changed
    (price repriced on keys %89, status flipped on %83, priority
    rewritten on %79; %97 keys dropped so the matched set is real).
    This is the audit a sync operator runs after ``snapshot_diff``
    says "3 1 2 changed": WHICH columns drifted, with a key checksum per
    column so divergent rows can be fetched. Shape at scale: one keyed
    equi-join (same shuffle as the row diff), then the per-column
    comparisons fold into ONE aggregation producing a fixed-width row —
    the long (column, count) form is a constant-size unpivot of that
    single row, so column count multiplies neither shuffles nor scans.
    Reference analog: verify_data_transfer_script.py's count check,
    upgraded to column granularity (SURVEY §2.6)."""
    cents = (
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    old = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents, "o_orderstatus", "o_orderpriority"
    )
    key = F.col("o_orderkey")
    new = old.filter(key % 97 != 0).select(
        "o_orderkey",
        F.when(key % 89 == 0, F.col("cents") + 100)
        .otherwise(F.col("cents"))
        .alias("cents"),
        F.when(key % 83 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(key % 79 == 0, F.lit("9-RUSH"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    o = old.select(
        "o_orderkey",
        F.col("cents").alias("_o_cents"),
        F.col("o_orderstatus").alias("_o_status"),
        F.col("o_orderpriority").alias("_o_priority"),
    )
    j = o.join(new, "o_orderkey")
    flags = j.select(
        "o_orderkey",
        (F.col("_o_cents") != F.col("cents")).cast("bigint").alias("d_price"),
        (F.col("_o_status") != F.col("o_orderstatus"))
        .cast("bigint")
        .alias("d_status"),
        (F.col("_o_priority") != F.col("o_orderpriority"))
        .cast("bigint")
        .alias("d_priority"),
    )
    wide = flags.agg(
        F.sum("d_price").alias("n_price"),
        F.sum(F.col("d_price") * F.col("o_orderkey")).alias("k_price"),
        F.sum("d_status").alias("n_status"),
        F.sum(F.col("d_status") * F.col("o_orderkey")).alias("k_status"),
        F.sum("d_priority").alias("n_priority"),
        F.sum(F.col("d_priority") * F.col("o_orderkey")).alias("k_priority"),
    )
    # constant-size unpivot of the single aggregated row
    return wide.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_totalprice").alias("col"),
                    F.col("n_price").alias("n_changed"),
                    F.col("k_price").alias("changed_key_sum"),
                ),
                F.struct(
                    F.lit("o_orderstatus").alias("col"),
                    F.col("n_status").alias("n_changed"),
                    F.col("k_status").alias("changed_key_sum"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col"),
                    F.col("n_priority").alias("n_changed"),
                    F.col("k_priority").alias("changed_key_sum"),
                ),
            )
        ).alias("c")
    ).select("c.col", "c.n_changed", "c.changed_key_sum")
