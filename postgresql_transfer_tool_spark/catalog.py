"""Catalog / reflection layer.

The reference discovers its universe of tables by *reflecting* a live
PostgreSQL schema at startup and treating the result as fixed for the run
(``transfer_data_script.py:30-35``,
``transfer_data_with_constraints_script.py:38-39`` — SURVEY.md §1.2, S1).
Spark's JDBC reader infers column types but not constraints, so this layer
keeps its own constraint metadata (PK / unique / check / FK with
ON DELETE/ON UPDATE actions, mirroring
``transfer_data_with_constraints_script.py:80-91,146-151``).

For the driver's parquet fixtures the "reflection" source is the parquet
footer (schema) plus the documented FK graph (FIXTURES.md); for a real
PostgreSQL source the same dataclasses are populated from
``information_schema`` / ``pg_catalog`` queries (see ``sources/jdbc.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every table in the driver's fixture universe (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class ForeignKey:
    """One FK edge, with referential actions preserved for DDL round-trip
    fidelity (reference: ``transfer_data_with_constraints_script.py:146-151``)."""

    table: str
    columns: tuple[str, ...]
    ref_table: str
    ref_columns: tuple[str, ...]
    on_delete: str | None = None
    on_update: str | None = None


@dataclass
class TableInfo:
    """Reflected table metadata — the engine's analog of a SQLAlchemy
    ``Table`` object (reference: ``transfer_data_script.py:62``)."""

    name: str
    schema: str = "public"
    primary_key: tuple[str, ...] = ()
    unique: tuple[tuple[str, ...], ...] = ()
    checks: tuple[str, ...] = ()  # ANSI boolean expressions
    foreign_keys: tuple[ForeignKey, ...] = ()
    serial_columns: tuple[str, ...] = field(default=())  # sequence-backed cols


#: FK graph of the fixture star schema (FIXTURES.md; exercised by the
#: constraint validators C1-C4 and the transfer pipeline's load ordering).
FIXTURE_FOREIGN_KEYS: tuple[ForeignKey, ...] = (
    ForeignKey("nation", ("n_regionkey",), "region", ("r_regionkey",)),
    ForeignKey("customer", ("c_nationkey",), "nation", ("n_nationkey",)),
    ForeignKey("supplier", ("s_nationkey",), "nation", ("n_nationkey",)),
    ForeignKey("orders", ("o_custkey",), "customer", ("c_custkey",)),
    ForeignKey("lineitem", ("l_orderkey",), "orders", ("o_orderkey",)),
    ForeignKey("lineitem", ("l_partkey",), "part", ("p_partkey",)),
    ForeignKey("lineitem", ("l_suppkey",), "supplier", ("s_suppkey",)),
)

FIXTURE_PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    # NB: the fixture's lineitem does NOT satisfy the classic TPC-H
    # (l_orderkey, l_linenumber) key — linenumbers repeat per order — so
    # the reflected catalog declares no PK for it (the constraint audit
    # still exercises it as a violated candidate key, operators/constraints.py).
    "lineitem": (),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def fixture_catalog() -> dict[str, TableInfo]:
    """The reflected fixture universe, constraints included."""
    fks: dict[str, list[ForeignKey]] = {t: [] for t in TABLES}
    for fk in FIXTURE_FOREIGN_KEYS:
        fks[fk.table].append(fk)
    return {
        t: TableInfo(
            name=t,
            primary_key=FIXTURE_PRIMARY_KEYS.get(t, ()),
            foreign_keys=tuple(fks[t]),
            serial_columns=FIXTURE_PRIMARY_KEYS.get(t, ())[:1]
            if t in ("events", "orders", "documents", "embeddings")
            else (),
        )
        for t in TABLES
    }


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _parquet_files(path: str) -> list[str]:
    """Every .parquet data file under ``path`` (itself, if a file) —
    shared listing for both footer readers, walking RECURSIVELY so a
    nested/partitioned dataset (``table=.../date=.../part-0.parquet``)
    is counted fully (r14 ADVICE #3: the flat listdir undercounted
    row groups for partitioned layouts and forced pointless
    repartitions). Sorted for determinism."""
    if not os.path.isdir(path):
        return [path]
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — no data scan.

    The statistics source for size-adaptive operators (LSH bit width,
    IVF cell count): reading the footer costs milliseconds regardless of
    table size, where a ``df.count()`` at 100 TB is a full scan job just
    to learn n. Parquet footers store num_rows exactly (not an
    estimate), so sizing decisions are identical to the count() they
    replace. Handles both single files and directory-style datasets.
    """
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _parquet_files(table_path(sf_dir, name))
    )


#: path → (file identity token, row groups counted, count_is_complete).
#: Driver-side footer reads are the cost being avoided (the _TABLE_MEMO
#: argument applies unchanged): at warehouse scale a table has thousands
#: of files, and re-opening every footer per balance_scan call is
#: repeated single-threaded driver work (r14 ADVICE #1). The token is
#: the table file/dir mtime+size, so in-place rewrites invalidate.
_SPLITS_MEMO: dict[str, tuple[tuple, int, bool]] = {}


def table_scan_splits(sf_dir: str, name: str, stop_at: int | None = None) -> int:
    """Total parquet ROW GROUPS across the table's files — the maximum
    parallelism a Spark scan can actually extract from this layout.

    Spark splits files by byte ranges, but a row group is the smallest
    unit that yields rows, so a table written as one file with one row
    group runs its whole scan stage (and any partial aggregation fused
    into it) on a single task no matter how many byte-range splits the
    planner generates. Operators whose first stage is a full-relation
    fold consult this to decide whether a balancing repartition after
    the read is worth an exchange (guide §2.5 "input skew: one huge
    unsplittable file — repartition immediately after the read"): at
    warehouse scale a table has thousands of row groups and the gate
    never fires; it fires exactly when the physical layout would
    serialize the stage. Footer metadata only — no data scan.

    ``stop_at``: callers that only need to know whether the count
    reaches a threshold (balance_scan's ``< width`` test) pass it so
    the footer walk short-circuits at the threshold instead of opening
    every footer of a thousand-file table. The result is then a lower
    bound ≥ ``stop_at`` rather than the exact total. Counts are
    memoized per (path, file-identity) alongside ``_TABLE_MEMO``.
    """
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    token = _file_token(path)
    hit = _SPLITS_MEMO.get(path)
    if hit is not None and token is not None and hit[0] == token:
        _, n, complete = hit
        if complete or (stop_at is not None and n >= stop_at):
            return n
    n, complete = 0, True
    for f in _parquet_files(path):
        n += pq.ParquetFile(f).metadata.num_row_groups
        if stop_at is not None and n >= stop_at:
            complete = False
            break
    if token is not None:
        if len(_SPLITS_MEMO) >= 512:
            _SPLITS_MEMO.clear()
        _SPLITS_MEMO[path] = (token, n, complete)
    return n


def balance_scan(
    spark: SparkSession, df: DataFrame, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """Round-robin repartition of a scan-derived relation, ONLY when the
    table's physical layout caps scan parallelism below the session's
    core budget (``table_scan_splits``) — used by full-relation folds
    whose partial aggregation would otherwise run fused into a
    single-task scan stage (guide §2.5). The fired exchange carries only
    the columns the caller has already projected; exact aggregates are
    partition-invariant, so results are unchanged. At warehouse scale
    (row groups ≥ cores) this is an exact no-op — no exchange is added.

    Call sites are FACT-table folds (lineitem, documents) by design:
    a small dimension naturally has few row groups at any scale, and
    balancing one would add a pointless tiny exchange on a large
    cluster (r14 VERDICT "What's wrong" #5) — keep this off dimension
    scans.

    ``keys`` (r15): when the downstream fold is a KEYED aggregation,
    balance by HASH on its grouping keys instead of round-robin — the
    groupBy then reuses this exchange outright (guide §2.4 "two
    operations keyed the same way share one exchange"), so the gated
    plan still has exactly one exchange, with the partial aggregation
    running at session width instead of fused into the one-task scan.
    Round-robin would scatter each group across partitions, destroying
    the map-side reduction (measured on copurchase_pairs_topk at sf0.1:
    keyed 1.07 s vs round-robin 1.88 s vs 1.45 s unbalanced).
    """
    width = spark.sparkContext.defaultParallelism
    if table_scan_splits(sf_dir, name, stop_at=width) < width:
        if keys:
            return df.repartition(width, *[F.col(k) for k in keys])
        return df.repartition(width)
    return df


#: (applicationId, sf_dir, name) → (file identity token, DataFrame).
#: METADATA memo only — the handle is a lazy plan whose schema/file
#: listing were inferred once; every action still scans parquet. This is
#: what a metastore gives a SQL engine for free: without it EVERY
#: load_table call re-reads the parquet footer on the driver (~120-170 ms
#: measured at sf0.1), which multiplied across a 215-query bench run is
#: pure single-threaded driver time (guide §5: the driver should do
#: almost no work; §6: repeated listings are cacheable). The token
#: (mtime_ns, size) invalidates the entry if the file is rewritten, so
#: sessions that regenerate a fixture in place never see a stale plan.
_TABLE_MEMO: dict = {}


def _file_token(path: str) -> tuple | None:
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table.

    This is the engine's S2 "full-table scan" (reference
    ``transfer_data_script.py:109-110``) — except nothing is materialized:
    Catalyst prunes columns and pushes predicates into the parquet reader,
    so a downstream 2-column projection reads 2 columns off disk.

    ``events.parquet`` carries a TIMESTAMP(NANOS) column, which Spark's
    parquet reader rejects by default. We read it as raw nanos
    (``nanosAsLong``) and convert to a microsecond timestamp JVM-side with
    integer arithmetic (``DIV 1000`` — float division would lose precision
    above 2^53 ns and disagree with DuckDB's truncating ns→µs read).
    This stays a distributed columnar scan; no driver materialization.

    The returned handle is memoized per (session, path, file identity) —
    see ``_TABLE_MEMO`` above; plans are immutable, so sharing one handle
    across queries changes nothing downstream.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    token = _file_token(table_path(sf_dir, name))
    hit = _TABLE_MEMO.get(key)
    if hit is not None and token is not None and hit[0] == token:
        return hit[1]
    df = _load_table_uncached(spark, sf_dir, name)
    if token is not None:
        if len(_TABLE_MEMO) >= 512:  # bound JVM plan refs in long sessions
            _TABLE_MEMO.clear()
        _TABLE_MEMO[key] = (token, df)
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(table_path(sf_dir, name))
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
            elif dict(df.dtypes).get("ts") == "timestamp_ntz":
                # Round-2 fixtures carry µs TIMESTAMP_NTZ instead of NANOS.
                # Normalize to TIMESTAMP (LTZ): every downstream operator
                # (unix_micros, withWatermark, window) expects it, and under
                # the engine's UTC session the instant is unchanged — DuckDB
                # reads the same column as naive-UTC, so oracles agree.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def list_tables(sf_dir: str) -> list[str]:
    """Which fixture tables exist in a directory — the engine's analog of
    the reference's ``pg_tables`` catalog scan (S4,
    ``after-running-script.sql:7-10``)."""
    return [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]


def table_exists(sf_dir: str, name: str) -> bool:
    """Existence predicate P4 (reference ``transfer_data_script.py:52-56``)."""
    return os.path.exists(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for t in tables:
        if table_exists(sf_dir, t):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def topo_sort_tables(catalog: dict[str, TableInfo]) -> list[str]:
    """FK-dependency load order (parents before children).

    The reference sidesteps ordering by deferring FK DDL to a third phase
    (``transfer_data_with_constraints_script.py:235-253``); the engine keeps
    that design for the *copy* (any parallel order) but still exposes a
    topological order for targets that enforce FKs during load.
    Deterministic: ties broken alphabetically. Raises on cycles.
    """
    deps: dict[str, set[str]] = {
        t: {fk.ref_table for fk in info.foreign_keys if fk.ref_table != t}
        for t, info in catalog.items()
    }
    order: list[str] = []
    done: set[str] = set()
    while deps:
        ready = sorted(t for t, d in deps.items() if d <= done)
        if not ready:
            raise ValueError(f"FK cycle among: {sorted(deps)}")
        order.extend(ready)
        done.update(ready)
        for t in ready:
            del deps[t]
    return order
