"""The transfer pipeline — the reference's flagship flow, Spark-native.

Reference shape (SURVEY.md §3.1-§3.2): reflect source → (phase 1) create
target tables without FKs → (phase 2) chunked sequential copy with
row-wise inserts → (phase 3) add FK constraints → sequence resync via
``after-running-script.sql``.

Engine shape, same semantics, scale-correct physics:

- phase 1 (plan): reflect schemas + constraints; exclusion (P3) and
  existence (P4) predicates applied to the work list.
- phase 2 (copy): tables copy in PARALLEL (driver thread pool — the
  reference loops sequentially, ``transfer_data_script.py:88``), each
  table as one distributed partitioned read→write (the OFFSET/LIMIT
  chunk loop of ``transfer_data_script.py:107-114`` disappears into
  Spark partitioning). Writes are staged and atomically renamed — the
  engine's per-table COMMIT/ROLLBACK analog (K5/K6): a failed table
  leaves no partial target.
- phase 3 (constraints): validators run on the target (C1 PK, C4 FK
  anti-joins); violations fail the table rather than silently landing;
  FK DDL is emitted as statements for RDBMS targets (K4 — Spark itself
  has no enforced FKs).
- phase 4 (sequence resync): COALESCE(MAX(id),0)+1 per serial column
  (A2-A4), persisted to a sequence manifest — the lake-target analog of
  ``setval`` (K7); per-object error isolation as in the PL/pgSQL blocks
  (K8, ``after-running-script.sql:23-26``).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import (
    TableInfo,
    fixture_catalog,
    list_tables,
    load_table,
    table_exists,
    table_path,
)


@dataclass
class TableResult:
    table: str
    status: str  # copied | skipped_excluded | skipped_missing | skipped_incompatible | failed
    source_rows: int = -1
    target_rows: int = -1
    error: str | None = None
    #: non-clean schema_compat verdicts vs a pre-existing target (append mode)
    schema_issues: list[dict] = field(default_factory=list)
    #: multiset source↔target equivalence (opt-in verify pass); None = not run
    verified: bool | None = None
    pk_violations: int = 0
    fk_orphans: dict[str, int] = field(default_factory=dict)
    unique_violations: dict[str, int] = field(default_factory=dict)
    check_violations: dict[str, int] = field(default_factory=dict)
    next_sequence_value: int | None = None


@dataclass
class TransferReport:
    results: dict[str, TableResult] = field(default_factory=dict)
    fk_ddl: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(
            r.status in ("copied", "skipped_excluded") and r.pk_violations == 0
            and all(v == 0 for v in r.fk_orphans.values())
            and all(v == 0 for v in r.unique_violations.values())
            and all(v == 0 for v in r.check_violations.values())
            for r in self.results.values()
        )


def fk_ddl_statement(info: TableInfo, fk) -> str:
    """The ALTER TABLE statement the reference hand-builds
    (``transfer_data_with_constraints_script.py:138-161``), preserved for
    RDBMS targets; referential actions included. Identifiers quote per
    PostgreSQL rules so mixed-case/hyphenated schemas (the reference's
    \"fde-local\", after-running-script.sql:84-126) round-trip."""
    from .types import quote_ident, quote_qualified

    cols = ", ".join(quote_ident(c) for c in fk.columns)
    ref_cols = ", ".join(quote_ident(c) for c in fk.ref_columns)
    name = quote_ident(f"fk_{fk.table}_{'_'.join(fk.columns)}")
    stmt = (
        f"ALTER TABLE {quote_qualified(info.schema, fk.table)} ADD CONSTRAINT {name} "
        f"FOREIGN KEY ({cols}) REFERENCES {quote_qualified(info.schema, fk.ref_table)} ({ref_cols})"
    )
    if fk.on_delete:
        stmt += f" ON DELETE {fk.on_delete}"
    if fk.on_update:
        stmt += f" ON UPDATE {fk.on_update}"
    return stmt


class TransferPipeline:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        target_dir: str,
        exclude: tuple[str, ...] = (),
        catalog: dict[str, TableInfo] | None = None,
        max_parallel_tables: int | None = None,
        partition_by: dict[str, tuple[str, ...]] | None = None,
        mode: str = "overwrite",
    ) -> None:
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
        self.spark = spark
        self.source_dir = source_dir
        self.target_dir = target_dir
        self.exclude = set(exclude)
        self.catalog = catalog if catalog is not None else fixture_catalog()
        #: in-flight table bound for the copy AND validation pools.
        #: Default scales with the session's core budget (guide §2.6
        #: keeps the in-flight count modest — enough concurrent jobs to
        #: back-fill a big table's write tail, not so many they fight):
        #: cores/4 clamped to [4, 8]; local[32] ⇒ 8, an 8-core driver
        #: rerun ⇒ 4 (the r14 constant). Real deployments pass their
        #: own value.
        if max_parallel_tables is None:
            cores = spark.sparkContext.defaultParallelism
            max_parallel_tables = max(4, min(8, cores // 4))
        self.max_parallel_tables = max_parallel_tables
        #: "overwrite" replaces targets (the reference's fresh-migration
        #: path); "append" loads INTO pre-existing targets — the
        #: reference's CREATE IF NOT EXISTS + INSERT semantics
        #: (transfer_data_script.py:59-71,126) — gated by a schema
        #: pre-flight (types.schema_compat): a source column that would
        #: narrow, collide, or violate a target NOT NULL skips the table
        #: BEFORE any data moves, instead of failing mid-insert.
        self.mode = mode
        #: per-table output partitioning, e.g. {"events": ("event_date",)} —
        #: at 100 TB the target layout (partition pruning for every
        #: downstream incremental read) matters as much as the copy itself.
        #: Columns not in the source schema are derived when recognized
        #: (``<ts_col>_date`` → ``to_date(ts_col)``).
        self.partition_by = partition_by or {}

    # -- phase 2 helper: one table, staged-atomic ---------------------------

    def _copy_table(self, name: str) -> TableResult:
        res = TableResult(name, "copied")
        staging = os.path.join(self.target_dir, f"{name}.parquet.staging-{uuid.uuid4().hex}")
        final = table_path(self.target_dir, name)
        try:
            from pyspark.sql import Observation

            df = load_table(self.spark, self.source_dir, name)
            part_cols = self.partition_by.get(name)
            if part_cols:
                for c in part_cols:
                    if c not in df.columns and c.endswith("_date") and c[:-5] in df.columns:
                        df = df.withColumn(c, F.to_date(F.col(c[:-5])))
            # identity projection (P1) stays columnar; the write is the
            # batched-insert analog (K1 → JDBC batchsize / parquet row
            # groups). The source row count rides the write itself via
            # observe() — no second full source scan (at 100 TB, or over
            # JDBC, a re-count is a second pass over the table).
            obs = Observation(f"copy_{name}")
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            existing_rows = 0
            if self.mode == "append" and os.path.exists(final):
                from .types import is_loadable, schema_compat

                existing = self.spark.read.parquet(final)
                compat = schema_compat(df.schema, existing.schema)
                res.schema_issues = [
                    r for r in compat if r["verdict"] not in ("equal", "widening")
                ]
                if not is_loadable(compat):
                    res.status = "skipped_incompatible"
                    res.error = "; ".join(
                        f"{r['column']}: {r['verdict']}" for r in res.schema_issues
                    )
                    return res
                # align to the target: widen source columns to the target
                # types, let unionByName null-fill nullable target extras
                aligned = df.select(
                    *[
                        F.col(f.name).cast(existing.schema[f.name].dataType)
                        if f.name in existing.columns
                        else F.col(f.name)
                        for f in df.schema.fields
                    ]
                )
                existing_rows = existing.count()
                # staged full rewrite keeps the table-level atomic-rename
                # commit; an RDBMS target would instead JDBC-append with
                # per-partition transactions (no local rewrite)
                df = existing.unionByName(aligned, allowMissingColumns=True)
            writer = df.write.mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.parquet(staging)
            res.source_rows = int(obs.get["rows"])
            # target count reads parquet footers only (metadata-cheap)
            res.target_rows = self.spark.read.parquet(staging).count()
            if res.target_rows != res.source_rows + existing_rows:
                raise RuntimeError(
                    f"row-count mismatch {existing_rows}+{res.source_rows}"
                    f" != {res.target_rows}"
                )
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(staging, final)  # atomic table-level "commit" (K5)
        except Exception as exc:  # error isolation per table (O8/K6)
            res.status = "failed"
            res.error = f"{type(exc).__name__}: {exc}"
            shutil.rmtree(staging, ignore_errors=True)  # "rollback"
        return res

    # -- phases --------------------------------------------------------------

    def run(self) -> TransferReport:
        report = TransferReport()
        os.makedirs(self.target_dir, exist_ok=True)

        # phase 1: plan — reflection + exclusion/existence predicates
        work: list[str] = []
        for name in list_tables(self.source_dir):
            if name in self.exclude:  # P3
                report.results[name] = TableResult(name, "skipped_excluded")
                continue
            if not table_exists(self.source_dir, name):  # P4
                report.results[name] = TableResult(name, "skipped_missing")
                continue
            work.append(name)

        # phases 2-4 OVERLAPPED (r15, guide §2.6 "overlap independent
        # jobs"): copies run in one thread pool, and each table's
        # validation (+ sequence resync) is submitted to a SECOND pool
        # the moment its own copy AND the copy attempts of all its FK
        # parents have completed — the r14 form had a hard barrier
        # between the copy phase and the validation phase, so the
        # cluster idled through the big fact table's write tail while
        # every small table's already-copied audits waited. Two pools
        # (not one) so a ready validation never queues behind
        # still-pending copy tasks; Spark schedules the concurrent
        # jobs FIFO and back-fills freed cores (§2.6).
        #
        # Validation reads one target handle per copied table, shared
        # by its own audits AND by every FK audit that reads it as a
        # parent — each spark.read.parquet re-infers the footer on the
        # driver (~120-170 ms, single-threaded), so per-FK re-reads
        # would be pure repeated driver work (guide §5/§7.3; same
        # reasoning as catalog._TABLE_MEMO). PK audit is a single
        # aggregation pass: grouping on the PK puts NULL keys in their
        # own groups, so duplicates and null-keys fall out of one
        # groupBy.
        import threading

        handles: dict[str, object] = {}
        handles_lock = threading.Lock()

        def _handle(name: str):
            with handles_lock:
                df = handles.get(name)
                if df is None:
                    df = self.spark.read.parquet(table_path(self.target_dir, name))
                    handles[name] = df
                return df

        def _validate(name: str) -> None:
            res = report.results[name]
            info = self.catalog.get(name)
            if info is None:
                return
            tdf = _handle(name)
            if info.primary_key:
                res.pk_violations = audit_primary_key(tdf, info.primary_key)
            for cols in info.unique:
                res.unique_violations[", ".join(cols)] = audit_unique(tdf, cols)
            # ALL check constraints in ONE aggregation pass over the
            # table (guide §1.2 "don't compute things twice" / §2.3
            # partial aggregation): each check is a count_if over the
            # same scan, so k checks cost one scan instead of k. Falls
            # back to the per-check audit on any expression error so a
            # malformed check stays isolated to itself.
            if info.checks:
                try:
                    row = tdf.agg(
                        *[
                            F.count_if(
                                ~F.coalesce(F.expr(check), F.lit(True))
                            ).alias(f"_c{i}")
                            for i, check in enumerate(info.checks)
                        ]
                    ).collect()[0]
                    for i, check in enumerate(info.checks):
                        res.check_violations[check] = int(row[f"_c{i}"])
                except Exception:
                    for check in info.checks:
                        res.check_violations[check] = audit_check(tdf, check)
            for fk in info.foreign_keys:
                if fk.ref_table not in report.results or (
                    report.results[fk.ref_table].status != "copied"
                ):
                    continue
                parent = _handle(fk.ref_table)
                res.fk_orphans[f"{fk.table}.{','.join(fk.columns)}"] = audit_fk_orphans(
                    tdf, parent, fk
                )
                report.fk_ddl.append(fk_ddl_statement(info, fk))
            if info.serial_columns:  # phase 4 (K7/A4), error-isolated (K8)
                try:
                    col = info.serial_columns[0]
                    nxt = tdf.agg(
                        (F.coalesce(F.max(col), F.lit(0)) + 1).cast("bigint").alias("v")
                    ).collect()[0]["v"]
                    res.next_sequence_value = int(nxt)
                except Exception as exc:
                    res.error = f"sequence resync failed: {exc}"

        # dependency map: validating T needs T's own copy to have
        # SUCCEEDED and every FK parent's copy attempt to have COMPLETED
        # (any status — a failed parent just skips that FK audit, as in
        # the phased form). Parents outside the work list were resolved
        # in phase 1.
        work_set = set(work)
        parents_of = {
            t: {
                fk.ref_table
                for fk in (
                    self.catalog[t].foreign_keys if t in self.catalog else ()
                )
                if fk.ref_table in work_set and fk.ref_table != t
            }
            for t in work
        }
        from concurrent.futures import FIRST_COMPLETED, wait

        validation_futures = []
        with ThreadPoolExecutor(max_workers=self.max_parallel_tables) as copy_pool, \
                ThreadPoolExecutor(max_workers=self.max_parallel_tables) as val_pool:
            pending = {copy_pool.submit(self._copy_table, t): t for t in work}
            done_copies: set[str] = set()
            submitted: set[str] = set()
            while pending:
                finished, _ = wait(set(pending), return_when=FIRST_COMPLETED)
                for fut in finished:
                    name = pending.pop(fut)
                    res = fut.result()
                    report.results[name] = res
                    done_copies.add(name)
                for t in work:
                    if (
                        t not in submitted
                        and t in done_copies
                        and report.results[t].status == "copied"
                        and parents_of[t] <= done_copies
                    ):
                        submitted.add(t)
                        validation_futures.append(val_pool.submit(_validate, t))
            for fut in validation_futures:
                fut.result()  # propagate validator errors, as pool.map did

        # work order, not completion order, so downstream iteration is
        # deterministic run-to-run
        copied = [n for n in work if report.results[n].status == "copied"]
        sequences = {
            f"{n}.{self.catalog[n].serial_columns[0]}": report.results[n].next_sequence_value
            for n in copied
            if self.catalog.get(n)
            and self.catalog[n].serial_columns
            and report.results[n].next_sequence_value is not None
        }
        with open(os.path.join(self.target_dir, "_sequences.json"), "w") as f:
            json.dump(sequences, f, indent=2, sort_keys=True)

        return report


def _any_null(cols: list[str]):
    cond = F.col(cols[0]).isNull()
    for c in cols[1:]:
        cond = cond | F.col(c).isNull()
    return cond


# ---------------------------------------------------------------------------
# Constraint audits (C1-C4) as standalone functions — shared by the
# parquet pipeline above and the live PG→PG pipeline (pg_transfer.py).
# Each is one distributed pass; none moves rows to the driver.
# ---------------------------------------------------------------------------


def audit_primary_key(tdf, pk_cols) -> int:
    """C1 in one aggregation pass: grouping on the PK puts NULL keys in
    their own groups, so duplicate groups and null-key rows fall out of
    a single groupBy."""
    pk = list(pk_cols)
    audit = (
        tdf.groupBy(*pk)
        .count()
        .agg(
            F.count_if((F.col("count") > 1) & ~_any_null(pk)).alias("dup_groups"),
            F.coalesce(
                F.sum(F.when(_any_null(pk), F.col("count"))), F.lit(0)
            ).alias("null_rows"),
        )
        .collect()[0]
    )
    return int(audit["dup_groups"]) + int(audit["null_rows"])


def audit_unique(tdf, cols) -> int:
    """C2 — one hash-aggregate per UNIQUE constraint (reference rebuilds
    UniqueConstraint, transfer_data_with_constraints_script.py:84-87)."""
    return int(tdf.groupBy(*cols).count().filter(F.col("count") > 1).count())


def audit_check(tdf, check: str) -> int:
    """C3 — the reflected boolean expression evaluates JVM-side; NULL
    (unknown) does not violate, matching SQL CHECK semantics (…:88-90)."""
    return int(tdf.filter(~F.coalesce(F.expr(check), F.lit(True))).count())


def audit_fk_orphans(child_df, parent_df, fk) -> int:
    """C4 — orphan count for one FK edge as a distributed anti-join.

    The child side is reduced to (key, row-count) before the join
    (guide §2.3): the anti-join shuffle carries one row per distinct
    child key, not one per child row, and the orphan ROW count is the
    sum of counts over surviving keys — identical to counting
    anti-joined rows."""
    parent = parent_df.select(*fk.ref_columns)
    child = (
        child_df.select(*fk.columns)
        .na.drop()
        .groupBy(*fk.columns)
        .agg(F.count("*").alias("_rows"))
    )
    orphans = child.join(
        parent,
        [child[c] == parent[r] for c, r in zip(fk.columns, fk.ref_columns)],
        "left_anti",
    )
    return int(
        orphans.agg(F.coalesce(F.sum("_rows"), F.lit(0)).alias("n")).collect()[0]["n"]
    )
