"""Watermark-based out-of-order admission (round-13 VERDICT #2).

The streamed funnel's correctness story so far rested on the
id-ordered-epoch ingest contract: epochs deliver nondecreasing doc_id
ranges, so "duplicate iff paired with a seen-before doc or a
same-epoch lower-id doc" coincides with the monolithic lowest-id-wins
rule. Real feeds are not id-ordered — documents carry an event time
(the reference's own late-data columns: ``event-table.sql:8,18`` —
``modified``, ``last_local_modified_at``) and arrive late. This module
is the standard streaming answer, applied in front of the funnel:

**Watermark gate.** Let ``cummax(k)`` = max event time over every row
DELIVERED in epochs ≤ k (late rows included — a late row still proves
the feed has progressed that far, Spark's own watermark rule). The
watermark applied to epoch k is ``W(k) = cummax(k-1) − delay``; a row
of epoch k with event time < W(k) is LATE: dropped from admission,
recorded durably for accounting. Epoch 0 has no watermark (nothing
seen yet — nothing can be provably late).

**Determinism / exactly-once.** ``cummax`` is a pure function of the
delivered batches, persisted per epoch with the same rename-aside
record writer as everything else (existence ⇒ completeness, overwrite
atomic), so a replayed epoch recomputes the identical watermark, the
identical late set, and hands the inner sink the identical on-time
subset — whose own ledger/fingerprint machinery then takes over. The
wrapper adds no new commit point: every wrapper-owned write is an
idempotent deterministic overwrite, and the inner ledger remains the
single source of epoch-done truth.

**Semantics of the ACCEPTED set (the bounded divergence, documented).**
On-time docs flow through the unchanged funnel, so the decision rule is
the funnel's own: duplicate iff verified-paired with a doc probed in an
EARLIER epoch (any id) or a SAME-epoch lower-id doc. Without the
id-ordered contract this is no longer the global lowest-id-wins rule:
for a twin pair split across epochs, the EARLIER-ARRIVING twin survives
regardless of id. The divergence is exactly that — survivor selection
within a duplicate pair follows (arrival epoch, doc_id) lexicographic
order instead of doc_id order; the duplicate PAIRS found are identical.
The ``streaming_funnel_late_data`` driver row proves the full rule
cross-engine: its DuckDB oracle recomputes the watermark, the late set,
and the (epoch, id)-ordered pairing monolithically and must hash-match
the engine's per-epoch decisions. Late rows never reach a probe and
never enter any index (they are not "seen" — the index only ever
contains decided docs), and the accounting record makes the drop
auditable instead of silent.

At 100 TB nothing here adds a driver-side data path: the gate is one
``max`` aggregate plus two filters per epoch; the watermark state is
one row per epoch.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactly_once import read_epoch_record, write_epoch_record
from ..functions.memo import unpersist_checkpoints


class WatermarkedFunnelSink:
    """Event-time admission gate wrapped around an
    :class:`~postgresql_transfer_tool_spark.streaming.ingest_funnel.IngestFunnelSink`
    (or any foreachBatch-shaped sink with a ``decisions_dir`` sibling
    layout). Per epoch: update the durable event-time cummax, derive
    the watermark from the PRIOR epoch's cummax, split the batch into
    late/on-time, record the late rows, and hand the on-time subset to
    the inner sink under the same epoch id."""

    def __init__(
        self,
        inner,
        event_col: str = "modified",
        delay: datetime.timedelta | float = 0.0,
    ) -> None:
        """``delay``: the allowed lateness (timedelta, or seconds). A
        row whose event time trails the prior epochs' max by more than
        this is dropped."""
        self.inner = inner
        self.event_col = event_col
        self.delay = (
            delay
            if isinstance(delay, datetime.timedelta)
            else datetime.timedelta(seconds=float(delay))
        )
        # single-stream sinks expose decisions_dir; the partitioned
        # coordinator exposes out_dir directly — the gate composes with
        # both (round 13: the watermark is orthogonal to slicing).
        out_dir = getattr(inner, "out_dir", None) or os.path.dirname(
            inner.decisions_dir.rstrip("/")
        )
        self.wm_dir = os.path.join(out_dir, "_watermark")
        self.late_dir = os.path.join(out_dir, "late")

    # -- durable watermark state ------------------------------------------
    def _cummax_record(self, epoch_id: int):
        """(exists, value) for epoch_id's durable cummax record. The
        two None-shapes are distinct (round-13 self-review): a MISSING
        record for a prior epoch is diverged state (loud error at the
        caller), while an existing record holding NULL means every
        delivered row so far had a NULL (or no) event time — a young
        stream with no watermark derivable yet, a legitimate state."""
        rec = read_epoch_record(
            self.inner.spark, os.path.join(self.wm_dir, f"epoch={epoch_id}")
        )
        if rec is None:
            return False, None
        try:
            rows = rec.collect()
        finally:
            unpersist_checkpoints(rec)
        return True, (rows[0]["max_event_time"] if rows else None)

    def _cummax_at(self, epoch_id: int):
        """cummax value of epochs ≤ epoch_id (None when unrecorded OR
        recorded-as-NULL; use :meth:`_cummax_record` to distinguish)."""
        return self._cummax_record(epoch_id)[1]

    def watermark_for(self, epoch_id: int):
        """The watermark applied to epoch ``epoch_id``: prior cummax −
        delay; None when no prior epoch exists OR no prior row carried
        an event time (an empty/all-NULL early epoch cannot prove
        lateness). Loud error when the prior record is MISSING for a
        non-first epoch — epochs are delivered serially, so its absence
        means the wrapper's state and the stream checkpoint diverged
        (one recovery unit, same posture as the inner sink's
        renumbering guard)."""
        if epoch_id <= 0:
            return None
        exists, prior = self._cummax_record(epoch_id - 1)
        if not exists:
            raise RuntimeError(
                f"watermark state for epoch {epoch_id - 1} is missing "
                f"under {self.wm_dir} — the stream checkpoint and the "
                "sink state diverged; restore or reset them together"
            )
        return None if prior is None else prior - self.delay

    # -- the per-epoch gate -------------------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        epoch_id = int(epoch_id)
        spark = self.inner.spark
        batch_df = batch_df.localCheckpoint(eager=True)
        try:
            wm = self.watermark_for(epoch_id)
            # 1. durable cummax for THIS epoch (feeds epoch k+1's
            #    watermark). Max over the WHOLE delivered batch, late
            #    rows included; deterministic on replay, idempotent
            #    rename-aside overwrite.
            batch_max = batch_df.agg(
                F.max(self.event_col).alias("m")
            ).first()["m"]
            prior = self._cummax_at(epoch_id - 1) if epoch_id > 0 else None
            cummax = max(
                (m for m in (prior, batch_max) if m is not None),
                default=None,
            )
            ev_type = dict(batch_df.dtypes)[self.event_col]
            write_epoch_record(
                spark.createDataFrame(
                    [(cummax,)], f"max_event_time {ev_type}"
                ),
                os.path.join(self.wm_dir, f"epoch={epoch_id}"),
            )
            # 2. split. NULL event times are never late (they prove no
            #    lateness; same as the filter's three-valued semantics).
            if wm is None:
                late = batch_df.filter(F.lit(False))
                on_time = batch_df
            else:
                is_late = F.col(self.event_col) < F.lit(wm)
                late = batch_df.filter(is_late)
                on_time = batch_df.filter(~F.coalesce(is_late, F.lit(False)))
            # 3. durable late accounting: who was dropped, when they
            #    claimed to happen, and the watermark that dropped them.
            #    The epoch itself rides on the partition directory (a
            #    data column named 'epoch' would collide with partition
            #    discovery at read-back).
            late_rec = late.select(
                "doc_id",
                F.col(self.event_col).alias("event_time"),
                F.lit(wm).cast(ev_type).alias("watermark"),
            )
            write_epoch_record(
                late_rec, os.path.join(self.late_dir, f"epoch={epoch_id}")
            )
            # 4. the funnel decides the on-time subset; its ledger is
            #    the commit point for the epoch.
            self.inner(on_time, epoch_id)
        finally:
            unpersist_checkpoints(batch_df)

    # -- batch re-admission of accounted late rows (round-13 VERDICT #1
    # follow-up: the accounting record was auditable but TERMINAL; a
    # 100 TB ingest wants the late set re-admitted — the
    # flag-and-timestamp re-sync the reference's own columns imply,
    # event-table.sql:17-18 `synced_with_posthog` /
    # `last_local_modified_at`) -------------------------------------------
    def _backfill_dir(self) -> str:
        out_dir = os.path.dirname(self.late_dir.rstrip("/"))
        return os.path.join(out_dir, "_backfill")

    def backfill(self, docs_df: DataFrame) -> int | None:
        """Re-admit every accounted late row through the unchanged
        funnel as ONE batch epoch numbered after every committed epoch.

        ``docs_df``: the document relation the funnel's batches were cut
        from (must still carry the late rows — the accounting record
        stores only identity + timestamps, the payload source of truth
        stays the lake). Returns the backfill epoch id, or None when no
        late rows are pending.

        **Semantics.** Backfilled rows probe the index as it stands —
        corpus plus every previously probed doc — and pair among
        themselves by the same-epoch lower-id rule. The merged decision
        relation therefore equals the monolithic no-watermark run under
        the EFFECTIVE delivery order (arrival epoch for on-time rows,
        the backfill epoch for late rows): duplicate pairs identical to
        any delivery order, survivor selection lexicographic in
        (effective epoch, doc_id). Budgets are charged by the inner
        sink's unchanged budget-state machine — a backfilled doc spends
        tokens exactly like an on-time one.

        **Exactly-once.** The pending id set is PLANNED durably
        (rename-aside record under ``_backfill/epoch=N``) before the
        funnel runs, so a crash anywhere re-derives the identical
        batch: an uncommitted planned epoch is resumed with its planned
        ids (the inner ledger/fingerprint machinery then proves the
        replay); a committed one is skipped. The epoch's watermark
        cummax record is carried forward unchanged (late rows already
        raised the cummax in their arrival epoch), so streamed epochs
        may continue after a backfill — with epoch ids the CALLER must
        keep from colliding (the stream checkpoint and sink state are
        one recovery unit; run backfill at a quiescent cut).
        """
        spark = self.inner.spark
        bf_dir = self._backfill_dir()
        committed = self.inner.ledger.committed()

        # 1. resume any planned-but-uncommitted backfill epoch first —
        #    its batch is the PLANNED id set, not today's pending set
        planned_epochs: list[int] = []
        if os.path.isdir(bf_dir):
            planned_epochs = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(bf_dir)
                if d.startswith("epoch=")
            )
        plans: list[DataFrame] = []
        try:
            planned_ids = None
            for e in planned_epochs:
                plan = read_epoch_record(
                    spark, os.path.join(bf_dir, f"epoch={e}")
                )
                if plan is None:
                    continue  # crash before the plan's rename — never ran
                plans.append(plan)
                planned_ids = (
                    plan
                    if planned_ids is None
                    else planned_ids.unionByName(plan)
                )
                if e not in committed:
                    self._run_backfill_epoch(docs_df, plan, e)

            # 2. pending = accounted late ids minus every planned id
            if not os.path.isdir(self.late_dir) or not os.listdir(
                self.late_dir
            ):
                return None
            pending = self.late_accounting().select("doc_id").distinct()
            if planned_ids is not None:
                pending = pending.join(
                    planned_ids.select("doc_id"), "doc_id", "left_anti"
                )
            pending = pending.localCheckpoint(eager=True)
            plans.append(pending)
            if not pending.limit(1).count():
                return None
            epoch = max(set(committed) | set(planned_epochs), default=-1) + 1
            # plan first (atomic rename-aside): existence ⇒ this epoch's
            # batch is THIS id set, on every replay
            write_epoch_record(
                pending.select("doc_id"),
                os.path.join(bf_dir, f"epoch={epoch}"),
            )
            self._run_backfill_epoch(docs_df, pending, epoch)
            return epoch
        finally:
            for p in plans:
                unpersist_checkpoints(p)

    def _run_backfill_epoch(
        self, docs_df: DataFrame, plan_ids: DataFrame, epoch: int
    ) -> None:
        """One planned backfill epoch: carry the cummax forward, then
        hand the planned rows to the inner sink under the planned id.
        Idempotent — both writes are rename-aside overwrites and the
        inner sink owns the commit point."""
        spark = self.inner.spark
        prior = self._cummax_at(epoch - 1)
        ev_type = dict(docs_df.dtypes).get(self.event_col, "timestamp")
        write_epoch_record(
            spark.createDataFrame([(prior,)], f"max_event_time {ev_type}"),
            os.path.join(self.wm_dir, f"epoch={epoch}"),
        )
        batch = docs_df.join(
            plan_ids.select("doc_id"), "doc_id", "left_semi"
        ).localCheckpoint(eager=True)
        try:
            self.inner(batch, epoch)
        finally:
            unpersist_checkpoints(batch)

    # -- read-backs ----------------------------------------------------------
    def late_accounting(self) -> DataFrame:
        """Every dropped-late row across epochs:
        (doc_id, event_time, watermark, epoch) — epoch comes from the
        partition directory."""
        return self.inner.spark.read.option(
            "basePath", self.late_dir
        ).parquet(self.late_dir)

    def decisions(self) -> DataFrame:
        return self.inner.decisions()
