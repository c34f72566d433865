"""Idempotent / exactly-once-ish sink via foreachBatch + epoch ledger.

SURVEY.md §7.4 hard-part 1: Spark cannot replicate the reference's
per-table ACID commit against a remote RDBMS (K5/K6). The engine's
upgrade path is an idempotent sink: every micro-batch carries a
monotonically increasing epoch id; the sink writes the batch to an
epoch-scoped location, then records the epoch in the ledger — atomically,
write-then-rename. A replayed epoch (failure/retry, which Structured
Streaming's at-least-once delivery permits) is detected in the ledger
and skipped, making the end-to-end pipeline effectively exactly-once
for an idempotent target.

The ledger is one marker FILE PER EPOCH (append-only directory), not a
shared JSON list: a read-modify-write list loses updates when two
streaming queries ever share a ledger (query A's rewrite drops the epoch
query B just committed, breaking the guarantee); independent marker
files commute, so concurrent writers are safe for distinct epochs, and
a same-epoch race is harmless because committing twice is idempotent.

For a real RDBMS target the same pattern holds with a staging table +
``INSERT ... SELECT`` guarded by an epochs table in one transaction.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from ..functions.index_base import atomic_write_text, pid_alive as _pid_alive

logger = logging.getLogger(__name__)


class EpochLedger:
    """Committed-epoch record: a directory of per-epoch marker files,
    each created atomically via write-then-rename. Alongside each
    marker the sinks store a tiny batch FINGERPRINT (count + xor of
    per-id hashes) — the exact-and-cheap substrate for epoch-id
    collision detection (:func:`verify_committed_replay`): unlike the
    epoch record, the fingerprint covers the WHOLE batch even for sinks
    whose record is a filtered view (a committed all-duplicates epoch
    leaves an EMPTY admitted record, against which a subset check is
    vacuous — round-10 review), costs one small agg job instead of a
    record read plus anti-joins on every routine restart redelivery,
    and survives :func:`prune_epoch_records` (it lives with the ledger
    markers, not the record dirs), so retention no longer degrades
    collision detection."""

    def __init__(self, path: str) -> None:
        self.path = path  # directory of epoch=N.committed markers

    def committed(self) -> set[int]:
        if not os.path.isdir(self.path):
            return set()
        return {
            int(f[len("epoch=") : -len(".committed")])
            for f in os.listdir(self.path)
            if f.startswith("epoch=") and f.endswith(".committed")
        }

    def commit(self, epoch_id: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        marker = os.path.join(self.path, f"epoch={epoch_id}.committed")
        atomic_write_text(marker, str(epoch_id))  # last writer wins, same content

    # -- batch fingerprints ------------------------------------------------
    def _fingerprint_path(self, epoch_id: int) -> str:
        return os.path.join(self.path, f"epoch={epoch_id}.fingerprint")

    def write_fingerprint(self, epoch_id: int, fp: dict) -> None:
        """Durably record the epoch's batch fingerprint (atomic
        write-then-rename, same discipline as commit markers). Sinks
        write it BEFORE the epoch record, so record-exists ⇒
        fingerprint-exists and every replay path can verify exactly."""
        os.makedirs(self.path, exist_ok=True)
        atomic_write_text(self._fingerprint_path(epoch_id), json.dumps(fp))

    def read_fingerprint(self, epoch_id: int) -> dict | None:
        """The stored fingerprint, or None when none was ever written
        (pre-round-11 ledger, or the epoch never reached the
        fingerprint write). A PRESENT-but-unreadable/corrupt file
        RAISES instead of degrading to None: the write is atomic
        (write-then-rename), so corruption means storage damage, and
        silently treating it as first-delivery would let a renumbered
        batch overwrite the truth and bless an epoch-id collision
        (round-11 review)."""
        try:
            with open(self._fingerprint_path(epoch_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"epoch {epoch_id} fingerprint at "
                f"{self._fingerprint_path(epoch_id)} exists but is "
                f"unreadable ({exc}) — refusing to treat the epoch as "
                "first-delivery; restore the ledger directory or remove "
                "the damaged file after verifying the epoch by hand"
            ) from exc


def batch_fingerprint(batch_df: DataFrame, id_col: str) -> dict:
    """Order-independent fingerprint of a batch's ``id_col`` multiset:
    row count + XOR of per-id 64-bit hashes (ids are unique per batch —
    the sinks' globally-unique-id contract — so XOR cancellation cannot
    occur). One agg job with map-side partial aggregation; the cast to
    string pins the hash input representation across id types."""
    from pyspark.sql import functions as F

    row = batch_df.select(
        F.count(F.col(id_col)).alias("n"),
        F.bit_xor(F.xxhash64(F.col(id_col).cast("string"))).alias("x"),
    ).first()
    return {"id_col": id_col, "n": int(row["n"]), "xor": int(row["x"] or 0)}


def check_batch_fingerprint(
    ledger: EpochLedger, batch_df: DataFrame, epoch_id: int, id_col: str
) -> tuple[bool, "Callable[[], None]"]:
    """Exact epoch-id collision check for an IN-PROGRESS epoch with a
    DEFERRED first-delivery write: compare the delivered batch against
    the ledger's stored fingerprint, raising on mismatch. Returns
    ``(verified, persist)`` — ``verified`` is True when the batch
    matched a stored fingerprint (callers may then trust this epoch's
    record as the batch's own prior progress and skip the weaker
    record-based subset check); ``persist()`` durably stamps the
    just-computed fingerprint and must be called only AFTER the epoch's
    prior-record consistency check passes (or when no record exists).

    Why deferred (round-12 ADVICE): a renumbered batch replayed onto a
    PRE-fingerprint uncommitted epoch passes this check (nothing
    stored), and an eager write would durably stamp the IMPOSTOR's
    fingerprint just before the record check raises — after the
    operator restores the correct checkpoint, the legitimate batch then
    also fails (fingerprint mismatch) until the bogus file is removed
    by hand. Writing only after the record check keeps the first
    durable fingerprint the one the record evidence is consistent
    with."""
    fp = batch_fingerprint(batch_df, id_col)
    stored = ledger.read_fingerprint(epoch_id)
    if stored is not None:
        if (stored["n"], stored["xor"]) != (fp["n"], fp["xor"]):
            raise epoch_collision_error(epoch_id, committed=False)
        return True, (lambda: None)
    return False, (lambda: ledger.write_fingerprint(epoch_id, fp))


def verify_batch_fingerprint(
    ledger: EpochLedger, batch_df: DataFrame, epoch_id: int, id_col: str
) -> bool:
    """:func:`check_batch_fingerprint` with an IMMEDIATE first-delivery
    write — correct only for sinks whose uncommitted path performs no
    later record-consistency check that could reject the batch (e.g.
    the contamination sink, whose epoch record is written after the
    extend and never consulted on replay). Sinks that verify a prior
    record must use the deferred form instead (round-12 ADVICE)."""
    verified, persist = check_batch_fingerprint(ledger, batch_df, epoch_id, id_col)
    persist()
    return verified


class IdempotentParquetSink:
    """foreachBatch target: parquet partition per epoch, ledger-guarded."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.ledger = EpochLedger(os.path.join(out_dir, "_epochs"))
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.ledger.committed():
            return  # replayed batch: already durable, skip (idempotence)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={epoch_id}")
        )
        self.ledger.commit(epoch_id)  # commit point: rename is atomic

    def read_all(self, spark, schema=None) -> DataFrame:
        """Union of all committed epochs. With nothing committed yet,
        returns an empty frame when the caller supplies a schema, else
        raises — ``spark.read.parquet()`` with zero paths would otherwise
        fail with an inscrutable analysis error."""
        paths = [
            os.path.join(self.out_dir, f"epoch={e}")
            for e in sorted(self.ledger.committed())
        ]
        if not paths:
            if schema is not None:
                return spark.createDataFrame([], schema)
            raise ValueError(
                f"no committed epochs under {self.out_dir}; pass schema= "
                "to read an empty frame before the first commit"
            )
        return spark.read.parquet(*paths)

# ---------------------------------------------------------------------------
# Epoch records (round 9): the three index-admission sinks each keep a
# small per-epoch parquet record (admitted doc ids / ingested vec ids)
# that partial-replay logic reads back. Two shared properties matter:
#
# - WRITES are all-or-nothing. A plain df.write.parquet(dir) commits
#   file-by-file at job-commit time, so a crash mid-commit can leave a
#   READABLE SUBSET of the record — replay logic that trusts a record's
#   existence as completeness would then silently drop the missing rows
#   (the round-9 review's AnnIndexSink finding). Writing to a sibling
#   tmp dir and renaming into place makes existence imply completeness.
# - READS are eagerly checkpointed, because the caller typically
#   overwrites the very directory the plan reads (read-your-own-writes);
#   the caller owns the returned blocks (unpersist_checkpoints).
# ---------------------------------------------------------------------------


def _aside_dirs(epoch_dir: str) -> tuple[str, str]:
    """(tmp, old) scratch siblings for a rename-aside record write. Both
    live NEXT TO the epoch dir but start with '_' and contain no '=', so
    Spark's partition discovery over the record root skips them — a
    crash can never leave a leftover that the admitted()/ingested()
    read-back helpers would parse as a phantom (string-typed!) epoch
    partition and double-count (round-9 ADVICE #3; the old scheme's
    'epoch=N.tmp-<pid>' leftovers did exactly that)."""
    parent, base = os.path.split(epoch_dir.rstrip("/"))
    safe = base.replace("=", "-")
    return (
        os.path.join(parent, f"_tmp-{safe}-{os.getpid()}"),
        os.path.join(parent, f"_old-{safe}"),
    )


def write_epoch_record(df: DataFrame, epoch_dir: str) -> None:
    """All-or-nothing epoch record write, atomic ACROSS overwrites.

    Two invariants, both load-bearing for the sinks' replay logic:

    - existence ⇒ completeness: the record is written to a scratch dir
      and renamed into place, so a record that exists was fully written
      (a plain parquet write commits file-by-file and a mid-commit crash
      leaves a readable SUBSET — the round-9 AnnIndexSink finding).
    - nonexistence ⇒ no prior progress: an OVERWRITE renames the live
      record ASIDE rather than rmtree'ing it, so there is no window in
      which neither old nor new record is readable. The old scheme's
      rmtree-then-rename window made a replaying DedupIndexSink see
      prior=None, skip its pre-filter, and re-probe docs whose
      signatures were already indexed — self-matching them as
      duplicates and dropping them from the admitted output forever
      (round-9 ADVICE #2). read_epoch_record falls back to the aside
      dir when the live dir is mid-swap.
    """
    import glob
    import shutil

    tmp, old = _aside_dirs(epoch_dir)
    parent, base = os.path.split(epoch_dir.rstrip("/"))
    # sweep scratch left by CRASHED writers. Two classes, different
    # rules (round-11 review refined round-10's):
    # - new-scheme '_tmp-*' siblings live OUTSIDE partition discovery
    #   and are harmless to keep, so they are reclaimed only when their
    #   writing pid is dead — a LIVE concurrent writer's in-flight
    #   scratch is left alone (the sweep no longer assumes one writer
    #   per out_dir);
    # - legacy pre-round-10 'epoch=N.tmp-<pid>' leftovers sit INSIDE
    #   the partition root and corrupt discovery (phantom string-typed
    #   epochs), and no current writer ever creates that name — they
    #   are swept unconditionally (a pid-liveness gate would let a
    #   recycled pid pin the corruption forever).
    for stale in glob.glob(
        os.path.join(parent, f"_tmp-{base.replace('=', '-')}-*")
    ):
        pid_part = stale.rsplit("-", 1)[-1].rstrip("/")
        if pid_part.isdigit() and _pid_alive(int(pid_part)):
            continue
        shutil.rmtree(stale, ignore_errors=True)
    for legacy in glob.glob(f"{epoch_dir}.tmp-*"):
        shutil.rmtree(legacy, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(epoch_dir):
        shutil.rmtree(old, ignore_errors=True)  # stale aside of an old crash
        os.rename(epoch_dir, old)
    os.rename(tmp, epoch_dir)
    shutil.rmtree(old, ignore_errors=True)


def read_epoch_record(spark, epoch_dir: str) -> DataFrame | None:
    """The epoch's record, eagerly checkpointed (caller owns the
    blocks), or None when no record was (completely) written. Prefers
    the live dir; falls back to the rename-aside dir when a crashed
    overwrite left only the old generation (write_epoch_record)."""
    from pyspark.errors import AnalysisException

    path = epoch_dir
    if not os.path.isdir(path):
        path = _aside_dirs(epoch_dir)[1]
        if not os.path.isdir(path):
            return None
    try:
        return spark.read.parquet(path).localCheckpoint(eager=True)
    except AnalysisException:
        return None  # dir exists, holds no parquet yet


def prune_epoch_records(
    records_dir: str, ledger: EpochLedger, before_epoch: int
) -> int:
    """Retention for per-epoch record dirs: reclaim every COMMITTED
    epoch's record older than ``before_epoch`` (an uncommitted epoch's
    record is live replay state and is never touched; the ledger marker
    AND the batch fingerprint are kept — they are the exactly-once /
    collision-detection substrate and are two tiny files per epoch).

    What pruning actually trades away: the record dirs double as the
    sinks' queryable OUTPUT for DedupIndexSink (``admitted()``) and
    IngestFunnelSink (``decisions()``) — pruning TRUNCATES those
    read-backs to the retained window, so it is only appropriate once
    downstream has consumed (or re-materialized) the pruned epochs.
    Collision detection is NOT degraded for epochs committed under
    round-11+ code: the redelivery check verifies against the surviving
    fingerprint. Only pre-fingerprint epochs degrade to the bare ledger
    skip, which verify_committed_replay logs loudly. Returns the number
    of records reclaimed."""
    import shutil

    n = 0
    for e in sorted(ledger.committed()):
        if e >= before_epoch:
            continue
        d = os.path.join(records_dir, f"epoch={e}")
        if os.path.isdir(d):
            shutil.rmtree(d)
            n += 1
        shutil.rmtree(_aside_dirs(d)[1], ignore_errors=True)
    return n


def archive_epoch_records(
    spark, records_dir: str, ledger: EpochLedger, archive_dir: str,
    before_epoch: int,
) -> int:
    """Copy committed epoch records older than ``before_epoch`` into a
    durable partitioned archive BEFORE retention reclaims them —
    separating the sinks' queryable product history (admitted rows /
    decision rows) from replay state, so :func:`prune_epoch_records`
    stops truncating what downstream reads (the round-10 review trade,
    now closed rather than documented). Idempotent per epoch: an
    already-archived epoch is skipped, so a crash mid-archive re-runs
    cleanly; each epoch's archive write is rename-aside atomic
    (:func:`write_epoch_record`), so existence ⇒ completeness and the
    archive is never half an epoch. Reading the full history =
    union(archive, live records) via one basePath read per root.
    Returns the number of epochs archived."""
    n = 0
    for e in sorted(ledger.committed()):
        if e >= before_epoch:
            continue
        src = os.path.join(records_dir, f"epoch={e}")
        dst = os.path.join(archive_dir, f"epoch={e}")
        if os.path.isdir(dst) or not os.path.isdir(src):
            continue
        rec = read_epoch_record(spark, src)
        if rec is None:
            continue
        try:
            write_epoch_record(rec, dst)
        finally:
            from ..functions.memo import unpersist_checkpoints

            unpersist_checkpoints(rec)
        n += 1
    return n


def full_epoch_history(spark, records_dir: str, archive_dir: str) -> DataFrame:
    """The COMPLETE per-epoch history of a record root whose old epochs
    were archived-then-pruned: union(archive, live), with the live side
    winning for any epoch present in both (an epoch sits in both only
    between its archive write and its prune — contents identical, the
    archive is a rename-aside-atomic copy). Two basePath reads, one
    filter on the partition column — no listing-sized driver work
    beyond the live dir's epoch names (VERDICT r11 #4: the archive
    separated replay state from product history, but nothing READ the
    union back; this is that read, used by the sinks'
    ``*_full_history()`` helpers and proved against the monolithic
    oracle by the ``streaming_funnel_archived_history`` driver row).

    Mid-overwrite epochs are not lost (round-13 ADVICE): an epoch whose
    live dir vanished because a crashed :func:`write_epoch_record` left
    only the rename-aside ``_old-epoch=N`` dir is read back from the
    aside — the same fallback :func:`read_epoch_record` applies — so
    the "complete" history stays complete even while an overwrite of a
    never-archived epoch is in flight."""
    from pyspark.sql import functions as F

    live_epochs = (
        {
            int(d.split("=", 1)[1])
            for d in os.listdir(records_dir)
            if d.startswith("epoch=")
        }
        if os.path.isdir(records_dir)
        else set()
    )
    arch_epochs = (
        {
            int(d.split("=", 1)[1])
            for d in os.listdir(archive_dir)
            if d.startswith("epoch=")
        }
        if os.path.isdir(archive_dir)
        else set()
    )
    # aside-only epochs: live dir renamed aside by a crashed overwrite
    # and nothing re-renamed back — absent from BOTH listings above.
    aside_epochs: dict[int, str] = {}
    if os.path.isdir(records_dir):
        for d in os.listdir(records_dir):
            if not d.startswith("_old-epoch-"):
                continue
            suffix = d[len("_old-epoch-"):]
            if not suffix.isdigit():
                continue
            e = int(suffix)
            if e not in live_epochs and e not in arch_epochs:
                aside_epochs[e] = os.path.join(records_dir, d)
    live = (
        spark.read.option("basePath", records_dir).parquet(records_dir)
        if live_epochs
        else None
    )
    arch = (
        spark.read.option("basePath", archive_dir).parquet(archive_dir)
        if arch_epochs
        else None
    )
    if arch is not None and live is not None:
        arch = arch.filter(~F.col("epoch").isin(sorted(live_epochs)))
    parts = [p for p in (arch, live) if p is not None]
    if parts:
        ep_type = dict(parts[0].dtypes)["epoch"]
        for e in sorted(aside_epochs):
            parts.append(
                spark.read.parquet(aside_epochs[e]).withColumn(
                    "epoch", F.lit(e).cast(ep_type)
                )
            )
    elif aside_epochs:
        parts = [
            spark.read.parquet(aside_epochs[e]).withColumn("epoch", F.lit(e))
            for e in sorted(aside_epochs)
        ]
    else:
        raise ValueError(
            f"no epoch records under {records_dir} or {archive_dir}"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def verify_committed_replay(
    spark,
    batch_df: DataFrame,
    epoch_dir: str,
    epoch_id: int,
    id_col: str,
    subset_ok: bool = False,
    ledger: EpochLedger | None = None,
) -> None:
    """Guard a committed-epoch skip against EPOCH-ID COLLISIONS.

    A committed epoch redelivered by Structured Streaming is a harmless
    replay — but epoch ids are only meaningful within one streaming
    checkpoint lineage. If the checkpoint is wiped (or the query is
    pointed at a fresh checkpoint) while the sink's ledger survives,
    the restarted query numbers fresh batches from 0 and a bare
    "committed → skip" silently drops their data. The check is exact
    and cheap when the ledger holds the epoch's batch FINGERPRINT
    (round 11 — one small agg job, no record read; routine restarts
    redeliver the last committed batch on essentially every start, so
    this is the hot path); it works even when the record was pruned or
    is an EMPTY filtered view (the two blind spots of the record-based
    check). Raises on mismatch — loud failure naming the recovery unit
    instead of silent loss.

    Fallback for pre-fingerprint epochs: compare against the epoch's
    record. ``subset_ok``: for sinks whose record is a FILTERED view of
    the batch (DedupIndexSink records admitted ⊂ batch), only
    record-but-not-in-batch ids can prove a collision — a vacuous pass
    (empty or subset-consistent record) is logged as unverified rather
    than trusted silently. A missing record (e.g. reclaimed by
    retention) degrades to the bare skip, also logged."""
    from ..functions.memo import unpersist_checkpoints

    if ledger is not None:
        stored = ledger.read_fingerprint(epoch_id)
        if stored is not None:
            fp = batch_fingerprint(batch_df, id_col)
            if (stored["n"], stored["xor"]) != (fp["n"], fp["xor"]):
                raise epoch_collision_error(epoch_id, committed=True)
            return
    record = read_epoch_record(spark, epoch_dir)
    if record is None:
        logger.warning(
            "committed epoch %d redelivered at %s: skipping UNVERIFIED — "
            "no fingerprint (pre-round-11 commit) and no record (pruned "
            "or never written); an epoch-id collision here would be "
            "silent data loss",
            epoch_id,
            epoch_dir,
        )
        return
    try:
        mismatch = replay_contents_mismatch(batch_df, record, id_col, subset_ok)
    finally:
        unpersist_checkpoints(record)
    if mismatch:
        raise epoch_collision_error(epoch_id, committed=True)
    if subset_ok:
        logger.warning(
            "committed epoch %d redelivered at %s: verified only as a "
            "SUBSET (the record is a filtered view and carries no "
            "fingerprint) — a renumbered batch that happens to be a "
            "superset of the recorded ids would pass this check",
            epoch_id,
            epoch_dir,
        )


def replay_contents_mismatch(
    batch_df: DataFrame, record: DataFrame, id_col: str, subset_ok: bool = False
) -> bool:
    """True when a redelivered batch's ``id_col`` set is NOT consistent
    with an epoch record — the collision-detection core shared by the
    committed-skip path (:func:`verify_committed_replay`) and the
    sinks' record-exists-but-uncommitted partial-replay paths (which
    already hold the record and must verify it BEFORE trusting it as
    this batch's prior progress)."""
    rec_ids = record.select(id_col)
    batch_ids = batch_df.select(id_col)
    missing = rec_ids.join(batch_ids, id_col, "left_anti").limit(1).count()
    extra = 0
    if not subset_ok:
        extra = batch_ids.join(rec_ids, id_col, "left_anti").limit(1).count()
    return bool(missing or extra)


def epoch_collision_error(epoch_id: int, committed: bool) -> RuntimeError:
    state = "committed" if committed else "partially processed (record written)"
    return RuntimeError(
        f"epoch {epoch_id} is {state} but was redelivered with different "
        "contents — this is not a replay but an epoch-id collision "
        "(typically a wiped/renamed streaming checkpoint over a surviving "
        "sink ledger). The checkpoint and the sink state (ledger + epoch "
        "records + index) form one recovery unit: restore them to the "
        "same point, or reset all of them, before restarting the stream."
    )
