"""Shared machinery for the persistent-index family (VERDICT r8 #7).

The three index modules — operators/dedup_index.py (near-dup),
operators/contamination_index.py (benchmark grams), operators/
ann_index.py (IVF cells) — share one lifecycle: a bucketed build, an
append-only ``extend``, a probe that must never shuffle or rescan the
index side, and a compaction/rewrite path. Round 8 duplicated the
supporting hygiene in each module; this module is the single home for:

- **append + refresh** (:func:`append_bucketed`): bucketed appends must
  refresh the relation cache through the CALLER's session, because
  foreachBatch hands micro-batch DataFrames owned by a per-epoch clone
  and ``saveAsTable`` only invalidates the writer session's cache.
- **snapshot-before-write** (:func:`snapshot_before_write`): any lazy
  plan whose leaves include tables/dirs the same function later mutates
  must be eagerly localCheckpoint'ed BEFORE the first write
  (read-your-own-writes; hit twice in round 8).
- **atomic-ish table swap** (:func:`swap_table` / :func:`recover_swap`):
  generation swaps rename the live table ASIDE first, so every failure
  window leaves a recoverable catalog state (r8 ADVICE #3 — the old
  DROP-then-RENAME left a window with no catalog entry at all).
- **tombstones** (:func:`add_tombstones` / :func:`apply_tombstones`):
  deletion/retraction is a small tombstone relation anti-joined into
  every probe (broadcast — the bucketed index side keeps its
  partitioning, so probes stay exchange-free) until a compaction folds
  the deletions into a physical rewrite. This is the delete path of
  every LSM/lakehouse store, chosen because an in-place bucketed rewrite
  per takedown would cost O(index) while tombstones cost O(deleted).
- **ingest stamps** (:func:`record_stamps` / :func:`expired_ids`): an
  optional (id, stamp) ledger written at build/extend time; TTL expiry
  = tombstone every id with stamp < cutoff. Logical stamps, not wall
  clocks, so tests and replays are deterministic.
- **single-writer lock** (:func:`single_writer`): extend/delete/compact
  assume one writer (two interleaved extends could interleave appends
  between snapshot and write). The lock is an O_EXCL marker file in the
  index root — acquisition failure raises loudly instead of corrupting.

Reference parity: the reference serializes writers through PostgreSQL
transactions and deletes via plain SQL DELETE
(transfer_data_with_constraints_script.py:49-253 relies on both); these
helpers are the lakehouse-native equivalents of those guarantees.
"""

from __future__ import annotations

import logging
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def pid_alive(pid: int) -> bool:
    """Is a process with this pid currently running on THIS host?
    (EPERM means it exists but is not ours — still alive.) Meaningless
    across hosts sharing a filesystem — callers gate recovery actions
    on it only where single-host deployment is the documented scope.
    Non-positive pids (kill(2) would signal a process GROUP) are
    reported alive — 'cannot verify dead' must never justify
    recovery."""
    if pid <= 0:
        return True
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return False
    return True


def atomic_write_text(path: str, text: str) -> None:
    """Write a small marker file atomically AND durably: tmp sibling,
    fsync the data, rename, fsync the directory. The shared primitive
    behind every marker in the engine (ledger commits, batch
    fingerprints, index format meta, pinned HWMs) — one implementation
    so the tmp-naming and replace semantics cannot drift apart
    (round-11 review).

    The two fsyncs extend the guarantee from process-crash to
    POWER-LOSS (round-12 ADVICE): without them a rename can be on disk
    while the file's bytes are not (torn marker), or the rename itself
    can vanish from an unsynced directory — and ledger commit markers /
    pinned HWMs are the exactly-once substrate, so a silently-reverted
    commit would replay an epoch the downstream already consumed.
    Markers are tiny and per-epoch, so the two fsyncs are noise next to
    the epoch's Spark jobs."""
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class ConcurrentIndexWriteError(RuntimeError):
    """A second writer attempted to mutate an index while another held
    its write lock. The index is untouched; retry after the holder
    finishes (or remove a stale lock left by a crashed process — the
    holder's pid is in the message and the lock file)."""


class IndexFormatError(RuntimeError):
    """A persistent index's on-disk format metadata does not match what
    this engine version reads/writes. At 100 TB the index OUTLIVES the
    engine version — a round-9-built index probed by round-12 code with
    silently drifted table schemas would return wrong results, not
    errors; this check turns that into a loud refusal at first touch."""


#: bump when a table's meaning/layout changes incompatibly (column
#: semantics, bucketing key, hash function) — readers of version N
#: refuse versions ≠ N rather than guessing
INDEX_FORMAT_VERSION = 1

_META_FILE = "_index_meta.json"


def write_index_meta(root: str, kind: str, tables: dict[str, list[str]]) -> None:
    """Stamp an index root with its format metadata at build time:
    engine format version, index kind, and each table role's expected
    column schema (the engine-side schema hash the checker compares).
    Atomic write-then-rename, same discipline as every other marker."""
    import json

    os.makedirs(root, exist_ok=True)
    meta = {
        "format_version": INDEX_FORMAT_VERSION,
        "kind": kind,
        "tables": tables,
    }
    atomic_write_text(os.path.join(root, _META_FILE), json.dumps(meta, indent=1))


def check_index_format(
    spark: SparkSession,
    any_index_table: str,
    kind: str,
    tables: dict[str, list[str]],
    backfill: bool = False,
) -> None:
    """Refuse loudly to touch an index whose on-disk format metadata
    does not match this engine version — called at the entry of every
    probe and mutator.

    A MISSING meta file (an index built by pre-versioning code) is
    unverifiable; how that resolves depends on the caller (round-11
    review — the old unconditional backfill let the FIRST toucher,
    probe or mutator, right or wrong, stamp its own expectations as
    durable truth):

    - mutators pass ``backfill=True``: they are about to write under
      this module's own spec anyway, so stamping that spec (at the
      current version) is exactly as trustworthy as the mutation
      itself, and it makes the guarantee forward-looking without a
      rebuild;
    - probes (default) never write — a missing meta is logged as an
      unverifiable legacy probe and allowed, so read paths stay
      read-only and a mis-addressed reader cannot poison the root."""
    import json

    root = index_root(spark, any_index_table)
    path = os.path.join(root, _META_FILE)
    try:
        with open(path) as f:
            meta = json.load(f)
    except FileNotFoundError:
        if backfill:
            write_index_meta(root, kind, tables)  # legacy backfill
        else:
            logger.warning(
                "index at %s has no format metadata (pre-versioning "
                "build) — probing UNVERIFIED as %s; the next mutation "
                "will stamp it", root, kind,
            )
        return
    except (OSError, ValueError) as exc:
        raise IndexFormatError(
            f"index at {root}: unreadable format metadata ({exc}) — refuse "
            "to touch; restore or rebuild the index"
        ) from exc
    if meta.get("format_version") != INDEX_FORMAT_VERSION:
        raise IndexFormatError(
            f"index at {root} has format_version="
            f"{meta.get('format_version')!r} but this engine reads/writes "
            f"version {INDEX_FORMAT_VERSION} — rebuild the index with this "
            "engine version (or run the matching engine); probing across "
            "format versions would silently misread the layout"
        )
    if meta.get("kind") != kind:
        raise IndexFormatError(
            f"index at {root} is a {meta.get('kind')!r} index but was "
            f"addressed as {kind!r} — wrong index root"
        )
    if meta.get("tables") != tables:
        raise IndexFormatError(
            f"index at {root}: table schemas drifted — on disk "
            f"{meta.get('tables')}, engine expects {tables}; rebuild or "
            "migrate before probing"
        )


def table_location(spark: SparkSession, table: str) -> str:
    """Filesystem path of a catalog table's storage location (the
    ``file:`` URI from DESC EXTENDED, scheme stripped)."""
    for r in spark.sql(f"DESC EXTENDED {table}").collect():
        if r.col_name == "Location":
            loc = r.data_type
            return loc[len("file:"):] if loc.startswith("file:") else loc
    raise ValueError(f"no Location in DESC EXTENDED {table}")


def index_root(spark: SparkSession, table: str) -> str:
    """Root directory of the index that owns ``table`` — the parent of
    the table's location (every index writes each table into its own
    subdirectory of one root; side relations — tombstones, stamps,
    lock — live in that root too, so they travel with the index)."""
    return os.path.dirname(table_location(spark, table).rstrip("/"))


# ---------------------------------------------------------------------------
# single-writer contract
# ---------------------------------------------------------------------------

#: a breaker marker with unreadable content must be at least this old
#: (mtime) before it is reclaimed — a LIVE breaker holds its marker for
#: a few filesystem ops, so seconds of grace is orders of magnitude safe
_BREAKER_GRACE_S = 30.0


def _reclaim_dead_breaker(breaker: str) -> bool:
    """Remove a breaker marker whose writer is provably dead — the
    recursive application of the stale-lock rule to the breaker itself
    (round-12 ADVICE: a SIGKILL inside the breaker critical section
    orphaned '{lock}.breaker' forever, and every later recovery attempt
    returned False on FileExistsError). Content ``pid=N`` with N dead →
    reclaim; content unreadable/unparseable (the pid write may not have
    landed) → reclaim only past an mtime grace window. Returns True
    when the marker was removed (caller should retry the break)."""
    import time

    try:
        with open(breaker) as f:
            txt = f.read()
            # fstat the open fd so content and identity come from the
            # SAME inode — a path re-stat could describe a replacement
            seen = os.stat(f.fileno())
    except OSError:
        return True  # marker vanished — its writer finished; retry
    pid_part = txt[len("pid="):].strip() if txt.startswith("pid=") else ""
    stale = False
    if pid_part.isdigit():
        stale = not pid_alive(int(pid_part))
    else:
        stale = time.time() - seen.st_mtime > _BREAKER_GRACE_S
    if not stale:
        return False
    # round-14 (closes the r13 shrunken window): CLAIM the marker
    # atomically before removing. The r13 stat-identity re-check could
    # still interleave — between the re-stat and the unlink, a racer
    # reclaims and a new live breaker recreates the path, so the slower
    # reclaimer unlinked a live marker. rename() moves whatever file is
    # at the path to a reclaimer-private name in ONE atomic step, so at
    # most one reclaimer ever holds any given marker file. We then
    # verify the claimed file is the one we judged stale (same
    # inode+mtime); a mismatch means we claimed a LIVE breaker's fresh
    # marker, which we restore via link() — link refuses to clobber a
    # marker a third breaker may have since created (in that residual
    # shape exactly one marker remains at the path; the stolen one is
    # dropped and logged loudly).
    claimed = f"{breaker}.reclaim.{os.getpid()}"
    try:
        os.rename(breaker, claimed)
    except OSError:
        return True  # path vanished/moved — another reclaimer won; retry
    try:
        now = os.stat(claimed)
    except OSError:
        return True  # our private name removed externally; retry break
    if (now.st_ino, now.st_mtime_ns) == (seen.st_ino, seen.st_mtime_ns):
        try:
            os.remove(claimed)
        except OSError:
            pass
        logger.warning(
            "reclaimed orphaned lock-breaker marker %s (%r)", breaker, txt
        )
        return True
    # mismatch: we claimed a live breaker's marker — restore it
    try:
        os.link(claimed, breaker)
    except OSError:
        logger.warning(
            "could not restore claimed live breaker marker %s — a newer "
            "marker already holds the path; dropping the claimed copy",
            breaker,
        )
    try:
        os.remove(claimed)
    except OSError:
        pass
    return False  # a live breaker owns the path


def _maybe_break_stale_lock(lock: str) -> bool:
    """Reclaim a lock whose recorded holder pid is provably dead on
    THIS host (a SIGKILL'd auto-compaction would otherwise wedge every
    restart in a loud-error loop until a human removed the file —
    round-11 review). Safety: lock content is written once at creation
    and never rewritten, so re-reading it under the breaker marker and
    comparing proves the same dead holder still owns it; the breaker
    marker (O_EXCL) serializes concurrent breakers. A lock whose
    content is missing/unparseable (the creation write may not have
    landed yet) is never broken. Single-host scope only — on a shared
    filesystem a remote holder's pid is not checkable, which is the
    standing documented limit of the file lock (use a lock service at
    cluster scale). Returns True when the lock was removed."""
    try:
        with open(lock) as f:
            txt = f.read()
    except OSError:
        return False  # gone already — the holder released
    if not txt.startswith("pid="):
        return False
    pid_part = txt[len("pid="):].split()[0] if txt[len("pid="):].split() else ""
    if not pid_part.isdigit() or pid_alive(int(pid_part)):
        return False
    breaker = f"{lock}.breaker"
    try:
        fd = os.open(breaker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        # Another breaker is on it — unless ITS writer died between
        # creating the marker and the finally-removal (a SIGKILL there
        # would otherwise orphan the marker forever, permanently
        # disabling stale-lock recovery — round-12 ADVICE). The breaker
        # records its writer's pid exactly like the lock does, so the
        # same dead-pid reclaim applies; an empty/unparseable marker
        # (crash before the pid write landed, or a pre-round-12 file)
        # is reclaimed only once it is older than a grace window that
        # no live breaker holds the marker for (the critical section is
        # a handful of filesystem ops).
        if _reclaim_dead_breaker(breaker):
            return _maybe_break_stale_lock(lock)  # one retry, re-checks all
        return False
    try:
        os.write(fd, f"pid={os.getpid()}".encode())
        os.close(fd)
        try:
            with open(lock) as f:
                if f.read() != txt:
                    return False  # lock changed hands — leave it
        except OSError:
            return False
        try:
            os.remove(lock)
        except FileNotFoundError:
            # round-13 ADVICE: another breaker (racing through the
            # marker-reclaim window) removed the same stale lock first.
            # The lock is gone either way — report broken so the
            # acquire loop retries O_EXCL instead of crashing.
            return True
        except OSError:
            return False  # lock unremovable right now — leave it
        logger.warning(
            "broke stale index write lock %s held by dead process [%s]",
            lock, txt.strip(),
        )
        return True
    finally:
        try:
            os.remove(breaker)
        except OSError:
            pass


@contextmanager
def writer_lock(root: str, op: str = "write", wait: float | None = None):
    """Exclusive write lock over the index rooted at ``root`` — the
    path-keyed core of :func:`single_writer`, usable without a Spark
    session (and therefore from OTHER PROCESSES: the whole point of an
    O_EXCL file lock is that it arbitrates between writers that share
    nothing but the filesystem — tests/test_index_base.py races real
    subprocesses through this exact function).

    ``wait``: fail-loud-immediately stays the default (None). A bounded
    timeout in seconds turns contention into jittered retry — for two
    LEGITIMATE streams sharing one index (round-10 review: previously
    the second stream needed operator babysitting). Waiting is safe
    under the torn-extend analysis because every caller builds its read
    plans AFTER acquisition (the snapshot-inside-lock discipline of the
    extend/compact functions); the timeout bounds the wait so a LIVE
    contending holder still surfaces as a loud error rather than a
    hang. A lock left by a provably-DEAD local holder is broken and
    retried in both modes (:func:`_maybe_break_stale_lock`) — crashed
    auto-maintenance must not require a human to delete a file."""
    import random
    import time

    lock = os.path.join(root, "_writer.lock")
    deadline = None if wait is None else time.monotonic() + wait
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if _maybe_break_stale_lock(lock):
                continue  # dead holder reclaimed — retry immediately
            remaining = None if deadline is None else deadline - time.monotonic()
            if remaining is None or remaining <= 0:
                try:
                    with open(lock) as f:
                        holder = f.read().strip() or "unknown"
                except OSError:
                    holder = "unknown"
                waited = "" if wait is None else f" after waiting {wait}s"
                raise ConcurrentIndexWriteError(
                    f"index at {root} is being written by [{holder}] — "
                    f"concurrent {op} refused{waited} (single-writer "
                    f"contract; remove {lock} only if the holder crashed)"
                ) from None
            # jittered backoff: desynchronizes N waiters so release is
            # not a thundering herd; capped by the remaining budget
            time.sleep(min(remaining, 0.02 + random.uniform(0, 0.08)))
    try:
        os.write(fd, f"pid={os.getpid()} op={op}".encode())
        os.close(fd)
        yield
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


@contextmanager
def single_writer(
    spark: SparkSession, table: str, op: str = "write", wait: float | None = None
):
    """Exclusive write lock over the index that owns ``table``.

    O_CREAT|O_EXCL creation of ``_writer.lock`` in the index root is
    atomic on every POSIX filesystem — including between unrelated OS
    processes; a held lock raises :class:`ConcurrentIndexWriteError`
    immediately by default (fail-loud — a writer that read its inputs
    BEFORE acquiring would operate on a pre-append snapshot, exactly
    the torn-extend interleaving the lock exists to prevent; every
    caller here snapshots inside the lock, which is also why the
    optional bounded ``wait`` retry is sound). At 100 TB the same
    contract holds via the object store's conditional-put / a catalog
    lock service; the acquire/release sites in the index modules are
    the integration points.

    Root re-resolution after acquire (round-11 review): compaction and
    retrain REWRITE the index into a fresh root and repoint the table
    there, so a writer that waited on the OLD root's lock could
    otherwise acquire it just as it stops guarding anything (the
    compactor released it after swapping away) and mutate concurrently
    with a third writer locking the NEW root. Re-resolving the table's
    root after acquisition and retrying on mismatch closes the window:
    whoever holds the lock of the root the table CURRENTLY points at
    is the writer."""
    while True:
        root = index_root(spark, table)
        cm = writer_lock(root, op=op, wait=wait)
        cm.__enter__()
        if index_root(spark, table) == root:
            break
        cm.__exit__(None, None, None)  # root migrated mid-wait — retry
    try:
        yield
    finally:
        cm.__exit__(None, None, None)


# ---------------------------------------------------------------------------
# write hygiene
# ---------------------------------------------------------------------------

def snapshot_before_write(df: DataFrame) -> DataFrame:
    """Eagerly materialize a plan that reads state the caller is about
    to mutate (catalog tables, output dirs). Evaluating the lazy plan
    after the first write would see the write's own rows — the
    read-your-own-writes class (two round-8 bugs). The caller owns the
    returned checkpoint's blocks (``unpersist_checkpoints`` when done)."""
    return df.localCheckpoint(eager=True)


def append_bucketed(
    spark: SparkSession,
    table: str,
    rows: DataFrame,
    bucket_key: str,
    n_buckets: int,
) -> None:
    """Append rows to a bucketed index table, preserving the bucket
    spec, then refresh the relation cache through the CALLER's session
    (``rows`` may belong to a per-epoch clone session — see module
    docstring). ``rows`` must not read ``table`` through a lazy plan
    (snapshot_before_write first)."""
    (
        rows.write.mode("append")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )
    spark.catalog.refreshTable(table)


# ---------------------------------------------------------------------------
# generation swap
# ---------------------------------------------------------------------------

def swap_table(spark: SparkSession, live: str, tmp: str) -> None:
    """Swap a rewritten generation in for the live table: live →
    ``{live}_retired``, tmp → live, drop retired. Every failure window
    is recoverable (r8 ADVICE #3): before the first rename nothing
    changed; between the renames the data survives under
    ``{live}_retired`` and :func:`recover_swap` restores it; after the
    second rename the swap is complete and the drop is cosmetic."""
    retired = f"{live}_retired"
    spark.sql(f"DROP TABLE IF EXISTS {retired}")  # leftover of an old crash
    spark.sql(f"ALTER TABLE {live} RENAME TO {retired}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {live}")
    spark.sql(f"DROP TABLE {retired}")


def recover_swap(spark: SparkSession, live: str) -> bool:
    """Recover from a crash between swap_table's two renames: if the
    live name is gone but ``{live}_retired`` exists, rename it back.
    Returns True if a recovery was performed."""
    retired = f"{live}_retired"
    if not spark.catalog.tableExists(live) and spark.catalog.tableExists(retired):
        spark.sql(f"ALTER TABLE {retired} RENAME TO {live}")
        return True
    return False


# ---------------------------------------------------------------------------
# tombstones (deletion/retraction) + ingest stamps (TTL)
# ---------------------------------------------------------------------------

def _side_name(any_index_table: str, kind: str) -> str:
    """Catalog name of a side relation for the index owning
    ``any_index_table``: the index's stem (the table name up to its
    last '_'-suffix) + kind, so side tables are session-unique exactly
    like the index tables themselves."""
    return f"{any_index_table.rsplit('_', 1)[0]}_{kind}"


def _side_table(spark: SparkSession, any_index_table: str, kind: str) -> tuple[str, str]:
    """(catalog name, path) — path resolution costs a DESC EXTENDED, so
    probe-side readers use :func:`_side_name` alone."""
    return _side_name(any_index_table, kind), os.path.join(
        index_root(spark, any_index_table), kind
    )


def add_tombstones(spark: SparkSession, any_index_table: str, ids: DataFrame) -> str:
    """Retract ids from the index owning ``any_index_table``: append a
    one-column (id) tombstone relation. O(deleted) — no index rewrite;
    probes anti-join it until a compaction folds it in. Returns the
    tombstone table name. ``ids``'s single column may have any name;
    it is normalized to ``id``."""
    tomb, path = _side_table(spark, any_index_table, "tombstones")
    rows = ids.select(F.col(ids.columns[0]).cast("long").alias("id")).distinct()
    if spark.catalog.tableExists(tomb):
        rows = snapshot_before_write(rows.join(spark.table(tomb), "id", "left_anti"))
        rows.write.mode("append").format("parquet").saveAsTable(tomb)
        spark.catalog.refreshTable(tomb)
        from .memo import unpersist_checkpoints

        unpersist_checkpoints(rows)
    else:
        (
            rows.coalesce(1)
            .write.mode("overwrite")
            .option("path", path)
            .format("parquet")
            .saveAsTable(tomb)
        )
    return tomb


def tombstones(spark: SparkSession, any_index_table: str) -> DataFrame | None:
    """The (id) tombstone relation of the index owning
    ``any_index_table``, or None when nothing was ever deleted (the
    common case — probes then skip the anti-join entirely)."""
    tomb = _side_name(any_index_table, "tombstones")
    return spark.table(tomb) if spark.catalog.tableExists(tomb) else None


def apply_tombstones(
    indexed: DataFrame, tombs: DataFrame | None, key_col: str
) -> DataFrame:
    """Filter retracted ids out of an index-side relation via a
    BROADCAST anti-join (tombstones are O(deleted-since-compaction),
    bounded small by compaction cadence). Broadcast matters twice: no
    shuffle is induced, and the streamed index side keeps its bucketed
    output partitioning, so downstream probe joins stay exchange-free."""
    if tombs is None:
        return indexed
    return indexed.join(
        F.broadcast(tombs.select(F.col("id").alias(key_col))),
        key_col,
        "left_anti",
    )


def drop_side_tables(spark: SparkSession, any_index_table: str) -> None:
    """Drop the tombstone/stamp side relations unconditionally. Only
    correct when the index itself is being torn down — compaction must
    use :func:`fold_side_tables` instead (dropping the stamps ledger
    would silently exempt every surviving row from future TTL expiry)."""
    for kind in ("tombstones", "stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {_side_name(any_index_table, kind)}")


def fold_side_tables(spark: SparkSession, any_index_table: str, new_path: str) -> None:
    """Post-rewrite side-relation upkeep for compaction/retrain: the
    tombstones are spent (the rewrite dropped their rows physically)
    and are dropped; the stamps ledger is REWRITTEN to the surviving
    ids — rows that lived through the compaction keep their ingest
    history, so TTL expiry keeps working across generations (round-9
    review finding: dropping stamps here silently disabled TTL for
    every pre-compaction survivor)."""
    stamps = _side_name(any_index_table, "stamps")
    tombs = tombstones(spark, any_index_table)
    if spark.catalog.tableExists(stamps):
        live = spark.table(stamps)
        if tombs is not None:
            live = live.join(F.broadcast(tombs), "id", "left_anti")
        tmp = f"{stamps}_compacting"
        (
            live.write.mode("overwrite")
            .option("path", os.path.join(new_path, "stamps"))
            .format("parquet")
            .saveAsTable(tmp)
        )
        swap_table(spark, stamps, tmp)
    spark.sql(f"DROP TABLE IF EXISTS {_side_name(any_index_table, 'tombstones')}")


def compaction_due(
    spark: SparkSession,
    any_index_table: str,
    n_buckets: int,
    max_files_per_bucket: int = 8,
    max_dead_ratio: float = 0.2,
) -> dict:
    """Should this index be compacted now? Encodes the MEASURED cadence
    guidance (SCALE.md, tools/compaction_cadence.py): probe latency is
    flat in tombstone backlog — the broadcast anti-join is effectively
    free until the tombstone relation itself stops fitting the driver
    (~10⁷ ids) — so cadence keys on the two costs compaction actually
    removes:

    - **file-count decay**: every extend appends up to one file per
      non-empty bucket, so files/bucket ≈ extends since last compaction;
      scan open/seek overhead grows with it.
    - **dead rows**: tombstoned ids still occupy index rows until the
      rewrite; the post-compaction probe speedup in the measured curve
      is proportional to the physical shrink.

    Returns {"due": bool, "files_per_bucket": float, "dead_ratio":
    float, "reasons": [...]}. dead_ratio = tombstoned ids / distinct
    index ids — the one index-sized job, paid only when tombstones
    exist (a stamps-ledger denominator would be cheaper but is WRONG
    whenever the ledger covers only part of the index, e.g. built
    unstamped then extended stamped: a 1k-id ledger under a 1M-id index
    would inflate 300 deletions to dead_ratio 0.3 and trigger spurious
    full rewrites — round-10 review). The file-count check stays
    metadata-only."""
    files = len(spark.table(any_index_table).inputFiles())
    fpb = files / max(1, n_buckets)
    reasons = []
    if fpb > max_files_per_bucket:
        reasons.append(f"files/bucket {fpb:.1f} > {max_files_per_bucket}")

    dead_ratio = 0.0
    tombs = tombstones(spark, any_index_table)
    if tombs is not None:
        n_dead = tombs.count()
        if n_dead:
            idx = spark.table(any_index_table)
            n_total = idx.select(F.col(idx.columns[0])).distinct().count()
            dead_ratio = n_dead / max(1, n_total)
            if dead_ratio > max_dead_ratio:
                reasons.append(
                    f"dead ratio {dead_ratio:.2f} > {max_dead_ratio}"
                )
    return {
        "due": bool(reasons),
        "files_per_bucket": round(fpb, 2),
        "dead_ratio": round(dead_ratio, 4),
        "reasons": reasons,
    }


def record_stamps(
    spark: SparkSession, any_index_table: str, ids: DataFrame, stamp: int
) -> str:
    """Record the logical ingest stamp of ids entering the index (call
    at build/extend). Stamps are the TTL substrate: expiry tombstones
    every id whose stamp predates the cutoff. Logical ints, not wall
    clocks — deterministic under test and replay (a replayed epoch
    re-records the same stamp, and the duplicate row is harmless
    because expiry reads MAX(stamp) per id)."""
    stamps, path = _side_table(spark, any_index_table, "stamps")
    rows = ids.select(
        F.col(ids.columns[0]).cast("long").alias("id"), F.lit(stamp).alias("stamp")
    )
    if spark.catalog.tableExists(stamps):
        rows.write.mode("append").format("parquet").saveAsTable(stamps)
        spark.catalog.refreshTable(stamps)
    else:
        (
            rows.coalesce(1)
            .write.mode("overwrite")
            .option("path", path)
            .format("parquet")
            .saveAsTable(stamps)
        )
    return stamps


def append_stamp_rows(
    spark: SparkSession, any_index_table: str, rows: DataFrame
) -> str:
    """Append pre-formed (id, stamp) ledger rows — the stamp-history
    carry of an index MERGE (the source index's ids keep their original
    ingest stamps in the destination, so TTL expiry stays correct
    across the fold; re-stamping them at merge time would silently
    extend every merged id's lifetime). Duplicate rows are harmless for
    the same reason as :func:`record_stamps` replays — expiry reads
    MAX(stamp) per id."""
    stamps, path = _side_table(spark, any_index_table, "stamps")
    out = rows.select(
        F.col("id").cast("long").alias("id"),
        F.col("stamp").cast("long").alias("stamp"),
    )
    if spark.catalog.tableExists(stamps):
        out.write.mode("append").format("parquet").saveAsTable(stamps)
        spark.catalog.refreshTable(stamps)
    else:
        (
            out.coalesce(1)
            .write.mode("overwrite")
            .option("path", path)
            .format("parquet")
            .saveAsTable(stamps)
        )
    return stamps


def stamp_rows(spark: SparkSession, any_index_table: str) -> DataFrame | None:
    """The raw (id, stamp) ledger of the index owning
    ``any_index_table``, or None when no stamp was ever recorded —
    the read side of :func:`append_stamp_rows`."""
    stamps = _side_name(any_index_table, "stamps")
    return spark.table(stamps) if spark.catalog.tableExists(stamps) else None


def expired_ids(
    spark: SparkSession, any_index_table: str, before_stamp: int
) -> DataFrame:
    """Ids whose LATEST ingest stamp is < ``before_stamp`` (re-ingest
    under a newer stamp refreshes an id's TTL, the retention semantics
    every cache/TTL store uses). Feed straight into
    :func:`add_tombstones` to expire."""
    stamps = _side_name(any_index_table, "stamps")
    if not spark.catalog.tableExists(stamps):
        return spark.range(0).select(F.col("id"))
    return (
        spark.table(stamps)
        .groupBy("id")
        .agg(F.max("stamp").alias("latest"))
        .filter(F.col("latest") < before_stamp)
        .select("id")
    )
