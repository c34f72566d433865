"""Live PG→PG transfer pipeline (pg_transfer.py) against a throwaway
in-container PostgreSQL — the reference's flagship flow
(transfer_data_with_constraints_script.py + after-running-script.sql)
with real data movement: reflect → bulk copy → audit-gated FK DDL →
live sequence resync."""

from __future__ import annotations

import shutil
import subprocess
import tempfile

import pytest

pytestmark = pytest.mark.pg

PORT = 54333


def _su_postgres(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        capture_output=True, text=True, cwd="/", timeout=60,
    )


@pytest.fixture(scope="module")
def pg_server():
    from postgresql_transfer_tool_spark.sources.pgcopy import PgServer, run_sql

    if not (shutil.which("initdb") and shutil.which("psql") and shutil.which("pg_ctl")):
        pytest.skip("PostgreSQL binaries not available")
    base = tempfile.mkdtemp(prefix="pg_transfer_")
    try:
        subprocess.run(["chown", "postgres:postgres", base], check=False)
        r = _su_postgres(f"initdb -D {base}/data -A trust")
        if r.returncode != 0:
            pytest.skip(f"initdb failed: {r.stderr[-200:]}")
        r = _su_postgres(
            f"pg_ctl -D {base}/data -o '-p {PORT} -k {base} -c listen_addresses=' "
            f"-l {base}/pg.log start"
        )
        if r.returncode != 0:
            pytest.skip(f"server start failed: {r.stderr[-200:]}")
        server = PgServer(host=base, port=PORT)
        run_sql(server, "CREATE SCHEMA src")
        run_sql(
            server,
            "CREATE TABLE src.region ("
            " r_regionkey int PRIMARY KEY,"
            " r_name text NOT NULL,"
            " CONSTRAINT uq_region_name UNIQUE (r_name))",
        )
        run_sql(
            server,
            "CREATE TABLE src.nation ("
            " n_nationkey bigserial PRIMARY KEY,"
            " n_name text,"
            " n_regionkey int NOT NULL REFERENCES src.region(r_regionkey)"
            "   ON DELETE CASCADE ON UPDATE RESTRICT,"
            " n_comment text,"
            " CONSTRAINT ck_nation_nonneg CHECK (n_regionkey >= 0))",
        )
        run_sql(
            server,
            "INSERT INTO src.region VALUES"
            " (0, 'AFRICA'), (1, 'AMERICA'), (2, 'ASIA')",
        )
        run_sql(
            server,
            "INSERT INTO src.nation (n_name, n_regionkey, n_comment) VALUES"
            " ('ALGERIA', 0, E'multi\\nline, \"quoted\"'),"
            " ('BRAZIL', 1, NULL),"
            " ('CHINA', 2, ''),"
            " ('JAPAN', 2, 'häïku')",
        )
        yield server
        _su_postgres(f"pg_ctl -D {base}/data -m immediate stop")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@pytest.fixture(scope="module")
def report(spark, pg_server):
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline

    return PgTransferPipeline(
        spark,
        source=pg_server, source_schema="src",
        target=pg_server, target_schema="tgt",
    ).run()


def test_transfer_ok_and_counts(report):
    assert report.ok, {n: (r.status, r.error) for n, r in report.results.items()}
    assert report.results["region"].source_rows == 3
    assert report.results["region"].target_rows == 3
    assert report.results["nation"].target_rows == 4


def test_values_survive(pg_server, report):
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    src = run_sql(
        pg_server,
        "SELECT n_nationkey, n_name, n_regionkey, COALESCE(n_comment, '<null>')"
        " FROM src.nation ORDER BY n_nationkey",
    )
    tgt = run_sql(
        pg_server,
        "SELECT n_nationkey, n_name, n_regionkey, COALESCE(n_comment, '<null>')"
        " FROM tgt.nation ORDER BY n_nationkey",
    )
    assert src == tgt and len(src) == 4


def test_constraints_recreated(pg_server, report):
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    # FK with preserved referential actions (K4)
    rows = run_sql(
        pg_server,
        "SELECT confdeltype, confupdtype FROM pg_constraint c"
        " JOIN pg_namespace n ON n.oid = c.connamespace"
        " WHERE n.nspname = 'tgt' AND c.conname = 'fk_nation_n_regionkey'",
    )
    assert rows == [("c", "r")]  # CASCADE / RESTRICT
    assert any("fk_nation_n_regionkey" in d for d in report.fk_ddl)
    # audits all clean
    nat = report.results["nation"]
    assert nat.fk_orphans == {"nation.n_regionkey": 0}
    assert nat.check_violations == {"(n_regionkey >= 0)": 0}
    assert report.results["region"].unique_violations == {"r_name": 0}


def test_sequence_resynced_live(pg_server, report):
    """K7: the target's serial continues after MAX(id), no collision."""
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    assert report.results["nation"].next_sequence_value == 5
    run_sql(
        pg_server,
        "INSERT INTO tgt.nation (n_name, n_regionkey) VALUES ('EGYPT', 0)",
    )
    [(k,)] = run_sql(
        pg_server, "SELECT n_nationkey FROM tgt.nation WHERE n_name = 'EGYPT'"
    )
    assert int(k) == 5


def test_orphan_gates_fk_ddl(spark, pg_server):
    """An FK edge with orphans is reported but NOT enforced on the
    target (the ALTER would fail wholesale) — data still lands."""
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(pg_server, "CREATE SCHEMA bad")
    run_sql(pg_server, "CREATE TABLE bad.parent (id int PRIMARY KEY)")
    run_sql(
        pg_server,
        "CREATE TABLE bad.child ("
        " id int PRIMARY KEY,"
        " pid int REFERENCES bad.parent(id))",
    )
    run_sql(pg_server, "INSERT INTO bad.parent VALUES (1)")
    run_sql(pg_server, "INSERT INTO bad.child VALUES (10, 1)")
    # orphan sneaks in with the FK disabled (simulates source drift)
    run_sql(pg_server, "ALTER TABLE bad.child DROP CONSTRAINT child_pid_fkey")
    run_sql(pg_server, "INSERT INTO bad.child VALUES (11, 99)")
    run_sql(
        pg_server,
        "ALTER TABLE bad.child ADD CONSTRAINT child_pid_fkey"
        " FOREIGN KEY (pid) REFERENCES bad.parent(id) NOT VALID",
    )
    rep = PgTransferPipeline(
        spark,
        source=pg_server, source_schema="bad",
        target=pg_server, target_schema="bad_tgt",
    ).run()
    assert not rep.ok
    assert rep.results["child"].fk_orphans == {"child.pid": 1}
    assert rep.results["child"].target_rows == 2  # data still copied
    assert rep.fk_ddl == []  # enforcement gated
    rows = run_sql(
        pg_server,
        "SELECT COUNT(*) FROM pg_constraint c"
        " JOIN pg_namespace n ON n.oid = c.connamespace"
        " WHERE n.nspname = 'bad_tgt' AND c.contype = 'f'",
    )
    assert rows == [("0",)]


def test_exclusion_predicate(spark, pg_server):
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline
    from postgresql_transfer_tool_spark.sources.pgcopy import PgCopyError, run_sql

    rep = PgTransferPipeline(
        spark,
        source=pg_server, source_schema="src",
        target=pg_server, target_schema="excl_tgt",
        exclude=("nation",),
    ).run()
    assert rep.results["nation"].status == "skipped_excluded"
    assert rep.results["region"].status == "copied"
    with pytest.raises(PgCopyError):
        run_sql(pg_server, "SELECT COUNT(*) FROM excl_tgt.nation")


def test_hwm_incremental_cycles(spark, pg_server, tmp_path):
    """I2 live: cycle 1 full, cycle 2 only the delta, cycle 3 empty with
    a stable checkpoint (P5) — the HWM filter runs server-side so only
    new rows cross the wire."""
    from postgresql_transfer_tool_spark.pg_transfer import run_pg_incremental_batch
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql
    from postgresql_transfer_tool_spark.streaming.incremental import CheckpointStore

    run_sql(
        pg_server,
        "CREATE TABLE src.ev ("
        " id bigserial PRIMARY KEY, v text,"
        " ts timestamp NOT NULL DEFAULT '2026-01-01 00:00:00')",
    )
    run_sql(
        pg_server,
        "INSERT INTO src.ev (v, ts) VALUES"
        " ('a', '2026-01-01 10:00:00'), ('b', '2026-01-01 11:00:00.25')",
    )
    store = CheckpointStore(str(tmp_path / "ckpt.json"))

    b1 = run_pg_incremental_batch(spark, pg_server, "src", "ev", "ts", store)
    assert b1.n_rows == 2 and b1.prev_checkpoint is None
    store.set("src.ev.ts", b1.new_checkpoint)

    run_sql(
        pg_server,
        "INSERT INTO src.ev (v, ts) VALUES ('c', '2026-01-01 12:00:00')",
    )
    b2 = run_pg_incremental_batch(spark, pg_server, "src", "ev", "ts", store)
    assert b2.n_rows == 1
    assert [r["v"] for r in b2.data.collect()] == ["c"]
    store.set("src.ev.ts", b2.new_checkpoint)

    b3 = run_pg_incremental_batch(spark, pg_server, "src", "ev", "ts", store)
    assert b3.n_rows == 0
    assert b3.new_checkpoint == b2.new_checkpoint  # empty batch: stable


def test_hwm_incremental_serial_column(spark, pg_server, tmp_path):
    """The same protocol over a serial integer HWM (A2's MAX(id) shape)."""
    from postgresql_transfer_tool_spark.pg_transfer import run_pg_incremental_batch
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql
    from postgresql_transfer_tool_spark.streaming.incremental import CheckpointStore

    run_sql(pg_server, "CREATE TABLE src.hw (id bigserial PRIMARY KEY, v text)")
    run_sql(pg_server, "INSERT INTO src.hw (v) VALUES ('x'), ('y')")
    store = CheckpointStore(str(tmp_path / "ckpt.json"))
    b1 = run_pg_incremental_batch(spark, pg_server, "src", "hw", "id", store)
    assert b1.n_rows == 2 and b1.new_checkpoint == "2"
    store.set("src.hw.id", b1.new_checkpoint)
    run_sql(pg_server, "INSERT INTO src.hw (v) VALUES ('z')")
    b2 = run_pg_incremental_batch(spark, pg_server, "src", "hw", "id", store)
    assert b2.n_rows == 1 and b2.new_checkpoint == "3"


def test_flag_sync_cycle(spark, pg_server):
    """I1 live: unsynced rows stream out, the returned UPDATE marks
    them, the next cycle is empty; a row inserted later re-surfaces."""
    from postgresql_transfer_tool_spark.pg_transfer import run_pg_flag_sync
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(
        pg_server,
        "CREATE TABLE src.flagged ("
        " id int PRIMARY KEY, v text,"
        " update_flag boolean NOT NULL DEFAULT false)",
    )
    run_sql(
        pg_server,
        "INSERT INTO src.flagged (id, v) VALUES (1, 'a'), (2, 'b')",
    )
    df, mark = run_pg_flag_sync(spark, pg_server, "src", "flagged")
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    run_sql(pg_server, mark)  # commit-after-write ordering
    df2, _ = run_pg_flag_sync(spark, pg_server, "src", "flagged")
    assert df2.count() == 0
    run_sql(pg_server, "INSERT INTO src.flagged (id, v) VALUES (3, 'c')")
    df3, _ = run_pg_flag_sync(spark, pg_server, "src", "flagged")
    assert [r["id"] for r in df3.collect()] == [3]


def test_resync_schema_sequences_standalone(pg_server):
    """The reference's third entry point (after-running-script.sql) as
    a callable: stale sequences across a whole schema snap to
    COALESCE(MAX,0)+1, empty tables get 1, non-serial tables are
    untouched, and one broken object does not stop the walk."""
    from postgresql_transfer_tool_spark.pg_transfer import resync_schema_sequences
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(pg_server, "CREATE SCHEMA rs")
    run_sql(
        pg_server,
        "CREATE TABLE rs.hist (id bigserial PRIMARY KEY,"
        " history_id bigserial, v text)",
    )
    run_sql(pg_server, "CREATE TABLE rs.empty_t (id bigserial PRIMARY KEY)")
    run_sql(pg_server, "CREATE TABLE rs.plain (k int PRIMARY KEY)")
    run_sql(
        pg_server,
        "INSERT INTO rs.hist (id, history_id, v) VALUES"
        " (5, 30, 'a'), (9, 31, 'b')",
    )
    # sequences are stale (never advanced past their initial state)
    out = resync_schema_sequences(pg_server, "rs")
    assert out == {"hist.id": 10, "hist.history_id": 32, "empty_t.id": 1}
    run_sql(pg_server, "INSERT INTO rs.hist (v) VALUES ('c')")
    rows = run_sql(
        pg_server, "SELECT id, history_id FROM rs.hist WHERE v = 'c'"
    )
    assert rows == [("10", "32")]
    rows = run_sql(pg_server, "INSERT INTO rs.empty_t DEFAULT VALUES RETURNING id")
    assert rows == [("1",)]


def test_full_fixture_migration_dress_rehearsal(spark, sf_dir, pg_server):
    """The reference's whole job at fixture scale: seed live PG with all
    10 fixture tables (PKs, serials, the 7-edge FK graph), then run the
    PG→PG pipeline into a fresh schema and require a fully-green report
    — counts, audits, enforced FKs, resynced sequences."""
    import os
    from dataclasses import replace

    from postgresql_transfer_tool_spark.catalog import fixture_catalog, load_table
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql, write_table
    from postgresql_transfer_tool_spark.transfer import fk_ddl_statement

    root = os.path.dirname(sf_dir.rstrip("/"))
    small = os.path.join(root, "sf0.001")
    catalog = fixture_catalog()
    run_sql(pg_server, "CREATE SCHEMA mig")
    counts: dict[str, int] = {}
    for name, info in catalog.items():
        df = load_table(spark, small, name)
        write_table(
            df, pg_server, "mig", name,
            primary_key=info.primary_key, serial_columns=info.serial_columns,
        )
        counts[name] = df.count()
    for info in catalog.values():  # FK graph on the seeded source
        for fk in info.foreign_keys:
            run_sql(pg_server, fk_ddl_statement(replace(info, schema="mig"), fk))

    rep = PgTransferPipeline(
        spark,
        source=pg_server, source_schema="mig",
        target=pg_server, target_schema="mig2",
    ).run()

    assert rep.ok, {n: (r.status, r.error) for n, r in rep.results.items()}
    assert len(rep.results) == 10
    for name, n in counts.items():
        assert rep.results[name].target_rows == n, name
    assert len(rep.fk_ddl) == 7  # whole FK graph re-enforced on the target
    orphan_counts = [
        v for r in rep.results.values() for v in r.fk_orphans.values()
    ]
    assert len(orphan_counts) == 7 and all(v == 0 for v in orphan_counts)
    # serial continuation on the migrated side (orders is serial-backed):
    # next value is MAX(key)+1, not row-count+1 — keys need not be dense
    [(omax,)] = run_sql(pg_server, "SELECT MAX(o_orderkey) FROM mig2.orders")
    assert rep.results["orders"].next_sequence_value == int(omax) + 1
    # micro-precision timestamps survived both hops (events.ts has micros)
    src_ck = run_sql(
        pg_server,
        "SELECT md5(string_agg(event_id::text || '|' || ts::text, ','"
        " ORDER BY event_id)) FROM mig.events",
    )
    tgt_ck = run_sql(
        pg_server,
        "SELECT md5(string_agg(event_id::text || '|' || ts::text, ','"
        " ORDER BY event_id)) FROM mig2.events",
    )
    assert src_ck == tgt_ck
    [(has_micros,)] = run_sql(
        pg_server,
        "SELECT COUNT(*) FROM mig2.events"
        " WHERE date_part('microseconds', ts)::int % 1000 <> 0",
    )
    assert int(has_micros) > 0  # precision actually exercised


def test_composite_fk_reflection_and_enforcement(spark, pg_server):
    """A two-column FK must reflect with its child↔parent column
    CORRESPONDENCE intact (information_schema alone returns an
    unordered column bag) and re-enforce on the target with the same
    column order and referential action."""
    from postgresql_transfer_tool_spark.pg_transfer import (
        PgTransferPipeline,
        reflect_pg_catalog,
    )
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(pg_server, "CREATE SCHEMA comp")
    run_sql(
        pg_server,
        "CREATE TABLE comp.parent (a int, b int, v text, PRIMARY KEY (a, b))",
    )
    run_sql(
        pg_server,
        "CREATE TABLE comp.child ("
        " id int PRIMARY KEY, yb int, xa int,"
        " FOREIGN KEY (xa, yb) REFERENCES comp.parent (a, b)"
        "   ON DELETE SET NULL)",
    )
    run_sql(pg_server, "INSERT INTO comp.parent VALUES (1, 2, 'p')")
    run_sql(pg_server, "INSERT INTO comp.child VALUES (10, 2, 1)")

    cat = reflect_pg_catalog(pg_server, "comp")
    [fk] = cat["child"].foreign_keys
    assert fk.columns == ("xa", "yb") and fk.ref_columns == ("a", "b")
    assert fk.on_delete == "SET NULL" and fk.on_update is None

    rep = PgTransferPipeline(
        spark,
        source=pg_server, source_schema="comp",
        target=pg_server, target_schema="comp2",
    ).run()
    assert rep.ok, {n: (r.status, r.error) for n, r in rep.results.items()}
    assert rep.results["child"].fk_orphans == {"child.xa,yb": 0}
    [(condef,)] = run_sql(
        pg_server,
        "SELECT pg_get_constraintdef(c.oid) FROM pg_constraint c"
        " JOIN pg_namespace n ON n.oid = c.connamespace"
        " WHERE n.nspname = 'comp2' AND c.contype = 'f'",
    )
    assert condef == (
        "FOREIGN KEY (xa, yb) REFERENCES comp2.parent(a, b) ON DELETE SET NULL"
    )
    # the action is live: deleting the parent nulls the child columns
    run_sql(pg_server, "DELETE FROM comp2.parent WHERE a = 1 AND b = 2")
    assert run_sql(pg_server, "SELECT xa, yb FROM comp2.child") == [("", "")] or \
        run_sql(pg_server, "SELECT xa IS NULL, yb IS NULL FROM comp2.child") == [("t", "t")]


def test_lake_replicator_exactly_once(spark, pg_server, tmp_path):
    """PG→parquet-lake CDC: delta-only epochs, empty cycles create no
    epoch, and a crash between parquet write and ledger commit is
    repaired by REWRITING the same epoch — the lake never duplicates
    rows because data and checkpoint commit in one atomic rename."""
    import os

    from postgresql_transfer_tool_spark.pg_transfer import PgLakeReplicator
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(
        pg_server,
        "CREATE TABLE src.lake_ev (id bigserial PRIMARY KEY, v text)",
    )
    run_sql(pg_server, "INSERT INTO src.lake_ev (v) VALUES ('a'), ('b')")
    lake = str(tmp_path / "lake")
    rep = PgLakeReplicator(spark, pg_server, "src", "lake_ev", "id", lake)

    c1 = rep.run_cycle()
    assert c1 == {"epoch": 0, "n_rows": 2, "hwm": "2"}
    run_sql(pg_server, "INSERT INTO src.lake_ev (v) VALUES ('c')")
    c2 = rep.run_cycle()
    assert c2 == {"epoch": 1, "n_rows": 1, "hwm": "3"}
    assert rep.run_cycle()["n_rows"] == 0  # no delta → no epoch
    rows = sorted(
        (r["id"], r["v"]) for r in rep.read_lake().collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]

    # crash simulation: epoch 1's parquet landed but its ledger marker
    # didn't (remove the marker). Recovery must rewrite epoch 1 from
    # the epoch-0 checkpoint, not append a duplicate epoch 2.
    os.remove(os.path.join(lake, "_epochs", "epoch=1.committed"))
    c2b = rep.run_cycle()
    assert c2b == {"epoch": 1, "n_rows": 1, "hwm": "3"}
    rows = sorted(
        (r["id"], r["v"]) for r in rep.read_lake().collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]  # no duplicates


@pytest.fixture(scope="module")
def pg_server_b():
    """A SECOND independent cluster — the pipeline's actual deployment
    shape is cross-server, not schema rename."""
    from postgresql_transfer_tool_spark.sources.pgcopy import PgServer

    base = tempfile.mkdtemp(prefix="pg_transfer_b_")
    try:
        subprocess.run(["chown", "postgres:postgres", base], check=False)
        r = _su_postgres(f"initdb -D {base}/data -A trust")
        if r.returncode != 0:
            pytest.skip(f"initdb failed: {r.stderr[-200:]}")
        r = _su_postgres(
            f"pg_ctl -D {base}/data -o '-p 54334 -k {base} -c listen_addresses=' "
            f"-l {base}/pg.log start"
        )
        if r.returncode != 0:
            pytest.skip(f"server start failed: {r.stderr[-200:]}")
        yield PgServer(host=base, port=54334)
        _su_postgres(f"pg_ctl -D {base}/data -m immediate stop")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cross_server_transfer(spark, pg_server, pg_server_b, report):
    """Source and target on DIFFERENT clusters: data, constraints, and
    sequence state all land on server B, which never saw the source."""
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    rep = PgTransferPipeline(
        spark,
        source=pg_server, source_schema="src",
        target=pg_server_b, target_schema="xfer",
    ).run()
    assert rep.ok, {n: (r.status, r.error) for n, r in rep.results.items()}
    assert rep.results["nation"].target_rows == 4
    src_rows = run_sql(
        pg_server, "SELECT n_name, n_regionkey FROM src.nation ORDER BY n_nationkey"
    )
    tgt_rows = run_sql(
        pg_server_b,
        "SELECT n_name, n_regionkey FROM xfer.nation ORDER BY n_nationkey",
    )
    assert src_rows == tgt_rows
    # FK enforced on B; serial continues on B
    [(nfk,)] = run_sql(
        pg_server_b,
        "SELECT COUNT(*) FROM pg_constraint c"
        " JOIN pg_namespace n ON n.oid = c.connamespace"
        " WHERE n.nspname = 'xfer' AND c.contype = 'f'",
    )
    assert int(nfk) == 1
    run_sql(
        pg_server_b,
        "INSERT INTO xfer.nation (n_name, n_regionkey) VALUES ('KENYA', 0)",
    )
    [(k,)] = run_sql(
        pg_server_b, "SELECT n_nationkey FROM xfer.nation WHERE n_name = 'KENYA'"
    )
    assert int(k) == 5


def test_swap_mode_idempotent_rerun(spark, pg_server):
    """mode='swap': a second run against a populated target replaces
    tables atomically — same counts, no PK-violation failures, FKs and
    sequences re-established. (mode='fresh' reruns fail mid-COPY like
    the reference would.)"""
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    def once():
        return PgTransferPipeline(
            spark,
            source=pg_server, source_schema="src",
            target=pg_server, target_schema="swap_tgt",
            mode="swap",
        ).run()

    r1 = once()
    assert r1.ok, {n: (r.status, r.error) for n, r in r1.results.items()}
    # poison the target so only a real replacement can restore it
    run_sql(pg_server, "DELETE FROM swap_tgt.nation WHERE n_nationkey = 1")
    r2 = once()
    assert r2.ok, {n: (r.status, r.error) for n, r in r2.results.items()}
    assert r2.results["nation"].target_rows == 4  # restored, not appended
    [(n,)] = run_sql(pg_server, "SELECT COUNT(*) FROM swap_tgt.nation")
    assert int(n) == 4
    [(nfk,)] = run_sql(
        pg_server,
        "SELECT COUNT(*) FROM pg_constraint c"
        " JOIN pg_namespace ns ON ns.oid = c.connamespace"
        " WHERE ns.nspname = 'swap_tgt' AND c.contype = 'f'",
    )
    assert int(nfk) == 1  # FK re-added after the swap
    # no staging leftovers
    [(nstg,)] = run_sql(
        pg_server,
        "SELECT COUNT(*) FROM pg_tables"
        " WHERE schemaname = 'swap_tgt' AND tablename LIKE '%__stg'",
    )
    assert int(nstg) == 0
    # sequence still live post-swap
    run_sql(
        pg_server,
        "INSERT INTO swap_tgt.nation (n_name, n_regionkey) VALUES ('GHANA', 0)",
    )
    [(k,)] = run_sql(
        pg_server, "SELECT n_nationkey FROM swap_tgt.nation WHERE n_name = 'GHANA'"
    )
    assert int(k) == 5


def test_swap_mode_failed_table_keeps_previous_target(spark, pg_server, monkeypatch):
    """K6 live: when a table's load fails, the PREVIOUS target version
    survives untouched (staging dropped), other tables still commit.
    The failure is injected at the load step (the realistic failure
    modes — parse error, disk, lost connection — all surface there)."""
    from postgresql_transfer_tool_spark import pg_transfer
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(pg_server, "CREATE SCHEMA rb")
    run_sql(pg_server, "CREATE TABLE rb.good (id int PRIMARY KEY, v text)")
    run_sql(pg_server, "CREATE TABLE rb.flaky (id int PRIMARY KEY, v text)")
    run_sql(pg_server, "INSERT INTO rb.good VALUES (1, 'g1')")
    run_sql(pg_server, "INSERT INTO rb.flaky VALUES (1, 'f1')")

    def once():
        return pg_transfer.PgTransferPipeline(
            spark,
            source=pg_server, source_schema="rb",
            target=pg_server, target_schema="rb_tgt",
            mode="swap",
        ).run()

    assert once().ok
    run_sql(pg_server, "INSERT INTO rb.flaky VALUES (2, 'f2')")
    run_sql(pg_server, "INSERT INTO rb.good VALUES (2, 'g2')")

    real_write = pg_transfer.write_table

    def flaky_write(df, server, schema, table, **kw):
        if table.startswith("flaky"):
            raise RuntimeError("injected mid-load failure")
        return real_write(df, server, schema, table, **kw)

    monkeypatch.setattr(pg_transfer, "write_table", flaky_write)
    r2 = once()
    assert not r2.ok
    assert r2.results["flaky"].status == "failed"
    assert "injected" in r2.results["flaky"].error
    # previous flaky version intact (1 row, not 2), staging cleaned
    [(n,)] = run_sql(pg_server, "SELECT COUNT(*) FROM rb_tgt.flaky")
    assert int(n) == 1
    [(nstg,)] = run_sql(
        pg_server,
        "SELECT COUNT(*) FROM pg_tables"
        " WHERE schemaname = 'rb_tgt' AND tablename LIKE '%__stg'",
    )
    assert int(nstg) == 0
    # the good table committed regardless of its sibling
    assert r2.results["good"].status == "copied"
    [(n,)] = run_sql(pg_server, "SELECT COUNT(*) FROM rb_tgt.good")
    assert int(n) == 2


def test_verify_table_equivalence(spark, pg_server):
    """Multiset diff catches what COUNT(*) validation cannot: equal
    counts with different values. Uses its own target schema — sibling
    tests mutate the shared 'tgt' schema (sequence-continuation
    inserts), and this test's contract is exact equivalence."""
    from postgresql_transfer_tool_spark.pg_transfer import (
        PgTransferPipeline,
        verify_table_equivalence,
    )
    from postgresql_transfer_tool_spark.sources.pgcopy import read_table, run_sql

    assert PgTransferPipeline(
        spark,
        source=pg_server, source_schema="src",
        target=pg_server, target_schema="veq_tgt",
        exclude=tuple(
            t for (t,) in run_sql(
                pg_server,
                "SELECT tablename FROM pg_tables WHERE schemaname='src'",
            )
            if t not in ("region", "nation")
        ),
    ).run().results["nation"].status == "copied"
    src_df = read_table(spark, pg_server, "src", "nation")
    v = verify_table_equivalence(spark, src_df, pg_server, "veq_tgt", "nation")
    assert v == {"missing": 0, "extra": 0, "equal": True}
    # same count, one mutated value — count-only validation passes,
    # the multiset diff must not
    run_sql(
        pg_server,
        "CREATE TABLE veq_tgt.nation_mut AS SELECT * FROM veq_tgt.nation",
    )
    run_sql(
        pg_server,
        "UPDATE veq_tgt.nation_mut SET n_name = 'BRASIL' WHERE n_name = 'BRAZIL'",
    )
    v2 = verify_table_equivalence(
        spark, src_df, pg_server, "veq_tgt", "nation_mut"
    )
    assert v2 == {"missing": 1, "extra": 1, "equal": False}


def test_pipeline_verify_phase(spark, pg_server):
    """verify=True: every copied table carries a verified=True flag from
    the post-load multiset diff."""
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline

    rep = PgTransferPipeline(
        spark,
        source=pg_server, source_schema="src",
        target=pg_server, target_schema="verif_tgt",
        exclude=("ev", "hw", "flagged", "lake_ev"),
        verify=True,
    ).run()
    assert rep.ok, {n: (r.status, r.error) for n, r in rep.results.items()}
    copied = [r for r in rep.results.values() if r.status == "copied"]
    assert copied and all(r.verified is True for r in copied)


def test_fk_edges_same_constraint_name_two_tables():
    """Constraint names are unique per TABLE: two tables sharing an
    fk_customer name must reflect as two distinct edges (review
    finding: grouping by name alone garbled them)."""
    from postgresql_transfer_tool_spark.sources.jdbc import fk_edges_from_rows

    rows = [
        ("fk_customer", "orders", "cust_id", "customer", "id", 1, "a", "a"),
        ("fk_customer", "invoices", "cust_id", "customer", "id", 1, "c", "a"),
    ]
    edges = sorted(fk_edges_from_rows(rows), key=lambda e: e.table)
    assert len(edges) == 2
    assert edges[0].table == "invoices" and edges[0].on_delete == "CASCADE"
    assert edges[1].table == "orders" and edges[1].on_delete is None
    assert all(e.columns == ("cust_id",) for e in edges)


def test_hwm_tiebreak_closes_equal_timestamp_window(spark, pg_server, tmp_path):
    """A row sharing the checkpoint timestamp but committing later must
    surface on the next cycle when a tiebreak column is supplied."""
    from postgresql_transfer_tool_spark.pg_transfer import run_pg_incremental_batch
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql
    from postgresql_transfer_tool_spark.streaming.incremental import CheckpointStore

    run_sql(
        pg_server,
        "CREATE TABLE src.tieb (id bigserial PRIMARY KEY, v text,"
        " ts timestamp NOT NULL)",
    )
    run_sql(
        pg_server,
        "INSERT INTO src.tieb (v, ts) VALUES ('a', '2026-02-01 10:00:00')",
    )
    store = CheckpointStore(str(tmp_path / "ck.json"))
    b1 = run_pg_incremental_batch(
        spark, pg_server, "src", "tieb", "ts", store, tiebreak_col="id"
    )
    assert b1.n_rows == 1 and b1.new_checkpoint == "2026-02-01 10:00:00|1"
    store.set("src.tieb.ts", b1.new_checkpoint)
    # late commit with the SAME timestamp — strict '>' would skip it
    run_sql(
        pg_server,
        "INSERT INTO src.tieb (v, ts) VALUES ('late', '2026-02-01 10:00:00')",
    )
    b2 = run_pg_incremental_batch(
        spark, pg_server, "src", "tieb", "ts", store, tiebreak_col="id"
    )
    assert b2.n_rows == 1
    assert [r["v"] for r in b2.data.collect()] == ["late"]
    assert b2.new_checkpoint == "2026-02-01 10:00:00|2"
    store.set("src.tieb.ts", b2.new_checkpoint)
    b3 = run_pg_incremental_batch(
        spark, pg_server, "src", "tieb", "ts", store, tiebreak_col="id"
    )
    assert b3.n_rows == 0 and b3.new_checkpoint == b2.new_checkpoint


def test_swap_preserves_excluded_tables_fk(spark, pg_server):
    """Swap-mode rerun with an exclusion: the excluded child's FK onto a
    swapped parent is dropped for the swap but RESTORED afterwards —
    the run must not shed integrity outside its scope."""
    from postgresql_transfer_tool_spark.pg_transfer import PgTransferPipeline
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(pg_server, "CREATE SCHEMA keepfk")
    run_sql(pg_server, "CREATE TABLE keepfk.parent (id int PRIMARY KEY)")
    run_sql(
        pg_server,
        "CREATE TABLE keepfk.child (id int PRIMARY KEY,"
        " pid int REFERENCES keepfk.parent(id))",
    )
    run_sql(pg_server, "INSERT INTO keepfk.parent VALUES (1)")
    run_sql(pg_server, "INSERT INTO keepfk.child VALUES (10, 1)")

    def once(**kw):
        return PgTransferPipeline(
            spark,
            source=pg_server, source_schema="keepfk",
            target=pg_server, target_schema="keepfk_tgt",
            mode="swap", **kw,
        ).run()

    assert once().ok  # target now has parent+child+FK
    r2 = once(exclude=("child",))  # rerun swaps parent only
    assert r2.ok, {n: (r.status, r.error) for n, r in r2.results.items()}
    [(nfk,)] = run_sql(
        pg_server,
        "SELECT COUNT(*) FROM pg_constraint c"
        " JOIN pg_namespace n ON n.oid = c.connamespace"
        " WHERE n.nspname = 'keepfk_tgt' AND c.contype = 'f'",
    )
    assert int(nfk) == 1  # the excluded child's FK survived the swap
    # and it is live: inserting an orphan into the excluded child fails
    import pytest as _pytest

    from postgresql_transfer_tool_spark.sources.pgcopy import PgCopyError

    with _pytest.raises(PgCopyError):
        run_sql(pg_server, "INSERT INTO keepfk_tgt.child VALUES (11, 99)")


def test_hyphenated_schema_sequence_resync(spark, pg_server):
    """pg_get_serial_sequence parses its TEXT argument under identifier
    rules — the hyphenated schema must be quoted (review finding: the
    probe silently failed and left sequences stale)."""
    from postgresql_transfer_tool_spark.pg_transfer import resync_schema_sequences
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    run_sql(pg_server, 'CREATE SCHEMA "hy-ph"')
    run_sql(
        pg_server,
        'CREATE TABLE "hy-ph"."Tab-le" (id bigserial PRIMARY KEY, v text)',
    )
    run_sql(pg_server, 'INSERT INTO "hy-ph"."Tab-le" (id, v) VALUES (9, \'x\')')
    out = resync_schema_sequences(pg_server, "hy-ph")
    assert out == {"Tab-le.id": 10}
    run_sql(pg_server, 'INSERT INTO "hy-ph"."Tab-le" (v) VALUES (\'y\')')
    rows = run_sql(pg_server, 'SELECT id FROM "hy-ph"."Tab-le" WHERE v = \'y\'')
    assert rows == [("10",)]
