"""PG-sourced admission funnel (pg_transfer.PgFunnelIngest — VERDICT
r10 #7): documents arrive from a live PostgreSQL table via HWM serial
batches (the reference's CDC surface, event-table.sql:17-18 /
transfer_data_script.py:96-133) and flow through the streaming
admission funnel into the lake — exactly-once across a mid-cycle kill,
including rows that land in PostgreSQL WHILE the crashed epoch is down
(the pinned-upper-bound re-read)."""

from __future__ import annotations

import shutil
import subprocess
import tempfile
import uuid

import pytest

from tests.test_dedup_index import _docs, _text

pytestmark = pytest.mark.pg

PORT = 54337


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
    base = tempfile.mkdtemp(prefix="pg_funnel_")
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
            "CREATE TABLE src.documents ("
            " doc_id bigserial PRIMARY KEY,"
            " text text NOT NULL)",
        )
        yield server
        _su_postgres(f"pg_ctl -D {base}/data -m immediate stop")
    finally:
        shutil.rmtree(base, ignore_errors=True)


CORPUS = [(100, _text(1)), (101, _text(2)), (102, _text(3))]
BENCH = [(900, _text(50))]


def _insert_docs(server, texts: list[str]) -> None:
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql

    vals = ", ".join("('" + t.replace("'", "''") + "')" for t in texts)
    run_sql(server, f"INSERT INTO src.documents (text) VALUES {vals}")


def test_pg_cdc_through_funnel_exactly_once_across_kill(
    spark, tmp_path, pg_server, monkeypatch
):
    from postgresql_transfer_tool_spark.operators.contamination_index import (
        build_contamination_index,
    )
    from postgresql_transfer_tool_spark.operators.dedup_index import (
        build_dedup_index,
    )
    from postgresql_transfer_tool_spark.pg_transfer import PgFunnelIngest
    from postgresql_transfer_tool_spark.streaming import ingest_funnel as mod
    from postgresql_transfer_tool_spark.streaming.ingest_funnel import (
        IngestFunnelSink,
    )

    name = f"pgfnl{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, _docs(spark, CORPUS), tempfile.mkdtemp(prefix=name), name
    )
    gtable = build_contamination_index(
        spark, _docs(spark, BENCH), tempfile.mkdtemp(prefix=f"{name}g"), f"{name}g"
    )
    sink = IngestFunnelSink(spark, index, gtable, str(tmp_path / "out"))
    ingest = PgFunnelIngest(
        spark, pg_server, "src", "documents", "doc_id", sink
    )

    # --- cycle 1: novel / corpus-dup / contaminated / short (ids 1-4) ---
    _insert_docs(pg_server, [_text(11), _text(1), _text(50), "too short"])
    s1 = ingest.run_cycle()
    assert s1 == {"epoch": 0, "n_rows": 4, "hwm": "4"}
    cols = ["doc_id", "is_novel", "is_contaminated", "admitted"]
    d = {r[0]: tuple(r) for r in sink.decisions().select(*cols).collect()}
    assert d[1][1] is True and d[1][3] is True          # novel, admitted
    assert d[2][1] is False and d[2][3] is False        # dups corpus 100
    assert d[3][2] is True and d[3][3] is False         # contaminated
    assert d[4][1] is True and d[4][3] is False         # quality floor

    # --- idle cycle: no delta, no epoch ---
    assert ingest.run_cycle()["epoch"] is None

    # --- cycle 2: dup of a PG-STREAMED doc + novel (ids 5-6): the index
    # grew with epoch 0, so 5 (≡ doc 1's text) is caught cross-epoch ---
    _insert_docs(pg_server, [_text(11), _text(12)])
    s2 = ingest.run_cycle()
    assert s2 == {"epoch": 1, "n_rows": 2, "hwm": "6"}
    d = {r[0]: tuple(r) for r in sink.decisions().select(*cols).collect()}
    assert d[5][1] is False and d[5][3] is False
    assert d[6][1] is True and d[6][3] is True

    # --- mid-cycle kill: decisions written, index extend lost ---
    _insert_docs(pg_server, [_text(13), _text(13)])  # ids 7-8: twin pair
    def boom(*a, **k):
        raise RuntimeError("injected kill before extend")
    monkeypatch.setattr(mod, "append_all_signatures", boom)
    with pytest.raises(RuntimeError, match="injected"):
        ingest.run_cycle()
    assert sink.ledger.committed() == {0, 1}  # epoch 2 is NOT committed
    monkeypatch.undo()

    # rows land in PG WHILE the epoch is down — the recovery re-read
    # must NOT absorb them into the crashed epoch (the pinned bound)
    _insert_docs(pg_server, [_text(11), _text(14)])  # ids 9-10

    s3 = ingest.run_cycle()
    assert s3 == {"epoch": 2, "n_rows": 2, "hwm": "8"}  # ids 7-8 only
    assert sink.ledger.committed() == {0, 1, 2}
    d = {r[0]: tuple(r) for r in sink.decisions().select(*cols).collect()}
    assert d[7][1] is True and d[7][3] is True          # lower-id twin
    assert d[8][1] is False and d[8][3] is False        # within-epoch dup
    assert 9 not in d and 10 not in d                   # bound held

    # --- next cycle picks up the post-crash rows as their own epoch ---
    s4 = ingest.run_cycle()
    assert s4 == {"epoch": 3, "n_rows": 2, "hwm": "10"}
    d = {r[0]: tuple(r) for r in sink.decisions().select(*cols).collect()}
    assert d[9][1] is False           # ≡ doc 1, caught via the repaired index
    assert d[10][1] is True and d[10][3] is True
    # exactly one decision row per PG doc — no replay duplicates
    assert sorted(d) == list(range(1, 11))
    assert sink.decisions().count() == 10

    # the end-to-end lake view: admitted docs only
    admitted = {r for (r, *rest) in d.values() if d[r][3]}
    assert admitted == {1, 6, 7, 10}

    stem = index.bands_table.rsplit("_", 1)[0]
    gstem = gtable.rsplit("_", 1)[0]
    for t in (index.bands_table, index.shingles_table, gtable,
              f"{stem}_tombstones", f"{stem}_stamps",
              f"{gstem}_tombstones", f"{gstem}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pg_cdc_full_trilogy_with_maintenance(spark, tmp_path, pg_server):
    """The complete production shape, live: documents CDC-stream from
    PostgreSQL through the TRILOGY funnel (text near-dup ∧ GROWING
    vector index ∧ contamination ∧ quality) with sink-integrated
    maintenance armed — compaction of both indexes fires between HWM
    cycles and changes no decision. Cross-cycle checks: a later PG doc
    whose embedding duplicates an earlier STREAMED doc's is rejected
    by the grown vector index; every PG doc gets exactly one decision."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.ann_index import (
        build_ann_index,
    )
    from postgresql_transfer_tool_spark.operators.contamination_index import (
        build_contamination_index,
    )
    from postgresql_transfer_tool_spark.operators.dedup_index import (
        build_dedup_index,
    )
    from postgresql_transfer_tool_spark.pg_transfer import PgFunnelIngest
    from postgresql_transfer_tool_spark.sources.pgcopy import run_sql
    from postgresql_transfer_tool_spark.streaming.ingest_funnel import (
        IngestFunnelSink,
    )
    from postgresql_transfer_tool_spark.streaming.maintenance import (
        MaintenancePolicy,
    )

    run_sql(pg_server, "CREATE TABLE src.documents2 ("
            " doc_id bigserial PRIMARY KEY, text text NOT NULL)")

    def insert2(texts):
        vals = ", ".join("('" + t.replace("'", "''") + "')" for t in texts)
        run_sql(pg_server, f"INSERT INTO src.documents2 (text) VALUES {vals}")

    name = f"pgtri{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, _docs(spark, CORPUS), tempfile.mkdtemp(prefix=name), name
    )
    gtable = build_contamination_index(
        spark, _docs(spark, BENCH), tempfile.mkdtemp(prefix=f"{name}g"), f"{name}g"
    )

    dim = 8
    def vec(vid, axis, bump):
        qe = [0] * dim
        qe[axis] = 1_000_000 + bump
        return (vid, qe, sum(x * x for x in qe))

    # embeddings for corpus docs + the PG serials we are about to
    # insert (vec_id = doc_id): PG doc 2's vector dups PG doc 1's
    # EXACTLY but arrives in a LATER cycle — only the grown index
    # catches it; doc 3 has no embedding row (emb-novel by definition)
    v1 = vec(1, 6, 500)
    emb_rows = [vec(d, i % dim, i) for i, (d, _) in enumerate(CORPUS)] + [
        v1, (2, v1[1], v1[2]), (4, *vec(4, 7, 900)[1:]),
    ]
    embeddings = spark.createDataFrame(
        emb_rows, "vec_id bigint, qe array<bigint>, nq bigint"
    )
    aname = f"annidx_pg{uuid.uuid4().hex[:6]}"
    ann = build_ann_index(
        spark,
        embeddings.filter(F.col("vec_id").isin([d for d, _ in CORPUS])),
        tempfile.mkdtemp(prefix=aname), aname, n_rows=len(CORPUS),
    )

    policy = MaintenancePolicy(
        every_epochs=2, max_files_per_bucket=0, scratch_root=str(tmp_path)
    )
    sink = IngestFunnelSink(
        spark, index, gtable, str(tmp_path / "out"),
        ann_index=ann, embeddings=embeddings, nprobe=2, grow_ann=True,
        maintenance=policy,
    )
    ingest = PgFunnelIngest(
        spark, pg_server, "src", "documents2", "doc_id", sink
    )

    insert2([_text(81)])                      # id 1: clean, admitted
    assert ingest.run_cycle()["epoch"] == 0
    insert2([_text(82), _text(83)])           # id 2: emb-dup of 1; id 3 clean
    s = ingest.run_cycle()
    assert s["epoch"] == 1 and s["n_rows"] == 2
    # maintenance fired after epoch 1 (every_epochs=2), on BOTH indexes
    tables = {h["table"] for h in policy.history if "stats" in h}
    assert any("_bands" in t for t in tables)
    assert any("_cells" in t for t in tables)

    insert2([_text(84)])                      # id 4: clean, admitted
    assert ingest.run_cycle()["epoch"] == 2   # post-compaction cycle

    cols = ["doc_id", "is_novel", "is_emb_novel", "nn_cosine", "admitted"]
    d = {r[0]: tuple(r) for r in sink.decisions().select(*cols).collect()}
    assert sorted(d) == [1, 2, 3, 4]
    assert d[1][2] is True and d[1][4] is True
    # the grown index catches the cross-cycle embedding dup
    assert d[2][1] is True and d[2][2] is False
    assert d[2][3] >= 1.0 - 1e-15 and d[2][4] is False
    assert d[3][2] is True and d[3][4] is True  # no embedding row
    assert d[4][2] is True and d[4][4] is True  # post-compaction probe OK

    # exactly-once across the whole composition: re-running with no new
    # PG rows is a no-op
    assert ingest.run_cycle()["epoch"] is None
    assert sink.decisions().count() == 4

    stem = index.bands_table.rsplit("_", 1)[0]
    gstem = gtable.rsplit("_", 1)[0]
    astem = ann.cells_table.rsplit("_", 1)[0]
    for t in (index.bands_table, index.shingles_table, gtable,
              ann.cells_table, ann.centroids_table,
              f"{stem}_tombstones", f"{stem}_stamps",
              f"{gstem}_tombstones", f"{gstem}_stamps",
              f"{astem}_tombstones", f"{astem}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
