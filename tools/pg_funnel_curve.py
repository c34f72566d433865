"""PG-CDC → funnel throughput curve (VERDICT r11 #6): PgFunnelIngest
has a live exactly-once test but carried no scale numbers — this tool
measures end-to-end rows/sec (live PostgreSQL INSERT → HWM COPY batch →
trilogy funnel decision → lake commit) at three batch sizes, for
SCALE.md.

Spins up a scratch single-user PostgreSQL exactly like
tests/test_pg_funnel_live.py, inserts ``batch`` unique documents per
cycle, and times ``run_cycle`` (pin + COPY + probe + decide + extend +
commit). Three cycles per size; best cycle reported (the first cycle
at each size pays plan-compilation warmup).

    python tools/pg_funnel_curve.py [batch_sizes_csv]
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
import time
import uuid

sys.path.insert(0, ".")

from postgresql_transfer_tool_spark.session import get_spark  # noqa: E402

PORT = 54341


def _su_postgres(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        capture_output=True, text=True, cwd="/", timeout=120,
    )


def _mk_server(base: str):
    from postgresql_transfer_tool_spark.sources.pgcopy import PgServer, run_sql

    subprocess.run(["chown", "postgres:postgres", base], check=False)
    for cmd in (
        f"initdb -D {base}/data -A trust",
        f"pg_ctl -D {base}/data -o '-p {PORT} -k {base} "
        f"-c listen_addresses=' -l {base}/pg.log start",
    ):
        r = _su_postgres(cmd)
        if r.returncode != 0:
            raise RuntimeError(f"{cmd}: {r.stderr[-300:]}")
    server = PgServer(host=base, port=PORT)
    run_sql(server, "CREATE SCHEMA src")
    run_sql(
        server,
        "CREATE TABLE src.documents ("
        " doc_id bigserial PRIMARY KEY, text text NOT NULL)",
    )
    return server


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [200, 1000, 5000]
    )
    from tests.test_dedup_index import _docs, _text

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

    spark = get_spark("pg-funnel-curve")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="pg_curve_")
    out = tempfile.mkdtemp(prefix="pg_curve_out_")
    server = _mk_server(base)
    try:
        name = f"pgc{uuid.uuid4().hex[:8]}"
        corpus = [(100 + i, _text(i + 1)) for i in range(3)]
        bench = [(900, _text(50))]
        index = build_dedup_index(
            spark, _docs(spark, corpus), tempfile.mkdtemp(prefix=name), name
        )
        gtable = build_contamination_index(
            spark, _docs(spark, bench),
            tempfile.mkdtemp(prefix=f"{name}g"), f"{name}g",
        )
        sink = IngestFunnelSink(spark, index, gtable, out)
        ingest = PgFunnelIngest(
            spark, server, "src", "documents", "doc_id", sink
        )
        seq = 10_000
        print(f"PG-CDC -> trilogy funnel, {len(sizes)} batch sizes x 3 cycles")
        for batch in sizes:
            best = None
            for cycle in range(3):
                texts = [_text(seq + j) for j in range(batch)]
                seq += batch
                for lo in range(0, len(texts), 100):  # psql arg-length cap
                    vals = ", ".join(
                        "('" + t.replace("'", "''") + "')"
                        for t in texts[lo : lo + 100]
                    )
                    run_sql(
                        server,
                        f"INSERT INTO src.documents (text) VALUES {vals}",
                    )
                t0 = time.monotonic()
                stats = ingest.run_cycle()
                dt = time.monotonic() - t0
                assert stats["n_rows"] == batch, stats
                best = dt if best is None else min(best, dt)
            print(
                f"batch {batch:6d}: best cycle {best:6.2f}s  "
                f"-> {batch / best:8.1f} rows/s", flush=True,
            )
    finally:
        _su_postgres(f"pg_ctl -D {base}/data -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
