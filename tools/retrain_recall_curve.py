"""Recall-vs-epoch curve for the growing IVF index, WITH and WITHOUT
the auto-retrain trigger (VERDICT r11 #3 "done" criterion, recorded in
SCALE.md).

Clustered drift — the regime IVF assumes: the corpus is 16 tight
clusters on axes 0..15 of a 32-dim space; each streamed epoch extends
the index with three BRAND-NEW clusters (axes 16..30) the build-time
centroids never saw, and a held-out probe set drawn from those same new
clusters measures recall@10 of the IVF probe against brute-force cosine
over everything indexed so far.

Frozen centroids scatter each new cluster across arbitrary old cells
(the assignment argmax is decided by noise when every real cosine is
≈ 0), so a query's nprobe cells miss most of its true neighbors and
recall decays as drift accumulates. The auto trigger evaluates the SAME
retrain_due policy the funnel sink deploys
(streaming/maintenance.retrain_due: cell imbalance OR mean-fill
occupancy past the knobs) after every epoch and re-trains under the
writer lock; resampled centroids give the new clusters their own cells
and recall recovers.

    python tools/retrain_recall_curve.py [N_CORPUS] [N_EPOCHS]

Round-13 VERDICT #8 adds the QUERY-TIME knob sweep: ``--nprobe-curve``
measures recall@10 and probe wall-clock across per-query nprobe values
against ONE fixed index (build-time cell count untouched) — the
recall/latency trade a caller buys per query through
``ann_query_index(..., nprobe=...)``, recorded in SCALE.md:

    python tools/retrain_recall_curve.py --nprobe-curve [N_CORPUS]
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from postgresql_transfer_tool_spark.operators.ann_index import (  # noqa: E402
    ann_query_index,
    build_ann_index,
    cell_balance,
    extend_ann_index,
    retrain_ann_index,
)
from postgresql_transfer_tool_spark.session import get_spark  # noqa: E402
from postgresql_transfer_tool_spark.streaming.maintenance import (  # noqa: E402
    MaintenancePolicy,
    retrain_due,
)

DIM = 32
TOPK = 10
N_PROBES = 45
POLICY = MaintenancePolicy(max_cell_imbalance=4.0, max_mean_cell_fill=1.5)


def _quantize(v: np.ndarray):
    q = np.round(v * 1_000_000).astype(np.int64)
    return [int(x) for x in q], int((q.astype(object) ** 2).sum())


def _cluster(rng, n, axes):
    """n vectors spread evenly over tight clusters on the given axes."""
    out = np.zeros((n, DIM))
    for i in range(n):
        c = np.zeros(DIM)
        c[axes[i % len(axes)]] = 2.0
        out[i] = c + rng.normal(0, 0.15, DIM)
    return out


def _rows(ids, mat):
    return [
        (int(vid), *_quantize(v)) for vid, v in zip(ids, mat)
    ]


def _recall(spark, index, probe_rows, indexed_rows, nprobe=None) -> float:
    probes = spark.createDataFrame(
        probe_rows, "vec_id bigint, qe array<bigint>, nq bigint"
    )
    kw = {} if nprobe is None else {"nprobe": nprobe}
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_query_index(
            spark, probes, index, topk=TOPK, **kw
        ).collect()
    }
    ids = np.array([r[0] for r in indexed_rows])
    m = np.array([r[1] for r in indexed_rows], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    hits = 0
    for qid, qe, _ in probe_rows:
        q = np.array(qe, dtype=np.float64)
        cos = (m @ q) / (norms * np.sqrt((q * q).sum()) + 1e-12)
        cos[ids == qid] = -2
        want = set(ids[np.argsort(-cos)[:TOPK]].tolist())
        hits += len(want & {n for (g, n) in got if g == qid})
    return hits / (len(probe_rows) * TOPK)


def nprobe_curve(n_corpus: int) -> None:
    """Recall@10 + warm probe latency vs PER-QUERY nprobe on one fixed
    index: the build-time cell count (corpus-adaptive) stays put; only
    the query-time knob moves. The corpus is the same 16-cluster layout
    as the drift curve WITHOUT drift — so recall deficits are purely
    cell-boundary misses, the regime the knob exists for."""
    import time

    spark = get_spark("nprobe-curve")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)
    corpus = _rows(range(n_corpus), _cluster(rng, n_corpus, list(range(16))))
    name = "npc"
    index = build_ann_index(
        spark,
        spark.createDataFrame(
            corpus, "vec_id bigint, qe array<bigint>, nq bigint"
        ),
        tempfile.mkdtemp(prefix=name),
        name,
        n_rows=n_corpus,
    )
    probes = _rows(
        range(900_000, 900_000 + N_PROBES),
        _cluster(rng, N_PROBES, list(range(16))),
    )
    n_cells = spark.table(index.centroids_table).count()
    print(f"nprobe curve: corpus {n_corpus}, {n_cells} cells, "
          f"recall@{TOPK} over {N_PROBES} probes")
    for nprobe in (1, 2, 4, 8, 16, 32, 64):
        if nprobe > n_cells:
            break
        _recall(spark, index, probes, corpus, nprobe=nprobe)  # warm
        t0 = time.time()
        r = _recall(spark, index, probes, corpus, nprobe=nprobe)
        dt = time.time() - t0
        print(f"nprobe {nprobe:3d}: recall@{TOPK} {r:.3f}  "
              f"probe wall {dt:.2f}s", flush=True)
    for t in (index.cells_table, index.centroids_table,
              f"{name}_tombstones", f"{name}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def main() -> None:
    if "--nprobe-curve" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        nprobe_curve(int(args[0]) if args else 4000)
        return
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    per_epoch = n_corpus // 4
    spark = get_spark("retrain-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"corpus {n_corpus} (16 clusters), {n_epochs} epochs x "
          f"{per_epoch} (3 new clusters each), dim {DIM}, recall@{TOPK} "
          f"over {N_PROBES} new-cluster probes; knobs imbalance>"
          f"{POLICY.max_cell_imbalance} fill>{POLICY.max_mean_cell_fill}")
    for auto in (False, True):
        rng = np.random.default_rng(7)
        corpus = _rows(
            range(n_corpus), _cluster(rng, n_corpus, list(range(16)))
        )
        name = f"rrc{'a' if auto else 'f'}"
        index = build_ann_index(
            spark,
            spark.createDataFrame(
                corpus, "vec_id bigint, qe array<bigint>, nq bigint"
            ),
            tempfile.mkdtemp(prefix=name),
            name,
            n_rows=n_corpus,
        )
        indexed = list(corpus)
        tag = "auto-retrain" if auto else "frozen      "
        retrains = 0
        for k in range(n_epochs):
            axes = [16 + (3 * k + j) % 15 for j in range(3)]
            ids = range(100_000 * (k + 1), 100_000 * (k + 1) + per_epoch)
            rows = _rows(ids, _cluster(rng, per_epoch, axes))
            extend_ann_index(
                spark,
                index,
                spark.createDataFrame(
                    rows, "vec_id bigint, qe array<bigint>, nq bigint"
                ),
                stamp=k,
            )
            indexed += rows
            bal = cell_balance(spark, index)
            if auto and retrain_due(bal, POLICY):
                retrain_ann_index(spark, index, tempfile.mkdtemp(prefix=name))
                retrains += 1
                bal = cell_balance(spark, index)
            probe_ids = range(900_000 * (k + 1), 900_000 * (k + 1) + N_PROBES)
            probes = _rows(probe_ids, _cluster(rng, N_PROBES, axes))
            r = _recall(spark, index, probes, indexed)
            print(f"{tag} epoch {k}: recall@{TOPK} {r:.3f}  "
                  f"imbalance {bal['imbalance']:.2f}  "
                  f"fill {bal['mean_fill']:.2f}  cells {bal['n_cells']}",
                  flush=True)
        print(f"{tag}: {retrains} retrains fired", flush=True)
        for t in (index.cells_table, index.centroids_table,
                  f"{name}_tombstones", f"{name}_stamps"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
