"""Round-14 curation rows: deterministic global shuffle sharding,
weighted interleave scheduling, leakage-guarded splits.

The driver's oracle gate proves engine-equivalence; these tests pin the
SEMANTIC properties the oracles can't state: dense per-shard positions,
the low-discrepancy prefix guarantee of the interleave, and the
"eval-clean by construction" invariant of the decontaminated split.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.curation import (
    N_SHUFFLE_SHARDS,
    _TEST_PCT,
    corpus_split_decontaminated,
    global_shuffle_shards,
    training_mix_schedule,
)
from postgresql_transfer_tool_spark.operators.corpus import _NGRAM


def test_shuffle_shards_dense_cover_deterministic(spark, sf_dir):
    rows = global_shuffle_shards(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs  # a permutation, not a sample

    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(N_SHUFFLE_SHARDS))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard  # dense

    # md5-uniform balance: every shard within 3·σ of the mean
    sizes = [len(v) for v in by_shard.values()]
    mean = n_docs / N_SHUFFLE_SHARDS
    assert max(sizes) - min(sizes) < 6 * mean**0.5 + 10, sizes

    again = global_shuffle_shards(spark, sf_dir).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in again} == {
        (r.doc_id, r.shard, r.pos) for r in rows
    }  # bit-reproducible re-run


def test_mix_schedule_prefix_discrepancy(spark, sf_dir):
    rows = training_mix_schedule(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    weights = {r.source: (int(r.source[3:]) % 4 + 1) * 25 for r in rows}
    n_src = Counter(r.source for r in rows)

    # sched_pos = (rank - 0.5)/w ⇒ docs of source s with sched_pos ≤ P
    # number round(w_s · P) (until s exhausts) — the interleave tracks
    # every source's weight after ANY prefix, error < 1 doc
    ordered = sorted(rows, key=lambda r: (r.sched_pos, r.doc_id))
    for cut in (len(ordered) // 7, len(ordered) // 3, len(ordered) // 2):
        prefix = ordered[:cut]
        per_src = Counter(r.source for r in prefix)
        p_max = prefix[-1].sched_pos
        for s, w in weights.items():
            expect = min(w * p_max, n_src[s])
            # ≤ 0.5 from the rank rounding, + up to 1 when the cut index
            # splits an exact sched_pos tie between same-weight sources
            assert abs(per_src.get(s, 0) - expect) <= 1.5, (s, cut)


def test_split_decontaminated_eval_clean(spark, sf_dir):
    out = {r.doc_id: (r.split, r.n_shared)
           for r in corpus_split_decontaminated(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert len(out) == n_docs  # total partition of the corpus

    splits = Counter(s for s, _ in out.values())
    assert 0 < splits["test"] < n_docs * 2 * _TEST_PCT / 100
    assert splits["train"] > 0

    # independent recompute of the gram-sharing relation
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= _NGRAM)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(0, size(toks)-{_NGRAM}),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],"
                " toks[i+3], toks[i+4])))"
            )
        ).alias("gram"),
    ).collect()
    test_grams = {g.gram for g in grams if out[g.doc_id][0] == "test"}
    shares = {
        d for d, gs in _group(grams).items()
        if out[d][0] != "test" and gs & test_grams
    }
    quarantined = {d for d, (s, _) in out.items() if s == "quarantined"}
    assert shares == quarantined  # exactly the sharing docs are held out
    assert shares, "fixture's planted near-dups should cross the split"
    for d in quarantined:
        assert out[d][1] > 0
    for d, (s, n) in out.items():
        if s == "train":
            assert n == 0


def _group(gram_rows):
    by_doc: dict[int, set] = {}
    for r in gram_rows:
        by_doc.setdefault(r.doc_id, set()).add(r.gram)
    return by_doc
