"""Property and scale tests for the graph operator family
(operators/graph.py) — the oracle gate proves point correctness at one
SF; these pin the invariants that make the family safe at 100 TB.

Scale argument under test: the co-purchase pair generation is a
self-join on l_orderkey, so its output is Σ_orders k_o·(k_o−1) for
per-order item counts k_o that the data model bounds — pair instances
must stay within a constant factor of lineitem rows at every SF, or
the join has gone quadratic in something unbounded.
"""

import os

import pytest
from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.operators.graph import (
    PR_BASE,
    PR_SCALE,
    _edges,
    _incidence,
    bfs_reachability_hops,
    pagerank_copurchase,
)

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"
SF3 = "/root/testdata/sf0.1"

#: per-order pair instances ≤ MAX_PPO × items: k·(k−1) ≤ MAX_PPO·k ⇔
#: max items per order ≤ MAX_PPO + 1.
MAX_PPO = 12


def _pair_stats(spark, sf_dir):
    op = _incidence(spark, sf_dir)
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = a.join(b, "ok").filter(F.col("pa") != F.col("pb"))
    return op.count(), pairs.count()


def test_pair_generation_is_per_order_bounded(spark):
    """Pair instances / incidence rows ≤ MAX_PPO at both base SFs, and
    the ratio does not grow across the decade — the self-join's
    quadratic term is per-key constant, not data-driven."""
    ratios = []
    for sf in (SF1, SF2):
        n_inc, n_pairs = _pair_stats(spark, sf)
        assert n_pairs <= MAX_PPO * n_inc, (sf, n_inc, n_pairs)
        ratios.append(n_pairs / n_inc)
    assert ratios[1] <= ratios[0] * 1.5, f"pairs/row grew across the decade: {ratios}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF01"),
    reason="sf0.1 graph growth point is opt-in (SPARK_GRAFT_SWEEP_SF01=1)",
)
def test_pair_generation_bounded_at_sf01(spark):
    n_inc, n_pairs = _pair_stats(spark, SF3)
    assert n_pairs <= MAX_PPO * n_inc, (n_inc, n_pairs)


def test_pagerank_mass_and_floor(spark):
    """Two invariants of the integer PageRank spec: every rank ≥ the
    damping floor PR_BASE, and total mass never exceeds the initial
    n·PR_SCALE (floor divisions only lose mass; 0.15 + 0.85 preserve
    the rest), so ranks cannot blow up with iteration count."""
    r = pagerank_copurchase(spark, SF1)
    agg = r.agg(
        F.count("*").alias("n"),
        F.min("rank_scaled").alias("mn"),
        F.sum("rank_scaled").alias("mass"),
    ).first()
    assert agg["mn"] >= PR_BASE
    assert agg["mass"] <= agg["n"] * PR_SCALE


def test_bfs_hops_form_a_minimal_frontier(spark):
    """hop labels are unique per node, hop 0 is exactly the source, and
    every hop-k node (k ≥ 1) has at least one hop-(k−1) neighbor —
    i.e. the labels really are BFS levels, not just reachability."""
    hops = bfs_reachability_hops(spark, SF1).localCheckpoint(eager=False)
    assert hops.groupBy("partkey").count().filter("count > 1").count() == 0
    assert hops.filter("hop = 0").count() == 1
    edges = _edges(spark, SF1)
    prev = hops.select(
        F.col("partkey").alias("src"), F.col("hop").alias("hop_src")
    )
    # a hop-k node with NO neighbor at hop k-1 violates minimality
    bad = (
        hops.filter("hop >= 1")
        .join(edges, hops.partkey == edges.dst)
        .join(prev, "src")
        .groupBy("partkey", "hop")
        .agg(F.min(F.col("hop_src")).alias("best_nbr"))
        .filter(F.col("best_nbr") != F.col("hop") - 1)
    )
    assert bad.count() == 0


def test_trigram_join_is_threshold_exact(spark):
    """Brute-force cross-check at sf0.001: the share-a-trigram candidate
    join must find EXACTLY the pairs a full quadratic comparison finds
    (candidates are complete for any positive threshold)."""
    from postgresql_transfer_tool_spark.operators.joins import (
        TRGM_SIM_PCT,
        trigram_similarity_names,
    )

    got = {
        (r["name_a"], r["name_b"])
        for r in trigram_similarity_names(spark, SF1).collect()
    }

    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{SF1}/part.parquet'")
    rows = con.sql(
        f"""
        WITH names AS (SELECT DISTINCT '  ' || lower(p_name) || ' ' AS s FROM part),
        tg AS (SELECT DISTINCT s, substr(s, CAST(i AS INT), 3) AS g
               FROM names, UNNEST(generate_series(1, length(s) - 2)) AS t(i)),
        sets AS (SELECT s, LIST(g ORDER BY g) AS gs FROM tg GROUP BY s)
        SELECT trim(a.s), trim(b.s)
        FROM sets a JOIN sets b ON a.s < b.s
        WHERE 100 * len(list_intersect(a.gs, b.gs))
              >= {TRGM_SIM_PCT} * (len(a.gs) + len(b.gs)
                                   - len(list_intersect(a.gs, b.gs)))
        """
    ).fetchall()
    assert got == {(a, b) for a, b in rows}


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF01"),
    reason="synthesized 10x graph decade point is opt-in (SPARK_GRAFT_SWEEP_SF01=1)",
)
def test_graph_decade_synthesized_10x(spark):
    """Fourth scale point: 10 bijective disjoint copies of sf0.1's
    incidence (orderkeys and partkeys both strided, so the graph is 10
    isomorphic components). Growth laws must be EXACT: incidence, pair
    instances, distinct edges and PageRank node count all 10×, and the
    PageRank mass exactly 10× the base mass (isomorphic components give
    identical rank multisets — any drift is an engine bug, not noise)."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.graph import (
        edges_from_incidence,
        pagerank_over_edges,
    )

    base = _incidence(spark, SF3).localCheckpoint(eager=False)
    copies = spark.range(10).select(F.col("id").alias("cp"))
    big = (
        base.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("cp") * F.lit(10**9)).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("cp") * F.lit(10**7)).alias("l_partkey"),
        )
        .localCheckpoint(eager=False)
    )
    n_base, n_big = base.count(), big.count()
    assert n_big == 10 * n_base

    e_base = edges_from_incidence(base)
    e_big = edges_from_incidence(big)
    assert e_big.count() == 10 * e_base.count()

    r_base = pagerank_over_edges(e_base).agg(
        F.count("*").alias("n"), F.sum("r").alias("mass")
    ).first()
    r_big = pagerank_over_edges(e_big).agg(
        F.count("*").alias("n"), F.sum("r").alias("mass")
    ).first()
    assert r_big["n"] == 10 * r_base["n"]
    assert r_big["mass"] == 10 * r_base["mass"]


def test_hot_basket_skew_completes_with_formula_exact_pairs(spark):
    """Adversarial skew: one synthetic 1000-item order alongside normal
    baskets. Pair generation is quadratic PER ORDER KEY — the hot
    basket contributes exactly k·(k−1) pair instances inside one
    shuffle partition's key group, and the job completes without
    driver-side blowup. This pins the documented contract: basket size
    is the quadratic driver, so unbounded-basket datasets must cap or
    sample baskets upstream (SCALE.md, graph family)."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.graph import (
        edges_from_incidence,
    )

    k = 1000
    hot = spark.range(k).select(
        F.lit(10**9).alias("l_orderkey"), F.col("id").alias("l_partkey")
    )
    normal = _incidence(spark, SF1)
    op = normal.unionByName(hot).localCheckpoint(eager=False)

    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = a.join(b, "ok").filter(F.col("pa") != F.col("pb"))
    n_hot = pairs.filter(F.col("ok") == 10**9).count()
    assert n_hot == k * (k - 1)

    # the edge builder absorbs the hot basket too (distinct dedups the
    # k·(k−1) instances into k·(k−1) distinct directed edges here since
    # part ids are unique within the basket)
    edges = edges_from_incidence(op)
    assert edges.filter(F.col("src") < k).count() >= k * (k - 1) // 2


def test_hot_basket_cap_formula_exact(spark):
    """The basket cap on a synthetic 1000-item hot basket: capped
    incidence keeps exactly the BASKET-lowest part keys, and the hot
    order's pair contribution collapses from k·(k−1)/2 to the formula-
    exact C(cap, 2) — the implemented form of SCALE.md's "cap or sample
    baskets upstream" posture (VERDICT r6 "Next round" #3)."""
    from postgresql_transfer_tool_spark.operators.graph import cap_baskets

    k, cap = 1000, 5
    hot = spark.range(k).select(
        F.lit(10**9).alias("l_orderkey"), F.col("id").alias("l_partkey")
    )
    normal = _incidence(spark, SF1)
    op = normal.unionByName(hot).localCheckpoint(eager=False)
    capped = cap_baskets(op, cap)

    # hot basket: exactly the cap lowest part keys survive
    hot_kept = sorted(
        r.l_partkey for r in capped.filter(F.col("l_orderkey") == 10**9).collect()
    )
    assert hot_kept == list(range(cap))

    # orders already under the cap are untouched
    small = op.groupBy("l_orderkey").count().filter(F.col("count") <= cap)
    assert (
        capped.join(small, "l_orderkey").count()
        == op.join(small, "l_orderkey").count()
    )

    # pair count through the capped incidence: C(cap,2) for the hot order
    a = capped.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = capped.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    n_hot = (
        a.join(b, "ok")
        .filter((F.col("pa") < F.col("pb")) & (F.col("ok") == 10**9))
        .count()
    )
    assert n_hot == cap * (cap - 1) // 2


def test_cap_baskets_rejects_nonpositive(spark):
    from postgresql_transfer_tool_spark.operators.graph import cap_baskets

    with pytest.raises(ValueError, match="max_basket_size"):
        cap_baskets(_incidence(spark, SF1), 0)


def test_deep_bfs_checkpoint_path_depth8(spark):
    """Depth-8 BFS on a synthetic 12-node chain (VERDICT r6 "Next
    round" #6): the checkpointed strategy (auto past depth 6) must (a)
    compute the same hops as the plan-subtree strategy, (b) keep the
    final plan's Exchange count O(depth) instead of O(2^depth), and
    (c) leave no checkpoint blocks behind beyond the final reached set."""
    from postgresql_transfer_tool_spark.functions.memo import (
        unpersist_checkpoints,
    )
    from postgresql_transfer_tool_spark.operators.graph import (
        BFS_CHECKPOINT_DEPTH,
        bfs_over_edges,
    )
    from postgresql_transfer_tool_spark.plans import count_exchanges

    depth = 8
    assert depth > BFS_CHECKPOINT_DEPTH  # exercises the auto flip
    chain = spark.range(11).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).localCheckpoint(eager=True)

    ckpt = bfs_over_edges(chain, depth)  # auto → checkpoint_levels=True
    got = {(r.v, r.hop) for r in ckpt.collect()}
    # chain nodes 0..11; depth 8 reaches exactly 0..8, nodes 9..11 stay out
    assert got == {(v, v) for v in range(depth + 1)}

    # strategy equivalence cross-check at depth 5: the plan-subtree
    # form's anti-join loop nests every prior level inside the next, so
    # its ANALYSIS cost alone grows ~3^depth — at depth 8 that is
    # minutes of pure Catalyst work, which is exactly why the auto flip
    # exists. Depth 5 exercises the same code path cheaply; depth-8
    # correctness is already pinned by the closed-form chain answer.
    xdepth = 5
    ck5 = bfs_over_edges(chain, xdepth, checkpoint_levels=True)
    plan_form = bfs_over_edges(chain, xdepth, checkpoint_levels=False)
    got5 = {(r.v, r.hop) for r in ck5.collect()}
    assert got5 == {(v, v) for v in range(xdepth + 1)}
    assert {(r.v, r.hop) for r in plan_form.collect()} == got5
    unpersist_checkpoints(ck5)

    # O(depth) plan: the checkpointed form's final plan is a union of
    # materialized levels — a handful of exchanges, not 2^8 subtrees
    assert count_exchanges(ckpt) <= 2 * depth + 4, count_exchanges(ckpt)

    unpersist_checkpoints(ckpt)
    unpersist_checkpoints(chain)


def test_deep_bfs_result_routed_through_memo(spark, monkeypatch):
    # ADVICE r7: if BFS_DEPTH is raised past BFS_CHECKPOINT_DEPTH the
    # returned eager checkpoint must be parked in _BFS_CACHE (bounded,
    # unpersist-on-evict) instead of leaking one checkpoint per call.
    from postgresql_transfer_tool_spark.operators import graph

    monkeypatch.setattr(graph, "BFS_DEPTH", 8)
    graph._BFS_CACHE.clear()
    try:
        out = {(r.partkey, r.hop) for r in bfs_reachability_hops(spark, SF1).collect()}
        key = (spark.sparkContext.applicationId, SF1, 8)
        assert key in graph._BFS_CACHE, "deep BFS result not memoized"
        # second call reuses the parked handle (same memo entry)
        first = graph._BFS_CACHE.get(key)
        again = {(r.partkey, r.hop) for r in bfs_reachability_hops(spark, SF1).collect()}
        assert graph._BFS_CACHE.get(key) is first
        assert again == out
        # shallow-depth semantics agree on the overlap: hop counts are
        # minimal, so depth-3 results are a prefix of depth-8's
        monkeypatch.setattr(graph, "BFS_DEPTH", 3)
        shallow = {
            (r.partkey, r.hop) for r in bfs_reachability_hops(spark, SF1).collect()
        }
        assert shallow == {(v, h) for v, h in out if h <= 3}
    finally:
        graph._BFS_CACHE.clear()
