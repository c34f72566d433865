"""Iterative graph operators over the part co-purchase graph.

Not reference features (the reference, like PostgreSQL, leaves graph
analytics to recursive CTEs — SURVEY.md §2.6); they complete the
"switchable engine" surface for the workloads a PG user runs with
``WITH RECURSIVE`` today: fixed-iteration PageRank, bounded-depth BFS,
and the frequent-pair mining those graphs are built from.

Graph: nodes are parts; (a, b) is an edge iff parts a and b co-occur in
at least one order (via distinct (orderkey, partkey) lineitem rows).
The pair generation is a self-join on ``l_orderkey`` — per-order item
counts are O(1) in the data model, so the quadratic blow-up is per-key
bounded and the join shuffles on the order key exactly once (the same
scale argument as q21's multi-supplier self-join).

Determinism: PageRank is specified in scaled INTEGER arithmetic —
rank₀ = 10⁹; rankₜ₊₁(v) = 0.15·10⁹ + ⌊85·Σ_{u→v} ⌊rankₜ(u)/deg(u)⌋ / 100⌋
with all divisions integral (Spark ``div`` ↔ DuckDB ``//`` — equal for
non-negative operands), so the oracle comparison is bit-exact with no
float summation order anywhere. Incoming sums are accumulated in
decimal(38,0) (Spark) / HUGEINT (DuckDB): per-node in-sums are bounded
by total rank mass ≈ n·10⁹, which overflows int64 only past ~10⁹ nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import balance_scan, load_table, table_row_count
from ..functions.memo import CheckpointMemo
from .registry import query

PR_SCALE = 1_000_000_000  # rank fixed-point scale (10^9)
PR_BASE = 150_000_000  # (15 * PR_SCALE) / 100, the damping floor
PR_ITERS = 3
BFS_DEPTH = 3
COPURCHASE_TOPK = 20

#: shared SQL prefix: distinct order→part incidence and the symmetric
#: co-purchase edge list derived from it.
_SQL_EDGES = """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)"""


def _incidence(
    spark: SparkSession, sf_dir: str, max_basket_size: int | None = None
) -> DataFrame:
    """Distinct (orderkey, partkey) — one row per part per order.

    ``max_basket_size`` (default off) caps each order at its
    ``max_basket_size`` LOWEST part keys before any pair generation —
    the upstream fix for hot-basket quadratic blowup documented in
    SCALE.md ("Graph family"): pair count per order is k·(k−1), so one
    million-item basket is 10¹² pair instances inside a single shuffle
    key group. Deterministic (ordered by part key, so the capped set is
    stable across runs/engines) and oracle-mirrorable via QUALIFY
    row_number(). The row_number filter lowers to WindowGroupLimit —
    per-partition partial top-k BEFORE the shuffle — so the cap itself
    never materializes the hot basket either."""
    # keyed balance_scan (r15, §2.4/§2.5): run the partial-distinct at
    # session width instead of fused into the single-row-group scan
    # task; hashing on the distinct keys lets the distinct reuse the
    # gated exchange
    op = balance_scan(
        spark,
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ),
        sf_dir,
        "lineitem",
        "l_orderkey",
        "l_partkey",
    ).distinct()
    if max_basket_size is not None:
        op = cap_baskets(op, max_basket_size)
    return op


def cap_baskets(op: DataFrame, max_basket_size: int) -> DataFrame:
    """Keep the ``max_basket_size`` lowest part keys of each order in an
    (l_orderkey, l_partkey) incidence relation (see ``_incidence``)."""
    if max_basket_size < 1:
        raise ValueError(f"max_basket_size must be >= 1, got {max_basket_size}")
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        op.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_basket_size)
        .drop("_rn")
    )


#: a<b part pairs expanded IN-ARRAY from one order's sorted distinct
#: part list (the dedup_winnowing_overlap idiom, r14): elements are
#: strictly ascending, so every emitted struct already satisfies
#: pa < pb with no post-filter, and per-order pair multiplicity is
#: exactly 1 — the COUNT semantics of the distinct-incidence self-join.
_BASKET_PAIRS = (
    "flatten(transform(ps, (x, i) ->"
    " transform(slice(ps, i + 2, size(ps) - i - 1),"
    " y -> struct(x AS pa, y AS pb))))"
)


def _baskets(
    spark: SparkSession, sf_dir: str, max_basket_size: int | None = None
) -> DataFrame:
    """Per-order sorted distinct part array in ONE shuffle on the order
    key (r14, guide §2.3/§2.4): collect_set performs the op-distinct
    INSIDE the aggregate (partial map-side), replacing the r13 chain of
    distinct exchange + self-join reshuffles; the basket cap becomes a
    slice of the sorted array — same rows as the oracle's QUALIFY
    row_number ≤ cap over part-key order — instead of a window pass."""
    ps = F.sort_array(F.collect_set("l_partkey"))
    if max_basket_size is not None:
        ps = F.slice(ps, 1, max_basket_size)
    # keyed balance_scan (r15, §2.4/§2.5): the partial collect_set is
    # the heavy per-row work of this query; fused into a single-row-
    # group file's one-task scan stage it serializes. Hash-balancing on
    # the order key lets the groupBy reuse the gated exchange — one
    # exchange either way, aggregation at session width.
    return (
        balance_scan(
            spark,
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_partkey"
            ),
            sf_dir,
            "lineitem",
            "l_orderkey",
        )
        .groupBy("l_orderkey")
        .agg(ps.alias("ps"))
    )


def edges_from_incidence(op: DataFrame) -> DataFrame:
    """Symmetric distinct co-purchase edges (src, dst) from an
    (l_orderkey, l_partkey) incidence relation, checkpointed: PageRank
    re-reads them every iteration and BFS every level, so one
    materialization replaces PR_ITERS+1 scans of the lineitem base.

    r14 shape (guide §2.3/§2.4): one shuffle on the order key builds
    sorted distinct baskets, a<b pairs expand in-array, and the
    symmetric closure is a column swap — the r13 self-join's two extra
    order-key exchanges and its per-bucket O(k²) join rows are gone;
    the edge distinct is the only other exchange."""
    baskets = op.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    half = (
        baskets.select(F.explode(F.expr(_BASKET_PAIRS)).alias("p"))
        .select(F.col("p.pa").alias("src"), F.col("p.pb").alias("dst"))
    )
    return (
        half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )


#: edge-list memo, keyed by (applicationId, sf_dir): PageRank, BFS and
#: the pair miner all consume the same relation — one distinct+
#: checkpoint per session instead of one per query (the dedup
#: _SHINGLE_CACHE pattern). LRU-bounded with unpersist-on-evict
#: (functions/memo.py, VERDICT r6 nit #1).
_EDGE_CACHE = CheckpointMemo()

#: deep-BFS result memo: the checkpoint_levels=True path of
#: bfs_over_edges returns an eager localCheckpoint the caller must free;
#: bfs_reachability_hops parks deep results here so LRU eviction (not a
#: leak) bounds their block-manager footprint. Unused at the default
#: BFS_DEPTH = 3 (plan-subtree path returns nothing to free).
_BFS_CACHE = CheckpointMemo()


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGE_CACHE.get(key)
    if cached is None:
        cached = _EDGE_CACHE.put(
            key, edges_from_incidence(_incidence(spark, sf_dir))
        )
    return cached


def _nodes_fit_broadcast(sf_dir: str) -> bool:
    """Gate for the broadcast rank/frontier forms: co-purchase node ids
    are part keys, so the part table's footer row count bounds the node
    count exactly — metadata only, no scan (the LSH/IVF statistics
    pattern)."""
    return table_row_count(sf_dir, "part") <= PR_BROADCAST_MAX_NODES


#: node-count bound under which the per-iteration rank relation (and
#: the BFS frontier) is explicitly BROADCAST instead of shuffle-joined
#: against the edge list (guide §3.1 "broadcast the side that fits"):
#: a rank row is (bigint v, bigint r, bigint d) ≈ 24 B + framing, so
#: 4M nodes ≈ 100 MB built — comfortably inside the driver/executor
#: budget here and far under the 8 GB / 512M-row broadcast cap, while
#: a 100 TB co-purchase graph (billions of nodes) falls back to the
#: co-partitioned shuffle form below. The gate is decided from footer
#: metadata by the callers (node ids ⊆ part keys), never a scan.
PR_BROADCAST_MAX_NODES = 4_000_000


def pagerank_over_edges(
    edges: DataFrame,
    iters: int = PR_ITERS,
    *,
    symmetric: bool = True,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """The distributed PageRank core over an edge list — see
    pagerank_copurchase for the spec and scale argument. Returns
    (v, r) with r in PR_SCALE fixed-point units.

    ``symmetric=True`` (the co-purchase caller's case, pinned in
    tests/test_graph_ops.py) asserts that every node with out-edges
    also has in-edges, which licenses dropping the per-iteration
    dangling-node left join (below). For a general DIRECTED edge list
    pass ``symmetric=False``: zero-in-degree nodes then keep their
    damping-floor rank via an explicit left join each iteration —
    silently omitting them was flagged by the r14 verdict as a trap
    for future non-symmetric callers.

    Only the REUSED relation (edge+degree table) is checkpointed;
    intermediate ranks are not — each is consumed exactly once by the
    next iteration, so for a fixed small iteration count one deep plan
    beats per-iteration materialization by ~3× in job overhead
    (measured at sf0.1). Past ~10 iterations, checkpoint ranks every
    few iterations to bound plan depth.

    The per-iteration rank update is the incoming-sum aggregate ALONE:
    on a symmetric edge list every node has in-edges (in-neighbor set =
    out-neighbor set), so groupBy(dst) already emits one row per node
    and the classic dangling-node left-join against the node list is a
    no-op — dropping it removes one SortMergeJoin + two exchanges per
    iteration (guide §2.4), with rows identical to the oracle's LEFT
    JOIN form.

    ``broadcast_ranks`` (r15, guide §3.1): the rank relation is
    node-sized while the edge list is edge-sized, so when the node
    count is bounded (callers gate on PR_BROADCAST_MAX_NODES from
    footer metadata) the per-iteration join broadcasts the ranks —
    with the degree FOLDED INTO the broadcast row — and the EDGE
    relation is never exchanged or sorted at all: the r14 shuffle form
    paid one reused src-exchange plus a per-iteration SORT of the full
    edge relation under each SortMergeJoin. The node-sized degree
    relation is localCheckpoint'ed once per call (it feeds rank₀ and
    every iteration's degree re-attach) so its edge aggregation runs
    once. Arithmetic is unchanged integer/decimal — join strategy
    cannot affect the result."""
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    if broadcast_ranks:
        # node-sized; materialized once so the edge-aggregation subtree
        # is not recomputed by every broadcast build job
        deg = deg.localCheckpoint(eager=False)
    # No checkpoint on ed (r14): the checkpoint materialized a fresh
    # edge+degree copy per CALL and — because an ExistingRDD forgets
    # its partitioning — every iteration re-shuffled it by src. As a
    # plain subtree the iterations' exchanges canonicalize identically
    # and AQE's stage reuse computes the src-shuffle ONCE per query
    # (guide §2.4 "share one exchange"); `edges` itself is still the
    # session-memoized checkpoint, so nothing upstream recomputes.
    ed = deg if broadcast_ranks else edges.join(deg, "src")
    ranks = deg.select(
        F.col("src").alias("v"),
        F.lit(PR_SCALE).cast("bigint").alias("r"),
        *(["d"] if broadcast_ranks else []),
    )
    nodes = deg.select(F.col("src").alias("nv")) if not symmetric else None
    for it in range(iters):
        if broadcast_ranks:
            inc = (
                edges.join(F.broadcast(ranks), edges.src == ranks.v)
                .select("dst", F.expr("r div d").alias("c"))
                .groupBy("dst")
                .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("inc"))
            )
        else:
            inc = (
                ed.join(ranks, ed.src == ranks.v)
                .select("dst", F.expr("r div d").alias("c"))
                .groupBy("dst")
                .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("inc"))
            )
        if symmetric:
            ranks = inc.select(
                F.col("dst").alias("v"),
                (F.lit(PR_BASE) + F.expr("(85 * inc) div 100"))
                .cast("bigint")
                .alias("r"),
            )
        else:
            # general directed graph: a node with out-edges but NO
            # in-edges never appears in the incoming-sum aggregate —
            # re-attach the node universe so it keeps the damping floor
            join_inc = F.broadcast(inc) if broadcast_ranks else inc
            ranks = (
                nodes.join(join_inc, nodes.nv == inc.dst, "left")
                .select(
                    F.col("nv").alias("v"),
                    (
                        F.lit(PR_BASE)
                        + F.coalesce(
                            F.expr("(85 * inc) div 100"), F.lit(0)
                        )
                    )
                    .cast("bigint")
                    .alias("r"),
                )
            )
        if broadcast_ranks and it < iters - 1:
            # re-attach the degree for the next iteration's div — a
            # node-sized broadcast join against the checkpointed deg
            ranks = ranks.join(
                F.broadcast(deg), ranks.v == deg.src
            ).select("v", "r", "d")
    return ranks


def _pagerank_oracle() -> str:
    base, scale = PR_BASE, PR_SCALE
    ctes = [f"r0 AS (SELECT src AS v, CAST({scale} AS BIGINT) AS r FROM deg)"]
    for t in range(1, PR_ITERS + 1):
        ctes.append(
            f"""i{t} AS (
      SELECT e.dst AS v, SUM(r.r // dg.d) AS inc
      FROM edges e JOIN r{t - 1} r ON e.src = r.v JOIN deg dg ON e.src = dg.src
      GROUP BY e.dst
    ),
    r{t} AS (
      SELECT n.src AS v,
             CAST({base} + COALESCE((85 * i.inc) // 100, 0) AS BIGINT) AS r
      FROM deg n LEFT JOIN i{t} i ON n.src = i.v
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {_SQL_EDGES},
    {joined}
    SELECT v AS partkey, r AS rank_scaled FROM r{PR_ITERS}
    """


@query("pagerank_copurchase", oracle=_pagerank_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (damping 0.85, 3 iterations) on
    the co-purchase graph, in scaled-integer arithmetic (module
    docstring) so the result is bit-exact against the chained-CTE
    oracle. Every node of the symmetric graph has out-edges, so there
    is no dangling-mass term.

    Scale: one edge materialization (session-memoized, shared with BFS);
    per iteration one join keyed on ``src`` (rank lookup) and one
    shuffle on ``dst`` (partial-aggregated sum) — the textbook
    distributed PageRank step; see pagerank_over_edges for the
    checkpointing trade. The node-sized rank relation is broadcast
    (degree folded in) while the graph's node bound — part keys, known
    exactly from the parquet footer — fits PR_BROADCAST_MAX_NODES, so
    the edge relation is never shuffled or sorted; past the bound the
    co-partitioned shuffle form takes over (guide §3.1)."""
    ranks = pagerank_over_edges(
        _edges(spark, sf_dir),
        broadcast_ranks=_nodes_fit_broadcast(sf_dir),
    )
    return ranks.select(F.col("v").alias("partkey"), F.col("r").alias("rank_scaled"))


def _bfs_oracle() -> str:
    ctes = [
        "s0 AS (SELECT MIN(src) AS v FROM edges)",
        "h0 AS (SELECT v, 0 AS hop FROM s0)",
    ]
    for k in range(1, BFS_DEPTH + 1):
        ctes.append(
            f"""n{k} AS (
      SELECT DISTINCT e.dst AS v
      FROM edges e JOIN h{k - 1} h ON e.src = h.v AND h.hop = {k - 1}
    ),
    h{k} AS (
      SELECT v, hop FROM h{k - 1}
      UNION ALL
      SELECT v, {k} AS hop FROM n{k}
      WHERE v NOT IN (SELECT v FROM h{k - 1})
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {_SQL_EDGES},
    {joined}
    SELECT v AS partkey, CAST(hop AS INT) AS hop FROM h{BFS_DEPTH}
    """


@query("bfs_reachability_hops", oracle=_bfs_oracle())
def bfs_reachability_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS: minimum hop count (≤ BFS_DEPTH = 3) from the
    lowest part key to every reachable node — PostgreSQL's
    ``WITH RECURSIVE`` shortest-hop idiom, re-expressed as a bounded
    frontier loop (each level: one join keyed on ``src``, one distinct,
    one anti-join against the reached set — all partial-aggregable
    shuffles; no iteration ever materializes more than the frontier).

    Scale: ONLY the edge list is materialized (checkpointed once);
    levels are left as plan subtrees — at fixed small depth the
    re-derivation of level k-1 inside level k's plan is a handful of
    joins over the cached edges, and skipping per-level persistence
    removed ~80% of the job overhead (measured at sf0.1: 0.8 s vs
    4.4 s with per-level checkpoints, 6.5 s with cache()). The trade is
    explicit: the static plan carries ~2^depth subtree copies (PLANS.md
    shows the inflated Exchange count), i.e. ≤ 2^depth extra passes
    over the MEMOIZED edge RDD — a bounded constant that also
    distributes at cluster scale. Past depth ~6 the balance flips:
    reintroduce a per-level checkpoint; depth here is a fixed
    constant 3.

    If BFS_DEPTH is ever raised past BFS_CHECKPOINT_DEPTH the auto
    strategy returns an eager checkpoint the CALLER owns (see
    bfs_over_edges's ownership contract) — so the deep path parks the
    handle in the session _BFS_CACHE, whose LRU eviction unpersists the
    blocks instead of leaking one checkpoint per call."""
    bcast = _nodes_fit_broadcast(sf_dir)
    if bfs_uses_checkpoints(BFS_DEPTH):
        key = (spark.sparkContext.applicationId, sf_dir, BFS_DEPTH)
        reached = _BFS_CACHE.get(key)
        if reached is None:
            reached = _BFS_CACHE.put(
                key,
                bfs_over_edges(
                    _edges(spark, sf_dir), BFS_DEPTH,
                    broadcast_frontier=bcast,
                ),
            )
    else:
        reached = bfs_over_edges(
            _edges(spark, sf_dir), BFS_DEPTH, broadcast_frontier=bcast
        )
    return reached.select(F.col("v").alias("partkey"), F.col("hop").cast("int"))


#: depth past which bfs_over_edges flips to per-level checkpoints: the
#: plan-subtree form carries ~2^depth copies of the frontier derivation,
#: so its static-plan cost doubles per level while the checkpointed form
#: pays a flat ~1.5 s/level in job overhead at local[32] — measured
#: crossover is around 6 levels.
BFS_CHECKPOINT_DEPTH = 6


def bfs_uses_checkpoints(depth: int) -> bool:
    """The ONE definition of bfs_over_edges' auto strategy flip. Both
    the core and callers that must mirror the ownership consequence
    (a checkpoint_levels result is caller-owned — see bfs_over_edges)
    consult this, so the decision cannot desync across sites."""
    return depth > BFS_CHECKPOINT_DEPTH


def bfs_over_edges(
    edges: DataFrame,
    depth: int,
    checkpoint_levels: bool | None = None,
    *,
    broadcast_frontier: bool = False,
) -> DataFrame:
    """Bounded-depth BFS core: (v, hop) with hop = min hops (≤ depth)
    from the lowest ``src`` over a directed edge list.

    Two physical strategies with identical semantics:

    - ``checkpoint_levels=False`` (auto for depth ≤ 6): levels stay plan
      subtrees — no per-level job, but the static plan carries ~2^depth
      subtree copies (each ≤ a few joins over the memoized edges). Wins
      at small fixed depth: 0.8 s vs 4.4 s at sf0.1 depth 3.
    - ``checkpoint_levels=True`` (auto past depth 6): the frontier and
      the accumulated reached set are eagerly localCheckpoint'ed each
      level, so plan size — and therefore Exchange count — stays
      O(depth). Per-level materializations are strictly frontier-sized;
      the checkpoint blocks of level k−1 are unpersisted as soon as
      level k lands (only the latest frontier+reached are live).

    Ownership contract: on the ``checkpoint_levels=True`` path the
    RETURNED DataFrame is itself an eager localCheckpoint — the caller
    owns its blocks and must release them with
    ``functions.memo.unpersist_checkpoints(result)`` (or park the handle
    in a ``CheckpointMemo``, which unpersists on eviction/clear) once the
    result is no longer needed. The plan-subtree path returns an ordinary
    lazy plan with nothing to free.

    ``broadcast_frontier`` (r15, guide §3.1): the frontier is at most
    node-sized while the edge list is edge-sized — when the node count
    is bounded (callers gate on PR_BROADCAST_MAX_NODES, same as
    PageRank's rank broadcast) each level's expansion broadcasts the
    frontier, so the edge relation is never exchanged or sorted; only
    the node-sized per-level distinct shuffles. Join strategy cannot
    change the reached set.
    """
    if checkpoint_levels is None:
        checkpoint_levels = bfs_uses_checkpoints(depth)

    root = edges.agg(F.min("src").alias("v")).withColumn(
        "hop", F.lit(0).cast("int")
    )
    if not checkpoint_levels:
        # min-hop formulation (r14): level k = distinct walk-endpoints
        # of length exactly k (NO per-level anti-join pruning), then one
        # MIN(hop) aggregate picks each node's first appearance. A node
        # with min-hop m has a length-m walk from the root, so it enters
        # at level m and the MIN is exact — identical rows to the
        # pruned-frontier form. The pruning anti-joins made level k
        # reference ALL prior levels (plan subtrees ~3^depth, the
        # documented blowup that forced the checkpoint flip); here level
        # k references only level k-1, so the static plan is O(depth²)
        # subtree copies and the duplicated distinct-exchanges dedupe at
        # runtime via ReuseExchange (guide §2.4). The trade: unpruned
        # frontiers revisit already-reached nodes (bounded by |V| via
        # the distinct), the right trade at small fixed depth where the
        # frontier saturates anyway.
        frontier = root.select("v")
        levels = [root]
        for k in range(1, depth + 1):
            probe = F.broadcast(frontier) if broadcast_frontier else frontier
            frontier = (
                edges.join(probe, edges.src == frontier.v)
                .select(F.col("dst").alias("v"))
                .distinct()
            )
            levels.append(frontier.withColumn("hop", F.lit(k).cast("int")))
        reached = levels[0]
        for lvl in levels[1:]:
            reached = reached.union(lvl)
        return reached.groupBy("v").agg(F.min("hop").alias("hop"))

    from ..functions.memo import unpersist_checkpoints

    frontier = root.localCheckpoint(eager=True)
    reached = frontier
    for k in range(1, depth + 1):
        probe = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            edges.join(probe, edges.src == frontier.v)
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(reached, "v", "left_anti")
            .withColumn("hop", F.lit(k).cast("int"))
            .localCheckpoint(eager=True)
        )
        new_reached = reached.union(nxt).localCheckpoint(eager=True)
        # only the latest frontier + reached set stay live
        unpersist_checkpoints(frontier)
        if k > 1:  # level-1's reached IS the root frontier — already freed
            unpersist_checkpoints(reached)
        frontier, reached = nxt, new_reached
    unpersist_checkpoints(frontier)
    return reached


@query(
    "copurchase_pairs_topk",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT pa, pb, n_orders FROM pairs
    ORDER BY n_orders DESC, pa, pb LIMIT {COPURCHASE_TOPK}
    """,
)
def copurchase_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent pairs: the COPURCHASE_TOPK = 20 part pairs
    co-occurring in the most orders, ties broken by (pa, pb) so the
    LIMIT boundary is deterministic. The orderBy+limit lowers to
    TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    the driver) — no global sort at any scale."""
    return _pairs_topk(_baskets(spark, sf_dir))


def _pairs_topk(baskets: DataFrame) -> DataFrame:
    """Frequent a<b part pairs from per-order basket arrays (r14): the
    r13 form shuffled the distinct incidence, reshuffled both self-join
    sides on the order key and aggregated the join's O(k²) output rows
    (5 exchanges, 1 SMJ); here the pair instances expand in-array from
    the already-grouped basket, so only the basket exchange and the
    (pa, pb) count exchange remain."""
    return (
        baskets.select(F.explode(F.expr(_BASKET_PAIRS)).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "pa", "pb")
        .limit(COPURCHASE_TOPK)
    )


#: default basket cap for the capped pair-mining variant: lineitem
#: baskets are ≤7 rows in the data model, so 5 exercises both branches
#: (some orders capped, some untouched) at every fixture scale.
BASKET_CAP = 5


@query(
    "copurchase_pairs_capped",
    oracle=f"""
    WITH op0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    op AS (
      SELECT l_orderkey, l_partkey FROM op0
      QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
              <= {BASKET_CAP}
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT pa, pb, n_orders FROM pairs
    ORDER BY n_orders DESC, pa, pb LIMIT {COPURCHASE_TOPK}
    """,
)
def copurchase_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """copurchase_pairs_topk with the hot-basket cap ON (BASKET_CAP
    lowest part keys per order — ``cap_baskets``): the skew-safe
    production form for datasets with unbounded basket sizes. The cap
    is mirrored exactly in the oracle's QUALIFY row_number filter, so
    the driver verifies the capped semantics themselves (VERDICT r6
    "Next round" #3)."""
    return _pairs_topk(_baskets(spark, sf_dir, max_basket_size=BASKET_CAP))
