"""Round-14 optimization equivalence pins.

Each optimization in this round restructures HOW an operator computes
(fewer shuffles / scans / sorts) without changing WHAT it computes; the
DuckDB oracle re-verifies every declared query end-to-end, and these
tests pin the restructured internals on adversarial micro-inputs the
fixtures may not cover (ties, duplicate keys, all-null edges).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_min_struct_equals_row_number_argmin_on_ties(spark):
    # ann_pq_topk's encode: MIN(struct(dist, k)) must pick exactly the
    # row_number()-over-(dist ASC, k ASC) rk=1 row, including dist ties.
    rows = [
        (1, 0, 10, 7), (1, 0, 10, 3), (1, 0, 12, 1),   # tie at dist=10 -> k=3
        (1, 1, 5, 9), (1, 1, 4, 11),                   # plain min -> k=11
        (2, 0, 0, 2), (2, 0, 0, 1), (2, 0, 0, 8),      # triple tie -> k=1
    ]
    df = spark.createDataFrame(rows, "vec_id int, m int, dist long, k long")
    agg = (
        df.select("vec_id", "m", F.struct("dist", "k").alias("dk"))
        .groupBy("vec_id", "m")
        .agg(F.min("dk").alias("dk"))
        .select("vec_id", "m", F.col("dk.k").alias("code"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.col("dist"), F.col("k"))
    win = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", F.col("k").alias("code"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, win.collect()))


def test_preaggregated_fk_orphan_count_keeps_row_multiplicity(spark):
    # fk_orphan_check / audit_fk_orphans: aggregating the child side to
    # (key, rows) before the anti-join must still count orphan ROWS, not
    # orphan KEYS — duplicated orphan keys count once per row.
    child = spark.createDataFrame(
        [(10,), (10,), (10,), (20,), (None,), (30,)], "fk bigint"
    )
    parent = spark.createDataFrame([(20,), (40,)], "pk bigint")
    pre = (
        child.filter(F.col("fk").isNotNull())
        .groupBy("fk")
        .agg(F.count("*").alias("_rows"))
    )
    orphans = pre.join(parent, pre.fk == parent.pk, "left_anti")
    n = orphans.agg(
        F.coalesce(F.sum("_rows"), F.lit(0)).cast("bigint").alias("n")
    ).collect()[0]["n"]
    assert n == 4  # three rows of 10 + one row of 30; NULL and 20 excluded

    # empty-orphan edge: coalesce must yield 0, not NULL
    all_present = spark.createDataFrame([(20,), (40,)], "fk bigint")
    pre2 = all_present.groupBy("fk").agg(F.count("*").alias("_rows"))
    n0 = (
        pre2.join(parent, pre2.fk == parent.pk, "left_anti")
        .agg(F.coalesce(F.sum("_rows"), F.lit(0)).cast("bigint").alias("n"))
        .collect()[0]["n"]
    )
    assert n0 == 0


def test_single_pass_pk_audit_matches_two_scan_form(spark):
    # pk_violation_audit: the one-groupBy form must report the same
    # (duplicate_keys, null_rows) as the two-scan dup/null branches,
    # including compound keys where only ONE component is null.
    rows = [
        (1, 1), (1, 1), (1, 2),        # (1,1) duplicated
        (2, None), (None, 5), (None, None),  # three null-key rows
        (3, 3),
    ]
    df = spark.createDataFrame(rows, "a int, b int")
    notnull = F.col("a").isNotNull() & F.col("b").isNotNull()
    one = (
        df.groupBy("a", "b")
        .count()
        .agg(
            F.count_if((F.col("count") > 1) & notnull).alias("dups"),
            F.coalesce(F.sum(F.when(~notnull, F.col("count"))), F.lit(0)).alias(
                "nulls"
            ),
        )
        .collect()[0]
    )
    dups_ref = (
        df.filter(notnull).groupBy("a", "b").count().filter("count > 1").count()
    )
    nulls_ref = df.filter(~notnull).count()
    assert (one["dups"], one["nulls"]) == (dups_ref, nulls_ref) == (1, 3)


def test_window_count_equals_group_count_join(spark):
    # text_bigram_lm_score's c12: a whole-partition COUNT window over the
    # bigram key must equal the groupBy(bg).count() + join-back form.
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "z"), (6, "z")],
        "doc_id int, bg string",
    )
    win = df.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("bg")))
    grp = df.join(df.groupBy("bg").agg(F.count("*").alias("c")), "bg")
    assert sorted(map(tuple, win.select("doc_id", "c").collect())) == sorted(
        map(tuple, grp.select("doc_id", "c").collect())
    )


def test_sorted_run_top_count_matches_nested_rescan(spark):
    # text_repetition_ratio: the sorted-run aggregate() fold must equal
    # the O(distinct×n) transform+filter max-frequency count.
    rows = [
        ("a b a c a b",), ("x",), ("z z z z",), ("p q r",), ("",),
        ("same same same diff same",),
    ]
    df = spark.createDataFrame(rows, "text string").withColumn(
        "toks", F.split(F.trim("text"), r"\s+")
    )
    fold = F.expr(
        "aggregate(array_sort(toks),"
        " struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS best),"
        " (acc, x) -> struct(x AS prev,"
        "   IF(x = acc.prev, acc.run + 1, 1) AS run,"
        "   GREATEST(acc.best, IF(x = acc.prev, acc.run + 1, 1)) AS best),"
        " acc -> acc.best)"
    )
    rescan = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda w: F.size(F.filter("toks", lambda x: x == w)),
        )
    )
    got = df.select(fold.alias("a"), rescan.alias("b")).collect()
    assert all(r["a"] == r["b"] for r in got)
    assert [r["a"] for r in got] == [3, 1, 4, 1, 1, 4]


def test_combined_check_audit_matches_per_check(spark):
    # transfer._validate: k count_if aggregates in one pass must match k
    # independent audit_check passes, including NULL-as-not-violating.
    from postgresql_transfer_tool_spark.transfer import audit_check

    df = spark.createDataFrame(
        [(1, 10), (2, None), (-3, 5), (4, -1)], "x int, y int"
    )
    checks = ["x > 0", "y >= 0"]
    row = df.agg(
        *[
            F.count_if(~F.coalesce(F.expr(c), F.lit(True))).alias(f"_c{i}")
            for i, c in enumerate(checks)
        ]
    ).collect()[0]
    combined = [int(row[f"_c{i}"]) for i in range(len(checks))]
    assert combined == [audit_check(df, c) for c in checks] == [1, 1]


def test_winnowing_inarray_pairs_match_selfjoin_multiplicity(spark):
    # dedup_winnowing_overlap: the in-bucket position-pair expansion of
    # the sorted member multiset must reproduce the fp self-join's pair
    # multiplicity EXACTLY — including a doc repeating a fingerprint
    # (multiplicity product) and the strict a<b same-doc exclusion.
    rows = [
        (1, 100), (1, 100), (2, 100), (3, 100),  # doc 1 repeats fp 100
        (1, 200), (2, 200),
        (9, 300),                                # singleton bucket
    ]
    fp = spark.createDataFrame(rows, "doc_id int, fp int")
    bucket = (
        fp.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") <= 10)
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds) - i - 1),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    arr = (
        bucket.select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    a, b = fp.alias("a"), fp.alias("b")
    join = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    got = sorted(map(tuple, arr.collect()))
    want = sorted(map(tuple, join.collect()))
    assert got == want
    assert (1, 2, 3) in got  # 2×(fp100) + 1×(fp200) for the repeat doc


def test_pagerank_symmetric_incoming_covers_all_nodes(spark):
    # pagerank_over_edges (r14): dropping the node-list left-join is
    # sound because a symmetric edge list gives every node in-edges —
    # the incoming-sum aggregate must emit exactly the node set, and
    # ranks must match the explicit left-join form on a graph with a
    # leaf (degree-1) node.
    from postgresql_transfer_tool_spark.operators.graph import (
        PR_BASE,
        PR_SCALE,
        pagerank_over_edges,
    )

    sym = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 3), (3, 1)]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = {r.v: r.r for r in pagerank_over_edges(edges, iters=2).collect()}
    assert set(got) == {1, 2, 3, 4}

    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ed = edges.join(deg, "src")
    nodes = deg.select(F.col("src").alias("v"))
    ranks = nodes.select("v", F.lit(PR_SCALE).cast("bigint").alias("r"))
    for _ in range(2):
        inc = (
            ed.join(ranks, ed.src == ranks.v)
            .select("dst", F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("inc"))
        )
        ranks = nodes.join(inc, nodes.v == inc.dst, "left").select(
            "v",
            (
                F.lit(PR_BASE)
                + F.coalesce(
                    F.expr("(85 * inc) div 100"), F.lit(0).cast("bigint")
                )
            ).alias("r"),
        )
    want = {r.v: r.r for r in ranks.collect()}
    assert got == want


def test_bfs_minhop_union_equals_pruned_frontier_on_cycle(spark):
    # bfs_over_edges plan-subtree path (r14): the min-hop union form
    # must equal the pruned-frontier form on a graph with cycles and
    # multiple path lengths to the same node (walk at k=3 revisits the
    # k=1 node; MIN must keep the first appearance).
    from postgresql_transfer_tool_spark.operators.graph import bfs_over_edges

    sym = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (3, 4), (4, 3)]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = {
        (r.v, r.hop)
        for r in bfs_over_edges(edges, 3, checkpoint_levels=False).collect()
    }
    want = {
        (r.v, r.hop)
        for r in bfs_over_edges(edges, 3, checkpoint_levels=True).collect()
    }
    assert got == want == {(1, 0), (2, 1), (3, 1), (4, 2)}
