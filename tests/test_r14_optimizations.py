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


def test_basket_pairs_match_incidence_selfjoin(spark):
    # copurchase_pairs_topk/capped (r14): per-order collect_set baskets
    # + in-array a<b expansion must reproduce the distinct-incidence
    # self-join's per-pair order counts, including raw duplicate
    # (order, part) rows (collect_set dedups them like DISTINCT did)
    # and the basket cap as slice-of-sorted-set vs row_number.
    from pyspark.sql.window import Window as W

    rows = [
        (1, 10), (1, 10), (1, 20), (1, 30),   # dup (1,10) row
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 30), (3, 40),
        (4, 99),                              # singleton basket
    ]
    li = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps) - i - 1),"
        " y -> struct(x AS pa, y AS pb))))"
    )
    for cap in (None, 3):
        ps = F.sort_array(F.collect_set("l_partkey"))
        if cap is not None:
            ps = F.slice(ps, 1, cap)
        got = (
            li.groupBy("l_orderkey")
            .agg(ps.alias("ps"))
            .select(F.explode(pair_expr).alias("p"))
            .select("p.pa", "p.pb")
            .groupBy("pa", "pb")
            .agg(F.count("*").alias("n_orders"))
        )
        op = li.distinct()
        if cap is not None:
            w = W.partitionBy("l_orderkey").orderBy("l_partkey")
            op = (
                op.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= cap)
                .drop("_rn")
            )
        a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
        b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
        want = (
            a.join(b, "ok")
            .filter(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.count("*").alias("n_orders"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"cap={cap}"


def test_basket_edges_match_incidence_selfjoin(spark):
    # edges_from_incidence (r14): basket-built symmetric distinct edges
    # must equal the r13 order-key self-join + distinct form.
    from postgresql_transfer_tool_spark.operators.graph import (
        edges_from_incidence,
    )

    rows = [(1, 10), (1, 20), (1, 30), (2, 20), (2, 30), (3, 40)]
    op = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    got = {(r.src, r.dst) for r in edges_from_incidence(op).collect()}
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    want = {
        (r.src, r.dst)
        for r in a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .collect()
    }
    assert got == want
    assert (10, 20) in got and (20, 10) in got  # symmetric closure


def test_cell_member_pairs_match_assignment_selfjoin(spark):
    # dedup_semantic_clusters (r14): in-cell sorted-member pair
    # expansion + MIN(cluster_id) must equal the assignment self-join —
    # a pair sharing BOTH probe cells dedups to one row with the lower
    # cell id, exactly as the join's groupBy did.
    rows = [
        (1, 100), (2, 100), (3, 100),
        (1, 200), (2, 200),            # pair (1,2) shares cells 100 AND 200
        (9, 300),
    ]
    assigned = spark.createDataFrame(rows, "vec_id int, cluster_id int")
    pair_expr = F.expr(
        "flatten(transform(vs, (x, i) ->"
        " transform(slice(vs, i + 2, size(vs) - i - 1),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    got = (
        assigned.groupBy("cluster_id")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("vs"))
        .select("cluster_id", F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b", "cluster_id")
        .groupBy("doc_a", "doc_b")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    want = (
        assigned.select(F.col("vec_id").alias("doc_a"), "cluster_id")
        .join(
            assigned.select(F.col("vec_id").alias("doc_b"), "cluster_id"),
            "cluster_id",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == sorted(map(tuple, want.collect()))
    assert (1, 2, 100) in got_rows  # shared-both-cells pair, lower cell kept


def test_two_step_explode_pairs_match_selfjoin_with_dups(spark):
    # dedup_ngram_jaccard (r14): posexplode anchor + tail-slice explode
    # (never a flattened k² array) must reproduce the key self-join's
    # pair multiplicity, including duplicate keys within one doc.
    rows = [
        (1, "s1"), (1, "s1"), (2, "s1"), (3, "s1"),  # doc 1 repeats s1
        (1, "s2"), (2, "s2"),
        (7, "s3"),
    ]
    sh = spark.createDataFrame(rows, "doc_id int, s string")
    bucket = sh.groupBy("s").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    anchor = bucket.select("ds", F.posexplode("ds").alias("i", "da"))
    got = (
        anchor.select(
            "da",
            F.explode(
                F.slice("ds", F.col("i") + 2, F.size("ds") - F.col("i") - 1)
            ).alias("db"),
        )
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), F.col("s").alias("s_r"))
    want = (
        a.join(b, (F.col("s") == F.col("s_r")) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == sorted(map(tuple, want.collect()))
    assert (1, 2, 3) in got_rows  # 2×(s1 multiplicity) + 1×(s2)


def test_min_docid_unique_gram_rollup_matches_join_form(spark):
    # text_ngram_novelty (r14): resolving each df==1 gram's single
    # member via MIN(doc_id) inside the df aggregate must match the
    # join-back form's per-doc (n_grams, n_unique) — including a doc
    # whose grams are ALL shared (n_unique must be 0, not missing).
    rows = [
        (1, "g1"), (1, "g2"), (1, "g3"),
        (2, "g1"), (2, "g2"),            # doc 2: zero unique grams
        (3, "g4"),
    ]
    e = spark.createDataFrame(rows, "doc_id int, gram string")
    gdf = e.groupBy("gram").agg(
        F.count("*").alias("df"), F.min("doc_id").alias("d0")
    )
    n1 = (
        gdf.filter(F.col("df") == 1)
        .select(F.col("d0").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_unique_nn"))
    )
    ng = e.select("doc_id").groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    got = (
        ng.join(n1, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_unique_nn"), F.lit(0).cast("bigint")).alias(
                "n_unique"
            ),
        )
    )
    dfc = e.groupBy("gram").agg(F.count("*").alias("df"))
    want = (
        e.join(dfc, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == sorted(map(tuple, want.collect()))
    assert (2, 2, 0) in got_rows  # all-shared doc present with 0


def test_longform_string_ndv_matches_countdistinct(spark):
    # analyze_table_stats (r14): the stacked (col, CAST(v AS STRING))
    # distinct chain must equal exact countDistinct per column —
    # including NULL handling and an ALL-NULL column (ndv 0 via the
    # left join's coalesce).
    rows = [(1, "a", None), (1, "b", None), (2, None, None), (None, "a", None)]
    df = spark.createDataFrame(rows, "x int, y string, z int")
    cols = ("x", "y", "z")
    val_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    ndv = (
        df.select(F.expr(f"stack({len(cols)}, {val_args}) AS (col, v)"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .groupBy("col")
        .agg(F.count("*").alias("ndv"))
    )
    got = {r.col: r.ndv for r in ndv.collect()}
    want_row = df.agg(
        *[F.countDistinct(c).alias(c) for c in cols]
    ).collect()[0]
    want = {c: want_row[c] for c in cols if want_row[c] != 0}
    assert got == want == {"x": 2, "y": 2}  # z all-null: absent -> coalesce 0


def test_cm_driver_closing_matches_spark_expressions(spark):
    # correlation_matrix_lineitem (r14): the driver-side closing over the
    # collected moment row must be BIT-identical to the previous in-plan
    # Spark expression sequence — including the decimal→string→double
    # conversion, sqrt(negative)→NaN, double /0→NULL, and NULL
    # propagation from empty inputs.
    from decimal import Decimal

    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.stats import (
        _CM_COLS,
        _CM_PAIRS,
        _cm_close_moments,
    )

    cases = [
        # ordinary moments (irregular values to exercise rounding)
        {"n": 7, "s": "123.45", "ss": "98765.4321", "sp": "55555.5555"},
        # zero variance: den = 0 -> the in-plan ANSI Divide would RAISE;
        # the driver closing yields NULL, matching the DuckDB oracle
        # (checked separately below)
        {"n": 3, "s": "6.00", "ss": "12.0000", "sp": "12.0000", "den0": True},
        # negative radicand after double rounding -> sqrt NaN -> r NaN
        {"n": 2, "s": "2.00", "ss": "1.9999", "sp": "1.0000"},
        # empty input: sums NULL, n = 0 -> r NULL via propagation
        {"n": 0, "s": None, "ss": None, "sp": None},
    ]
    for case in cases:
        vals = {"n": case["n"]}
        for c in _CM_COLS:
            vals[f"s_{c}"] = None if case["s"] is None else Decimal(case["s"])
            vals[f"ss_{c}"] = None if case["ss"] is None else Decimal(case["ss"])
        for a, b in _CM_PAIRS:
            vals[f"sp_{a}_{b}"] = (
                None if case["sp"] is None else Decimal(case["sp"])
            )
        fields = ["n bigint"]
        for c in _CM_COLS:
            fields += [f"s_{c} decimal(20,2)", f"ss_{c} decimal(24,4)"]
        fields += [f"sp_{a}_{b} decimal(24,4)" for a, b in _CM_PAIRS]
        m = spark.createDataFrame(
            [tuple(vals[f.split()[0]] for f in fields)], ", ".join(fields)
        )

        def d(col):
            return F.col(col).cast("string").cast("double")

        nd = F.col("n").cast("double")
        outs = []
        for a, b in _CM_PAIRS:
            r = (nd * d(f"sp_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")) / (
                F.sqrt(nd * d(f"ss_{a}") - d(f"s_{a}") * d(f"s_{a}"))
                * F.sqrt(nd * d(f"ss_{b}") - d(f"s_{b}") * d(f"s_{b}"))
            )
            outs.append(
                m.select(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    "n",
                    r.alias("pearson_r"),
                )
            )
        got = sorted(map(tuple, _cm_close_moments(m.collect()[0])))
        if case.get("den0"):
            # in-plan reference raises under ANSI; the driver closing
            # must return NULL (the DuckDB oracle's double /0 value)
            import pytest as _pytest

            with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
                outs[0].collect()
            assert all(g[3] is None for g in got)
            continue
        want_df = outs[0]
        for o in outs[1:]:
            want_df = want_df.unionAll(o)
        want = sorted(map(tuple, want_df.collect()))
        # NaN != NaN: compare with an is-nan-aware equality
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:3] == w[:3]
            if w[3] is None or g[3] is None:
                assert g[3] is None and w[3] is None, (g, w)
            elif w[3] != w[3]:
                assert g[3] != g[3], (g, w)
            else:
                assert g[3] == w[3], (g, w)
