"""Physical-plan inspection helpers.

"Would this plan survive a 100× scale-up?" is checked mechanically:
tests assert that filters reach the parquet scan (PushedFilters), that
projections prune the read schema (ReadSchema), and that dimension joins
broadcast instead of shuffling. A plan regression fails the suite even
while results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan's PushedFilters."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters section in plan:\n{plan}"
    assert any(fragment in ln for ln in pushed), (
        f"filter fragment {fragment!r} not pushed; PushedFilters lines: {pushed}"
    )


def assert_read_schema_only(df: DataFrame, table_fragment: str, columns: set[str]) -> None:
    """Assert the scan of ``table_fragment`` reads exactly ``columns``."""
    plan = physical_plan(df)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Location:" in ln and table_fragment in ln:
            schema_lines = [l for l in lines[i - 3 : i + 4] if "ReadSchema" in l]
            assert schema_lines, f"no ReadSchema near {table_fragment} scan:\n{plan}"
            schema = schema_lines[0]
            read_cols = {
                c.split(":")[0].strip()
                for c in schema.split("struct<", 1)[1].rstrip(">").split(",")
                if c.strip()
            }
            assert read_cols == columns, (
                f"scan of {table_fragment} reads {sorted(read_cols)}, "
                f"expected {sorted(columns)}"
            )
            return
    raise AssertionError(f"no scan of {table_fragment} found in plan:\n{plan}")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle-exchange NODES in the physical plan (formatted
    explain prints each node twice — tree line + detail header — so we
    count only the `(N) Exchange` detail headers)."""
    import re

    plan = physical_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", ln.strip()) and "Reused" not in ln
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def exchanges_below_first_join_above_scan(
    df: DataFrame, scan_fragment: str
) -> list[int]:
    """For every scan leaf whose simpleString contains ``scan_fragment``,
    the number of Exchange nodes strictly between that scan and its
    NEAREST join ancestor in the (pre-AQE) physical plan.

    This is the "big side never shuffled" assert for bucketed layouts:
    a table bucketed on its join key must reach its first join with zero
    intervening Exchange — the probe side pays the shuffle (or is
    broadcast). Exchanges ABOVE that join move already-joined/pruned
    rows and are not this check's concern. Returns one count per
    matching scan (empty list ⇒ no such scan in the plan)."""
    plan = df._jdf.queryExecution().sparkPlan()
    results: list[int] = []

    def walk(node, exch_since_join: int) -> None:
        cls = node.getClass().getSimpleName()
        if "Join" in cls:
            exch_since_join = 0
        elif "Exchange" in cls:
            exch_since_join += 1
        children = node.children()
        if children.length() == 0:
            if scan_fragment in node.simpleString(30):
                results.append(exch_since_join)
            return
        for i in range(children.length()):
            walk(children.apply(i), exch_since_join)

    # root counts as "no join seen yet": exchanges accumulate from the
    # top, then reset at each join boundary on the way down — so the
    # count reaching a leaf is exactly the exchanges between that leaf
    # and its nearest join ancestor.
    walk(plan, 0)
    return results


def has_wholestage_codegen(df: DataFrame) -> bool:
    """True if the executed plan contains whole-stage-codegen stages.

    Under AQE the plan is adaptive and codegen subtrees only exist in the
    *final* plan, so this executes the query (test-scale inputs only) and
    inspects the post-execution simple plan for codegen markers (``*(n)``).
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "*(" in plan or "WholeStageCodegen" in plan


def _top_level_bracket_contents(s: str) -> list[str]:
    """Top-level ``[...]`` group contents of a plan Arguments line."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


#: Logical-plan node classes that bound the cardinality of everything
#: above them: an aggregation collapses to one row per group key and a
#: limit to a constant. (A groupBy on a high-cardinality key is not
#: truly bounded, but per the sweep's contract an *intervening
#: aggregation* counts — the target bug class is hinting a raw or
#: merely-projected/filtered unbounded relation, VERDICT r4 #1.)
#: Deduplicate (``.distinct()``) counts for the same reason Aggregate
#: does: it collapses to the key domain's cardinality.
_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}

#: Leaf classes whose cardinality is a plan-time constant.
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation", "Range", "OneRowRelation$"}

#: Base tables that are bounded by the data model itself (TPC-H fixes
#: region at 5 rows and nation at 25 at every scale factor) —
#: recognized by the EXACT column-name set of the relation's analyzed
#: output (a leaf exposes the full table schema at analysis time). A
#: prefix rule ('r_'/'n_') would silently exempt any derived relation
#: whose columns happen to share the prefix, e.g. n_rows/n_docs
#: (ADVICE r5).
_BOUNDED_TABLE_COLSETS = (
    frozenset({"r_regionkey", "r_name"}),                   # region
    frozenset({"n_nationkey", "n_name", "n_regionkey"}),    # nation
)


def _hint_subtree_unbounded_leaves(node) -> list[str]:
    """Leaves of a ResolvedHint subtree that are NOT plan-time bounded,
    stopping descent at bounding nodes (Aggregate/Limit). Empty list ⇒
    the hinted relation's size is independent of base-table size."""
    cls = node.getClass().getSimpleName()
    if cls in _BOUNDING_NODES:
        return []
    children = node.children()
    if children.length() == 0:
        if cls in _BOUNDED_LEAVES:
            return []
        out = node.output()
        names = [out.apply(i).name() for i in range(out.length())]
        if frozenset(names) in _BOUNDED_TABLE_COLSETS:
            return []
        return [f"{cls}[{','.join(names[:6])}{'…' if len(names) > 6 else ''}]"]
    bad: list[str] = []
    for i in range(children.length()):
        bad.extend(_hint_subtree_unbounded_leaves(children.apply(i)))
    return bad


def broadcast_hint_violations(df: DataFrame) -> list[str]:
    """Every ``F.broadcast()`` hint in the analyzed logical plan whose
    hinted subtree is derived from an unbounded base table with no
    intervening aggregation or limit — the bug class of VERDICT r4
    "What's wrong" #1 (bm25 broadcast-hinting the O(N_docs) doc-length
    relation). A forced broadcast of a relation that grows with the
    data ODMs the driver at 100 TB no matter how small it is at test
    scale; Catalyst's *auto* broadcast (size-threshold / AQE) is not a
    hint and is not flagged.

    Works on the ANALYZED plan because hints are erased during
    optimization (EliminateResolvedHint folds them into the join), so
    the physical plan cannot distinguish a hinted broadcast from an
    auto one. Returns one descriptive string per offending hint."""
    violations: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
            bad = _hint_subtree_unbounded_leaves(node)
            if bad:
                violations.append(
                    "broadcast hint over unbounded leaves "
                    + ", ".join(sorted(set(bad)))
                )
        children = node.children()
        for i in range(children.length()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return violations


def window_partition_specs(df: DataFrame) -> list[str]:
    """The partition-spec text of every WindowExec in the physical plan
    ('' for a global window) — the substrate for asserting a window's
    PARTITIONING KEY, not just its existence. A window partitioned by a
    low-cardinality shard key (e.g. raw ``source``) is one task per
    shard — serial at scale even though ``unpartitioned_window_count``
    passes it; the keyed two-phase prefix sum's windows carry the
    physical-slice column ``_rs_part`` in their spec, which is what the
    packing/budget plan tests assert (VERDICT r11 #1). Same
    Arguments-line disambiguation as unpartitioned_window_count: order
    specs carry ASC/DESC NULLS markers, partition specs never do;
    WindowGroupLimit nodes are skipped."""
    import re

    plan = physical_plan(df)
    lines = plan.splitlines()
    specs: list[str] = []
    for i, ln in enumerate(lines):
        if re.match(r"^\(\d+\) Window(GroupLimit)?\s*$", ln.strip()):
            if "GroupLimit" in ln:
                continue
            for follow in lines[i + 1 : i + 6]:
                if follow.startswith("Arguments:"):
                    groups = _top_level_bracket_contents(follow)
                    if len(groups) >= 3:
                        specs.append(groups[1])
                    elif len(groups) == 2:
                        if re.search(r"\b(ASC|DESC) NULLS", groups[1]):
                            specs.append("")  # ordered global window
                        else:
                            specs.append(groups[1])
                    else:
                        specs.append("")
                    break
    return specs


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of Window nodes with NO partition spec — each one is a
    serial single-task bottleneck at scale (WindowExec moves all rows to
    one partition). The Arguments line carries up to three top-level
    bracket groups ``[exprs], [partSpec], [orderSpec]``, but trailing
    empty specs are omitted, so the group COUNT alone is ambiguous: an
    ordered-but-unpartitioned window and an unordered-but-PARTITIONED
    window both print two groups. Disambiguate by content — order specs
    carry ``ASC``/``DESC NULLS`` markers, partition specs never do.
    WindowGroupLimit nodes (partial top-k pushdown) are not WindowExec
    and are skipped."""
    import re

    plan = physical_plan(df)
    lines = plan.splitlines()
    count = 0
    for i, ln in enumerate(lines):
        if re.match(r"^\(\d+\) Window(GroupLimit)?\s*$", ln.strip()):
            if "GroupLimit" in ln:
                continue
            for follow in lines[i + 1 : i + 6]:
                if follow.startswith("Arguments:"):
                    groups = _top_level_bracket_contents(follow)
                    if len(groups) >= 3:
                        pass  # [exprs], [part], [order] — partitioned
                    elif len(groups) == 2:
                        # second group is either a partition spec
                        # (unordered partitioned window — fine) or an
                        # order spec (ordered GLOBAL window — serial)
                        if re.search(r"\b(ASC|DESC) NULLS", groups[1]):
                            count += 1
                    else:
                        count += 1  # exprs only — unordered global
                    break
    return count
