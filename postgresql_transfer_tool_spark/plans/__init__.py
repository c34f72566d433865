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
