from __future__ import annotations

import pytest

from postgresql_transfer_tool_spark.catalog import (
    TABLES,
    ForeignKey,
    TableInfo,
    fixture_catalog,
    list_tables,
    load_table,
    table_exists,
    topo_sort_tables,
)


def test_list_tables(sf_dir):
    assert list_tables(sf_dir) == list(TABLES)


def test_table_exists(sf_dir):
    assert table_exists(sf_dir, "lineitem")
    assert not table_exists(sf_dir, "nonexistent")


def test_topo_sort_parents_before_children():
    order = topo_sort_tables(fixture_catalog())
    pos = {t: i for i, t in enumerate(order)}
    assert set(order) == set(TABLES)
    for t, info in fixture_catalog().items():
        for fk in info.foreign_keys:
            assert pos[fk.ref_table] < pos[t], f"{fk.ref_table} must precede {t}"


def test_topo_sort_detects_cycle():
    cat = {
        "a": TableInfo("a", foreign_keys=(ForeignKey("a", ("x",), "b", ("y",)),)),
        "b": TableInfo("b", foreign_keys=(ForeignKey("b", ("y",), "a", ("x",)),)),
    }
    with pytest.raises(ValueError, match="cycle"):
        topo_sort_tables(cat)


def test_events_timestamp_readable(spark, sf_dir):
    """Fixture timestamps have shipped as TIMESTAMP(NANOS) (round 1) and
    as microsecond TIMESTAMP_NTZ (round 2); ``load_table`` must yield a
    usable timestamp either way. NTZ vs LTZ is immaterial under the
    engine's UTC session timezone (testing.py canonicalizes both)."""
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert df.count() > 0
