"""Join-family semantic tests (oracle parity is in test_oracle_diff)."""

from __future__ import annotations


def test_fuzzy_entity_match_finds_intended_targets(spark, sf_dir):
    """Every seeded typo resolves to the nation it was derived from."""
    from postgresql_transfer_tool_spark.operators.joins import fuzzy_entity_match

    got = {r["probe"]: (r["matched_name"], r["dist"]) for r in
           fuzzy_entity_match(spark, sf_dir).collect()}
    expected = {
        "NATOIN_7": "NATION_7",
        "NTION_21": "NATION_21",
        "NATI0N_4": "NATION_4",
        "NATION__18": "NATION_18",
        "NACION_19": "NATION_19",
        "NATION-22": "NATION_22",
        "NATON_13": "NATION_13",
        "XNATION_6": "NATION_6",
    }
    for probe, name in expected.items():
        assert got[probe][0] == name, (probe, got[probe])
        assert got[probe][1] <= 2
