"""Driver-gate rotation invariants (VERDICT r3 "Next round" #1/#2).

The verification driver checks a bounded ~50-query prefix of the
registry per round. ``load_all`` orders the registry via ``gate_order``
so coverage rotates automatically: queries with no driver CORRECTNESS
row ever sort first, then queries whose last row is stalest. These
tests pin that contract against the committed CORRECTNESS_r*.json
files so a future query addition can never silently ship unverified.
"""

from __future__ import annotations

from postgresql_transfer_tool_spark.operators import registry

PREFIX = 50  # the driver's per-round verification budget


def _loaded():
    registry.load_all()
    return list(registry.QUERIES)


def test_never_checked_oracle_queries_lead_the_prefix():
    """Any oracle-backed query absent from the union of all
    CORRECTNESS_r*.json files must sort into the driver's first-50
    prefix — otherwise it ships without a hard driver signal."""
    names = _loaded()
    last = registry.driver_rounds()
    never = [n for n in names if n not in last and n in registry.ORACLES]
    assert len(never) <= PREFIX, "more unchecked queries than gate slots"
    head = set(names[:PREFIX])
    missing = [n for n in never if n not in head]
    assert not missing, f"unchecked oracle queries outside the gate: {missing}"


def test_prefix_prefers_stalest_rows():
    """Within the prefix, no checked query may outrank a staler one:
    the sequence of EFFECTIVE last-checked rounds along the registry
    order is non-decreasing — never-checked = -1 first, and a query
    whose plan was reshaped (registry._RESHAPED) counts as unchecked
    until a driver row at/after the reshape round lands (its older rows
    proved the OLD plan — VERDICT r11 #7)."""
    names = _loaded()
    last = registry.driver_rounds()

    def eff(n):
        e = last.get(n, -1)
        return -1 if e < registry._RESHAPED.get(n, 0) else e

    seq = [eff(n) for n in names]
    assert seq == sorted(seq), "registry order is not stalest-first"


def test_driver_rounds_sees_multiple_recorded_rounds():
    """Sanity: the scan actually parses the committed CORRECTNESS files.
    Round-agnostic (the 50-slot gate rotation supersedes older rows as
    rounds accumulate): there must be rows from at least 3 distinct
    rounds and near-full union coverage."""
    last = registry.driver_rounds()
    assert len(last) >= 147
    assert len(set(last.values())) >= 3
    assert max(last.values()) >= 4  # recent rounds are being picked up


def test_gate_order_is_deterministic_and_total():
    names = _loaded()
    assert registry.gate_order(list(registry.QUERIES)) == names
    assert len(set(names)) == len(names)
    assert set(names) == set(registry.QUERIES)


def test_rotation_staleness_is_bounded():
    """VERDICT r6 "Next round" #7: under stalest-first rotation with a
    PREFIX-slot budget, no query's driver row may age past
    ceil(Q/PREFIX) + 1 rounds. Proven two ways:

    (a) simulation — run the exact gate policy (stalest-first, budget
        PREFIX) over the real registry for several full cycles and
        measure the worst observed staleness;
    (b) the committed record — every query with a CORRECTNESS row is
        within the bound of the newest recorded round (new queries with
        no row yet are excluded: they sort first into the NEXT round's
        prefix by test_never_checked_oracle_queries_lead_the_prefix).
    """
    import math

    names = _loaded()
    q = len(names)
    bound = math.ceil(q / PREFIX) + 1

    # (a) closed-loop simulation of the rotation policy
    last = {n: 0 for n in names}
    worst = 0
    for rnd in range(1, 4 * bound + 1):
        order = sorted(names, key=lambda n: last[n])
        for n in order[:PREFIX]:
            last[n] = rnd
        worst = max(worst, rnd - min(last.values()))
    assert worst <= bound, f"simulated staleness {worst} > bound {bound}"

    # (b) the committed CORRECTNESS history honors the bound
    recorded = registry.driver_rounds()
    newest = max(recorded.values())
    stale = {
        n: newest - recorded[n]
        for n in names
        if n in recorded and newest - recorded[n] > bound
    }
    assert not stale, f"queries staler than {bound} rounds: {stale}"
