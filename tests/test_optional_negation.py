"""OPTIONAL MATCH hops (`E(optional=True)`) and bound-position negation
(`table(..., not_edges=...)` / `exclude_edges`) over the reference's own
F2 issue-tracker fixture (app/Main.hs:33-59): programmer 0 raises issues
3,4,5,6 and closes 3; programmer 1 raises nothing."""

import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark import E, N, exclude_edges, table
from tests.fixtures import f2_issue_tracker


@pytest.fixture(scope="module")
def g(spark):
    return f2_issue_tracker(spark)


def test_optional_hop_keeps_unmatched_with_nulls(g):
    # PROGRAMMER -Raises?-> : programmer 0 → 4 rows, programmer 1 → one
    # NULL row (raises nothing); inner variant would drop programmer 1
    pat = (N(labels=["PROGRAMMER"])
           >> E("Raises", direction="r", optional=True) >> N())
    rows = {(r["n0"], r["n1"]) for r in table(g, pat).collect()}
    assert rows == {(0, 3), (0, 4), (0, 5), (0, 6), (1, None)}
    inner = table(g, N(labels=["PROGRAMMER"])
                  >> E("Raises", direction="r") >> N())
    assert {r["n0"] for r in inner.collect()} == {0}


def test_optional_hop_applies_node_filter_inside(g):
    # the optional tail's node filter (ISSUE only) must scope INSIDE the
    # optional: programmer 1 keeps its NULL row even though no ISSUE
    # matches; prog 0's PR-accepting edge would never match anyway
    pat = (N(labels=["PROGRAMMER"])
           >> E(attr=["Raises", "Accepts"], direction="r", optional=True)
           >> N(labels=["ISSUE"]))
    rows = {(r["n0"], r["n1"]) for r in table(g, pat).collect()}
    # programmer 1 Accepts PR 7 (not an ISSUE) → filtered inside → NULL
    assert rows == {(0, 3), (0, 4), (0, 5), (0, 6), (1, None)}


def test_chained_optional_propagates_nulls(g):
    # PROGRAMMER -Raises?-> ISSUE -References?-> : prog 1's NULL frontier
    # stays NULL through the second optional hop; issues 5 and 6
    # reference nothing (5 only Closes 4) and keep NULL-tail rows
    pat = (N(labels=["PROGRAMMER"])
           >> E("Raises", direction="r", optional=True) >> N()
           >> E("References", direction="r", optional=True) >> N())
    rows = {(r["n0"], r["n1"], r["n2"]) for r in table(g, pat).collect()}
    assert rows == {(0, 3, 5), (0, 4, 3), (0, 4, 6), (0, 5, None),
                    (0, 6, None), (1, None, None)}


def test_required_after_optional_raises(g):
    pat = (N(labels=["PROGRAMMER"])
           >> E("Raises", direction="r", optional=True) >> N()
           >> E("References", direction="r") >> N())
    with pytest.raises(ValueError, match="optional"):
        table(g, pat).collect()


def test_several_optional_rejected():
    with pytest.raises(ValueError, match="several \\+ optional"):
        E("Raises", several=(1, 2), optional=True)


def test_not_edges_drops_connected_bindings(g):
    # raised-AND-closed: programmer 0 closes issue 3 → (0,3) excluded
    pat = N(labels=["PROGRAMMER"]) >> E("Raises", direction="r") >> N()
    kept = table(g, pat, not_edges=[(0, E("Closes", direction="r"), 1)])
    assert {(r["n0"], r["n1"]) for r in kept.collect()} \
        == {(0, 4), (0, 5), (0, 6)}


def test_exclude_edges_composes_and_where_filters(g):
    pat = N(labels=["PROGRAMMER"]) >> E("Raises", direction="r") >> N()
    b = table(g, pat)
    # a where-filtered negation that matches nothing removes nothing
    kept = exclude_edges(
        g, b, [(0, E("Closes", direction="r",
                     where=lambda c: c["edge_seq"] > 99), 1)])
    assert kept.count() == b.count()
    # two constraints apply conjunctively
    kept2 = exclude_edges(
        g, b, [(0, E("Closes", direction="r"), 1),
               (0, E("Raises", direction="r",
                     where=lambda c: c["dst"] == 6), 1)])
    assert {(r["n0"], r["n1"]) for r in kept2.collect()} == {(0, 4), (0, 5)}


def test_not_edges_spec_validation(g):
    pat = N(labels=["PROGRAMMER"]) >> E("Raises", direction="r") >> N()
    with pytest.raises(ValueError, match="plain single hops"):
        table(g, pat,
              not_edges=[(0, E("Closes", several=(1, 2)), 1)])


def test_optional_flip_survives_reversal_fields():
    e = E("Raises", direction="r", optional=True).flipped()
    assert e.optional and e.direction == "l"


def test_not_edges_unbound_position_raises(g):
    pat = N(labels=["PROGRAMMER"]) >> E("Raises", direction="r") >> N()
    with pytest.raises(ValueError, match="position 5 is not bound"):
        table(g, pat, not_edges=[(0, E("Closes", direction="r"), 5)])


def test_optional_pattern_through_flat_and_nested_views(g):
    """flat_table / nested_layers must absorb NULL tails, not crash."""
    from judy_graph_db_spark import flat_table, nested_layers

    pat = (N(labels=["PROGRAMMER"])
           >> E("Raises", direction="r", optional=True) >> N())
    ft = {r["position"]: r["node_set"]
          for r in flat_table(g, pat).collect()}
    assert set(ft[0]) == {0, 1}
    # collect_set drops the NULL tail; the bound issues all appear
    assert set(ft[1]) == {3, 4, 5, 6}
    nl = nested_layers(table(g, pat))
    by_n0 = {r["n0"]: r for r in nl.collect()}
    assert 1 in by_n0  # the NULL-tail programmer still has a row


def test_pattern_negation_keeps_null_optional_bindings(g):
    """Pin the optional+not_edges composition: a binding whose position
    is NULL (unmatched optional hop) SURVIVES negation — the anti-join
    condition is NULL, read as "no endpoint, so no such edge". This is
    the documented divergence from Cypher, whose WHERE NOT with a NULL
    endpoint filters the row (exclude_edges docstring); Cypher's
    behavior is one .isNotNull() filter away."""
    pat = (N(labels=["PROGRAMMER"])
           >> E("Raises", direction="r", optional=True) >> N())
    kept = table(g, pat, not_edges=[(0, E("Closes", direction="r"), 1)])
    rows = {(r["n0"], r["n1"]) for r in kept.collect()}
    # (0,3) dropped (0 Closes 3); programmer 1's NULL row KEPT
    assert rows == {(0, 4), (0, 5), (0, 6), (1, None)}
    # the one-filter recipe for Cypher's NULL-filters semantics
    cypherish = {(r["n0"], r["n1"])
                 for r in kept.filter(F.col("n1").isNotNull()).collect()}
    assert cypherish == {(0, 4), (0, 5), (0, 6)}


def test_pattern_negation_cypher_nulls_drops_unmatched_optionals(g):
    """The mirror of the NULL-keeps pin: ``cypher_nulls=True`` makes
    negation NULL-propagating like Cypher — a binding whose negated
    position is NULL (unmatched optional hop) is DROPPED before the
    anti-join, so the one-keyword flag replaces the manual isNotNull
    recipe. Non-NULL rows are judged identically in both modes."""
    pat = (N(labels=["PROGRAMMER"])
           >> E("Raises", direction="r", optional=True) >> N())
    kept = table(g, pat, not_edges=[(0, E("Closes", direction="r"), 1)],
                 cypher_nulls=True)
    rows = {(r["n0"], r["n1"]) for r in kept.collect()}
    # (0,3) dropped by negation; programmer 1's NULL row dropped by the
    # Cypher NULL rule (vs KEPT in the default mode)
    assert rows == {(0, 4), (0, 5), (0, 6)}
