"""Cypher-style motif string parser → Pattern, and execution equivalence
with the combinator EDSL."""

import pytest

from judy_graph_db_spark import E, N, parse_motif, table
from judy_graph_db_spark.plans.pattern import Pattern

from tests.fixtures import f2_issue_tracker


def specs(m):
    return parse_motif(m).specs


def test_node_forms():
    p = parse_motif("(a:CUSTOMER)")
    assert p.specs[0].labels == ["CUSTOMER"] and p.specs[0].name == "a"
    assert parse_motif("(x)").specs[0].is_any()
    assert parse_motif("()").specs[0].is_any()
    assert parse_motif("(:REGION|NATION)").specs[0].labels == ["REGION", "NATION"]
    assert parse_motif("(=42,43)").specs[0].ids == [42, 43]


def test_edge_forms():
    e = specs("(a)-[:PLACED]->(b)")[1]
    assert e.attr == ["PLACED"] and e.direction == "r"
    e = specs("(a)<-[:PLACED]-(b)")[1]
    assert e.direction == "l"
    e = specs("(a)-[:A|B]-(b)")[1]
    assert e.attr == ["A", "B"] and e.direction is None
    e = specs("(a)-[o~BULK]->(b)")[1]
    assert e.orth == ["BULK"] and e.name == "o"
    assert specs("(a)-->(b)")[1].direction == "r"
    assert specs("(a)<--(b)")[1].direction == "l"
    assert specs("(a)--(b)")[1].attr is None


def test_var_length_forms():
    assert specs("(a)-[:N*1..3]->(b)")[1].several == (1, 3)
    assert specs("(a)-[:N*]->(b)")[1].several == (1, None)
    assert specs("(a)-[:N*2]->(b)")[1].several == (2, 2)
    assert specs("(a)-[:N*2..]->(b)")[1].several == (2, None)


def test_multi_hop_chain():
    p = parse_motif("(c:CUSTOMER)-[:PLACED]->(o:ORDER)-[:CONTAINS]->(p:PART)")
    assert isinstance(p, Pattern) and len(p.specs) == 5
    assert [s.labels for s in p.node_specs] == [["CUSTOMER"], ["ORDER"], ["PART"]]
    assert [e.attr for e in p.edge_specs] == [["PLACED"], ["CONTAINS"]]


@pytest.mark.parametrize("bad", [
    "(a)-[:X]->", "-[:X]->(b)", "(a)(b)", "(a)<-[:X]->(b)", "(a)-[??]->(b)",
])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_motif(bad)


def test_motif_executes_like_combinators(spark):
    g = f2_issue_tracker(spark)
    via_str = table(g, parse_motif("(=0)-[:Raises]->(i)")).collect()
    via_edsl = table(g, N(ids=[0]) >> E("Raises", direction="r") >> N()).collect()
    assert sorted(map(tuple, via_str)) == sorted(map(tuple, via_edsl))
    assert len(via_str) > 0


def test_optional_edge_forms():
    assert specs("(a)-[:PLACED?]->(b)")[1].optional is True
    assert specs("(a)-[?]->(b)")[1].optional is True
    e = specs("(a)<-[r:X|Y?]-(b)")[1]
    assert e.optional and e.attr == ["X", "Y"] and e.direction == "l"
    assert specs("(a)-[:PLACED]->(b)")[1].optional is False


def test_optional_motif_executes_like_combinators(spark):
    g = f2_issue_tracker(spark)
    via_str = table(
        g, parse_motif("(p:PROGRAMMER)-[:Raises?]->(i)")).collect()
    via_edsl = table(
        g, N(labels=["PROGRAMMER"])
        >> E("Raises", direction="r", optional=True) >> N()).collect()
    assert sorted(map(tuple, via_str)) == sorted(map(tuple, via_edsl))
    assert any(r["n1"] is None for r in via_str)  # programmer 1


def test_several_optional_motif_raises():
    with pytest.raises(ValueError, match="several \\+ optional"):
        parse_motif("(a)-[:N*1..3?]->(b)")


def test_named_bindings_from_motif(spark):
    g = f2_issue_tracker(spark)
    df = table(g, parse_motif("(p=0)-[r:Raises]->(i:ISSUE)"), named=True)
    assert set(df.columns) == {"p", "r_label", "r_seq", "i"}
    rows = {(x["p"], x["i"]) for x in df.collect()}
    assert rows == {(0, 3), (0, 4), (0, 5), (0, 6)}
    # unnamed positions keep their positional columns
    df2 = table(g, parse_motif("(p=0)-[:Raises]->(i)"), named=True)
    assert "e0_label" in df2.columns and "p" in df2.columns


def test_named_bindings_duplicate_raises(spark):
    g = f2_issue_tracker(spark)
    with pytest.raises(ValueError, match="duplicate binding names"):
        table(g, parse_motif("(x=0)-[:Raises]->(x)"), named=True)
