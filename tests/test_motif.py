"""Cypher-style motif string parser → Pattern, and execution equivalence
with the combinator EDSL."""

import pytest
from pyspark.sql import functions as F

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


def test_cycle_motif_unifies_repeated_variable(spark):
    """Cypher's ``(a)-->(b)-->(a)`` cycle: a repeated node variable
    unifies its positions (equality filter + single output column)
    instead of raising. Hand-joined oracle: the positional table with an
    explicit n0==n3 filter. Fixture triangle: 3-References->5-Closes->4
    -References->3 (Main.hs:45-48)."""
    g = f2_issue_tracker(spark)
    pat = parse_motif(
        "(a)-[:References]->(b)-[:Closes]->(c)-[:References]->(a)")
    df = table(g, pat, named=True)
    assert set(df.columns) == {
        "a", "b", "c",
        "e0_label", "e0_seq", "e1_label", "e1_seq", "e2_label", "e2_seq"}
    rows = {(r["a"], r["b"], r["c"]) for r in df.collect()}
    assert rows == {(3, 5, 4)}
    # hand-joined oracle on the positional path
    pos = table(g, pat).filter(F.col("n0") == F.col("n3"))
    oracle = {(r["n0"], r["n1"], r["n2"]) for r in pos.collect()}
    assert rows == oracle
    # each occurrence's own constraints still apply: labeling the
    # repeated variable ISSUE at either end keeps the triangle; a
    # non-matching label on the second occurrence empties it
    ok = table(g, parse_motif(
        "(a:ISSUE)-[:References]->(b)-[:Closes]->(c)-[:References]->(a:ISSUE)"),
        named=True)
    assert {(r["a"], r["b"], r["c"]) for r in ok.collect()} == {(3, 5, 4)}
    none = table(g, parse_motif(
        "(a)-[:References]->(b)-[:Closes]->(c)-[:References]->(a:PROGRAMMER)"),
        named=True)
    assert none.count() == 0


def test_cycle_motif_two_hop_back_and_forth(spark):
    """2-cycle via a forward hop and a backward hop on the same label:
    (p)-[:Raises]->(i)<-[:Raises]-(p) — every Raises pair survives
    (each issue is raised only by programmer 0)."""
    g = f2_issue_tracker(spark)
    df = table(
        g, parse_motif("(p)-[:Raises]->(i)<-[:Raises]-(p)"), named=True)
    rows = {(r["p"], r["i"]) for r in df.collect()}
    assert rows == {(0, 3), (0, 4), (0, 5), (0, 6)}


def test_cycle_unification_null_semantics(spark):
    """Unification at an unmatched-optional (NULL) position: KEPT by
    default (the house NULL rule, matching exclude_edges), DROPPED with
    cypher_nulls=True (Cypher's NULL-propagating equality). Programmer 1
    raises nothing, so its optional hops bind NULL."""
    g = f2_issue_tracker(spark)
    pat = parse_motif("(p:PROGRAMMER)-[:Raises?]->(i)<-[:Raises?]-(p)")
    kept = {(r["p"], r["i"])
            for r in table(g, pat, named=True).collect()}
    assert (1, None) in kept
    assert kept == {(0, 3), (0, 4), (0, 5), (0, 6), (1, None)}
    cy = {(r["p"], r["i"])
          for r in table(g, pat, named=True, cypher_nulls=True).collect()}
    assert cy == {(0, 3), (0, 4), (0, 5), (0, 6)}


def test_match_motif_comma_triangle_equals_chain_cycle(spark):
    """Comma-separated segments joined on shared variables — Cypher's
    multi-pattern MATCH. The triangle written as three 1-hop segments
    equals the single-chain cycle form."""
    from judy_graph_db_spark import match_motif

    g = f2_issue_tracker(spark)
    via_comma = match_motif(
        g, "(a)-[:References]->(b), (b)-[:Closes]->(c), "
           "(c)-[:References]->(a)")
    rows = {(r["a"], r["b"], r["c"]) for r in via_comma.collect()}
    assert rows == {(3, 5, 4)}
    via_chain = table(g, parse_motif(
        "(a)-[:References]->(b)-[:Closes]->(c)-[:References]->(a)"),
        named=True)
    assert rows == {(r["a"], r["b"], r["c"]) for r in via_chain.collect()}


def test_match_motif_segments_connect_in_any_order(spark):
    """A segment disjoint from the FIRST still joins once a later
    segment bridges them (Cypher joins the whole pattern graph, not
    left-to-right)."""
    from judy_graph_db_spark import match_motif

    g = f2_issue_tracker(spark)
    got = match_motif(
        g, "(a:PROGRAMMER)-[:Raises]->(b), (c)-[:Closes]->(d), "
           "(b)-[:References]->(c)")
    rows = {(r["a"], r["b"], r["c"], r["d"]) for r in got.collect()}
    assert rows == {(0, 3, 5, 4)}


def test_match_motif_errors_and_passthrough(spark):
    """Disconnected patterns raise (implicit cross product); repeated
    edge variables across segments raise; a single segment is exactly
    table(named=True)."""
    from judy_graph_db_spark import match_motif

    g = f2_issue_tracker(spark)
    with pytest.raises(ValueError, match="do not all connect"):
        match_motif(g, "(a)-[:Raises]->(b), (c)-[:Closes]->(d)")
    with pytest.raises(ValueError, match="edge variables repeated"):
        match_motif(g, "(a)-[r:Raises]->(b), (b)-[r:References]->(c)")
    one = match_motif(g, "(p=0)-[r:Raises]->(i:ISSUE)")
    ref = table(g, parse_motif("(p=0)-[r:Raises]->(i:ISSUE)"), named=True)
    assert sorted(map(tuple, one.collect())) \
        == sorted(map(tuple, ref.collect()))
    # id-list commas are NOT segment separators
    ids = match_motif(g, "(=3,4)-[:References]->(x)")
    assert {(r["n0"], r["x"]) for r in ids.collect()} \
        == {(3, 5), (4, 3), (4, 6)}
    # cost-based strategy threads through each segment identically
    m = "(a)-[:References]->(b), (b)-[:Closes]->(c)"
    qt = {tuple(r) for r in match_motif(g, m).collect()}
    qf = {tuple(r) for r in match_motif(g, m, quick=False).collect()}
    assert qt == qf and len(qt) > 0


def test_named_bindings_duplicate_edge_raises(spark):
    """Repeated EDGE variables stay an error (parallel edges make 'the
    same edge twice' ambiguous; Cypher forbids it too), as do node names
    colliding with other positions' columns."""
    g = f2_issue_tracker(spark)
    with pytest.raises(ValueError, match="duplicate binding names"):
        table(g, parse_motif("(a)-[r:Raises]->(b)<-[r:Raises]-(c)"),
              named=True)
    with pytest.raises(ValueError, match="duplicate binding names"):
        table(g, parse_motif("(n1=0)-[:Raises]->()"), named=True)


# ------------------------------------------------- r14: inline WHERE strings

def _norm_plan(df):
    import re as _re
    return _re.sub(r"#\d+L?", "#", df._jdf.queryExecution().optimizedPlan().toString())


def test_motif_where_string_seq_filter(spark):
    """`{seq>=3}` compiles to the same predicate as E(where=...) —
    values and rows identical (Raises seqs: 3→1, 4→2, 5→3, 6→4)."""
    g = f2_issue_tracker(spark)
    via_str = table(g, parse_motif("(p=0)-[:Raises {seq>=3}]->(i)"))
    rows = {(r["n0"], r["n1"]) for r in via_str.collect()}
    assert rows == {(0, 5), (0, 6)}
    via_edsl = table(
        g, N(ids=[0]) >> E("Raises", direction="r",
                           where=lambda c: c["edge_seq"] >= 3) >> N())
    assert rows == {(r["n0"], r["n1"]) for r in via_edsl.collect()}


def test_motif_where_string_plan_identical(spark):
    """The parsed `{...}` predicate produces the IDENTICAL optimized plan
    to the combinator E(where=...) form (exprIds normalized away)."""
    g = f2_issue_tracker(spark)
    via_str = table(g, parse_motif("(p=0)-[:Raises {seq>=3}]->(i)"))
    via_edsl = table(
        g, N(ids=[0]) >> E("Raises", direction="r",
                           where=lambda c: c["edge_seq"] >= 3) >> N())
    assert _norm_plan(via_str) == _norm_plan(via_edsl)


def test_motif_where_string_label_and_multi_terms(spark):
    """String literals + comma = AND; `label='Raises'` on an unlabeled
    edge restricts exactly like E(attr=['Raises'])'s filter would."""
    g = f2_issue_tracker(spark)
    df = table(g, parse_motif("(p=0)-[{label='Raises', seq<=2}]->(i)"))
    assert {(r["n0"], r["n1"]) for r in df.collect()} == {(0, 3), (0, 4)}


def test_motif_node_where_string(spark):
    """Node predicate `(i {id>=5})` restricts the bound endpoint."""
    g = f2_issue_tracker(spark)
    df = table(g, parse_motif("(p=0)-[:Raises]->(i {id>=5})"))
    assert {(r["n0"], r["n1"]) for r in df.collect()} == {(0, 5), (0, 6)}
    # combined with a label
    df2 = table(g, parse_motif("(p=0)-[:Raises]->(i:ISSUE {id>=5})"))
    assert {(r["n0"], r["n1"]) for r in df2.collect()} == {(0, 5), (0, 6)}


def test_motif_where_kwarg_and_compose(spark):
    """where={'var': fn} binds arbitrary callables by variable name;
    a var with BOTH an inline predicate and a kwarg entry gets the AND;
    unbound names raise."""
    g = f2_issue_tracker(spark)
    pat = parse_motif("(p=0)-[r:Raises]->(i)",
                      where={"r": lambda c: c["edge_seq"] >= 3})
    assert {(r["n0"], r["n2"]) if "n2" in r else (r["n0"], r["n1"])
            for r in table(g, pat).collect()} == {(0, 5), (0, 6)}
    both = parse_motif("(p=0)-[r:Raises {seq>=2}]->(i)",
                       where={"r": lambda c: c["edge_seq"] <= 3})
    assert {(r["n0"], r["n1"]) for r in table(g, both).collect()} \
        == {(0, 4), (0, 5)}
    with pytest.raises(ValueError, match="not bound"):
        parse_motif("(a)-->(b)", where={"zz": lambda c: c})
    from judy_graph_db_spark import match_motif
    mm = match_motif(g, "(p=0)-[r:Raises]->(i), (i)-[:Closes]->(x)",
                     where={"r": lambda c: c["edge_seq"] >= 3})
    assert {(r["i"], r["x"]) for r in mm.collect()} == {(5, 4)}


def test_motif_bad_where_strings():
    for bad in ["(a)-[{seq>>3}]->(b)", "(a)-[{bogus>=1}]->(b)",
                "(a {seq>=1})-->(b)"]:
        with pytest.raises(ValueError):
            parse_motif(bad)


# --------------------------------------- r14: match_motif semantics pins

def test_match_motif_node_var_with_edge_like_suffix(spark):
    """A NODE variable whose name merely looks like an edge column
    (`x_seq`) shared across segments joins normally — edge variables are
    detected from the parsed specs, not column-name suffixes."""
    from judy_graph_db_spark import match_motif

    g = f2_issue_tracker(spark)
    df = match_motif(
        g, "(a:PROGRAMMER)-[:Raises]->(x_seq), (x_seq)-[:References]->(c)")
    rows = {(r["a"], r["x_seq"], r["c"]) for r in df.collect()}
    assert rows == {(0, 3, 5), (0, 4, 3), (0, 4, 6)}


def test_match_motif_cross_segment_null_drops(spark):
    """Cross-segment joins are equi-joins: a shared variable bound NULL
    by an unmatched optional hop NEVER matches the next segment — the
    row is DROPPED regardless of cypher_nulls (each comma pattern is a
    separate MATCH, Cypher's semantics too). Programmer 1 raises
    nothing, so its optional `i` is NULL and its row disappears."""
    from judy_graph_db_spark import match_motif

    g = f2_issue_tracker(spark)
    m = "(p:PROGRAMMER)-[:Raises?]->(i), (i)-[:References?]->(x)"
    for nulls in (False, True):
        rows = {(r["p"], r["i"], r["x"])
                for r in match_motif(g, m, cypher_nulls=nulls).collect()}
        assert all(p != 1 for p, _, _ in rows)
        assert (0, 3, 5) in rows and (0, 4, 3) in rows
        # the SECOND segment's optional tail still keeps its NULLs
        assert (0, 5, None) in rows and (0, 6, None) in rows


def test_match_motif_cost_seeded_segment_order(spark):
    """quick=False seeds the segment join order from the globally
    cheapest endpoint (explicit ids cost len(ids), beating any label or
    anyNode seed) and attaches the cheapest connected segment each
    round; quick=True keeps written order. Results are identical."""
    from judy_graph_db_spark import match_motif
    from judy_graph_db_spark.plans.motif import _segment_order, _split_top_level

    g = f2_issue_tracker(spark)
    m = "(a)-[:Raises]->(b), (b)-[:References]->(c), (c=5)-[:Closes]->(d)"
    parts = [parse_motif(seg) for seg in _split_top_level(m)]
    seg_nodes = [{s.name for s in p.node_specs if s.name} for p in parts]
    assert _segment_order(g, parts, seg_nodes, quick=True) == [0, 1, 2]
    order = _segment_order(g, parts, seg_nodes, quick=False)
    assert order[0] == 2  # (c=5) is the cheapest seed
    qt = {tuple(r) for r in match_motif(g, m).collect()}
    qf = {tuple(r) for r in match_motif(g, m, quick=False).collect()}
    # same rows modulo column order (cost order may emit columns differently)
    cols_t = match_motif(g, m).columns
    cols_f = match_motif(g, m, quick=False).columns
    assert sorted(cols_t) == sorted(cols_f)
    dt = {tuple(r[c] for c in sorted(cols_t))
          for r in match_motif(g, m).collect()}
    df_ = {tuple(r[c] for c in sorted(cols_f))
           for r in match_motif(g, m, quick=False).collect()}
    assert dt == df_ and len(dt) > 0


# ------------------------------- r14: per-position NULL-tolerant unification

def test_cycle_closing_before_optional_folds_to_equi_join(spark):
    """A cycle whose unified positions both sit BEFORE the first optional
    hop can never be NULL, so the unification stays a plain equality
    (foldable into the closing join's hash keys) — no OR-isnull residual
    — and default semantics equal cypher_nulls=True."""
    g = f2_issue_tracker(spark)
    pat = parse_motif("(p)-[:Raises]->(i)<-[:Raises]-(p)-[:Closes?]->(x)")
    dflt = table(g, pat, named=True)
    rows = {(r["p"], r["i"], r["x"]) for r in dflt.collect()}
    assert rows == {(0, 3, 3), (0, 4, 3), (0, 5, 3), (0, 6, 3)}
    cy = {(r["p"], r["i"], r["x"])
          for r in table(g, pat, named=True, cypher_nulls=True).collect()}
    assert rows == cy
    plan = dflt._jdf.queryExecution().optimizedPlan().toString()
    assert "isnull(n0" not in plan and "isnull(n2" not in plan
