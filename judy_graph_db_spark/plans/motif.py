"""Cypher-style motif strings → :class:`Pattern`.

The reference's query language is a typed Haskell EDSL (``README.md:133-137``);
this engine's primary surface is the equivalent Python combinators
(``N(...) >> E(...) >> N(...)``). ``parse_motif`` adds the string form most
graph users already know (Neo4j MATCH / GraphFrames ``find`` syntax), mapped
1:1 onto the same specifiers — a parser front end only, nothing new in
execution:

    (a)                         any node                 N()
    (a:CUSTOMER)                label                    N(labels=["CUSTOMER"])
    (a:REGION|NATION)           label alternatives       N(labels=[...])
    (a=42) / (=42,43)           explicit node ids        N(ids=[42, 43])
    -[:PLACED]->                directed labeled edge    E("PLACED", direction="r")
    <-[:PLACED]-                reverse direction        E("PLACED", direction="l")
    -[:A|B]-                    undirected, label union  E(attr=["A","B"])
    -[o~BULK]->                 orth multi-label match   E(orth=["BULK"], ...)
    -[:NEXT*1..3]->             variable length          E(..., several=(1, 3))
    -[:NEXT*]->                 unbounded (***)          E(..., several=(1, None))
    -[:PLACED?]-> / -[?]->      optional hop (left join) E(..., optional=True)
    --> / <-- / --              unlabeled edges          E(direction=...)
    -[:PLACED {seq>=3}]->       inline WHERE predicate   E(..., where=fn)
    (a {id>=5})                 node WHERE predicate     N(where=fn)

Inline predicates (the reference's ``where_``, ``Cypher.hs:269-270``) are
comma-separated (AND) comparisons ``field op literal``; edge fields are
``seq`` (edge_seq), ``label``, ``src``, ``dst``; the node field is ``id``.
Literals: ints, floats, ``'quoted strings'``. They compile to exactly the
Column closure ``E(where=...)`` / ``N(where=...)`` would carry, so the
physical plan is identical to the combinator form. Arbitrary predicates
stay available as ``parse_motif(m, where={"e": fn})`` keyed by variable
name (both compose by AND if a variable has both).

Node/edge variable names (the ``a`` in ``(a:...)`` / ``[e:...]``) are kept
on the specs' ``name`` field for readability; binding columns stay
positional (``n0, e0_…, n1, …``) as everywhere else in the engine. Under
``table(..., named=True)`` a REPEATED node variable closes a cycle —
``(a)-->(b)-->(a)`` unifies the two ``a`` positions into one output
column via an equality the optimizer folds into the closing join's keys
(see ``compiler._apply_names``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from judy_graph_db_spark.plans.pattern import E, N, Pattern

_NODE_RE = re.compile(
    r"\(\s*([A-Za-z_][A-Za-z_0-9]*)?\s*(:[^){=]+|=[^){]+)?"
    r"\s*(\{[^}]*\})?\s*\)")
_EDGE_BODY_RE = re.compile(
    r"\[\s*([A-Za-z_][A-Za-z_0-9]*)?\s*([:~][^\]*?{]+)?\s*(\*[^\]?{]*)?"
    r"\s*(\{[^}]*\})?\s*(\?)?\s*\]"
)

# ---------------------------------------------------- inline WHERE predicates

_CMP_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*(==|!=|>=|<=|=|>|<)\s*(.+?)\s*$")
_EDGE_FIELDS = {"seq": "edge_seq", "label": "label", "src": "src", "dst": "dst"}


def _parse_literal(tok: str):
    t = tok.strip()
    if len(t) >= 2 and t[0] == t[-1] and t[0] in ("'", '"'):
        return t[1:-1]
    try:
        return int(t)
    except ValueError:
        return float(t)


def _split_pred_terms(body: str) -> "list[str]":
    """Split ``{...}`` bodies on commas outside quotes."""
    terms: list = []
    cur: list = []
    quote = None
    for ch in body:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == ",":
            terms.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    terms.append("".join(cur))
    return [t for t in (s.strip() for s in terms) if t]


def _compile_pred(body: str, fields: "dict[str, str]", kind: str):
    """``{seq>=3, label='X'}`` → a where-closure carrying the SAME Column
    expression the combinator surface's ``where=fn`` would build — the
    parser is a front end only; predicate pushdown and plan shape are
    identical (pinned by ``test_motif_where_string_plan_identical``)."""
    terms = []
    for t in _split_pred_terms(body.strip()[1:-1]):
        m = _CMP_RE.match(t)
        if not m:
            raise ValueError(f"cannot parse predicate term {t!r}")
        field, op, lit_s = m.groups()
        if field not in fields:
            raise ValueError(
                f"unknown {kind} predicate field {field!r} "
                f"(allowed: {sorted(fields)})")
        terms.append((fields[field], op, _parse_literal(lit_s)))
    if not terms:
        return None

    def _apply(col, op, lit):
        if op in ("=", "=="):
            return col == lit
        if op == "!=":
            return col != lit
        if op == ">=":
            return col >= lit
        if op == "<=":
            return col <= lit
        if op == ">":
            return col > lit
        return col < lit

    if kind == "node":
        def fn(col, _terms=terms):
            pred = None
            for _, op, lit in _terms:
                p = _apply(col, op, lit)
                pred = p if pred is None else (pred & p)
            return pred
    else:
        def fn(cols, _terms=terms):
            pred = None
            for key, op, lit in _terms:
                p = _apply(cols[key], op, lit)
                pred = p if pred is None else (pred & p)
            return pred
    return fn


def _parse_node(name: str | None, body: str | None,
                pred: str | None = None) -> N:
    where = _compile_pred(pred, {"id": "id"}, "node") if pred else None
    if body is None:
        return N(name=name, where=where)
    if body.startswith(":"):
        labels = [t.strip() for t in body[1:].split("|") if t.strip()]
        return N(labels=labels, name=name, where=where)
    ids = [int(t) for t in body[1:].split(",") if t.strip()]
    return N(ids=ids, name=name, where=where)


def _parse_several(spec: str) -> tuple:
    """``*``, ``*3``, ``*1..3``, ``*2..`` → (lo, hi)."""
    body = spec[1:].strip()
    if not body:
        return (1, None)
    if ".." in body:
        lo_s, hi_s = body.split("..", 1)
        lo = int(lo_s) if lo_s.strip() else 1
        hi = int(hi_s) if hi_s.strip() else None
        return (lo, hi)
    n = int(body)
    return (n, n)


def _parse_edge(segment: str) -> E:
    """``segment`` is the text between two node groups, e.g. ``-[:L]->``."""
    s = segment.strip()
    if not s:
        raise ValueError("adjacent node groups with no edge between them")
    if s in ("--", "~~"):
        return E()
    if s == "-->":
        return E(direction="r")
    if s == "<--":
        return E(direction="l")
    direction = None
    if s.endswith("->"):
        direction = "r"
        s = s[:-2]
    if s.startswith("<-"):
        if direction == "r":
            raise ValueError(f"edge {segment!r} points both ways")
        direction = "l"
        s = s[2:]
    s = s.strip("- \t")
    if not s:
        return E(direction=direction)
    m = _EDGE_BODY_RE.fullmatch(s)
    if not m:
        raise ValueError(f"cannot parse edge segment {segment!r}")
    name, body, star, pred, opt = m.groups()
    attr = orth = None
    if body:
        labels = [t.strip() for t in body[1:].split("|") if t.strip()]
        if body.startswith(":"):
            attr = labels
        else:  # '~' — orthogonal multi-label overlay (SURVEY.md §1.6)
            orth = labels
    several = _parse_several(star) if star else None
    where = _compile_pred(pred, _EDGE_FIELDS, "edge") if pred else None
    return E(attr=attr, orth=orth, several=several, direction=direction,
             name=name, optional=opt is not None, where=where)


def parse_motif(motif: str, where=None) -> Pattern:
    """Parse a motif string into a :class:`Pattern` (see module docstring
    for the grammar). Raises ``ValueError`` on malformed input.

    ``where`` maps variable names to arbitrary predicate callables for
    anything the inline ``{...}`` grammar can't express — a node name's
    callable becomes ``N(where=fn)`` (fn(id_col) → Column), an edge
    name's becomes ``E(where=fn)`` (fn(cols_dict) → Column), exactly the
    combinator surface (``where_``, ``Cypher.hs:269-270``). A name in
    ``where`` that appears nowhere in the motif raises; a variable with
    BOTH an inline predicate and a ``where`` entry gets their AND."""
    s = motif.strip()
    specs: list = []
    pos = 0
    expect_node = True
    while pos < len(s):
        if expect_node:
            m = _NODE_RE.match(s, pos)
            if not m:
                raise ValueError(f"expected a node at {s[pos:]!r}")
            specs.append(_parse_node(m.group(1), m.group(2), m.group(3)))
            pos = m.end()
        else:
            nxt = s.find("(", pos)
            if nxt < 0:
                raise ValueError(f"dangling edge at {s[pos:]!r}")
            specs.append(_parse_edge(s[pos:nxt]))
            pos = nxt
        expect_node = not expect_node
    if not specs or isinstance(specs[-1], E):
        raise ValueError("motif must start and end with a node group")
    pattern = Pattern(specs)
    if where:
        _apply_where_kwarg([pattern], where)
    return pattern


def _split_top_level(s: str) -> "list[str]":
    """Split on commas outside ``()``/``[]`` — segment separators, not
    the commas inside id lists like ``(=42,43)``."""
    parts: list = []
    cur: list = []
    depth = 0
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = [p.strip() for p in parts if p.strip()]
    if not out:
        raise ValueError("empty motif")
    return out


def _apply_where_kwarg(parts, where) -> None:
    """Bind ``where`` callables onto the named specs across ALL segments
    (a name may appear in any segment); unbound names raise."""
    bound = set()
    for pat in parts:
        for sp in pat.specs:
            if sp.name and sp.name in where:
                fn = where[sp.name]
                if sp.where is None:
                    sp.where = fn
                else:
                    prev = sp.where
                    sp.where = (lambda x, _p=prev, _f=fn: _p(x) & _f(x))
                bound.add(sp.name)
    missing = set(where) - bound
    if missing:
        raise ValueError(
            f"where= names not bound in the motif: {sorted(missing)}")


def _segment_order(g, parts, seg_nodes, quick: bool) -> "list[int]":
    """Join order over segments. ``quick=True``: as written (first
    segment seeds; each round attaches the first pending segment sharing
    a variable). ``quick=False``: the segment-level analog of the
    chain cost strategy (``runOnE``/``minI``, ``Cypher.hs:717-785``) —
    seed from the segment whose cheapest endpoint cost
    (:func:`compiler._endpoint_cost`, real cached label statistics) is
    globally minimal, then each round attach the connected pending
    segment with the smallest cost, so the small frontier drives every
    probe side. Returns segment indices; raises if the segments don't
    all connect (implicit cross product)."""
    from judy_graph_db_spark.plans.compiler import _endpoint_cost

    k = len(parts)
    if quick:
        costs = [0] * k
        order = [0]
    else:
        costs = [min(_endpoint_cost(g, s) for s in pat.node_specs)
                 for pat in parts]
        order = [min(range(k), key=lambda j: (costs[j], j))]
    have = set(seg_nodes[order[0]])
    remaining = [j for j in range(k) if j != order[0]]
    while remaining:
        connected = [j for j in remaining if seg_nodes[j] & have]
        if not connected:
            raise ValueError(
                "pattern segments do not all connect through shared "
                "variables — an implicit cross product; join your "
                "patterns through a common variable")
        nxt = min(connected, key=lambda j: (costs[j], j))
        order.append(nxt)
        have |= seg_nodes[nxt]
        remaining.remove(nxt)
    return order


def match_motif(g, motif: str, quick: bool = True,
                cypher_nulls: bool = False, where=None) -> DataFrame:
    """Evaluate a full Cypher-style MATCH clause: one or more
    comma-separated motif patterns joined on their shared node
    variables — ``match_motif(g, "(a)-->(b), (b)-->(c)")`` is Cypher's
    ``MATCH (a)-->(b), (b)-->(c)``. Parity-plus: the reference's EDSL
    stops at single chains (``Cypher.hs:62-144``); with
    repeated-variable unification (``compiler._apply_names``) and this
    join, the MATCH pattern surface is complete — any pattern GRAPH
    (cycles, stars, multi-chains), not just paths.

    Each segment evaluates through :func:`~.compiler.table` with
    ``named=True`` (repeated variables *within* a segment already unify
    there); segments then inner-join on the node variables they share —
    id equality, exactly Cypher's semantics. Unnamed positional columns
    are prefixed ``p{k}_`` per segment so they never collide.
    ``cypher_nulls`` and ``where`` (see :func:`parse_motif`) apply
    across all segments.

    Segments may be written in any order — the join order connects them
    through shared variables, so ``"(a)-->(b), (c)-->(d), (b)-->(c)"``
    works even though its middle segment is disjoint from the first.
    ``quick=False`` additionally COST-SEEDS the order (the segment-level
    analog of the chain strategy, see :func:`_segment_order`): the
    cheapest segment joins first and each round attaches the cheapest
    connected one. Two deliberate errors: a pattern whose segments do
    NOT all connect raises (an implicit cross product — the same
    never-at-corpus-scale rule as negation to an unbound node, see
    ``pattern.py``); an edge variable repeated across segments raises
    (parallel edges make "the same edge" ambiguous, as within one
    segment). Edge/node variables are read from the parsed specs, so a
    node variable that merely LOOKS like an edge column (``x_seq``)
    joins normally.

    NULL semantics at segment boundaries: cross-segment joins are
    equi-joins, so a shared variable bound NULL by an unmatched
    ``optional`` hop NEVER matches the other segment — the row is
    DROPPED regardless of ``cypher_nulls``. This is deliberate and
    matches Cypher (each comma pattern is a separate MATCH; a NULL
    variable has no node to look up in the next pattern), but note it
    differs from the engine's NULL-keeps house rule that
    *within-segment* unification and ``exclude_edges`` follow
    (``compiler._apply_names``). Pinned by
    ``test_match_motif_cross_segment_null_drops``.

    Scale shape: one hash join per additional segment, keyed on the
    shared variables' ids; inside each segment the usual chain
    compilation applies (label/id filters at the scans, Catalyst join
    ordering). Nothing here adds state beyond the segments' bindings.
    """
    from judy_graph_db_spark.plans.compiler import table

    parts = [parse_motif(seg) for seg in _split_top_level(motif)]
    if where:
        _apply_where_kwarg(parts, where)
    if len(parts) == 1:
        return table(g, parts[0], quick=quick, named=True,
                     cypher_nulls=cypher_nulls)
    # variables come from the parsed specs, not column-name shapes
    seg_nodes = [{s.name for s in pat.node_specs if s.name}
                 for pat in parts]
    seg_edges = [{e.name for e in pat.edge_specs if e.name}
                 for pat in parts]
    for a in range(len(parts)):
        for b in range(a + 1, len(parts)):
            clash = seg_edges[a] & seg_edges[b]
            if clash:
                raise ValueError(
                    f"edge variables repeated across segments: "
                    f"{sorted(clash)} — edge names must be unique in a "
                    "MATCH")
    order = _segment_order(g, parts, seg_nodes, quick)
    compiled = {}
    for k in order:
        d = table(g, parts[k], quick=quick, named=True,
                  cypher_nulls=cypher_nulls)
        keep = seg_nodes[k] | {f"{e}_{suf}" for e in seg_edges[k]
                               for suf in ("label", "seq", "depth")}
        d = d.select([F.col(c).alias(c if c in keep else f"p{k}_{c}")
                      for c in d.columns])
        compiled[k] = d
    out = compiled[order[0]]
    out_named = set(seg_nodes[order[0]])
    for k in order[1:]:
        shared = sorted(seg_nodes[k] & out_named)
        out = out.join(compiled[k], on=shared, how="inner")
        out_named |= seg_nodes[k]
    return out
