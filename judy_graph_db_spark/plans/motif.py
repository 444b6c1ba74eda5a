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

_NODE_RE = re.compile(r"\(\s*([A-Za-z_][A-Za-z_0-9]*)?\s*(:[^)=]+|=[^)]+)?\s*\)")
_EDGE_BODY_RE = re.compile(
    r"\[\s*([A-Za-z_][A-Za-z_0-9]*)?\s*([:~][^\]*?]+)?\s*(\*[^\]?]*)?"
    r"\s*(\?)?\s*\]"
)


def _parse_node(name: str | None, body: str | None) -> N:
    if body is None:
        return N(name=name)
    if body.startswith(":"):
        labels = [t.strip() for t in body[1:].split("|") if t.strip()]
        return N(labels=labels, name=name)
    ids = [int(t) for t in body[1:].split(",") if t.strip()]
    return N(ids=ids, name=name)


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
    name, body, star, opt = m.groups()
    attr = orth = None
    if body:
        labels = [t.strip() for t in body[1:].split("|") if t.strip()]
        if body.startswith(":"):
            attr = labels
        else:  # '~' — orthogonal multi-label overlay (SURVEY.md §1.6)
            orth = labels
    several = _parse_several(star) if star else None
    return E(attr=attr, orth=orth, several=several, direction=direction,
             name=name, optional=opt is not None)


def parse_motif(motif: str) -> Pattern:
    """Parse a motif string into a :class:`Pattern` (see module docstring
    for the grammar). Raises ``ValueError`` on malformed input."""
    s = motif.strip()
    specs: list = []
    pos = 0
    expect_node = True
    while pos < len(s):
        if expect_node:
            m = _NODE_RE.match(s, pos)
            if not m:
                raise ValueError(f"expected a node at {s[pos:]!r}")
            specs.append(_parse_node(m.group(1), m.group(2)))
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
    return Pattern(specs)


_POSITIONAL_RE = re.compile(r"^(n\d+|e\d+_(label|seq|depth))$")


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


def match_motif(g, motif: str, quick: bool = True,
                cypher_nulls: bool = False) -> DataFrame:
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
    ``cypher_nulls`` is passed through to every segment.

    Segments join in any order — each round picks the next segment
    sharing a variable with what's already matched, so
    ``"(a)-->(b), (c)-->(d), (b)-->(c)"`` connects even though its
    middle segment is disjoint from the first. Two deliberate errors:
    a pattern whose segments do NOT all connect raises (an implicit
    cross product — the same never-at-corpus-scale rule as negation to
    an unbound node, see ``pattern.py``); an edge variable repeated
    across segments raises (parallel edges make "the same edge"
    ambiguous, as within one segment).

    Scale shape: one hash join per additional segment, keyed on the
    shared variables' ids; inside each segment the usual chain
    compilation applies (label/id filters at the scans, Catalyst join
    ordering). Nothing here adds state beyond the segments' bindings.
    """
    from judy_graph_db_spark.plans.compiler import table

    parts = [parse_motif(seg) for seg in _split_top_level(motif)]
    if len(parts) == 1:
        return table(g, parts[0], quick=quick, named=True,
                     cypher_nulls=cypher_nulls)
    pending = []
    for k, pat in enumerate(parts):
        d = table(g, pat, quick=quick, named=True,
                  cypher_nulls=cypher_nulls)
        named = {c for c in d.columns if not _POSITIONAL_RE.match(c)}
        d = d.select([F.col(c).alias(c if c in named else f"p{k}_{c}")
                      for c in d.columns])
        pending.append((d, named))
    out, out_named = pending.pop(0)
    while pending:
        i = next((j for j, (_, named) in enumerate(pending)
                  if named & out_named), None)
        if i is None:
            raise ValueError(
                "pattern segments do not all connect through shared "
                "variables — an implicit cross product; join your "
                "patterns through a common variable")
        d, named = pending.pop(i)
        shared = sorted(named & out_named)
        edge_clash = [c for c in shared
                      if c.endswith(("_label", "_seq", "_depth"))]
        if edge_clash:
            raise ValueError(
                f"edge variables repeated across segments: {edge_clash} "
                "— edge names must be unique in a MATCH")
        out = out.join(d, on=shared, how="inner")
        out_named |= named
    return out
