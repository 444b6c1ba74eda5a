"""Pattern EDSL — the Cypher-like surface (SURVEY.md §2.5).

The reference builds typed patterns of alternating node/edge specifiers with
combinators ``--| |-- <--| |--> ~~ --> <--`` (``Cypher.hs:62-144``). Here a
pattern is a plain Python list of alternating :class:`N` / :class:`E` specs,
chained with ``>>`` (alternation is validated at chain time, the analog of
the reference's type-level enforcement).

Node specifiers (``Cypher.hs:232-244,337-346``):
    ``N()``                  — anyNode
    ``N(labels=["A","B"])``  — nodes in label classes
    ``N(ids=[1,2,3])``       — explicit nodes (nodes32)
    ``N(where=...)``         — extra Column predicate over the node id

Edge specifiers (``Cypher.hs:212-224,252-274``):
    ``E("L")`` / ``E(attr=["L1","L2"])`` — labeled, several attrs = union
    ``E(orth=["A","B"])``     — orthogonal multi-labels; matches edges whose
                               ``labels`` array overlaps (the reference
                               expands 2ⁿ-1 bit combinations, ``genAttrs``
                               ``Cypher.hs:288-316``; arrays_overlap replaces
                               the expansion, SURVEY.md §1.6)
    ``E(..., direction='r'|'l'|None)`` — ``|-->`` / ``<--|`` / undirected
    ``E(..., where=fn)``      — per-edge predicate (``where_``,
                               ``Cypher.hs:269-270``); fn(cols) -> Column,
                               cols is a dict of the edge's columns
    ``E(..., several=(lo,hi))`` — variable-length path, Neo4j ``[*lo..hi]``
                               (``Cypher.hs:127-136,273-274``); hi=None = ``***``
    ``E(..., optional=True)`` — OPTIONAL MATCH semantics for this hop and
                               everything after it: bindings that cannot
                               extend keep their prefix with NULL edge/node
                               columns (relationally: a LEFT join, with the
                               hop's node/edge filters applied INSIDE the
                               optional side, exactly Cypher's OPTIONAL
                               MATCH scoping). The reference has no
                               optional patterns (parity-plus); once a hop
                               is optional every later hop must be too —
                               the compiler raises otherwise, because an
                               inner join above a NULL frontier silently
                               drops the kept rows.

Negation (``WHERE NOT (a)-[:X]->(b)``) is NOT an edge flag: a negated hop
to an UNBOUND node is a cross product (every non-neighbor). It is the
post-filter :func:`judy_graph_db_spark.plans.compiler.exclude_edges` /
``table(..., not_edges=[(i, E(...), j)])`` between two bound positions —
an anti-join, the only scale-safe relational form.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence


@dataclass
class N:
    """Node specifier."""

    labels: Optional[Sequence[str]] = None
    ids: Optional[Sequence[int]] = None
    where: Optional[Callable] = None  # fn(id_column) -> Column
    name: Optional[str] = None

    def __rshift__(self, other):
        if isinstance(other, E):
            return Pattern([self, other])
        if isinstance(other, N):  # n >> m : unlabeled undirected edge (~~)
            return Pattern([self, E(), other])
        raise TypeError(f"cannot chain N >> {type(other).__name__}")

    def is_any(self) -> bool:
        return self.labels is None and self.ids is None and self.where is None

    def complexity(self) -> int:
        """The reference's 3-bucket cost model (``compl``, ``Cypher.hs:575-583``):
        explicit nodes < labels < all nodes."""
        if self.ids is not None:
            return 0
        if self.labels is not None:
            return len(self.labels)
        return 100000


@dataclass
class E:
    """Edge specifier."""

    attr: Optional[Sequence[str] | str] = None
    orth: Optional[Sequence[str]] = None
    where: Optional[Callable] = None
    several: Optional[tuple] = None  # (lo, hi); hi=None → unbounded (***)
    direction: Optional[str] = None  # 'r' (|-->), 'l' (<--|), None (undirected)
    name: Optional[str] = None
    optional: bool = False  # OPTIONAL MATCH hop (left join)

    def __post_init__(self):
        if isinstance(self.attr, str):
            self.attr = [self.attr]
        if self.direction not in (None, "r", "l"):
            raise ValueError("direction must be 'r', 'l', or None")
        if self.several is not None:
            lo, hi = self.several
            if lo < 0 or (hi is not None and hi < lo):
                raise ValueError(f"bad several bounds {self.several}")
            if self.optional:
                raise ValueError(
                    "several + optional is unsupported: an optional "
                    "variable-length hop is ambiguous (which depth is "
                    "'absent'?) — make the whole pattern optional instead")

    def right(self) -> "E":
        self.direction = "r"
        return self

    def left(self) -> "E":
        self.direction = "l"
        return self

    def __rshift__(self, other):
        if isinstance(other, N):
            return Pattern([self, other])
        raise TypeError(f"cannot chain E >> {type(other).__name__}")

    def flipped(self) -> "E":
        d = {"r": "l", "l": "r", None: None}[self.direction]
        return E(attr=self.attr, orth=self.orth, where=self.where,
                 several=self.several, direction=d, name=self.name,
                 optional=self.optional)


class Pattern:
    """Alternating [N, E, N, E, N, ...] chain."""

    def __init__(self, specs: list):
        self.specs = specs
        self._validate()

    def _validate(self):
        for i, s in enumerate(self.specs):
            want = N if i % 2 == 0 else E
            if not isinstance(s, want):
                raise TypeError(
                    f"pattern position {i} must be {want.__name__}, got {type(s).__name__}"
                )

    def __rshift__(self, other):
        if isinstance(other, (N, E)):
            if isinstance(other, N) and self.specs and isinstance(self.specs[-1], N):
                # n >> m sugar: implicit unlabeled undirected edge (~~, Cypher.hs:393-414)
                return Pattern(self.specs + [E(), other])
            return Pattern(self.specs + [other])
        if isinstance(other, Pattern):
            return Pattern(self.specs + other.specs)
        raise TypeError(f"cannot chain Pattern >> {type(other).__name__}")

    @property
    def node_specs(self) -> list:
        return self.specs[0::2]

    @property
    def edge_specs(self) -> list:
        return self.specs[1::2]

    def is_complete(self) -> bool:
        return len(self.specs) % 2 == 1 and len(self.specs) >= 1

    def reversed(self) -> "Pattern":
        """Flip the pattern end-for-end (edge directions flip too) — used by
        the cost strategy to start from the cheaper end (``useLeft``,
        ``Cypher.hs:777-782``)."""
        out = []
        for s in reversed(self.specs):
            out.append(s.flipped() if isinstance(s, E) else s)
        return Pattern(out)


# ---------------------------------------------------------------- sugar
# vararg constructors mirroring the reference's `node`/`edge` (Cypher.hs:212-244)

def node(*, labels: Sequence[str] | None = None, ids: Sequence[int] | None = None,
         where=None, name: str | None = None) -> N:
    return N(labels=labels, ids=ids, where=where, name=name)


def edge(attr: Sequence[str] | str | None = None, *, orth=None, where=None,
         several=None, direction=None, name=None) -> E:
    return E(attr=attr, orth=orth, where=where, several=several,
             direction=direction, name=name)


def labels(ls: Sequence[str]) -> N:
    """``labels [L1,L2]`` (``Cypher.hs:341-342``)."""
    return N(labels=list(ls))


def nodes32(ids: Sequence[int]) -> N:
    """``nodes32 [..]`` (``Cypher.hs:345-346``)."""
    return N(ids=[int(i) for i in ids])


any_node = N()
