"""Graph fixtures F1–F3 from FIXTURES.md (reference test/example graphs)."""

from judy_graph_db_spark.graph import Graph, Ranges

F1_RANGES = Ranges.of((0, 10, "TN", ("E0",)), (10, 10, "FN", ("E0",)), (20, 10, "AN", ()))


def f1_right(spark) -> Graph:
    """Directed edge 0→1 (test/Spec.hs rightEdge: fwd + back row)."""
    return Graph.from_lists(
        spark,
        nodes=[(0, "FN"), (1, "TN")],
        directed_edges=[(0, 1, "E0")],
        ranges=F1_RANGES,
    )


def f1_left(spark) -> Graph:
    """Directed edge 1→0 (test/Spec.hs leftEdge)."""
    return Graph.from_lists(
        spark,
        nodes=[(0, "FN"), (1, "TN")],
        directed_edges=[(1, 0, "E0")],
        ranges=F1_RANGES,
    )


F2_RANGES = Ranges.of(
    (0, 2, "PROGRAMMER", ("Raises", "Accepts", "Closes", "BelongtsTO")),
    (2, 1, "ORGANISATION", ()),
    (3, 4, "ISSUE", ("Closes", "References")),
    (7, 1, "PULL_REQUEST", ("Closes", "References")),
)


def f2_issue_tracker(spark) -> Graph:
    """app/Main.hs:33-59 issue-tracker graph."""
    return Graph.from_lists(
        spark,
        nodes=[
            (0, "PROGRAMMER"), (1, "PROGRAMMER"), (2, "ORGANISATION"),
            (3, "ISSUE"), (4, "ISSUE"), (5, "ISSUE"), (6, "ISSUE"),
            (7, "PULL_REQUEST"),
        ],
        directed_edges=[
            (0, 3, "Raises"), (0, 4, "Raises"), (0, 5, "Raises"), (0, 6, "Raises"),
            (3, 5, "References"), (4, 3, "References"), (4, 6, "References"),
            (5, 4, "Closes"), (0, 3, "Closes"), (1, 7, "Accepts"), (0, 2, "BelongtsTO"),
        ],
        ranges=F2_RANGES,
    )


F3_RANGES = Ranges.of(
    (0, 1, "PACKAGE", ("PartOf",)),
    (1, 3, "PACKAGEVER", ("PartOf", "NextVer")),
    (4, 7, "FUNCTION", ("NextVer",)),
)


def f3_package_graph(spark) -> Graph:
    """test/examples/SortNodes.hs:71-99 package-version graph."""
    nodes = [(0, "PACKAGE", {"name": "test"})]
    nodes += [(i, "PACKAGEVER", {"name": f"test-0.{i}"}) for i in (1, 2, 3)]
    nodes += [
        (4, "FUNCTION", {"type": "Int -> Bool", "name": "odd", "namespace": "MyPrelude"}),
        (5, "FUNCTION", {"name": "f5"}), (6, "FUNCTION", {"name": "f6"}),
        (7, "FUNCTION", {"name": "f7"}), (8, "FUNCTION", {"name": "f8"}),
        (9, "FUNCTION", {"name": "f9"}), (10, "FUNCTION", {"name": "f10"}),
    ]
    part_of = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 4), (2, 5), (3, 5), (2, 6)]
    next_ver = [(1, 2), (2, 3), (7, 8), (8, 9), (9, 10)]
    return Graph.from_lists(
        spark,
        nodes=nodes,
        directed_edges=[(a, b, "PartOf") for a, b in part_of]
        + [(a, b, "NextVer") for a, b in next_ver],
        ranges=F3_RANGES,
    )
