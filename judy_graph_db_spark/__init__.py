"""judy_graph_db_spark — a PySpark-native property-graph analytics engine.

Brand-new implementation of the query and data-processing capabilities of
tkvogt/judy-graph-db (reference: /root/reference, Haskell, BSD3), re-expressed
Spark-first: the graph is a pair of DataFrames (``nodes``, ``edges``) plus a
small broadcast ``ranges`` table; queries compile to Catalyst-optimizable
join chains; variable-length paths run as an iterative frontier loop.

Nothing here is a port — see SURVEY.md for the semantic mapping.
"""

from judy_graph_db_spark.graph import Graph, Ranges
from judy_graph_db_spark.plans.motif import match_motif, parse_motif
from judy_graph_db_spark.plans.pattern import N, E, node, edge, any_node, labels, nodes32
from judy_graph_db_spark.plans.compiler import (
    table,
    exclude_edges,
    temp,
    flat_table,
    nested_layers,
    appl,
    shortest_paths,
    create_mem,
    graph_query,
    graph_create,
    GraphDiff,
)

__all__ = [
    "Graph",
    "Ranges",
    "N",
    "E",
    "node",
    "edge",
    "any_node",
    "labels",
    "nodes32",
    "match_motif",
    "parse_motif",
    "table",
    "exclude_edges",
    "temp",
    "flat_table",
    "nested_layers",
    "appl",
    "shortest_paths",
    "create_mem",
    "graph_query",
    "graph_create",
    "GraphDiff",
]

__version__ = "0.1.0"
