"""Canonical graph schema.

The reference packs everything into 32-bit words (nodes: Node32,
``FastAccess.hs:129``; edges: 64-bit judy keys src‖attr → dst,
``FastAccess.hs:19-25``). We replace bit-packing with typed columns — a strict
superset (see SURVEY.md §1.3):

    nodes(id, label, props)
    edges(src, dst, label, labels, is_back, edge_seq)
    ranges(range_start, range_len, label, valid_edge_labels)

``edge_seq`` is the 1-based per-(src,label) insertion index that replaces the
reference's parallel-edge counter (``FastAccess.hs:293-315``); ``is_back``
replaces the back-bit ``edgeBackward=0x80000000`` (``FastAccess.hs:149-150``);
``labels`` (array) replaces the summed orthogonal attr bits
(``FastAccess.hs:271-278``).
"""

from __future__ import annotations

from pyspark.sql import types as T

NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("is_back", T.BooleanType(), False),
        T.StructField("edge_seq", T.LongType(), False),
    ]
)

RANGES_SCHEMA = T.StructType(
    [
        T.StructField("range_start", T.LongType(), False),
        T.StructField("range_len", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("valid_edge_labels", T.ArrayType(T.StringType()), True),
    ]
)

EDGE_COLS = [f.name for f in EDGES_SCHEMA.fields]
NODE_COLS = [f.name for f in NODES_SCHEMA.fields]
