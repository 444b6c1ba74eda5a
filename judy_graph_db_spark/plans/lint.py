"""Physical-plan linter: the repo's 100 TB plan-shape rules as a
reusable checker instead of ad-hoc string asserts.

Every round of this engine's development has involved the same audit:
read ``df.explain()`` output and hunt for the four shapes that are
correct on a laptop and catastrophic on a 1000-executor cluster —

1. **unpartitioned window** — ``Window.orderBy(...)`` with no
   ``partitionBy`` forces an ``Exchange SinglePartition``: the entire
   input relation sorts through ONE task. Fine over an aggregate-sized
   relation, fatal over a corpus-sized one (this exact flaw was found
   and fixed in ``pq_adc_topk``, ``assign_dense_ids`` and
   ``misra_gries`` — see VERDICT r10).
2. **cartesian product** — a join that degenerated to
   ``CartesianProduct`` (non-equi condition over two big sides):
   |A|·|B| row pairs.
3. **non-scalar nested-loop join** — ``BroadcastNestedLoopJoin`` is
   legitimate when the build side is a one-row scalar aggregate or a
   k-row ``limit`` (the house scalar-``crossJoin`` idiom); anything
   bigger re-evaluates the build side per probe-side partition.
4. **row-at-a-time Python UDF** — ``BatchEvalPython`` pickles every row
   across the JVM/Python boundary one at a time; the Arrow paths
   (``ArrowEvalPython``, ``MapInPandas``, ``FlatMapGroupsInPandas``)
   are 10-100x faster and are the only Python surface this engine
   allows in hot paths.

``lint_plan`` parses the *executed* physical plan (what Catalyst
actually chose, AQE stub included) and returns findings;
``assert_scale_safe`` is the one-line test guard
(``tests/test_plans.py`` and ``tests/test_lint.py`` use it over the
engine's own headline operators).

Heuristics, stated honestly: the check is textual over
``queryExecution().executedPlan().toString()`` — it sees plan SHAPE,
not cardinalities. An ``Exchange SinglePartition`` under a scalar
aggregate (``HashAggregate(keys=[]``, partial-aggregated to one row per
partition first) or a ``CollectLimit``/``GlobalLimit`` is normal and
not flagged; one under a ``Sort``/``Window`` is the single-task funnel
and is. A window partitioned by a low-cardinality key can still skew —
no static linter sees that; this one catches the shapes that are
*always* wrong at corpus scale.

Reference parity: judy-graph-db has no analog (single-process, no
query planner) — this is engine tooling for the Spark-first design,
in the spirit of ``EXPLAIN``-driven review the PySpark guide
prescribes.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Sequence, Union

from pyspark.sql import DataFrame


class Finding(NamedTuple):
    """One lint hit: ``rule`` (kebab-case id), ``line`` (0-based index
    into the plan text), ``node`` (the offending plan node's text)."""

    rule: str
    line: int
    node: str


#: rules `lint_plan` can emit (the `allow=` vocabulary)
RULES = (
    "unpartitioned-window",
    "single-partition-exchange",
    "cartesian-product",
    "nested-loop-join",
    "python-row-udf",
)

_NODE_RE = re.compile(r"^([ :+\-]*)(\*\(\d+\) )?([A-Za-z].*)$")

#: ancestors that make an `Exchange SinglePartition` benign: a scalar
#: aggregate reduces to one row per partition BEFORE the exchange, and
#: limit collection moves k rows only
_SCALAR_PARENTS = ("HashAggregate(keys=[]", "ObjectHashAggregate(keys=[]",
                   "SortAggregate(key=[]", "CollectLimit", "GlobalLimit")

#: build-side markers that make a BroadcastNestedLoopJoin benign —
#: the broadcast relation is provably scalar- or k-sized, or is a
#: LocalTableScan (driver-literal data, e.g. the ranges table — it
#: already lives whole on the driver, so broadcasting it is free by
#: definition)
_SCALAR_BUILD = ("HashAggregate(keys=[]", "ObjectHashAggregate(keys=[]",
                 "SortAggregate(key=[]", "GlobalLimit", "LocalLimit",
                 "CollectLimit", "TakeOrderedAndProject", "LocalTableScan")


def _parse(plan: str) -> "list[tuple[int, str, int]]":
    """(depth, node_text, line_no) per plan node. Depth = width of the
    tree-art prefix (`+- `, `:- `, `:  +- `, ...); whole-stage-codegen
    star prefixes (`*(1) `) don't count toward depth."""
    nodes = []
    for i, ln in enumerate(plan.splitlines()):
        m = _NODE_RE.match(ln)
        if not m:
            continue
        nodes.append((len(m.group(1)), m.group(3), i))
    return nodes


def _ancestors(nodes, idx) -> "list[str]":
    """Node texts of the ancestor chain of nodes[idx], nearest first."""
    out = []
    d = nodes[idx][0]
    for j in range(idx - 1, -1, -1):
        if nodes[j][0] < d:
            out.append(nodes[j][1])
            d = nodes[j][0]
    return out


def _subtree(nodes, idx) -> "list[str]":
    """Node texts strictly under nodes[idx]."""
    d = nodes[idx][0]
    out = []
    for j in range(idx + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        out.append(nodes[j][1])
    return out


def lint_plan(df_or_plan: Union[DataFrame, str],
              allow: Sequence[str] = ()) -> List[Finding]:
    """Lint a DataFrame's executed physical plan (or a plan string) for
    the scale-fatal shapes in the module doc. Returns findings not in
    ``allow``; an empty list means the plan passes every rule."""
    if isinstance(df_or_plan, DataFrame):
        plan = df_or_plan._jdf.queryExecution().executedPlan().toString()
    else:
        plan = str(df_or_plan)
    nodes = _parse(plan)
    findings: List[Finding] = []

    def hit(rule, idx):
        if rule not in allow:
            findings.append(Finding(rule, nodes[idx][2], nodes[idx][1]))

    for i, (_d, name, _ln) in enumerate(nodes):
        if name.startswith("Exchange SinglePartition"):
            # benign when the exchange INPUT is already k-bounded — the
            # house "sort+limit, THEN rank the k survivors" pattern puts
            # a tiny single-partition exchange above a TakeOrdered/limit
            sub = _subtree(nodes, i)
            if any(s.startswith(_SCALAR_BUILD) for s in sub[:3]):
                continue
            anc = _ancestors(nodes, i)
            # benign if the NEAREST interesting ancestor is a scalar
            # aggregate / limit; a Sort or Window above means the whole
            # relation funnels through one task
            verdict = None
            for a in anc[:3]:
                if a.startswith(_SCALAR_PARENTS):
                    verdict = "ok"
                    break
                if a.startswith(("Sort ", "Sort[", "Window ", "Window[",
                                 "WindowGroupLimit")):
                    verdict = "window"
                    break
            if verdict == "window":
                hit("unpartitioned-window", i)
            elif verdict is None:
                hit("single-partition-exchange", i)
        elif name.startswith("CartesianProduct"):
            hit("cartesian-product", i)
        elif name.startswith("BroadcastNestedLoopJoin"):
            # judge only the BUILD side: the subtree under the join's
            # BroadcastExchange (a ReusedExchange build is benign — its
            # original exchange is linted where it first appears)
            d0 = nodes[i][0]
            kids = []  # the join's DIRECT children (min depth in subtree)
            for j in range(i + 1, len(nodes)):
                if nodes[j][0] <= d0:
                    break
                if not kids or nodes[j][0] < nodes[kids[0]][0]:
                    kids = [j]
                elif nodes[j][0] == nodes[kids[0]][0]:
                    kids.append(j)
            bj = next((j for j in kids if nodes[j][1].startswith(
                ("BroadcastExchange", "ReusedExchange"))), None)
            if bj is None:
                hit("nested-loop-join", i)  # can't identify a build side
            elif not nodes[bj][1].startswith("ReusedExchange") and not any(
                    s.startswith(_SCALAR_BUILD)
                    for s in _subtree(nodes, bj)):
                hit("nested-loop-join", i)
        elif name.startswith("BatchEvalPython"):
            hit("python-row-udf", i)
    return findings


def assert_scale_safe(df_or_plan: Union[DataFrame, str],
                      allow: Sequence[str] = ()) -> None:
    """Raise ``AssertionError`` listing every lint finding; the one-line
    plan-shape guard for tests (`allow=` whitelists rules a specific
    plan legitimately triggers — document why at the call site)."""
    fs = lint_plan(df_or_plan, allow)
    if fs:
        msg = "\n".join(f"  [{f.rule}] line {f.line}: {f.node[:120]}"
                        for f in fs)
        raise AssertionError(f"plan is not scale-safe:\n{msg}")
