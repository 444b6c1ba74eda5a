"""gates_manifest() — the machine-readable audit map of the driver's 50
correctness rows (VERDICT r13 task 8): keys lock to queries(), op lists
lock to the live gate outputs (spot-checked at sf0.001), and every
COVERAGE.md gate/op reference must resolve to a live gate key or op tag."""

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em

MANIFEST = em.gates_manifest()
SF_DIR = "/root/testdata/sf0.001"


def test_manifest_keys_match_queries():
    assert set(MANIFEST) == set(em.queries())


def test_manifest_oracle_flags_match():
    oracles = set(em.oracle_sql())
    for name, entry in MANIFEST.items():
        assert entry["oracle"] == (name in oracles), name


def test_manifest_ops_unique_within_gate():
    for name, entry in MANIFEST.items():
        assert len(entry["ops"]) == len(set(entry["ops"])), name


@pytest.mark.parametrize("name", [
    # cheap spot-check bundles across families (the full 50 would double
    # the oracle suite's runtime; any bundle edit also trips these via
    # the hash gates themselves)
    "pattern_1hop_matrix", "pattern_2hop", "create_mem_diff",
    "delete_ops", "var_length_paths", "point_lookups",
    "dedup_docs", "pagerank_ranks",
])
def test_manifest_ops_match_live_gate(spark, name):
    df = em.queries()[name](spark, SF_DIR)
    assert "op" in df.columns, f"{name} listed with ops but has no op column"
    live = sorted(r["op"] for r in df.select("op").distinct().collect())
    ops = MANIFEST[name]["ops"]
    # subset, not equality: an op may legitimately emit 0 rows at the
    # tiny SF (e.g. point_lookups' attr_overlap needs duplicate keys)
    assert set(live) <= set(ops), (
        f"{name}: live ops {sorted(set(live) - set(ops))} missing from "
        "gates_manifest() — regenerate the entry")
    assert len(set(ops) - set(live)) <= 1, (
        f"{name}: manifest ops {sorted(set(ops) - set(live))} never "
        "emitted — stale manifest entry?")


def test_coverage_md_references_resolve():
    """Every `gate \\`X\\`` and `op \\`Y\\`` reference in COVERAGE.md
    must name a live queries() key or a live op tag — the audit chain
    from the coverage table to a driver-visible hash-checked row must
    never dangle."""
    text = open("/root/repo/COVERAGE.md").read()
    gate_keys = set(MANIFEST)
    op_tags = {t for e in MANIFEST.values() for t in e["ops"]}
    bad = []
    for ref in re.findall(r"gate `([a-z0-9_]+)`", text):
        if ref not in gate_keys and ref not in op_tags:
            bad.append(f"gate `{ref}`")
    for ref in re.findall(r"op `([a-z0-9_]+)`", text):
        if ref not in op_tags:
            bad.append(f"op `{ref}`")
    assert not bad, f"dangling COVERAGE.md references: {sorted(set(bad))}"
