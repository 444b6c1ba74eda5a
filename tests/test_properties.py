"""Property-based tests (hypothesis) — the invariants SURVEY.md §5 calls
for, including the one the reference left commented out (undirected ⊇
directed, ``Spec.hs:179-187``). Graphs are tiny and example counts small:
each example builds real DataFrames."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from judy_graph_db_spark import E, Graph, N, table
from judy_graph_db_spark.operators import mutation as M

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # src
        st.integers(min_value=0, max_value=5),   # dst
        st.sampled_from(["A", "B"]),             # label
    ),
    min_size=1,
    max_size=12,
)


def _graph(spark, edges, add_back=True):
    return Graph.from_lists(
        spark,
        nodes=[(i, "N") for i in range(6)],
        directed_edges=edges,
        add_back_edges=add_back,
    )


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_undirected_superset_of_directed(spark, edges):
    """n --| e |-- m  ⊇  n --| e |--> m for every start node and label
    (the reference's unfinished property, Spec.hs:179-187)."""
    g = _graph(spark, edges)
    for label in ("A", "B"):
        und = table(g, N() >> E(label) >> N())
        fwd = table(g, N() >> E(label, direction="r") >> N())
        u = {(r.n0, r.n1) for r in und.select("n0", "n1").collect()}
        f = {(r.n0, r.n1) for r in fwd.select("n0", "n1").collect()}
        assert f <= u


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_edge_seq_contiguous(spark, edges):
    """Per-(src,label,is_back) enumeration is exactly 1..n — the counter
    invariant (insertNodeEdgeAttr, FastAccess.hs:293-315)."""
    g = _graph(spark, edges)
    rows = g.edges.groupBy("src", "label", "is_back").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("edge_seq").alias("lo"),
        F.max("edge_seq").alias("hi"),
        F.count_distinct("edge_seq").alias("d"),
    ).collect()
    for r in rows:
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n), r


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_union_self_idempotent(spark, edges):
    """g ∪ g = g under the overwrite rule (union, FastAccess.hs:381-393)."""
    g = _graph(spark, edges)
    u = g.union(g)
    a = sorted(map(tuple, g.edges.select("src", "dst", "label", "edge_seq", "is_back").collect()))
    b = sorted(map(tuple, u.edges.select("src", "dst", "label", "edge_seq", "is_back").collect()))
    assert a == b


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_union_overwrite_right_wins(spark, edges):
    """On colliding (src,label,edge_seq,is_back) keys the OTHER graph's
    target wins."""
    g = _graph(spark, edges)
    rewired = Graph(
        spark, g.nodes, g.edges.withColumn("dst", F.lit(99).cast("long")), g.ranges
    )
    u = g.union(rewired)
    assert u.edges.filter(F.col("dst") != 99).count() == 0
    assert u.edges.count() == g.edges.count()


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_several_equals_union_of_fixed_hops(spark, edges):
    """several (1,2) ≡ 1-hop ∪ 2-hop (distinct per depth) — the repeat
    bounds semantics (Cypher.hs:853-858)."""
    g = _graph(spark, edges, add_back=False)
    var = table(g, N() >> E("A", direction="r", several=(1, 2)) >> N())
    got = {(r.n0, r.n1, r.e0_depth) for r in var.collect()}

    hop1 = table(g, N() >> E("A", direction="r") >> N())
    hop2 = table(g, N() >> E("A", direction="r") >> N() >> E("A", direction="r") >> N())
    want = {(r.n0, r.n1, 1) for r in hop1.select("n0", "n1").distinct().collect()}
    want |= {(r.n0, r.n2, 2) for r in hop2.select("n0", "n2").distinct().collect()}
    assert got == want


@given(edges=edges_strategy, seq=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_insert_then_delete_roundtrip(spark, edges, seq):
    """insert_node_edges then delete_edge_keys of the inserted keys is a
    no-op on the edge multiset."""
    g = _graph(spark, edges, add_back=False)
    before = sorted(map(tuple, g.edges.collect()))
    g2 = M.insert_node_edges(g, [(0, 5, "A")] * seq)
    added = g2.edges.exceptAll(g.edges).select("src", "label", "edge_seq").collect()
    assert len(added) == seq
    g3 = M.delete_edge_keys(g2, [(r.src, r.label, r.edge_seq) for r in added])
    after = sorted(map(tuple, g3.edges.collect()))
    assert before == after


pair_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=20,
)


@given(edges=pair_edges_strategy)
@settings(**SETTINGS)
def test_mis_independent_and_maximal_random(spark, edges):
    from judy_graph_db_spark.operators import analytics as AN

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    mis = {r.id for r in AN.maximal_independent_set(df).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in mis:
        assert not (adj.get(v, set()) & mis)
    for v in adj:
        if v not in mis:
            assert adj[v] & mis


@given(edges=pair_edges_strategy, k=st.integers(min_value=3, max_value=4))
@settings(**SETTINGS)
def test_k_truss_support_invariant_and_core_containment(spark, edges, k):
    from judy_graph_db_spark.operators import analytics as AN

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    truss = AN.k_truss(df, k=k).collect()
    # every surviving edge meets the support bound, measured inside
    for r in truss:
        assert r.support >= k - 2
    # k-truss nodes are contained in the (k-1)-core
    truss_nodes = {r.a for r in truss} | {r.b for r in truss}
    core = {r.id for r in AN.k_core(df, k=k - 1).collect()}
    assert truss_nodes <= core


@given(edges=pair_edges_strategy)
@settings(**SETTINGS)
def test_msf_spans_components_acyclically(spark, edges):
    from judy_graph_db_spark.operators import analytics as AN

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(
        [(a, b, (a * 7 + b * 13) % 97 + 1) for a, b in edges],
        "src long, dst long, weight long",
    )
    forest = [(r.a, r.b) for r in AN.minimum_spanning_forest(df).collect()]
    # same connectivity as the input, with exactly n - #components edges
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = {v for e in edges for v in e}
    for a, b in edges:
        parent[find(a)] = find(b)
    n_comp = len({find(v) for v in nodes})
    assert len(set(forest)) == len(nodes) - n_comp
    parent2 = {}

    def find2(x):
        while parent2.setdefault(x, x) != x:
            parent2[x] = parent2[parent2[x]]
            x = parent2[x]
        return x

    for a, b in forest:
        assert find2(a) != find2(b), "forest contains a cycle"
        parent2[find2(a)] = find2(b)
    assert len({find2(v) for v in nodes}) == n_comp


# --- local BPE trainer: heap selection == brute-force scan -------------------

def _bpe_bruteforce(words, n_merges):
    """Reference implementation: full pair recount + full scan per round,
    same (count DESC, a ASC, b ASC) selection and greedy fold."""
    from judy_graph_db_spark.operators.bpe import _apply_merge_local

    words = [list(w) for w in words]
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        live = [(c, p) for p, c in counts.items() if c > 0]
        if not live:
            break
        maxc = max(c for c, _ in live)
        best = min(p for c, p in live if c == maxc)
        merges.append((rank, best[0], best[1], maxc))
        for i, (syms, freq) in enumerate(words):
            words[i] = [_apply_merge_local(syms, *best), freq]
    return merges


@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1, max_size=10,
    ),
    n_merges=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=80, deadline=None)
def test_local_bpe_heap_matches_bruteforce(words, n_merges):
    """The lazy-invalidation heap + incremental pair counts must pick the
    exact same merge sequence as a full recount-and-scan every round —
    including pair reappearance after merges and duplicate words."""
    from judy_graph_db_spark.operators.bpe import _train_merges_local

    table = [[list(w) + ["</w>"], f] for w, f in words]
    got = _train_merges_local([[syms[:], f] for syms, f in table], n_merges)
    want = _bpe_bruteforce([[syms[:], f] for syms, f in table], n_merges)
    assert got == want


# --- local WordPiece trainer: incremental counts == brute-force --------------

def _wp_bruteforce(words, n_merges):
    """Reference WordPiece loop: full pair + unit recount per round, exact
    integer score cnt*SCALE // (c_a*c_b), (score DESC, cnt DESC, a, b)."""
    from judy_graph_db_spark.operators.bpe import (WP_SCORE_SCALE,
                                                   _apply_merge_local)

    words = [list(w) for w in words]
    merges = []
    for rank in range(n_merges):
        counts, units = {}, {}
        for syms, freq in words:
            for s in syms:
                units[s] = units.get(s, 0) + freq
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        live = [(c * WP_SCORE_SCALE // (units[p[0]] * units[p[1]]), c, p)
                for p, c in counts.items() if c > 0]
        if not live:
            break
        top = max((s, c) for s, c, _ in live)
        best = min(p for s, c, p in live if (s, c) == top)
        merges.append((rank, best[0], best[1], top[0]))
        for i, (syms, freq) in enumerate(words):
            words[i] = [_apply_merge_local(syms, *best), freq]
    return merges


@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1, max_size=10,
    ),
    n_merges=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=80, deadline=None)
def test_local_wordpiece_matches_bruteforce(words, n_merges):
    """The incremental pair/unit counts of the likelihood-scored loop must
    pick the exact same merge sequence as a full recount every round."""
    from judy_graph_db_spark.operators.bpe import \
        _train_merges_local_likelihood

    table = [[list(w) + ["</w>"], f] for w, f in words]
    got = _train_merges_local_likelihood(
        [[syms[:], f] for syms, f in table], n_merges)
    want = _wp_bruteforce([[syms[:], f] for syms, f in table], n_merges)
    assert got == want


payload_strategy = st.lists(
    st.lists(
        st.sampled_from(
            list("abc xyzé\n\r\t.:#") + ["\r\n", "\r\n\r\n", "WARC/1.0"]),
        min_size=0, max_size=40,
    ).map("".join),
    min_size=1, max_size=8,
)


@given(payloads=payload_strategy)
@settings(**SETTINGS)
def test_warc_roundtrip_arbitrary_payloads(spark, tmp_path_factory, payloads):
    """Any payload bytes — embedded CRLFs, blank lines, unicode, colons —
    must survive serialize → scan-split → parse exactly, UNLESS the
    payload embeds the record separator itself, in which case the record
    must be flagged malformed (never silently corrupted)."""
    import os

    from judy_graph_db_spark.sources import warc as W

    d = tmp_path_factory.mktemp("warcprop")
    recs = [
        W.warc_record_bytes(
            "conversion",
            {"WARC-Target-URI": f"http://example.com/{i}"}, p)
        for i, p in enumerate(payloads)
    ]
    path = os.path.join(str(d), "p.wet")
    with open(path, "wb") as f:
        f.write(b"".join(recs))
    parsed = {r.url: r.text
              for r in W.read_wet(spark, path).collect()}
    n_bad = W.read_warc_records(spark, path).filter("malformed").count()
    # a collision is ANY separator byte-sequence occurrence at a
    # non-boundary position — it can live inside one payload OR compose
    # across framing bytes (e.g. header blank line + payload starting
    # 'WARC/1.0' + terminator), so classify on the actual byte stream
    blob = b"".join(recs)
    sep = W.RECORD_SEP.encode()
    legit, pos = set(), 0
    for r in recs[:-1]:
        pos += len(r)
        legit.add(pos - 4)  # terminator CRLF CRLF + next version line
    collisions = [i for i in range(len(blob))
                  if blob.startswith(sep, i) and i not in legit]
    expected = {f"http://example.com/{i}": p
                for i, p in enumerate(payloads)}
    if not collisions:
        assert n_bad == 0 and parsed == expected
    else:
        # records may be lost to the collision, but NO parsed text may
        # ever differ from what was written — corruption is only ever a
        # malformed flag
        for url, text in parsed.items():
            assert expected.get(url) == text
        assert n_bad >= 1
