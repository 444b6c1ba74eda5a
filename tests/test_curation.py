"""Corpus-curation operators: deterministic sampling/splitting, chunking,
token-budget sharding, canonical-corpus extraction. Semantics tests here;
the DuckDB twins are exercised by test_entry_oracle / check_oracle."""

import os

import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark.functions.text import token_count
from judy_graph_db_spark.operators import curation as CU

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


def test_hash_sample_deterministic_and_nested(docs):
    small = {r.doc_id for r in CU.hash_sample(docs, 32).select("doc_id").collect()}
    again = {r.doc_id for r in CU.hash_sample(docs, 32).select("doc_id").collect()}
    big = {r.doc_id for r in CU.hash_sample(docs, 128).select("doc_id").collect()}
    assert small == again  # stable across runs
    assert small <= big  # raising the cutoff only adds rows
    n = docs.count()
    assert 0 < len(big) < n
    # ~128/256 = half the corpus, give or take hash noise
    assert abs(len(big) / n - 0.5) < 0.15


def test_hash_sample_bounds(docs):
    with pytest.raises(ValueError):
        CU.hash_sample(docs, 0)
    with pytest.raises(ValueError):
        CU.hash_sample(docs, 300)


def test_hash_split_partitions_everything(docs):
    split = CU.hash_split(docs, {"train": 240, "val": 8, "test": 8})
    sizes = {r["split"]: r["n"] for r in
             split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(sizes.values()) == docs.count()
    assert sizes.get("train", 0) > sizes.get("val", 0)
    with pytest.raises(ValueError):
        CU.hash_split(docs, {"train": 200, "val": 8})


def test_chunks_cover_text(docs):
    size, stride = 200, 150
    chunks = CU.chunk_documents(docs, size=size, stride=stride)
    joined = chunks.join(docs.select("doc_id", "text"), "doc_id")
    bad = joined.filter(
        F.col("chunk") != F.expr(f"substring(text, chunk_idx * {stride} + 1, {size})")
    ).count()
    assert bad == 0
    # every doc yields at least one chunk; long docs yield several
    per_doc = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_doc.count() == docs.count()
    assert per_doc.agg(F.max("n")).first()[0] > 1
    # overlapping windows re-cover the stride boundary
    first_two = chunks.filter(F.col("chunk_idx") < 2)
    assert first_two.count() > docs.count()


def test_shard_by_token_budget_matches_serial_scan(docs):
    budget = 5000
    out = CU.shard_by_token_budget(docs, budget_tokens=budget).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["shard"]) for r in out}
    serial = docs.select(
        "doc_id", token_count(F.col("text")).alias("n")
    ).orderBy("doc_id").collect()
    cum = 0
    for r in serial:
        assert got[r["doc_id"]] == (r["n"], cum // budget)
        cum += r["n"]
    # shards are consecutive from 0
    shards = sorted({s for _, s in got.values()})
    assert shards == list(range(len(shards)))


def test_canonical_corpus_drops_only_non_canonical(docs, spark):
    from judy_graph_db_spark.operators.dedup import dedup_clusters

    cl = dedup_clusters(docs)
    kept = CU.canonical_corpus(docs, clusters=cl)
    n_canonical = cl.filter("is_canonical").count()
    assert kept.count() == n_canonical
    # kept ids are exactly the canonical representatives
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    want = {r.doc_id for r in cl.filter("is_canonical").select("doc_id").collect()}
    assert got == want


def test_chunks_reconstruct_text_when_non_overlapping(docs):
    """stride == size → chunks partition the text: ordered concatenation
    rebuilds every document exactly."""
    size = 100
    chunks = CU.chunk_documents(docs, size=size, stride=size)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))),
                                lambda s: s["chunk"])
            ).alias("rebuilt")
        )
    )
    bad = rebuilt.join(docs.select("doc_id", "text"), "doc_id").filter(
        F.col("rebuilt") != F.col("text")
    )
    assert bad.count() == 0


def test_leakage_safe_split_keeps_clusters_together(spark):
    from judy_graph_db_spark.operators import curation as CU

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    # three near-dup families + singletons
    clusters = spark.createDataFrame(
        [(i, 1) for i in (1, 17, 63, 99)]
        + [(i, 2) for i in (2, 40)]
        + [(i, i) for i in range(100) if i not in (1, 17, 63, 99, 2, 40)],
        "doc_id long, cluster_id long",
    )
    out = CU.leakage_safe_split(
        docs, clusters, {"train": 128, "val": 64, "test": 64}
    )
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 100
    # family members always co-located
    assert len({rows[i] for i in (1, 17, 63, 99)}) == 1
    assert len({rows[i] for i in (2, 40)}) == 1
    # docs missing from the map still split (on their own id)
    out2 = CU.leakage_safe_split(
        docs, clusters.filter(F.col("doc_id") != 5),
        {"train": 128, "val": 64, "test": 64},
    )
    assert {r.doc_id for r in out2.collect()} == set(range(100))
    # a singleton's split equals plain hash_split (same md5 bucket rule)
    plain = {r.doc_id: r.split for r in CU.hash_split(
        docs, {"train": 128, "val": 64, "test": 64}).collect()}
    for i in range(3, 16):
        assert rows[i] == plain[i]


def test_split_widths_must_be_positive(spark):
    """A zero-width split pushes an interior hex cutoff to '100', which
    string-compares below 'a0'..'ff' and silently misroutes ~37% of rows —
    both split builders must reject it loudly."""
    import pytest as _pytest

    from judy_graph_db_spark.operators import curation as CU

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    clusters = spark.createDataFrame([(0, 0)], "doc_id long, cluster_id long")
    with _pytest.raises(ValueError, match="positive"):
        CU.hash_split(docs, {"train": 256, "val": 0})
    with _pytest.raises(ValueError, match="positive"):
        CU.leakage_safe_split(docs, clusters, {"train": 256, "val": 0})


def test_strip_repeated_lines(spark):
    """Keep-first intra-document line dedup: order preserved, later exact
    repeats dropped, distinct lines untouched; cross-checked against the
    DuckDB list_reduce twin."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import dedup_lines_sql

    docs = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\nd"),
            (2, "same\nsame\nsame"),
            (3, "only one line"),
            (4, "x\n\ny\n\nx"),  # empty lines dedup like any other line
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.clean_text
           for r in CU.strip_repeated_lines(docs).collect()}
    assert out == {1: "a\nb\nc\nd", 2: "same", 3: "only one line",
                   4: "x\n\ny"}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    for i, s in [(1, "a\nb\na\nc\nb\nd"), (2, "same\nsame\nsame"),
                 (3, "only one line"), (4, "x\n\ny\n\nx")]:
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    twin = dict(con.execute(
        f"SELECT doc_id, {dedup_lines_sql('text')} FROM t").fetchall())
    assert twin == out


def test_strip_repeated_lines_is_shuffle_free(spark):
    from judy_graph_db_spark.operators import curation as CU

    docs = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = CU.strip_repeated_lines(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-stage fold


def test_remove_boilerplate_lines(spark):
    """Corpus-wide boilerplate: lines shared by >= min_docs distinct docs
    vanish everywhere, intra-doc-only repeats survive, all-boilerplate
    docs come back as ''; DuckDB twin agrees."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import remove_boilerplate_sql

    rows = [
        (1, "COOKIE BANNER\nunique one\nfooter (c) corp"),
        (2, "COOKIE BANNER\nunique two\nfooter (c) corp"),
        (3, "all mine\nno shared lines here"),
        (4, "COOKIE BANNER\nfooter (c) corp"),
        (5, "repeated inside\nrepeated inside"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text
           for r in CU.remove_boilerplate_lines(docs).collect()}
    assert got == {1: "unique one", 2: "unique two",
                   3: "all mine\nno shared lines here", 4: "",
                   5: "repeated inside\nrepeated inside"}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {r[0]: r[2]
            for r in con.execute(remove_boilerplate_sql()).fetchall()}
    assert twin == got
    # min_docs=4: banner and footer each span only 3 docs -> nothing is
    # boilerplate any more, every doc survives verbatim
    got4 = {r.doc_id: r.clean_text
            for r in CU.remove_boilerplate_lines(docs, min_docs=4).collect()}
    assert got4 == dict(rows)
    with pytest.raises(ValueError, match="positive"):
        CU.remove_boilerplate_lines(docs, min_docs=0)


def test_corpus_summary(spark):
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import corpus_summary_sql

    rows = [(1, "en", "web", "one two"), (2, "en", "web", "three"),
            (3, "de", "book", "vier funf!")]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")
    got = {(r.lang, r.source): (r.n_docs, r.sum_chars, r.sum_tokens)
           for r in CU.corpus_summary(docs).collect()}
    assert got == {("en", "web"): (2, 12, 3), ("de", "book"): (1, 10, 3)}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, "
                "source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?)", rows)
    twin = {(t[0], t[1]): (t[2], t[3], t[4]) for t in con.execute(
        corpus_summary_sql()).fetchall()}
    assert got == twin


def test_dsir_weights(spark):
    """Target-like docs outscore off-target docs, weights are exact
    integers, and the DuckDB twin agrees row-for-row."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import dsir_weights_sql

    # target domain: code-ish vocabulary (even ids); raw mix adds prose
    rows = [(i, "def main return value import module parse token stream"
             if i % 2 == 0 else
             "the cat sat on the warm mat and purred all day long")
            for i in range(20)] + [(100, "def parse import token"),
                                   (101, "the cat and the mat")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter((F.col("doc_id") % 2 == 0)
                         & (F.col("doc_id") < 100)).select("doc_id")
    got = CU.dsir_weights(docs, target, n_features=256, seed=5)
    res = {r.doc_id: (r.n_feats, r.score_bits, r.mean_bits_milli)
           for r in got.collect()}
    assert set(res) == {*range(20), 100, 101}
    # held-out code doc must outrank held-out prose doc
    assert res[100][2] > res[101][2]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {t[0]: (t[1], t[2], t[3]) for t in con.execute(dsir_weights_sql(
        "doc_id % 2 = 0 AND doc_id < 100", n_features=256, seed=5
    )).fetchall()}
    assert res == twin
    import pytest as _pt
    with _pt.raises(ValueError, match="positive"):
        CU.dsir_weights(docs, target, n_features=0)


def test_pps_systematic_sample(spark):
    """Deterministic PPS draws: n_hits matches a python replica of the
    stride arithmetic, total draws <= n, heavy items multi-hit, zero-weight
    items never drawn, and the draw is invariant to input partitioning."""
    import pytest as _pt

    from judy_graph_db_spark.operators.curation import pps_systematic_sample

    rows = [(i, (i * 37) % 23) for i in range(40)]  # weights 0..22
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def replica(rows, n):
        rows = sorted(rows)
        W = sum(w for _, w in rows)
        s = (W + n - 1) // n
        o = s // 2
        hits, c = {}, 0
        for i, w in rows:
            got = (c + w - 1 - o + s) // s - (c - 1 - o + s) // s
            if got > 0:
                hits[i] = got
            c += w
        return hits

    for n in (1, 3, 7, 16):
        got = {r.doc_id: r.n_hits
               for r in pps_systematic_sample(df, n, "w").collect()}
        want = replica(rows, n)
        assert got == want, f"n={n}"
        assert sum(got.values()) <= n
        assert sum(got.values()) >= n - 1
        assert all(rows[i][1] > 0 for i in got)
    # partitioning invariance
    got_repart = {r.doc_id: r.n_hits for r in pps_systematic_sample(
        df.repartition(7), 7, "w").collect()}
    assert got_repart == replica(rows, 7)
    # heavy item drawn multiple times
    heavy = spark.createDataFrame(
        [(1, 1), (2, 100), (3, 1)], "doc_id long, w long")
    gh = {r.doc_id: r.n_hits
          for r in pps_systematic_sample(heavy, 5, "w").collect()}
    assert gh[2] >= 4
    # all-zero weights raise loudly
    zero = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    with _pt.raises(Exception, match="total weight is zero"):
        pps_systematic_sample(zero, 3, "w").collect()


def test_dedup_paragraphs(spark):
    """Keep-first across the corpus: first occurrence by (doc_id, pos)
    survives, later duplicates vanish, order is preserved, all-duplicate
    docs yield ''."""
    from judy_graph_db_spark.operators.curation import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha\n\nshared\n\nbeta"),
            (2, "shared\n\ngamma"),
            (3, "shared\n\nalpha"),
            (4, "delta\n\ndelta"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean_text
           for r in dedup_paragraphs(docs).collect()}
    assert got[1] == "alpha\n\nshared\n\nbeta"   # firsts all
    assert got[2] == "gamma"                     # 'shared' kept in doc 1
    assert got[3] == ""                          # both already seen
    assert got[4] == "delta"                     # intra-doc repeat cut too
    # twin equivalence on the same fixture via DuckDB
    import duckdb

    from judy_graph_db_spark import oracle as O

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(1, 'alpha' || chr(10) || chr(10) || 'shared' || chr(10) ||"
                " chr(10) || 'beta'),"
                "(2, 'shared' || chr(10) || chr(10) || 'gamma'),"
                "(3, 'shared' || chr(10) || chr(10) || 'alpha'),"
                "(4, 'delta' || chr(10) || chr(10) || 'delta')"
                ") t(doc_id, text)")
    want = {r[0]: r[2] for r in con.execute(
        O.dedup_paragraphs_sql()).fetchall()}
    assert want == got


def test_paragraph_signals_and_filter(spark):
    """Signals computed per paragraph; filter drops short/stopword-poor
    blocks and reassembles in order; row-local until the reassembly."""
    from judy_graph_db_spark.operators.curation import (filter_paragraphs,
                                                        paragraph_signals)

    docs = spark.createDataFrame(
        [(1, "Home | Login\n\nthe cat sat on the mat and it was happy"
             "\n\nBuy now"),
         (2, "x\n\ny")],
        "doc_id long, text string")
    sig = {(r.doc_id, r.pos): (r.n_words, r.stopword_permille)
           for r in paragraph_signals(docs).collect()}
    assert sig[(1, 0)][0] == 3  # 'home', '|', 'login'
    assert sig[(1, 1)][0] == 10
    assert sig[(1, 1)][1] == 300  # the/the/and = 3 of 10
    got = {r.doc_id: r.clean_text
           for r in filter_paragraphs(
               docs, min_words=4, min_stopword_permille=100).collect()}
    assert got[1] == "the cat sat on the mat and it was happy"
    assert got[2] == ""


def test_epoch_shuffle(spark):
    """Same seed replays bit-for-bit across partitionings; different seed
    reshuffles; ranks are dense 0..n-1 per shard."""
    from judy_graph_db_spark.operators.curation import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in epoch_shuffle(df, seed=1, num_shards=8).collect()}
    b = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in epoch_shuffle(df.repartition(7), seed=1,
                                num_shards=8).collect()}
    assert a == b
    c = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in epoch_shuffle(df, seed=2, num_shards=8).collect()}
    assert a != c
    # dense ranks per shard
    from collections import defaultdict
    by_shard = defaultdict(list)
    for d, (s, p) in a.items():
        by_shard[s].append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # all shards used with 200 rows over 8 shards
    assert len(by_shard) == 8


def test_shard_by_weight(spark):
    """Weight-generalized budgeted sharding: cumulative-weight boundaries
    match a python replica (the compaction-planner shape)."""
    from judy_graph_db_spark.operators.curation import shard_by_weight

    rows = [(i, 10 + (i * 13) % 50) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, bytes long")
    got = {r.doc_id: r.shard
           for r in shard_by_weight(df, 100, "bytes").collect()}
    c, want = 0, {}
    for i, w in sorted(rows):
        want[i] = c // 100
        c += w
    assert got == want


def test_chunk_by_tokens(spark):
    """Overlapping token windows, short tail, empty doc yields one empty
    chunk, zero shuffles in the plan."""
    from judy_graph_db_spark.operators.curation import chunk_by_tokens

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")],
        "doc_id long, text string")
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
           for r in chunk_by_tokens(docs, size=4, stride=3).collect()}
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "d e f g")
    assert got[(1, 2)] == (1, "g")
    assert got[(2, 0)] == (1, "x")
    assert got[(3, 0)][1] == ""
    plan = chunk_by_tokens(docs, 4, 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_remove_repeated_spans(spark):
    """Cross-doc repeated windows keep only the globally-first occurrence;
    overlapping marked windows merge; short docs and unique docs pass
    through; matches a python replica on a random corpus."""
    from judy_graph_db_spark.operators.curation import remove_repeated_spans

    def replica(rows, w):
        toks = {d: t.split() if t.strip() else [] for d, t in rows}
        spans = {}
        for d in sorted(toks):
            for s in range(len(toks[d]) - w + 1):
                spans.setdefault(tuple(toks[d][s:s + w]), []).append((d, s))
        marked = {}
        for occ in spans.values():
            if len(occ) > 1:
                for d, s in occ[1:] if occ == sorted(occ) else sorted(occ)[1:]:
                    marked.setdefault(d, set()).add(s)
        out = {}
        for d, t in rows:
            cov = set()
            for s in marked.get(d, ()):  # noqa
                cov.update(range(s, s + w))
            kept = [tk for i, tk in enumerate(toks[d]) if i not in cov]
            out[d] = (" ".join(kept), len(toks[d]) - len(kept))
        return out

    span = "x1 x2 x3 x4 x5"
    rows = [
        (0, f"alpha beta {span} gamma delta"),
        (1, f"epsilon {span} zeta"),            # later copy -> cut
        (2, "totally unique words here only"),
        (3, f"{span} {span}"),                  # internal repeat
        (4, "tiny doc"),                        # shorter than window
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_removed_tokens)
           for r in remove_repeated_spans(docs, window=5).collect()}
    assert got == replica(rows, 5)
    assert got[0][1] == 0 and got[2][1] == 0 and got[4][1] == 0
    assert got[1] == ("epsilon zeta", 5)

    # random corpus with planted duplicates
    import random
    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(40)]
    planted = " ".join(rng.choice(vocab) for _ in range(7))
    rrows = []
    for d in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        if d % 3 == 0:
            at = rng.randrange(0, len(words) + 1)
            words[at:at] = planted.split()
        rrows.append((d, " ".join(words)))
    rdocs = spark.createDataFrame(rrows, "doc_id long, text string")
    rgot = {r.doc_id: (r.clean_text, r.n_removed_tokens)
            for r in remove_repeated_spans(rdocs, window=6).collect()}
    assert rgot == replica(rrows, 6)


def test_gopher_quality_rules(spark):
    """A1.1 signals + keep flag match hand computation AND the DuckDB
    twin; the paper's thresholds admit real prose and reject the symbol
    page, the bullet list, and the word-salad."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import gopher_keep_sql, gopher_signals_sql
    from tests.oracle_utils import compare

    prose = ("the cat sat on the mat and that hat is flat with style "
             "to be of note and more prose follows here now " * 3)
    rows = [
        (1, prose),
        (2, "- a\n- b\n- c\nd..."),           # bulleted + ellipsis lines
        (3, "#### #### ....... x"),           # symbol-heavy
        (4, ""),                              # empty
        (5, "zz qq ww ee rr tt yy uu " * 10),  # no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r.doc_id: r for r in
           CU.gopher_quality_signals(docs).collect()}
    assert sig[3].symbol_word_milli == 2500  # 8 '#' + 2 '...' runs / 4
    assert sig[2].bullet_line_milli == 750
    assert sig[2].ellipsis_line_milli == 250
    assert sig[4].n_words == 0
    keep = {r.doc_id: r.keep for r in
            CU.gopher_quality_filter(docs).collect()}
    assert keep == {1: True, 2: False, 3: False, 4: False, 5: False}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ok, msg = compare(CU.gopher_quality_signals(docs), con,
                      gopher_signals_sql())
    assert ok, msg
    from pyspark.sql import functions as F
    ok, msg = compare(
        CU.gopher_quality_filter(docs).select(
            "doc_id", F.col("keep").cast("long").alias("keep")),
        con, gopher_keep_sql())
    assert ok, msg


def test_repetition_char_fractions(spark):
    """Line- and n-gram-level Gopher A1.2 char fractions match hand
    computation and the DuckDB twins; docs without lines/grams report
    zeros, not missing rows."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import (dup_line_signals_sql,
                                            dup_ngram_char_sql,
                                            top_ngram_char_sql)
    from tests.oracle_utils import compare

    rows = [
        (1, "alpha beta\nalpha beta\ngamma"),     # dup line 2/3
        (2, "a b a b a b"),                        # top 2-gram 'a b' x3
        (3, "one two three four five one two three four five tail"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dl = {r.doc_id: (r.n_lines, r.dup_line_milli, r.dup_line_char_milli)
          for r in CU.dup_line_signals(docs).collect()}
    assert dl[1] == (3, 666, 800)  # 2/3 lines; 20/25 chars
    assert dl[4] == (0, 0, 0)
    tg = {r.doc_id: (r.gram, r.top_ngram_char_milli)
          for r in CU.top_ngram_char_fraction(docs, 2).collect()}
    assert tg[2] == ("a b", 818)   # 3*3 chars / 11
    assert tg[4] == (None, 0)
    dg = {r.doc_id: r.dup_ngram_char_milli
          for r in CU.dup_ngram_char_fraction(docs, 5).collect()}
    assert dg[3] == 884            # 'one two three four five' x2: 46/52
    assert dg[2] == 0 and dg[4] == 0

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for df, sql in [
        (CU.dup_line_signals(docs), dup_line_signals_sql()),
        (CU.top_ngram_char_fraction(docs, 2), top_ngram_char_sql(2)),
        (CU.dup_ngram_char_fraction(docs, 5), dup_ngram_char_sql(5)),
    ]:
        ok, msg = compare(df, con, sql)
        assert ok, msg


def test_gopher_plan_shapes(spark):
    """Plan guards for the Gopher family: the A1.1 signals are a pure
    scan-stage projection (no shuffle at all), and the n-gram top-1
    window is PARTITIONED by doc — never a single-partition global
    window."""
    from judy_graph_db_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(1, "some text here"), (2, "more words")],
        "doc_id long, text string")
    sig_plan = CU.gopher_quality_signals(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in sig_plan  # scan-stage only, no shuffle

    top_plan = CU.top_ngram_char_fraction(docs, 2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in top_plan
    # the rank window shuffles on the doc key, not into one partition
    assert "hashpartitioning(__id" in top_plan
    import re
    win = [ln for ln in top_plan.splitlines() if "Window" in ln
           and "row_number" in ln]
    assert win and all("__id" in ln for ln in win), win


def test_build_vocab_no_global_window(spark):
    """build_vocab's two-level rank never plans a single-partition
    window: the per-bucket row_number partitions on (count, prefix) and
    the only SinglePartition exchange feeds the aggregate-sized
    bucket-stats running sum — asserted by checking every window's
    partition spec is non-empty except the offset window over bstat."""
    from judy_graph_db_spark.operators.stats import build_vocab

    docs = spark.createDataFrame(
        [(1, "a b c a b a"), (2, "b d e")], "doc_id long, text string")
    vocab = build_vocab(docs)
    # output unchanged vs the spec: dense (count DESC, token ASC) ids
    got = {r.token: (r.token_id, r["count"]) for r in vocab.collect()}
    assert got == {"a": (0, 3), "b": (1, 3), "c": (2, 1), "d": (3, 1),
                   "e": (4, 1)}
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    rank_windows = [ln for ln in plan.splitlines()
                    if "Window" in ln and "row_number" in ln]
    # the big (per-token) rank window is keyed by (count, prefix)
    assert rank_windows and all(
        "count" in ln and "__b" in ln for ln in rank_windows), rank_windows


def test_c4_line_and_page_rules(spark):
    """C4 line rules (terminal punct / >=3 words / no javascript) and
    page rules (>=5 surviving sentences, lorem-ipsum / curly / blocklist
    kills) match hand computation AND the DuckDB twins."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import c4_keep_sql, c4_line_filter_sql
    from tests.oracle_utils import compare

    five_good = ("first good line right here.\n"
                 "second good line right here!\n"
                 "third good line right here?\n"
                 "fourth good line right here.\n"
                 "fifth good line right here.")
    rows = [
        (1, "good line with period.\nno.\nbad javascript line here.\n"
            "no terminal punct line\n" + five_good),
        (2, "lorem ipsum dolor sit amet.\n" + five_good),
        (3, "curly { line ends here.\n" + five_good),
        (4, "contains badword in line.\n" + five_good),
        (5, ""),
        (6, "only two good lines here.\nsecond good line right here."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    lf = {r.doc_id: (r.n_lines, r.n_kept_lines, r.clean_text)
          for r in CU.c4_line_filter(docs).collect()}
    assert lf[1][:2] == (9, 6)          # 'no.', javascript, unpunct drop
    assert lf[1][2].startswith("good line with period.\nfirst good")
    assert lf[5] == (0, 0, "")
    assert lf[6][:2] == (2, 2)

    qf = {r.doc_id: (bool(r.keep), r.n_sentences, r.has_lorem,
                     r.has_curly, r.bad_word_hits)
          for r in CU.c4_quality_filter(
              docs, bad_words=("badword",)).collect()}
    assert qf[1] == (True, 6, 0, 0, 0)
    assert qf[2] == (False, 6, 1, 0, 0)   # killed by lorem ipsum
    assert qf[3] == (False, 6, 0, 1, 0)   # killed by the curly bracket
    assert qf[4] == (False, 6, 0, 0, 1)   # killed by the blocklist
    assert qf[5] == (False, 0, 0, 0, 0)   # no sentences
    assert qf[6][0] is False              # 2 < 5 sentences

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ok, msg = compare(CU.c4_line_filter(docs), con, c4_line_filter_sql())
    assert ok, msg
    from pyspark.sql import functions as F
    ok, msg = compare(
        CU.c4_quality_filter(docs, bad_words=("badword",)).select(
            "doc_id", "clean_text", "n_lines", "n_kept_lines",
            "n_sentences", "has_lorem", "has_curly", "bad_word_hits",
            F.col("keep").cast("long").alias("keep")),
        con, c4_keep_sql(bad_words=("badword",)))
    assert ok, msg


def test_c4_span_dedup(spark):
    """The three-sentence-span rule keeps only the globally first
    occurrence: later docs lose exactly the shared block (a doc that IS
    the block collapses to empty), and the DuckDB twin hash-matches."""
    import duckdb

    from judy_graph_db_spark.operators import curation as CU
    from judy_graph_db_spark.oracle import c4_span_dedup_sql
    from tests.oracle_utils import compare

    shared = ("shared sentence one. shared sentence two. "
              "shared sentence three.")
    rows = [
        (1, "unique opener first here. " + shared + " unique closer one."),
        (2, "different opener two here. " + shared
            + " different closer two."),
        (3, "no shared content here. just words. more words here."),
        (4, shared),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_removed_sentences)
           for r in CU.c4_span_dedup(docs).collect()}
    assert got[1] == ("unique opener first here. shared sentence one. "
                      "shared sentence two. shared sentence three. "
                      "unique closer one", 0)
    assert got[2] == ("different opener two here. different closer two", 3)
    assert got[3][1] == 0
    assert got[4] == ("", 3)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ok, msg = compare(
        CU.c4_span_dedup(docs).select(
            "doc_id", "clean_text", "n_removed_sentences"),
        con, c4_span_dedup_sql())
    assert ok, msg


def test_c4_plan_shapes(spark):
    """Plan guards: the composed C4 document filter is a pure scan-stage
    projection (zero Exchanges — both rule levels fuse into the scan),
    and the span-dedup windows partition on the doc key, never a
    single-partition global window."""
    from judy_graph_db_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(1, "some text here."), (2, "more words here.")],
        "doc_id long, text string")
    qf_plan = CU.c4_quality_filter(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in qf_plan

    sp_plan = CU.c4_span_dedup(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    wins = [ln for ln in sp_plan.splitlines() if "Window" in ln]
    assert wins and all("__id" in ln for ln in wins), wins
    assert "SinglePartition" not in sp_plan


def test_web_corpus_funnel_end_to_end(spark):
    from judy_graph_db_spark.operators.curation import (funnel_counts,
                                                        web_corpus_funnel)

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friend because that is what they "
            "all do every single day of the week without fail and "
            "nobody is surprised that the fox and the dog are friends "
            "now after all this time together in the field") * 2
    rows = [
        (1, good, "http://ok.example.com/a"),               # survives all
        (2, good, "http://ok.example.com/b"),               # exact dup of 1
        (3, good + " tiny extra tail words here", "http://ok.example.com/c"),
        (4, good, "http://spam-mill.com/x"),                # blocked domain
        (5, "le la les et dans pour avec sur une des du il elle " * 20,
         "http://ok.example.com/fr"),                        # not en
        (6, "short", "http://ok.example.com/s"),             # gopher fails
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    # the blocklist matches REGISTERED domains (eTLD+1)
    out = web_corpus_funnel(
        docs, blocked_domains=("spam-mill.com",), keep_langs=("en",),
        url_col="url")
    got = {r.doc_id: r for r in out.collect()}
    assert not got[4].url_ok and got[1].url_ok
    assert not got[5].lang_ok and got[1].lang_ok
    assert not got[6].gopher_ok and got[1].gopher_ok
    # doc 2 is an exact dup of doc 1 -> 1 owns the slot
    assert got[1].exact_keep and not got[2].exact_keep
    # doc 3 is a near-dup of 1 (tiny tail) -> LSH cluster canonical is 1
    assert got[3].exact_keep and not got[3].neardup_keep
    assert got[1].keep and not any(got[i].keep for i in (2, 3, 4, 5, 6))
    fc = funnel_counts(out).collect()[0]
    # doc 6 ("short") fails BOTH lang-id (too little signal) and gopher
    assert (fc.n_total, fc.n_url, fc.n_lang, fc.n_gopher,
            fc.n_exact, fc.n_neardup) == (6, 5, 3, 3, 2, 1)


def test_web_corpus_funnel_blocked_dup_never_owns_slot(spark):
    from judy_graph_db_spark.operators.curation import web_corpus_funnel

    text = ("the quick brown fox jumps over the lazy dog and then "
            "walks home with all of the other animals every day") * 4
    docs = spark.createDataFrame(
        [(1, text, "http://spam-mill.com/a"),     # lower id, but blocked
         (2, text, "http://ok.example.com/b")],
        "doc_id long, text string, url string")
    out = web_corpus_funnel(docs, blocked_domains=("spam-mill.com",),
                            url_col="url", neardup=False)
    got = {r.doc_id: r for r in out.collect()}
    # the blocked doc 1 must NOT claim the canonical slot for doc 2
    assert not got[1].keep and got[2].keep


def test_compression_ratio_signals(spark):
    from judy_graph_db_spark.operators.curation import (
        compression_ratio_signals)

    import hashlib

    gibberish = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(60))
    docs = spark.createDataFrame(
        [(1, "spam " * 400),                      # hyper-repetitive
         (2, "the quick brown fox jumps over the lazy dog and then "
             "walks home thinking about many different things " * 8),
         (3, gibberish)],                         # non-repeating noise
        "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio_signals(docs).collect()}
    # repetitive << prose << gibberish-ish, and bytes are consistent
    assert got[1].ratio_permille < got[2].ratio_permille
    assert got[2].ratio_permille < got[3].ratio_permille
    for r in got.values():
        assert r.raw_bytes == len(r.text.encode()) and r.zip_bytes > 0
    # determinism: same input, same integers on a different partitioning
    again = {r.doc_id: r.ratio_permille
             for r in compression_ratio_signals(
                 docs.repartition(3)).collect()}
    assert again == {i: r.ratio_permille for i, r in got.items()}


def test_web_corpus_funnel_respects_robots(spark):
    from judy_graph_db_spark.operators.curation import web_corpus_funnel
    from judy_graph_db_spark.sources.robots import parse_robots

    text = ("the quick brown fox jumps over the lazy dog and then walks "
            "home with all of the other animals every single day") * 4
    docs = spark.createDataFrame(
        [(1, text, "http://ok-site.com/private/page"),
         (2, text + " b", "http://ok-site.com/public/page"),
         (3, text + " c", None)],
        "doc_id long, text string, url string")
    rules = parse_robots(spark.createDataFrame(
        [("ok-site.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, text string"))
    out = web_corpus_funnel(docs, url_col="url", neardup=False,
                            robots_rules=rules)
    got = {r.doc_id: (r.url_ok, r.keep) for r in out.collect()}
    assert got[1] == (False, False) and got[2] == (True, True)
    # a NULL url must NOT be silently dropped by the policy join — the
    # row stays, with missing policy treated as allowed
    assert got[3] == (True, True)


def test_emit_training_sequences_layout(spark):
    from judy_graph_db_spark.operators.curation import (
        emit_training_sequences)

    # hand-built encoder output: doc1 -> pieces a b c ; doc2 -> d e
    pieces = spark.createDataFrame(
        [(1, 0, 0, "a"), (1, 0, 1, "b"), (1, 1, 0, "c"),
         (2, 0, 0, "d"), (2, 1, 0, "e")],
        "doc_id long, word_pos long, piece_pos long, piece string")
    vocab = spark.createDataFrame(
        [("a", 11), ("b", 12), ("c", 13), ("d", 14), ("e", 15)],
        "piece string, token_id long")
    # stream = 11 12 13 EOD 14 15 EOD  (7 tokens) -> seq_len=3 gives
    # [11,12,13] [0,14,15] and a dropped partial [0]
    out = {r.seq_id: list(r.tokens)
           for r in emit_training_sequences(pieces, vocab, 3).collect()}
    assert out == {0: [11, 12, 13], 1: [0, 14, 15]}
    # keep_partial keeps the tail
    out2 = {r.seq_id: list(r.tokens)
            for r in emit_training_sequences(
                pieces, vocab, 3, drop_partial=False).collect()}
    assert out2[2] == [0]


def test_emit_training_sequences_oov(spark):
    from judy_graph_db_spark.operators.curation import (
        emit_training_sequences)

    pieces = spark.createDataFrame(
        [(1, 0, 0, "a"), (1, 0, 1, "zz")],
        "doc_id long, word_pos long, piece_pos long, piece string")
    vocab = spark.createDataFrame([("a", 1)], "piece string, token_id long")
    import pytest as _pytest
    with _pytest.raises(Exception, match="not in vocab"):
        emit_training_sequences(pieces, vocab, 4).collect()
    out = emit_training_sequences(pieces, vocab, 4, unk_id=9,
                                  drop_partial=False).collect()
    assert list(out[0].tokens) == [1, 9, 0]


def test_emit_training_sequences_end_to_end_wordpiece(spark):
    """corpus → seed vocab → WordPiece encode → id sequences: the whole
    tokenize-and-pack path, deterministic under repartitioning."""
    from judy_graph_db_spark.operators import unigram as U
    from judy_graph_db_spark.operators import wordpiece as W
    from judy_graph_db_spark.operators.curation import (
        emit_training_sequences)

    docs = spark.createDataFrame(
        [(i, "banana cab ban " * 3) for i in range(1, 7)],
        "doc_id long, text string")
    wpv = W.wordpiece_vocab_from_pieces(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=16))
    from pyspark.sql import Window as _W
    vocab = wpv.withColumn(
        "token_id", F.row_number().over(_W.orderBy("piece")).cast("long"))
    enc = W.wordpiece_encode(docs, wpv, max_piece_len=3)
    seqs = emit_training_sequences(enc, vocab, seq_len=16)
    rows = seqs.collect()
    assert rows and all(r.n_tokens == 16 for r in rows)
    again = emit_training_sequences(
        enc.repartition(5), vocab, seq_len=16).collect()
    assert {r.seq_id: tuple(r.tokens) for r in rows} == \
        {r.seq_id: tuple(r.tokens) for r in again}


def test_emit_span_corruption_semantics(spark):
    """T5 span corruption: one L-span per full block at the hashed
    offset; inputs replace each span with its ordinal sentinel; targets
    concatenate sentinel+span per span then EOS; short/empty sequences
    emit unchanged inputs and an EOS-only target."""
    from judy_graph_db_spark.operators.curation import emit_span_corruption

    seqs = spark.createDataFrame(
        [(0, list(range(100, 140))),   # 40 tokens -> 2 blocks at B=20
         (1, list(range(200, 205))),   # sub-block: no masking
         (2, [])],
        "seq_id long, tokens array<bigint>")
    out = {r.seq_id: r for r in emit_span_corruption(
        seqs, mean_span_len=3, noise_permille=150).collect()}
    r0 = out[0]
    assert r0.n_spans == 2
    # reconstruction invariants (placement itself is hash-driven):
    # inputs = originals minus 2 spans of 3, plus 2 sentinels
    assert len(r0.inputs) == 40 - 6 + 2
    assert 32000 in r0.inputs and 32001 in r0.inputs
    # targets = per span (sentinel + 3 tokens) + EOS
    assert len(r0.targets) == 2 * 4 + 1 and r0.targets[-1] == 1
    assert r0.targets[0] == 32000 and r0.targets[4] == 32001
    # masked tokens appear in targets, not inputs; union restores all
    masked = set(r0.targets[:-1]) - {32000, 32001}
    assert masked.isdisjoint(set(r0.inputs))
    assert masked | (set(r0.inputs) - {32000, 32001}) \
        == set(range(100, 140))
    # spans sit inside their blocks: targets slots 1-3 from block 0
    assert all(100 <= t < 120 for t in r0.targets[1:4])
    assert all(120 <= t < 140 for t in r0.targets[5:8])
    assert out[1].n_spans == 0 and list(out[1].inputs) == \
        [200, 201, 202, 203, 204] and list(out[1].targets) == [1]
    assert out[2].n_spans == 0 and list(out[2].inputs) == [] \
        and list(out[2].targets) == [1]


def test_emit_span_corruption_matches_duckdb(spark):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.operators.curation import emit_span_corruption
    from tests.oracle_utils import compare

    rows = [(i, [int(j * 7 + i) for j in range(5 + (i * 13) % 60)])
            for i in range(30)]
    seqs = spark.createDataFrame(rows, "seq_id long, tokens array<bigint>")
    con = duckdb.connect()
    con.sql("CREATE TABLE sc_seqs (seq_id BIGINT, tokens BIGINT[])")
    for i, toks in rows:
        con.execute("INSERT INTO sc_seqs VALUES (?, ?)", [i, toks])
    out = emit_span_corruption(seqs, mean_span_len=4,
                               noise_permille=250).select(
        "seq_id",
        F.array_join("inputs", "|").alias("inp"),
        F.array_join("targets", "|").alias("tgt"),
        "n_spans")
    sql = f"""SELECT seq_id, array_to_string(inputs, '|') AS inp,
        array_to_string(targets, '|') AS tgt, n_spans
        FROM ({O.span_corruption_sql('SELECT * FROM sc_seqs',
                                     mean_span_len=4,
                                     noise_permille=250)}) t"""
    ok, msg = compare(out, con, sql)
    assert ok, msg


def test_emit_sft_sequences_layout_and_masks(spark):
    from judy_graph_db_spark.operators.curation import emit_sft_sequences

    pairs = spark.createDataFrame(
        [(1, [10, 11], [20, 21, 22]),
         (2, [30], [40]),
         (3, [50, 51, 52], [60])],
        "example_id long, prompt_ids array<bigint>, "
        "response_ids array<bigint>")
    out = {r.seq_id: r for r in emit_sft_sequences(pairs, 7).collect()}
    assert list(out[0].tokens) == [10, 11, 20, 21, 22, 0, 30]
    assert list(out[0].loss_mask) == [0, 0, 1, 1, 1, 1, 0]
    assert list(out[1].tokens) == [40, 0, 50, 51, 52, 60, 0]
    assert list(out[1].loss_mask) == [1, 1, 0, 0, 0, 1, 1]
    # train_on_eod=False flips only the EOD mask bits
    out2 = {r.seq_id: list(r.loss_mask) for r in emit_sft_sequences(
        pairs, 7, train_on_eod=False).collect()}
    assert out2[0] == [0, 0, 1, 1, 1, 0, 0]
    assert out2[1] == [1, 0, 0, 0, 0, 1, 0]
    # keep_partial keeps the (empty here) tail: 14 tokens = exactly 2x7
    assert len(out) == 2


def test_emit_sft_sequences_matches_duckdb(spark):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.operators.curation import emit_sft_sequences
    from tests.oracle_utils import compare

    rows = [(i,
             [int((i * 31 + j) % 997) for j in range(1 + i % 5)],
             [int((i * 17 + j) % 991) for j in range(1 + i % 4)])
            for i in range(40)]
    pairs = spark.createDataFrame(
        rows, "example_id long, prompt_ids array<bigint>, "
              "response_ids array<bigint>")
    con = duckdb.connect()
    con.sql("CREATE TABLE sft_pairs (example_id BIGINT, "
            "prompt_ids BIGINT[], response_ids BIGINT[])")
    for i, p, r in rows:
        con.execute("INSERT INTO sft_pairs VALUES (?, ?, ?)", [i, p, r])
    out = emit_sft_sequences(pairs, seq_len=16).select(
        "seq_id", F.array_join("tokens", "|").alias("toks"),
        F.array_join("loss_mask", "|").alias("mask"), "n_tokens")
    ok, msg = compare(out, con, O.sft_sequences_sql(
        "SELECT * FROM sft_pairs", seq_len=16))
    assert ok, msg


def test_emit_fim_sequences_psm_layout(spark):
    from judy_graph_db_spark.operators.curation import emit_fim_sequences

    seqs = spark.createDataFrame(
        [(i, [int(100 + j) for j in range(10)]) for i in range(20)]
        + [(99, [1]), (98, [])],
        "seq_id long, tokens array<bigint>")
    out = {r.seq_id: r for r in emit_fim_sequences(
        seqs, fim_permille=600).collect()}
    fim_rows = [r for r in out.values() if r.is_fim]
    plain = [r for r in out.values() if not r.is_fim]
    assert fim_rows and plain  # both populations present at 60%
    base = set(range(100, 110))
    for r in fim_rows:
        toks = list(r.tokens)
        assert len(toks) == 13  # n + 3 sentinels
        assert toks[0] == 32100 and 32101 in toks and 32102 in toks
        # PSM reorder is a permutation: stripping sentinels restores
        # the original token multiset, and prefix++middle++suffix
        # reassembles the original order
        body = [x for x in toks if x < 32100]
        assert set(body) == base
        isuf, imid = toks.index(32102), toks.index(32101)
        pre, suf, mid = toks[1:isuf], toks[isuf + 1:imid], toks[imid + 1:]
        assert pre + mid + suf == sorted(base)
    # short/empty sequences pass through untransformed
    assert not out[99].is_fim and list(out[99].tokens) == [1]
    assert not out[98].is_fim and list(out[98].tokens) == []
    # rate 0 -> nothing transformed; rate 1000 -> everything eligible is
    full = emit_fim_sequences(seqs, fim_permille=1000)
    assert full.filter("size(tokens) >= 2 AND NOT is_fim").count() == 0
    none = emit_fim_sequences(seqs, fim_permille=0)
    assert none.filter("is_fim").count() == 0


def test_emit_fim_sequences_matches_duckdb(spark):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.operators.curation import emit_fim_sequences
    from tests.oracle_utils import compare

    rows = [(i, [int((i * 13 + j) % 500) for j in range(i % 12)])
            for i in range(40)]
    seqs = spark.createDataFrame(rows, "seq_id long, tokens array<bigint>")
    con = duckdb.connect()
    con.sql("CREATE TABLE fim_seqs (seq_id BIGINT, tokens BIGINT[])")
    for i, toks in rows:
        con.execute("INSERT INTO fim_seqs VALUES (?, ?)", [i, toks])
    out = emit_fim_sequences(seqs, fim_permille=700).select(
        "seq_id", F.array_join("tokens", "|").alias("toks"),
        F.col("is_fim").cast("long").alias("is_fim"))
    sql = f"""SELECT seq_id,
        COALESCE(array_to_string(tokens, '|'), '') AS toks,
        CAST(is_fim AS BIGINT) AS is_fim
        FROM ({O.fim_sequences_sql('SELECT * FROM fim_seqs',
                                   fim_permille=700)}) t"""
    ok, msg = compare(out, con, sql)
    assert ok, msg
