"""Grouped quantiles, TF-IDF stats, stratified sampling."""

import math

from pyspark.sql import functions as F

from judy_graph_db_spark.operators import curation as CU
from judy_graph_db_spark.operators import stats as ST


def test_grouped_quantiles_discrete(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [10, 20, 30, 40]] + [("b", v) for v in [5, 7, 9]],
        "grp string, v long",
    )
    out = {r.grp: r for r in ST.grouped_quantiles(df, ["grp"], "v", [0.5, 1.0]).collect()}
    # percentile_disc(0.5) over 4 values -> 2nd (20); over 3 -> 2nd (7)
    assert (out["a"].q_500, out["a"].q_1000) == (20, 40)
    assert (out["b"].q_500, out["b"].q_1000) == (7, 9)


def test_term_stats_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat. The cat!"), (2, "a cat")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.term): (r.tf, r.df) for r in ST.term_stats(docs).collect()}
    assert rows[(1, "cat")] == (2, 2)
    assert rows[(1, "the")] == (2, 1)
    assert rows[(1, ".")] == (1, 1)
    assert rows[(2, "cat")] == (1, 2)


def test_tfidf_values(spark):
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z")], "doc_id long, text string"
    )
    vals = {(r.doc_id, r.term): r.tfidf for r in ST.tfidf(docs).collect()}
    assert vals[(1, "x")] == 0.0  # df = n_docs -> idf 0
    assert abs(vals[(1, "y")] - math.log(2)) < 1e-12


def test_top_terms_per_doc_deterministic_ties(spark):
    docs = spark.createDataFrame([(1, "b a b a c")], "doc_id long, text string")
    out = [(r.term, r.rank_in_doc) for r in
           ST.top_terms_per_doc(docs, k=2).orderBy("rank_in_doc").collect()]
    assert out == [("a", 1), ("b", 2)]  # tf tie -> alphabetical


def test_stratified_sample_widths(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    out = CU.stratified_sample(docs, {"en": 64, "de": 256})
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 1000  # width 256 keeps everything
    assert 150 < counts["en"] < 350  # ~25% of 1000
    # unlisted strata default to 0 kept
    assert CU.stratified_sample(docs, {"fr": 256}).count() == 0
    # nested-subset property per stratum
    small = {r.doc_id for r in CU.stratified_sample(docs, {"en": 32}).collect()}
    big = {r.doc_id for r in CU.stratified_sample(docs, {"en": 64}).collect()}
    assert small <= big


def test_inverted_index(spark):
    docs = spark.createDataFrame(
        [(3, "cat dog"), (1, "cat cat"), (2, "dog fish")],
        "doc_id long, text string",
    )
    out = {r.term: (r.df, r.postings) for r in ST.inverted_index(docs).collect()}
    assert out["cat"] == (2, [1, 3])
    assert out["dog"] == (2, [2, 3])
    assert out["fish"] == (1, [2])
    # df bounds filter terms before postings assemble
    only = {r.term for r in ST.inverted_index(docs, min_df=2).collect()}
    assert only == {"cat", "dog"}
    rare = {r.term for r in ST.inverted_index(docs, max_df=1).collect()}
    assert rare == {"fish"}


def test_build_vocab_rank_and_cap(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], "doc_id long, text string"
    )
    v = {r.token: (r.token_id, r["count"])
         for r in ST.build_vocab(docs).collect()}
    # a and b both count 3 -> tie broken by token asc
    assert v["a"] == (0, 3) and v["b"] == (1, 3)
    assert v["c"] == (2, 1) and v["d"] == (3, 1)
    capped = ST.build_vocab(docs, min_count=2, max_size=1).collect()
    assert [(r.token, r.token_id) for r in capped] == [("a", 0)]


def test_encode_tokens_with_unk(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], "doc_id long, text string"
    )
    vocab = ST.build_vocab(docs, min_count=2)  # keeps a, b only
    enc = {(r.doc_id, r.pos): r.token_id
           for r in ST.encode_tokens(docs, vocab).collect()}
    assert enc[(1, 0)] == 1 and enc[(1, 3)] == 0
    assert enc[(1, 5)] == -1  # 'c' below min_count -> unk
    assert enc[(2, 1)] == -1  # 'd' -> unk


# --- BPE merge training -----------------------------------------------------

def test_bpe_train_learns_expected_merges(spark):
    from judy_graph_db_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low lower")], "doc_id long, text string"
    )
    merges, vocab = bpe_train(docs, n_merges=3)
    got = [(r.rank, r.a, r.b, r["count"]) for r in
           sorted(merges.collect(), key=lambda r: r.rank)]
    # (l,o) and (o,w) tie at 3; lexicographic tiebreak picks (l,o)
    assert got == [(0, "l", "o", 3), (1, "lo", "w", 3),
                   (2, "low", "</w>", 2)]
    v = {r.symbol: r.freq for r in vocab.collect()}
    assert v["low</w>"] == 2      # 'low' fully merged
    assert v["low"] == 1          # prefix of 'lower'
    assert v["e"] == 1 and v["r"] == 1 and v["</w>"] == 1


def test_bpe_train_min_freq_and_budget_guard(spark):
    import pytest as _pt

    from judy_graph_db_spark.operators.bpe import bpe_train

    # hapax junk ("zzqx") can't win a merge: pruning it with
    # min_word_freq=2 leaves the learned merges byte-identical
    docs = spark.createDataFrame(
        [(1, "low low low low zzqx")], "doc_id long, text string"
    )
    base, _ = bpe_train(docs, n_merges=3)
    pruned, pv = bpe_train(docs, n_merges=3, min_word_freq=2)
    key = lambda r: r.rank  # noqa: E731
    assert [tuple(r) for r in sorted(base.collect(), key=key)] == \
           [tuple(r) for r in sorted(pruned.collect(), key=key)]
    # and the pruned vocab no longer carries the junk symbols
    assert "z" not in {r.symbol for r in pv.collect()}
    # identical merges on both strategies under the same pruning
    rel, _ = bpe_train(docs, n_merges=3, min_word_freq=2,
                       strategy="relational")
    assert [tuple(r) for r in sorted(rel.collect(), key=key)] == \
           [tuple(r) for r in sorted(pruned.collect(), key=key)]

    # the collect budget guard fires loudly instead of OOM-ing the driver
    with _pt.raises(ValueError, match="max_collect_rows"):
        bpe_train(docs, n_merges=3, strategy="local", max_collect_rows=1)


def test_bpe_batched_merges_equal_sequential(spark):
    """merges_per_round > 1 must learn the byte-identical merge list the
    one-merge-at-a-time loop learns (the disjoint-batch acceptance rule
    is a sufficient condition, not an approximation)."""
    from judy_graph_db_spark.operators.bpe import bpe_train

    texts = [(1, "the cat sat on the mat and the rat sat flat"),
             (2, "that hat is flat and the chat was fast"),
             (3, "cats chatter at the fat bats")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    key = lambda r: r.rank  # noqa: E731
    seq, _ = bpe_train(docs, n_merges=10, strategy="relational",
                       merges_per_round=1)
    bat, _ = bpe_train(docs, n_merges=10, strategy="relational",
                       merges_per_round=8)
    assert [tuple(r) for r in sorted(seq.collect(), key=key)] == \
           [tuple(r) for r in sorted(bat.collect(), key=key)]


def test_select_disjoint_merges_conflict_rules():
    """The batch acceptance rule: conflicts are skipped, an acceptance
    must STRICTLY beat every conflicting count (a created pair could tie
    it otherwise), and a truncated window bounds by its last row."""
    from judy_graph_db_spark.operators.bpe import _select_disjoint_merges

    # (l,o) wins; (o,w) shares 'o' -> conflict at 90; (x,y) at 95 beats
    # the conflict bound and batches; (p,q) at 90 does NOT (ties the
    # conflicting count a created pair could reach)
    rows = [("l", "o", 100), ("x", "y", 95), ("o", "w", 90),
            ("p", "q", 90), ("r", "s", 80)]
    got = _select_disjoint_merges(rows, 4, window_full=False)
    assert got == [("l", "o", 100), ("x", "y", 95)]
    # a forced conflict between the top two: only the first survives
    rows2 = [("a", "b", 50), ("b", "c", 49), ("d", "e", 48)]
    got2 = _select_disjoint_merges(rows2, 4, window_full=False)
    assert got2 == [("a", "b", 50)]  # (d,e)=48 <= conflict bound 49
    # concatenated-product collision counts as a conflict: ab == "ab"
    rows3 = [("a", "b", 50), ("ab", "c", 40), ("d", "e", 39)]
    got3 = _select_disjoint_merges(rows3, 4, window_full=False)
    assert got3 == [("a", "b", 50)]
    # truncated window: the last row's count bounds later acceptances
    rows4 = [("a", "b", 50), ("c", "d", 50)]
    assert _select_disjoint_merges(rows4, 4, window_full=True) == \
        [("a", "b", 50)]
    assert _select_disjoint_merges(rows4, 4, window_full=False) == rows4
    # max_batch caps the batch
    assert len(_select_disjoint_merges(rows, 1, window_full=False)) == 1


def test_bpe_train_matches_duckdb(spark):
    import duckdb

    from judy_graph_db_spark.operators.bpe import (bpe_train,
                                                   bpe_train_oracle_sql)
    from tests.oracle_utils import compare

    texts = [(1, "the cat sat on the mat"), (2, "that hat is flat"),
             (3, "cats chatter")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in texts:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    merges, vocab = bpe_train(docs, n_merges=6)
    out = merges.select(
        F.lit("merge").alias("op"), "rank", "a", "b",
        F.col("count").alias("cnt"),
    ).unionByName(vocab.select(
        F.lit("vocab").alias("op"), F.lit(None).cast("long").alias("rank"),
        F.col("symbol").alias("a"), F.lit(None).cast("string").alias("b"),
        F.col("freq").alias("cnt"),
    ))
    ok, msg = compare(out, con, bpe_train_oracle_sql(n_merges=6))
    assert ok, msg


def test_bpe_encode_replays_merges(spark):
    from judy_graph_db_spark.operators.bpe import bpe_encode, bpe_train

    train = spark.createDataFrame(
        [(1, "low low lower")], "doc_id long, text string"
    )
    merges, _ = bpe_train(train, n_merges=3)
    # merges: (l,o), (lo,w), (low,</w>)
    new = spark.createDataFrame([(9, "low slow")], "doc_id long, text string")
    out = sorted(
        (r.word_pos, r.sym_pos, r.symbol)
        for r in bpe_encode(new, merges).collect()
    )
    # 'low' -> ['low</w>']; 'slow' -> ['s','low</w>'] (merges apply inside)
    assert out == [(0, 0, "low</w>"), (1, 0, "s"), (1, 1, "low</w>")]
    # encode is shuffle-free: no Exchange in the physical plan
    plan = bpe_encode(new, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_wordpiece_prefers_rare_unit_pairs(spark):
    from judy_graph_db_spark.operators.bpe import bpe_train

    # classic WordPiece property: 'q'+'x' (each rare, always together)
    # outscores the more FREQUENT pair built from common units — plain BPE
    # would merge the frequent pair first.
    docs = spark.createDataFrame(
        [(1, "qx qx aa aa aa aa aa")], "doc_id long, text string"
    )
    wp, _ = bpe_train(docs, n_merges=1, score="likelihood")
    freq, _ = bpe_train(docs, n_merges=1, score="freq")
    assert (wp.first().a, wp.first().b) == ("q", "x")
    # plain BPE merges a frequent-unit pair instead ((a,</w>) and (a,a)
    # tie at 5; '</w>' < 'a' so the lexicographic tiebreak picks it)
    assert (freq.first().a, freq.first().b) == ("a", "</w>")


def test_wordpiece_local_matches_relational_and_duckdb(spark):
    import duckdb

    from judy_graph_db_spark.operators.bpe import (bpe_train,
                                                   bpe_train_oracle_sql)
    from tests.oracle_utils import compare

    texts = [(1, "the cat sat on the mat"), (2, "that hat is flat"),
             (3, "cats chatter")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    merges, vocab = bpe_train(docs, n_merges=6, score="likelihood",
                              strategy="local")
    rel, _ = bpe_train(docs, n_merges=6, score="likelihood",
                       strategy="relational")
    key = lambda r: r.rank  # noqa: E731
    assert [tuple(r) for r in sorted(merges.collect(), key=key)] == \
           [tuple(r) for r in sorted(rel.collect(), key=key)]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in texts:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    out = merges.select(
        F.lit("merge").alias("op"), "rank", "a", "b",
        F.col("count").alias("cnt"),
    ).unionByName(vocab.select(
        F.lit("vocab").alias("op"), F.lit(None).cast("long").alias("rank"),
        F.col("symbol").alias("a"), F.lit(None).cast("string").alias("b"),
        F.col("freq").alias("cnt"),
    ))
    ok, msg = compare(
        out, con, bpe_train_oracle_sql(n_merges=6, score="likelihood"))
    assert ok, msg


def test_ngram_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b")], "doc_id long, text string"
    )
    bi = {r.gram: r["count"] for r in ST.ngram_counts(docs, n=2).collect()}
    assert bi["a b"] == 3 and bi["b c"] == 1 and bi["c a"] == 1
    tri = {r.gram: r["count"] for r in ST.ngram_counts(docs, n=3).collect()}
    assert tri == {"a b c": 1, "b c a": 1, "c a b": 1}
    # a 1-token doc yields no bigrams (greatest() guard)
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert ST.ngram_counts(one, n=2).count() == 0


def test_ngram_counts_matches_duckdb(spark):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from tests.oracle_utils import compare

    texts = [(1, "the cat sat on the cat mat"), (2, "the cat! sat.")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in texts:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    ok, msg = compare(ST.ngram_counts(docs, n=2), con, O.ngram_counts_sql(n=2))
    assert ok, msg


def test_bm25_scores_match_hand_computation(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat fish"), (3, "bird bird bird bird")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score
           for r in ST.bm25_scores(docs, ["cat", "dog"]).collect()}
    N, avgdl, k1, b = 3, 3.0, 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want1 = bm25(2, 2, 3) + bm25(1, 1, 3)   # cat x2, dog x1
    want2 = bm25(1, 2, 2)                   # cat x1
    assert abs(got[1] - want1) < 1e-12
    assert abs(got[2] - want2) < 1e-12
    assert 3 not in got                     # no query terms -> no row
    # relevance ordering: doc 1 (both terms) above doc 2
    assert got[1] > got[2]


def test_bpe_train_local_matches_relational(spark):
    """The local (collected word-table) trainer must produce byte-identical
    merges and vocab to the relational per-round loop — same (count, a, b)
    tiebreak, same greedy fold."""
    from judy_graph_db_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest newest newer new"),
         (2, "widest wide wider new lower")],
        "doc_id long, text string",
    )
    m_rel, v_rel = bpe_train(docs, n_merges=12, strategy="relational")
    m_loc, v_loc = bpe_train(docs, n_merges=12, strategy="local")
    rel = [(r.rank, r.a, r.b, r["count"]) for r in
           sorted(m_rel.collect(), key=lambda r: r.rank)]
    loc = [(r.rank, r.a, r.b, r["count"]) for r in
           sorted(m_loc.collect(), key=lambda r: r.rank)]
    assert rel == loc
    assert sorted(map(tuple, v_rel.collect())) == \
        sorted(map(tuple, v_loc.collect()))


def test_bpe_train_many_merges_is_fast(spark):
    """256 merges must complete in seconds — the local trainer runs ONE
    distributed word count then an in-memory incremental merge loop, not
    256 sequential Spark jobs (a 50k-merge production tokenizer would be
    hours of job-launch overhead relationally)."""
    import time

    from judy_graph_db_spark.operators.bpe import bpe_train

    text = " ".join(f"token{i % 97}ish{i % 13}suffix" for i in range(3000))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.time()
    merges, vocab = bpe_train(docs, n_merges=256)  # auto -> local
    n = merges.count()
    dt = time.time() - t0
    assert n > 100  # enough pairs existed to keep merging
    assert vocab.count() > 0
    assert dt < 30, f"local BPE training took {dt:.1f}s"


def test_repetition_signals(spark):
    """Gopher-style repetition permilles: hand-checked values on known
    texts, no row when the doc is shorter than n, DuckDB twin agrees."""
    import duckdb

    from judy_graph_db_spark.oracle import repetition_signals_sql

    rows = [
        (1, "the cat sat on the cat sat again the cat sat"),
        (2, "one two"),
        (3, "tiny"),
        (4, "a a a a a a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in ST.repetition_signals(docs).collect())
    # doc1: 10 bigram slots, "the cat"x3 + "cat sat"x3 duplicated -> 600
    assert (1, 2, 10, 300, 600) in got
    assert (4, 2, 5, 1000, 1000) in got        # degenerate "a a ..." doc
    assert (2, 2, 1, 1000, 0) in got           # single bigram, no dup
    assert not any(r[0] == 3 for r in got)     # 1 token -> no rows at all
    assert not any(r[0] == 2 and r[1] > 2 for r in got)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = sorted(tuple(t)
                  for t in con.execute(repetition_signals_sql()).fetchall())
    assert got == twin
    import pytest
    with pytest.raises(ValueError, match=">= 2"):
        ST.repetition_signals(docs, ns=(1, 2))


def test_token_surprisal(spark):
    """floor-log2 unigram surprisal: hand-computed bits, and the DuckDB
    twin agrees bit-for-bit (integer log2 via length(bin(x))-1)."""
    import duckdb

    from judy_graph_db_spark.operators import stats as STT
    from judy_graph_db_spark.oracle import token_surprisal_sql

    rows = [(1, "aa aa aa aa"), (2, "aa aa bb cc")]
    # corpus: T=8; c(aa)=6, c(bb)=1, c(cc)=1
    # bits(aa) = floor(log2(8//6=1)) = 0; bits(bb)=bits(cc)=floor(log2 8)=3
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.surprisal_bits, r.mean_bits_milli)
           for r in STT.token_surprisal(docs).collect()}
    assert got[1] == (4, 0, 0)
    assert got[2] == (4, 6, 1500)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {t[0]: (t[1], t[2], t[3]) for t in con.execute(
        token_surprisal_sql()).fetchall()}
    assert got == twin


def test_hashed_tf(spark):
    """Hashing trick: fixed-width buckets, counts add up, twin agrees."""
    import duckdb

    from judy_graph_db_spark.operators import stats as STT
    from judy_graph_db_spark.oracle import hashed_tf_sql

    rows = [(1, "alpha beta alpha"), (2, "beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in STT.hashed_tf(
        docs, n_features=16, seed=2).collect())
    assert sum(t for *_, t in got) == 5          # every token lands once
    assert all(0 <= b < 16 for _, b, _ in got)
    # identical tokens share a bucket across docs
    b1 = {b for d, b, t in got if d == 1}
    b2 = {b for d, b, t in got if d == 2}
    assert b1 & b2                               # 'beta' is shared
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = sorted(tuple(t) for t in con.execute(
        hashed_tf_sql(n_features=16, seed=2)).fetchall())
    assert got == twin


def test_collocation_scores(spark):
    """word2phrase score: a fused pair scores far above a chance pair;
    delta discounts; twin agrees."""
    import duckdb

    from judy_graph_db_spark.operators import stats as STT
    from judy_graph_db_spark.oracle import collocation_scores_sql

    rows = [(1, "new york new york new york trip"),
            (2, "old trip to new york today"),
            (3, "old shoes and old hats today")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.w_a, r.w_b): (r.n_pair, r.score_milli)
           for r in STT.collocation_scores(docs, min_count=2).collect()}
    assert got[("new", "york")][0] == 4
    # fused pair scores >> any chance co-occurrence of 'old'
    chance = [v for (a, b), (n, v) in got.items() if a == "old" or b == "old"]
    assert all(got[("new", "york")][1] > v for v in chance) or not chance
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {(t[0], t[1]): (t[2], t[3]) for t in con.execute(
        collocation_scores_sql(min_count=2)).fetchall()}
    assert got == twin
    # delta shrinks every score
    d1 = {(r.w_a, r.w_b): r.score_milli for r in STT.collocation_scores(
        docs, min_count=2, delta=1).collect()}
    assert all(d1[k] <= got[k][1] for k in d1)


def test_char_entropy_bits(spark):
    import duckdb

    from judy_graph_db_spark.operators import stats as STT
    from judy_graph_db_spark.oracle import char_entropy_bits_sql

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcdefgh")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_chars, r.entropy_bits, r.mean_milli_bits)
           for r in STT.char_entropy_bits(docs).collect()}
    # 'aaaa': log2(4//4)=0 -> 0; 'abab': each char n=2, L=4 -> 4·1 = 4;
    # 'abcdefgh': 8 chars n=1 -> 8·3 = 24
    assert got == {1: (4, 0, 0), 2: (4, 4, 1000), 3: (8, 24, 3000)}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {t[0]: tuple(t[1:]) for t in con.execute(
        char_entropy_bits_sql()).fetchall()}
    assert got == twin


def test_zipf_bits_stats(spark):
    import duckdb

    from judy_graph_db_spark.operators import stats as STT
    from judy_graph_db_spark.oracle import zipf_bits_stats_sql

    rows = [(1, "a a a a b b c"), (2, "a a b d")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    row = STT.zipf_bits_stats(docs).collect()[0]
    # vocab (count desc, token): a=6(id0), b=3(id1), c=1, d=1
    # x = bits(id+1): 0,1,1,2 ; y = bits(count): 2,1,0,0
    assert tuple(row) == (4, 4, 3, 1, 6)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    assert tuple(row) == con.execute(zipf_bits_stats_sql()).fetchone()


def test_ngram_novelty(spark):
    import duckdb

    from judy_graph_db_spark.operators import stats as STT
    from judy_graph_db_spark.oracle import ngram_novelty_sql

    rows = [(1, "the quick brown fox jumps"),
            (2, "the quick brown cat sleeps"),
            (3, "zz")]                        # < n grams: no row
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.novel_permille)
           for r in STT.ngram_novelty(docs, n=3).collect()}
    # doc1: 3 grams, 'the quick brown' shared -> 2/3 novel = 666
    assert got[1] == (3, 666) and got[2] == (3, 666)
    assert 3 not in got
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {t[0]: (t[1], t[2]) for t in con.execute(
        ngram_novelty_sql(n=3)).fetchall()}
    assert got == twin


def test_linear_score(spark):
    """Integer dot product vs a python replica; empty-feature docs absent
    (score only defined over featurized docs); unmatched buckets weigh 0."""
    from judy_graph_db_spark.operators.stats import hashed_tf, linear_score

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "cherry banana"), (3, "apple")],
        "doc_id long, text string")
    feats = hashed_tf(docs, n_features=16, seed=1)
    rows = feats.collect()
    weights = spark.createDataFrame(
        [(b, (b * 7) % 11 - 5) for b in range(8)],  # only half the buckets
        "bucket long, w long")
    wmap = {b: (b * 7) % 11 - 5 for b in range(8)}
    want = {}
    for r in rows:
        want[r.doc_id] = want.get(r.doc_id, 100) + r.tf * wmap.get(r.bucket, 0)
    got = {r.doc_id: r.score
           for r in linear_score(feats, weights, bias=100).collect()}
    assert got == want
    # plan: weight side broadcast
    plan = linear_score(feats, weights)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ranking_auc(spark):
    """Matches sklearn-style pairwise AUC on random data incl. ties;
    degenerate single-class input yields NULL auc."""
    import random

    from judy_graph_db_spark.operators.stats import ranking_auc

    rng = random.Random(7)
    rows = [(rng.randrange(10), rng.randrange(2)) for _ in range(200)]
    df = spark.createDataFrame(rows, "score long, label long")
    got = ranking_auc(df).collect()[0]
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    auc = (wins + ties / 2) / (len(pos) * len(neg))
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert got.u2 == 2 * wins + ties
    assert got.auc_micro == int(auc * 1_000_000) or \
        abs(got.auc_micro - auc * 1_000_000) < 1
    # perfect separation
    perf = spark.createDataFrame(
        [(1, 0), (2, 0), (5, 1), (9, 1)], "score long, label long")
    assert ranking_auc(perf).collect()[0].auc_micro == 1_000_000
    # single class -> NULL
    one = spark.createDataFrame([(3, 1), (4, 1)], "score long, label long")
    assert ranking_auc(one).collect()[0].auc_micro is None


def test_quantile_bins(spark):
    """Closed-form bin == percentile_disc cutoff counting; ties share a
    bin; grouped variant bins within each group."""
    from judy_graph_db_spark.operators.stats import quantile_bins

    rows = [(i, v) for i, v in enumerate(
        [5, 1, 9, 1, 7, 3, 3, 8, 2, 6, 4, 4])]
    df = spark.createDataFrame(rows, "id long, v long")
    nbins = 4
    got = {r.id: r.bin for r in quantile_bins(df, "v", nbins).collect()}
    # replica: percentile_disc cutoffs, bin = count of cutoffs < v
    vals = sorted(v for _, v in rows)
    n = len(vals)
    cuts = [vals[max(-(-k * n // nbins), 1) - 1] for k in range(1, nbins)]
    want = {i: sum(1 for c in cuts if c < v) for i, v in rows}
    assert got == want
    # ties always share a bin
    bin_by_val = {}
    for i, v in rows:
        bin_by_val.setdefault(v, set()).add(got[i])
    assert all(len(s) == 1 for s in bin_by_val.values())
    # grouped: each group bins independently
    grows = [("a", i, v) for i, v in enumerate([1, 2, 3, 4])] + \
            [("b", i, v) for i, v in enumerate([100, 200, 300, 400])]
    gdf = spark.createDataFrame(grows, "g string, id long, v long")
    gg = {(r.g, r.id): r.bin
          for r in quantile_bins(gdf, "v", 2, group_cols=["g"]).collect()}
    assert gg == {("a", 0): 0, ("a", 1): 0, ("a", 2): 1, ("a", 3): 1,
                  ("b", 0): 0, ("b", 1): 0, ("b", 2): 1, ("b", 3): 1}


def test_quantile_bins_nulls(spark):
    """NULL values keep a NULL bin (surfaced, not dropped); a NULL group
    key bins within its own group; non-null bins ignore the NULL rows."""
    from judy_graph_db_spark.operators.stats import quantile_bins

    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 20), (3, None), (4, 30), (5, 40)],
        "id long, v long")
    out = {r.id: r.bin for r in quantile_bins(df, "v", 2).collect()}
    assert len(out) == 6                       # no rows vanish
    assert out[1] is None and out[3] is None   # NULL value -> NULL bin
    assert out == {0: 0, 1: None, 2: 0, 3: None, 4: 1, 5: 1}

    gdf = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 2), (None, 2, 5), (None, 3, 6),
         (None, 4, None)],
        "g string, id long, v long")
    gg = {r.id: r.bin
          for r in quantile_bins(gdf, "v", 2, group_cols=["g"]).collect()}
    assert gg == {0: 0, 1: 1, 2: 0, 3: 1, 4: None}


def test_token_dist_divergence(spark):
    """Identical corpora are symmetric; a drifted snapshot inflates the
    cross term; python replica matches exactly."""
    from judy_graph_db_spark.operators.stats import token_dist_divergence

    a = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat")],
        "doc_id long, text string")
    same = token_dist_divergence(a, a).collect()[0]
    assert same.ta == same.tb and same.xab_bits == same.xba_bits

    b = spark.createDataFrame(
        [(1, "quantum flux capacitor array"), (2, "the cat sat")],
        "doc_id long, text string")
    got = token_dist_divergence(a, b).collect()[0]

    def replica(ca, cb):
        import collections
        import re
        A = collections.Counter(
            t for _, txt in ca for t in re.findall(r"[a-z0-9]+", txt.lower()))
        B = collections.Counter(
            t for _, txt in cb for t in re.findall(r"[a-z0-9]+", txt.lower()))
        vocab = set(A) | set(B)
        ta, tb, v = sum(A.values()), sum(B.values()), len(vocab)
        def bits(x):
            return x.bit_length() - 1
        xab = sum(c * bits((tb + v) // (B[t] + 1)) for t, c in A.items())
        xba = sum(c * bits((ta + v) // (A[t] + 1)) for t, c in B.items())
        return ta, tb, v, xab, xba
    ta, tb, v, xab, xba = replica(
        [(1, "the cat sat on the mat"), (2, "the dog sat")],
        [(1, "quantum flux capacitor array"), (2, "the cat sat")])
    assert (got.ta, got.tb, got.v_union, got.xab_bits, got.xba_bits) == \
        (ta, tb, v, xab, xba)
    assert got.xab_mean_milli == 1000 * xab // ta
    # drifted corpora are more surprising than the self term
    assert got.xab_bits * same.ta >= same.xab_bits * got.ta


def test_score_bigrams_stupid_backoff(spark):
    """Held-out scoring matches a python replica (seen bigram, unigram
    backoff +1 bit, uniform floor); self-scoring never backs off."""
    import collections
    import re

    from judy_graph_db_spark.operators.stats import (bigram_surprisal,
                                                     score_bigrams)

    ref_rows = [(1, "the cat sat on the mat"), (2, "the cat ran")]
    new_rows = [(10, "the cat sat"), (11, "purple cat flew")]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    def toks(t):
        return re.findall(r"[a-z0-9]+", t.lower())

    U = collections.Counter(t for _, x in ref_rows for t in toks(x))
    B = collections.Counter()
    for _, x in ref_rows:
        ts = toks(x)
        for a, b in zip(ts, ts[1:]):
            B[(a, b)] += 1
    T, V = sum(U.values()), len(U)

    def bits(x):
        return x.bit_length() - 1

    want = {}
    for i, x in new_rows:
        ts = toks(x)
        nb = sb = bk = 0
        for a, b in zip(ts, ts[1:]):
            nb += 1
            if (a, b) in B:
                sb += bits(U[a] // B[(a, b)])
            elif b in U:
                sb += 1 + bits((T + V) // U[b])
                bk += 1
            else:
                sb += 1 + bits(T + V)
                bk += 1
        want[i] = (nb, bk, sb, 1000 * sb // nb)
    got = {r.doc_id: (r.n_bigrams, r.n_backoffs, r.sb_bits,
                      r.mean_bits_milli)
           for r in score_bigrams(new, ref).collect()}
    assert got == want
    assert got[11][1] >= 1  # 'purple cat' and 'cat flew' unseen
    # self-scoring: no backoffs, < 2-token docs absent
    solo = spark.createDataFrame(
        ref_rows + [(3, "word")], "doc_id long, text string")
    self_got = {r.doc_id: r.n_backoffs
                for r in bigram_surprisal(solo).collect()}
    assert set(self_got) == {1, 2} and all(v == 0 for v in self_got.values())


def test_grouped_median_mad(spark):
    """Median/MAD per group vs a python replica (percentile_disc pick);
    robust to an injected outlier."""
    from judy_graph_db_spark.operators.stats import grouped_median_mad

    rows = [("a", v) for v in [1, 2, 3, 4, 100]] + \
           [("b", v) for v in [10, 10, 10]]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: (r.median, r.mad)
           for r in grouped_median_mad(df, ["g"], "v").collect()}

    def disc_median(vals):
        vals = sorted(vals)
        return vals[max(-(-1 * len(vals) // 2), 1) - 1]

    for g in ("a", "b"):
        vals = [v for gg, v in rows if gg == g]
        med = disc_median(vals)
        mad = disc_median([abs(v - med) for v in vals])
        assert got[g] == (med, mad), g
    # outlier barely moves the robust pair
    assert got["a"] == (3, 1)
    assert got["b"] == (10, 0)


def test_perceptron_train_separable(spark):
    # two vocabularies that never collide in 64 buckets -> separable
    docs = spark.createDataFrame(
        [(i, "good clean prose text" if i % 2 else "spam junk casino win")
         for i in range(20)], "doc_id long, text string")
    labels = docs.select("doc_id", (F.col("doc_id") % 2).alias("label"))
    feats = ST.hashed_tf(docs, n_features=64, seed=3)
    w, bias, errors = ST.perceptron_train(feats, labels, iters=5)
    assert errors[0] == 20          # zero weights misclassify everything
    assert errors[-1] == 0          # converged on a separable problem
    scored = ST.linear_score(feats, w, bias=bias)
    got = {r.doc_id: r.score for r in scored.collect()}
    for i in range(20):
        assert (got[i] > 0) == bool(i % 2), (i, got[i])


def test_perceptron_train_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 11} filler word")
         for i in range(30)], "doc_id long, text string")
    labels = docs.select("doc_id", (F.col("doc_id") % 3 == 0)
                         .cast("int").alias("label"))
    feats = ST.hashed_tf(docs, n_features=32, seed=1)
    r1 = ST.perceptron_train(feats, labels, iters=3)
    r2 = ST.perceptron_train(feats.repartition(7), labels, iters=3)
    assert r1[1] == r2[1] and r1[2] == r2[2]
    assert sorted(map(tuple, r1[0].collect())) == \
        sorted(map(tuple, r2[0].collect()))


def test_kneser_ney_matches_twin_and_python(spark):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from tests.oracle_utils import compare

    texts = ["the cat sat on the mat and the cat ran",
             "a dog sat on a log and the dog ran off",
             "the cat and the dog sat near the old mat"]
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i + 1, t])
    out = ST.kneser_ney_score_bigrams(
        docs.filter("doc_id = 1"), docs.filter("doc_id <> 1"))
    ok, msg = compare(out, con, O.kneser_ney_sql(
        score_where="doc_id = 1", ref_where="doc_id <> 1"))
    assert ok, msg
    # python replica of the interpolated-KN fixed-point formula on one
    # known pair: 'the cat' — cb=2 ('the cat' twice in ref? doc2+doc3:
    # doc3 has 'the cat'; doc2 none -> cb=1), c1b = count of bigrams
    # starting 'the' in ref, n1f distinct, pc from continuations
    row = out.collect()[0]
    assert row.n_bigrams == 9 and row.kn_bits > 0
    # a SEEN pair must always cost fewer bits than the unseen cap
    assert row.mean_bits_milli < 20000


def test_kneser_ney_prefers_plausible_sequences(spark):
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and "
             "the quick brown fox rests") for i in range(1, 4)],
        "doc_id long, text string")
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps"),
         (200, "fox the jumps quick brown")],   # shuffled
        "doc_id long, text string")
    got = {r.doc_id: r.mean_bits_milli
           for r in ST.kneser_ney_score_bigrams(probe, ref).collect()}
    assert got[100] < got[200]


def test_bpe_train_single_symbol_words_survive_merges(spark):
    """A word that collapses to ONE symbol mid-training must not crash
    the pair scan (Spark's sequence(1,0) is descending — regression for
    the sf1.0 probe crash)."""
    from judy_graph_db_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "ab ab ab ab x x x ab")], "doc_id long, text string")
    # merge 1 fuses a+b -> 'ab' becomes a single symbol; later rounds
    # must still scan pairs without touching out-of-bounds indices
    merges, vocab = bpe_train(docs, n_merges=4, strategy="relational")
    assert merges.count() >= 1
    syms = {r.symbol for r in vocab.collect()}
    assert "x</w>" in syms and any(s.startswith("ab") for s in syms)
