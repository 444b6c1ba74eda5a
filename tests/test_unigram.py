"""Unigram-LM tokenizer (Kudo 2018 hard-EM variant): seeding, whole-bit
costs, Viterbi segmentation, training rounds, encode — and the DuckDB
DP-unroll twins that hash-gate the driver bundle rows."""

import duckdb
import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark.operators import unigram as U
from tests.oracle_utils import compare


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _duck(texts):
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i + 1, t])
    return con


def test_seed_vocab_keeps_all_chars_and_top_substrings(spark):
    docs = _docs(spark, ["aaab aaab xy"])
    v = {r.piece: r.cnt for r in
         U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=2).collect()}
    # every char present; 'a' occurs 3 per 'aaab' x2 = 6
    assert v["a"] == 6 and v["b"] == 2 and v["x"] == 1 and v["y"] == 1
    # top-2 multi-char: 'aa' (2 per word x2 = 4) and 'aaa'/'aab'/'ab' tie
    # at 2 -> piece ASC picks 'aab'... check the two kept are cnt-ordered
    multi = {p: c for p, c in v.items() if len(p) >= 2}
    assert len(multi) == 2 and multi["aa"] == 4


def test_piece_costs_whole_bits(spark):
    vocab = spark.createDataFrame(
        [("a", 8), ("b", 4), ("c", 4)], "piece string, cnt long"
    )
    got = {r.piece: r.cost_bits
           for r in U.with_piece_costs(vocab).collect()}
    # total=16: a -> len(bin(2))=2; b,c -> len(bin(4))=3
    assert got == {"a": 2, "b": 3, "c": 3}


def test_viterbi_prefers_cheap_long_pieces():
    costs = {"a": 3, "b": 4, "ab": 4, "abab": 5}
    pieces, packed = U._viterbi("ababa", costs, 4, 64)
    # abab(5) + a(3) = 8 bits, 2 pieces beats ab+ab+a (11,3) etc.
    assert pieces == ["abab", "a"]
    assert packed == 8 * U.PACK + 2
    # unseen char falls back to UNK cost
    p2, v2 = U._viterbi("aqa", {"a": 1}, 4, 64)
    assert p2 == ["a", "q", "a"] and v2 == (1 + 64 + 1) * U.PACK + 3


def test_viterbi_tie_prefers_fewer_pieces():
    # "ab" as one piece (cost 6) vs "a"+"b" (3+3=6): same bits, packed
    # n_pieces field breaks the tie toward the single piece
    pieces, packed = U._viterbi("ab", {"a": 3, "b": 3, "ab": 6}, 4, 64)
    assert pieces == ["ab"]
    assert packed == 6 * U.PACK + 1


def test_viterbi_long_words_pack_without_carry():
    import pytest

    # 100 single-char pieces: n_pieces=100 must not carry into cost_bits
    # (it did under the old PACK=64)
    word = "a" * 100
    pieces, packed = U._viterbi(word, {"a": 2}, 4, 64)
    assert len(pieces) == 100
    assert packed // U.PACK == 200 and packed % U.PACK == 100
    # at the documented bound the guard fires loudly
    with pytest.raises(ValueError, match="PACK"):
        U._viterbi("a" * U.PACK, {"a": 2}, 4, 64)


def test_segment_words_matches_local_viterbi(spark):
    docs = _docs(spark, ["the cat sat on the mat", "that hat is flat"])
    costed = U.with_piece_costs(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=16))
    cost_map = {r.piece: r.cost_bits for r in costed.collect()}
    words = spark.createDataFrame(
        [("that",), ("flat",), ("cat",)], "word string")
    got = {r.word: (list(r.pieces), r.packed)
           for r in U.unigram_segment_words(words, costed, 3).collect()}
    for w in ("that", "flat", "cat"):
        assert got[w] == tuple([U._viterbi(w, cost_map, 3, 64)][0]) or \
            got[w] == U._viterbi(w, cost_map, 3, 64)


def test_seed_oracle_matches_duckdb(spark):
    texts = ["the cat sat on the mat", "that hat is flat", "cats chatter"]
    docs = _docs(spark, texts)
    con = _duck(texts)
    out = U.with_piece_costs(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=24))
    ok, msg = compare(
        out, con, U.unigram_seed_oracle_sql(max_piece_len=3, seed_size=24))
    assert ok, msg


def test_segment_oracle_matches_duckdb(spark):
    texts = ["the cat sat on the mat", "that hat is flat",
             "cats chatter chat that"]
    docs = _docs(spark, texts)
    con = _duck(texts)
    costed = U.with_piece_costs(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=24))
    words = (
        docs.select(F.explode(F.regexp_extract_all(
            F.lower("text"), F.lit(U.WORD_TOKEN_RE), F.lit(0))).alias("word"))
        .distinct().filter(F.length("word") <= 12)
    )
    out = U.unigram_segment_words(words, costed, 3).select(
        "word", "packed", "n_pieces")
    ok, msg = compare(
        out, con,
        U.unigram_segment_oracle_sql(max_piece_len=3, seed_size=24,
                                     max_word_len=12))
    assert ok, msg


def test_train_rounds_concentrate_counts(spark):
    docs = _docs(spark, ["banana banana banana bandana"])
    vocab = U.unigram_train(docs, rounds=2, max_piece_len=3, seed_size=8)
    rows = {r.piece: (r.cnt, r.cost_bits) for r in vocab.collect()}
    # all single chars survive training
    for ch in "band":
        assert ch in rows
    # the segmentation-derived counts only count WINNING pieces: total
    # count mass equals total pieces emitted, so costs stay consistent
    assert all(c >= 1 for c, _ in rows.values())
    # a frequent substring of 'banana' made it into the trained vocab
    assert any(len(p) >= 2 for p in rows)


def test_unigram_encode_shapes_and_reassembly(spark):
    docs = _docs(spark, ["banana cab", "ban cab"])
    vocab = U.unigram_train(docs, rounds=1, max_piece_len=3, seed_size=8)
    enc = U.unigram_encode(docs, vocab).collect()
    # reassembling pieces per (doc, word_pos) rebuilds the exact word
    by_word = {}
    for r in enc:
        by_word.setdefault((r.doc_id, r.word_pos), []).append(
            (r.piece_pos, r.piece))
    rebuilt = {k: "".join(p for _, p in sorted(v))
               for k, v in by_word.items()}
    assert rebuilt[(1, 0)] == "banana"
    assert rebuilt[(1, 1)] == "cab"
    assert rebuilt[(2, 0)] == "ban"


def test_encode_segments_each_distinct_word_once(spark):
    # plan shape: the Viterbi stage feeds from a distinct-word relation,
    # so the same word in many docs segments once
    docs = _docs(spark, ["cab cab cab", "cab cab"])
    vocab = U.unigram_train(docs, rounds=1, max_piece_len=3, seed_size=4)
    enc = U.unigram_encode(docs, vocab)
    rows = enc.collect()
    assert {r.doc_id for r in rows} == {1, 2}
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
