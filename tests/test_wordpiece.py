"""WordPiece greedy segmentation: longest-match semantics, [UNK]
collapse, encode shape, and the unrolled-greedy DuckDB twin."""

import duckdb
from pyspark.sql import functions as F

from judy_graph_db_spark.operators import unigram as U
from judy_graph_db_spark.operators import wordpiece as W
from tests.oracle_utils import compare


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _vocab(spark, pieces):
    return spark.createDataFrame([(p,) for p in pieces], "piece string")


def test_greedy_longest_match_and_continuation(spark):
    # vocab: un ##able ##a ##b ##l ##e u ##n a b l e
    vocab = _vocab(spark, ["un", "##able", "##a", "##b", "##l", "##e",
                           "u", "##n", "a", "b", "l", "e"])
    words = spark.createDataFrame([("unable",), ("able",)], "word string")
    got = {r.word: (list(r.pieces), r.n_pieces, r.is_unk)
           for r in W.wordpiece_segment_words(
               words, vocab, max_piece_len=6).collect()}
    # greedy takes 'un' (longest initial) then '##able' in one bite
    assert got["unable"] == (["un", "##able"], 2, False)
    # 'able' word-initially: no 'able'/'abl'/'ab' piece -> 'a' then '##b..'
    assert got["able"] == (["a", "##b", "##l", "##e"], 4, False)


def test_unk_collapse(spark):
    vocab = _vocab(spark, ["a", "##a"])
    words = spark.createDataFrame([("aaa",), ("axa",)], "word string")
    got = {r.word: (list(r.pieces), r.is_unk)
           for r in W.wordpiece_segment_words(
               words, vocab, max_piece_len=3).collect()}
    assert got["aaa"] == (["a", "##a", "##a"], False)
    # 'x' never matches -> the WHOLE word is [UNK], not a partial prefix
    assert got["axa"] == (["[UNK]"], True)


def test_max_pieces_collapse(spark):
    vocab = _vocab(spark, ["a", "##a"])
    words = spark.createDataFrame([("aaaa",)], "word string")
    out = W.wordpiece_segment_words(words, vocab, max_piece_len=1,
                                    max_pieces=3).collect()[0]
    assert list(out.pieces) == ["[UNK]"] and out.is_unk


def test_wordpiece_encode_shape(spark):
    docs = _docs(spark, ["banana cab", "ban cab"])
    vocab = W.wordpiece_vocab_from_pieces(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=8))
    enc = W.wordpiece_encode(docs, vocab, max_piece_len=3)
    rows = enc.collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    # reassembly: concatenating pieces (## stripped) re-spells each word
    from collections import defaultdict
    spelled = defaultdict(str)
    for r in sorted(rows, key=lambda r: (r.doc_id, r.word_pos, r.piece_pos)):
        spelled[(r.doc_id, r.word_pos)] += r.piece.replace("##", "")
    assert spelled[(1, 0)] == "banana" and spelled[(2, 1)] == "cab"


def test_wordpiece_twin_agreement(spark):
    texts = ["banana band cabana cab abba", "cab cabal banal banana"]
    docs = _docs(spark, texts)
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i + 1, t])
    vocab = W.wordpiece_vocab_from_pieces(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=24))
    words = (
        docs.select(F.explode(F.regexp_extract_all(
            F.lower("text"), F.lit(U.WORD_TOKEN_RE), F.lit(0))).alias("word"))
        .distinct().filter(F.length("word") <= 12)
    )
    out = W.wordpiece_segment_words(words, vocab, max_piece_len=3).select(
        "word", F.array_join("pieces", "|").alias("toks"),
        "n_pieces", "is_unk")
    ok, msg = compare(
        out, con,
        W.wordpiece_segment_oracle_sql(max_piece_len=3, seed_size=24,
                                       max_word_len=12))
    assert ok, msg


def test_wordpiece_emit_twin_agreement(spark):
    """Full tokenize-and-pack path vs the composed DuckDB twin."""
    from pyspark.sql import Window as _W

    from judy_graph_db_spark.operators.curation import (
        emit_training_sequences)

    texts = ["banana band cabana cab abba", "cab cabal banal banana",
             "ban cab abba banana cabana"]
    docs = _docs(spark, texts)
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i + 1, t])
    wpv = W.wordpiece_vocab_from_pieces(
        U.unigram_seed_vocab(docs, max_piece_len=3, seed_size=24))
    vocab = wpv.withColumn(
        "token_id", F.row_number().over(_W.orderBy("piece")).cast("long"))
    enc = W.wordpiece_encode(docs, wpv, max_piece_len=3)
    out = emit_training_sequences(enc, vocab, seq_len=8).select(
        "seq_id", F.concat_ws("|", "tokens").alias("toks"), "n_tokens")
    ok, msg = compare(out, con, W.wordpiece_emit_oracle_sql(
        seq_len=8, max_piece_len=3, seed_size=24))
    assert ok, msg
