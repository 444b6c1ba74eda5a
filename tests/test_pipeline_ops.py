"""Tests for the training-data pipeline operators (SURVEY.md §7.2 M6):
dedup, similarity search, text analysis, multimodal plumbing — run against
the driver's sf0.001 documents/embeddings tables."""

import os

import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark.functions import text as T
from judy_graph_db_spark.operators import dedup as D
from judy_graph_db_spark.operators import multimodal as M
from judy_graph_db_spark.operators import similarity as S

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


# ----------------------------------------------------------------- dedup

def test_exact_dedup_partitions_corpus(docs):
    groups = D.exact_dedup(docs).collect()
    assert sum(r.n_copies for r in groups) == docs.count()
    # keeper must be a member of its own group
    keep = D.dedup_keep_first(docs)
    assert keep.count() == len(groups)
    # dedup is idempotent
    assert D.dedup_keep_first(keep).count() == len(groups)


def test_exact_dedup_finds_real_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    groups = {r.keep_id: r.n_copies for r in D.exact_dedup(df).collect()}
    assert groups == {1: 2, 3: 1}


def test_normalized_dedup_collapses_whitespace_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world "), (3, "bye")],
        "doc_id long, text string",
    )
    assert D.exact_dedup_normalized(df).count() == 2


def test_minhash_lsh_catches_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely different content here xyz")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_candidates(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_candidates_ordered_and_distinct(docs):
    pairs = D.minhash_lsh_candidates(docs.limit(200)).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)
    assert len(pairs) == len({(r.doc_a, r.doc_b) for r in pairs})


def test_ngram_jaccard_scores(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "zzz qqq vvv www unrelated text entirely")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    j = {(r.doc_a, r.doc_b): r.jaccard_permille for r in D.ngram_jaccard_pairs(df, cands).collect()}
    assert j[(1, 2)] == 1000  # identical
    assert j[(1, 3)] < 300


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.sh for r in df.select("doc_id", D.simhash(F.col("text")).alias("sh")).collect()}
    assert rows[1] == rows[2]
    assert len(rows[1]) == 16 and set(rows[1]) <= {"0", "1"}


# ------------------------------------------------------------- similarity

def test_bruteforce_topk_shape_and_order(embs):
    top = S.cosine_topk_bruteforce(embs, query_id=0, k=10).collect()
    assert len(top) == 10
    sims = [r.sim_micro for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(r.vec_id != 0 for r in top)
    assert [r.rank for r in top] == list(range(1, 11))


def test_self_similarity_is_max(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    top = S.cosine_topk_bruteforce(df, query_id=0, k=3).collect()
    assert top[0].vec_id == 1 and top[0].sim_micro == 1000000
    assert top[-1].vec_id == 3 and top[-1].sim_micro == -1000000


def test_lsh_topk_subset_of_bucket(embs):
    approx = S.lsh_topk(embs, query_id=0, k=5, n_planes=3)
    rows = approx.collect()
    assert len(rows) <= 5
    # every returned neighbor shares the query's bucket
    buckets = {r.vec_id: r.bucket for r in S.hyperplane_buckets(embs, 3).collect()}
    for r in rows:
        assert buckets[r.vec_id] == buckets[0]


def test_rrf_fuse(spark):
    # doc 5 appears in both lists (ranks 1 and 2), doc 6 only in one
    la = spark.createDataFrame([(5, 1), (6, 2)], "id long, rank long")
    lb = spark.createDataFrame([(5, 2), (7, 1)], "id long, rank long")
    got = {r.id: (r.n_lists, r.rrf_micro)
           for r in S.rrf_fuse([la, lb], k0=60).collect()}
    assert got[5] == (2, 1000000 // 61 + 1000000 // 62)
    assert got[6] == (1, 1000000 // 62)
    assert got[7] == (1, 1000000 // 61)
    import duckdb

    con = duckdb.connect()
    twin = {t[0]: (t[1], t[2]) for t in con.execute(S.rrf_fuse_oracle_sql(
        ["SELECT 5 AS id, 1 AS rank UNION ALL SELECT 6, 2",
         "SELECT 5 AS id, 2 AS rank UNION ALL SELECT 7, 1"], k0=60)
    ).fetchall()}
    assert got == twin
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        S.rrf_fuse([])


def test_topk_recall(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)], "query_id long, id long")
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99)], "query_id long, id long")
    got = {r.query_id: (r.n_exact, r.n_hit, r.recall_permille)
           for r in S.topk_recall(approx, exact).collect()}
    # query 1: 2 of 3 found -> 666; query 2 absent from approx -> 0
    assert got == {1: (3, 2, 666), 2: (1, 0, 0)}
    import duckdb

    con = duckdb.connect()
    twin = {t[0]: (t[1], t[2], t[3]) for t in con.execute(
        S.topk_recall_oracle_sql(
            "SELECT 1 AS query_id, 10 AS id UNION ALL SELECT 1, 12 "
            "UNION ALL SELECT 1, 99",
            "SELECT 1 AS query_id, 10 AS id UNION ALL SELECT 1, 11 "
            "UNION ALL SELECT 1, 12 UNION ALL SELECT 2, 20")
    ).fetchall()}
    assert got == twin


def test_ivf_assign_covers_all_vectors(embs):
    assign = S.ivf_assign(embs, n_cells=4)
    assert assign.count() == embs.count()
    cells = {r.cell for r in assign.select("cell").distinct().collect()}
    assert cells <= {0, 1, 2, 3}
    top = S.ivf_topk(embs, query_id=7, k=5).collect()
    assert 1 <= len(top) <= 5


# ------------------------------------------------------------------ text

def test_token_counts(spark):
    df = spark.createDataFrame([(1, "one two  three"), (2, ""), (3, "  ")], "id long, text string")
    got = {r.id: r.n for r in df.select("id", T.token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0}


def test_word_token_count_bpe_shape(spark):
    df = spark.createDataFrame([(1, "don't stop-me now!!")], "id long, text string")
    # tokens: don, ', t, stop, -, me, now, !, !
    got = df.select(T.word_token_count(F.col("text")).alias("n")).first().n
    assert got == 9


def test_permille_ratios(spark):
    df = spark.createDataFrame([(1, "AB.!cd")], "id long, text string")
    r = df.select(
        T.punct_permille(F.col("text")).alias("p"),
        T.upper_permille(F.col("text")).alias("u"),
    ).first()
    assert r.p == 333  # 2 of 6
    assert r.u == 333


def test_stopword_and_quality(docs):
    scored = docs.select(
        "doc_id",
        T.stopword_permille(F.col("text")).alias("sp"),
        T.quality_score(F.col("text")).alias("q"),
    )
    rows = scored.collect()
    assert all(0 <= r.q <= 1000 for r in rows)
    assert any(r.sp > 0 for r in rows)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze nicht"),
            (3, "le chat et la maison les arbres"),
            (4, "zzz qqq"),
        ],
        "id long, text string",
    )
    got = {r.id: r.lang for r in df.select("id", T.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_deterministic(docs):
    fp = docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
    a = {r.doc_id: r.fp for r in fp.collect()}
    b = {r.doc_id: r.fp for r in fp.collect()}
    assert a == b
    assert all(len(v) == 32 for v in a.values())


# ------------------------------------------------------------ multimodal

def test_media_metadata_jvm_only(docs):
    media = M.as_media_table(docs.limit(50))
    meta = M.extract_metadata(media)
    rows = meta.collect()
    assert len(rows) == 50
    assert all(r.byte_len > 0 and len(r.content_hash) == 32 for r in rows)


def test_decode_features_stub_batches(docs):
    media = M.as_media_table(docs.limit(50))
    feats = M.decode_features(media).collect()
    assert len(feats) == 50
    assert all(16 <= r.width < 80 and 16 <= r.height < 80 for r in feats)
    # stub hash must agree with the JVM md5 of the same bytes
    meta = {r.doc_id: r.content_hash for r in M.extract_metadata(media).collect()}
    assert all(meta[r.doc_id] == r.content_hash for r in feats)


def _has_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _tiny_png(w, h):
    # a real (if minimal) PNG: signature + IHDR + one zlib IDAT + IEND
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(_has_pil(), reason="PIL present: that path has its own parity test")
def test_decode_real_builtin_header_parser(spark):
    """decode_stub=False works WITHOUT PIL: the built-in header parser reads
    true dimensions from real PNG/GIF/BMP/PPM payloads. (The minimal GIF/BMP
    fixtures here carry valid headers but truncated bodies, which a full
    codec would reject — this test pins the no-PIL path only.)"""
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 7, -9) + b"\x00" * 30
    ppm = b"P6\n# c\n12 34\n255\n" + b"\x00" * (12 * 34 * 3)
    media = spark.createDataFrame(
        [
            (1, bytearray(_tiny_png(20, 10)), "image"),
            (2, bytearray(gif), "image"),
            (3, bytearray(bmp), "image"),
            (4, bytearray(ppm), "image"),
        ],
        "doc_id long, content binary, media_type string",
    )
    got = {
        r.doc_id: (r.width, r.height, r.n_frames)
        for r in M.decode_features(media, decode_stub=False).collect()
    }
    assert got == {
        1: (20, 10, 1),
        2: (40, 30, 1),
        3: (7, 9, 1),  # negative BMP height = top-down
        4: (12, 34, 1),
    }


def test_decode_real_rejects_non_image_payloads(docs, spark):
    media = M.as_media_table(docs.limit(2))  # text bytes, not images
    ctx = (
        pytest.raises(Exception, match="unrecognized image payload")
        if not _has_pil()
        else pytest.raises(Exception)  # PIL raises its own decode error
    )
    with ctx:
        M.decode_features(media, decode_stub=False).collect()


def test_decode_real_pil_parity_with_stub_schema(spark):
    # a VALID zlib-built PNG through the real-decode path: PIL's full
    # codec when installed, the built-in header parser otherwise — both
    # must report the true dimensions with the stub's schema. Building
    # the fixture with stdlib zlib (not PIL) keeps this running — and the
    # real path exercised on a well-formed payload — in containers
    # without PIL.
    media = spark.createDataFrame(
        [(1, bytearray(_tiny_png(20, 10)), "image")],
        "doc_id long, content binary, media_type string",
    )
    stub_schema = M.decode_features(media, decode_stub=True).schema
    real = M.decode_features(media, decode_stub=False)
    assert real.schema == stub_schema
    row = real.collect()[0]
    assert (row.width, row.height, row.n_frames) == (20, 10, 1)


def _encode_png(w, h, ctype, pixels, filters):
    """Forward-filtering PNG encoder for fixtures: ``pixels`` is the
    row-major raw byte list, ``filters[y]`` the filter type to apply to
    scanline y (the encoder computes the correct filtered residuals, so
    the decoder must invert every filter type to round-trip)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        raw.append(f)
        for x in range(stride):
            cur = pixels[y * stride + x]
            a = pixels[y * stride + x - ch] if x >= ch else 0
            u = pixels[(y - 1) * stride + x] if y else 0
            c = pixels[(y - 1) * stride + x - ch] if (y and x >= ch) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = u
            elif f == 3:
                pred = (a + u) >> 1
            else:  # Paeth
                p = a + u - c
                pa, pb, pc = abs(p - a), abs(p - u), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (u if pb <= pc else c)
            raw.append((cur - pred) & 0xFF)

    def chunk(tag, data):
        cr = tag + data
        return struct.pack(">I", len(data)) + cr + \
            struct.pack(">I", zlib.crc32(cr))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_pixel_decoder_roundtrip():
    """The built-in zlib-inflate + unfilter PNG decoder inverts every
    scanline filter type (None/Sub/Up/Average/Paeth) for 8-bit
    gray/RGB/RGBA, and rejects the shapes it doesn't cover."""
    import random

    import pytest as _pt

    from judy_graph_db_spark.operators.multimodal import _png_pixels

    rng = random.Random(7)
    for ctype, ch in [(0, 1), (2, 3), (6, 4)]:
        w, h = 6, 5
        pixels = [rng.randrange(256) for _ in range(w * h * ch)]
        filters = [0, 1, 2, 3, 4]  # one row per filter type
        b = _encode_png(w, h, ctype, pixels, filters)
        gw, gh, gch, got = _png_pixels(b)
        assert (gw, gh, gch) == (w, h, ch)
        assert list(got) == pixels
    # 16-bit / palette / interlaced refused loudly
    import struct
    import zlib

    def chunk(tag, data):
        cr = tag + data
        return struct.pack(">I", len(data)) + cr + \
            struct.pack(">I", zlib.crc32(cr))

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
           + chunk(b"IEND", b""))
    with _pt.raises(ValueError, match="unsupported PNG shape"):
        _png_pixels(bad)
    with _pt.raises(ValueError, match="not a PNG"):
        _png_pixels(b"JFIF nope")


@pytest.mark.skipif(_has_pil(), reason="PIL present takes the PIL path")
def test_image_ahash_real_pixels_without_pil(spark):
    """decode_stub=False exercises REAL decoded pixels in this container:
    a gradient PNG's ahash matches a replica computed from the known
    pixel values via the same luma + box-average + threshold arithmetic;
    a flat image hashes all-zero bits."""
    from judy_graph_db_spark.operators.multimodal import image_ahash

    w = h = 16
    # RGB horizontal gradient: left half dark, right half bright
    pixels = []
    for y in range(h):
        for x in range(w):
            v = x * 255 // (w - 1)
            pixels += [v, v, v]
    png = _encode_png(w, h, 2, pixels, [y % 5 for y in range(h)])
    flat = _encode_png(4, 4, 0, [77] * 16, [0, 1, 2, 3])
    media = spark.createDataFrame(
        [(1, bytearray(png), "image"), (2, bytearray(flat), "image")],
        "doc_id long, content binary, media_type string")
    got = {r.doc_id: (r.ahash, r.mean_milli)
           for r in image_ahash(media, decode_stub=False).collect()}

    # replica from known pixels (grid 8 divides 16 evenly: 2x2 cells)
    grid = 8
    cells = []
    for gy in range(grid):
        for gx in range(grid):
            s = n = 0
            for y in range(gy * 2, gy * 2 + 2):
                for x in range(gx * 2, gx * 2 + 2):
                    r_, g_, b_ = pixels[(y * w + x) * 3:(y * w + x) * 3 + 3]
                    s += (299 * r_ + 587 * g_ + 114 * b_) // 1000
                    n += 1
            cells.append(s // n)
    tot = sum(cells)
    bits = 0
    for p in cells:
        bits = (bits << 1) | (1 if p * 64 > tot else 0)
    assert got[1] == (format(bits, "016x"), 1000 * tot // 64)
    # gradient: right-half cells above mean -> per-row nibble pattern
    assert got[1][0] == "0f" * 8
    # flat image: no pixel strictly above the mean
    assert got[2] == ("0" * 16, 77000)


def test_frame_sample_explodes_rows(docs):
    media = M.as_media_table(docs.limit(20))
    frames = M.frame_sample(media, every_n=2).collect()
    assert len(frames) >= 20
    assert all(r.frame_idx % 2 == 0 for r in frames)


def test_ivf_full_probe_equals_bruteforce(embs):
    """Probing every cell must recover the exact top-k."""
    exact = [(r.vec_id, r.rank) for r in S.cosine_topk_bruteforce(embs, 3, k=5).collect()]
    full = [(r.vec_id, r.rank) for r in S.ivf_topk(embs, 3, k=5, n_cells=4, n_probe=4).collect()]
    assert full == exact


def test_ivf_multiprobe_superset_recall(embs):
    """More probes → the probed set grows, recall is monotone."""
    one = {r.vec_id for r in S.ivf_topk(embs, 3, k=5, n_cells=4, n_probe=1).collect()}
    exact = [r.vec_id for r in S.cosine_topk_bruteforce(embs, 3, k=5).collect()]
    four = [r.vec_id for r in S.ivf_topk(embs, 3, k=5, n_cells=4, n_probe=4).collect()]
    assert four == exact
    assert one <= set(exact) | one  # sanity: one-probe results are a valid subset shape


def test_dedup_clusters_transitive_families(spark):
    # A~B and B~C must land in ONE family even if A and C never pair:
    # inject the candidate pairs so the closure itself is what's tested
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "unrelated")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    rows = {r.doc_id: (r.cluster_id, r.is_canonical)
            for r in D.dedup_clusters(df, candidates=cands).collect()}
    assert rows[1] == (1, True)
    assert rows[2][0] == 1 and rows[2][1] is False
    assert rows[3][0] == 1 and rows[3][1] is False
    assert rows[9] == (9, True)  # singleton = its own cluster


def test_cluster_representatives_argmax_and_tiebreak(spark):
    """Quality-aware canonical pick: max score per family, ties to min
    id; default score is character length (keep-by-length); a custom
    integer score column flips the winner."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaaa"), (3, "aaaaaa"), (10, "zz"), (20, "z")],
        "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (20, 10)],
        "doc_id long, cluster_id long")
    got = {r["doc_id"]: (r["cluster_id"], r["score"], r["is_best"])
           for r in D.cluster_representatives(docs, clusters).collect()}
    # family 1: max len 6 shared by 2 and 3 -> min id 2 wins
    assert got[2] == (1, 6, True) and got[3] == (1, 6, False)
    assert got[1] == (1, 4, False)
    assert got[10] == (10, 2, True) and got[20] == (10, 1, False)
    scored = docs.withColumn("q", F.col("doc_id") % 7)
    got_q = {r["doc_id"]: r["is_best"] for r in D.cluster_representatives(
        scored, clusters, score_col="q").collect()}
    # family 1 scores 1/2/3 -> doc 3; family 10 scores 3/6 -> doc 20
    assert got_q == {1: False, 2: False, 3: True, 10: False, 20: True}


def test_dedup_clusters_lsh_end_to_end(spark):
    # true near-dups via the LSH path cluster together; unrelated stays out
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"),
         (9, "completely unrelated content zzz qqq vvv www xyz abc def")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.cluster_id for r in D.dedup_clusters(df).collect()}
    assert rows[1] == 1 and rows[2] == 1 and rows[9] == 9


def test_incremental_exact_dedup(spark):
    existing = spark.createDataFrame(
        [(1, "known text"), (2, "other text")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "known text"),    # dup of existing -> reject
         (11, "fresh"),        # genuinely new -> keep
         (12, "fresh"),        # within-batch dup, higher id -> reject
         (13, "also new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.dup_of_existing, r.keep)
           for r in D.incremental_exact_dedup(new, existing).collect()}
    assert out == {10: (True, False), 11: (False, True),
                   12: (False, False), 13: (False, True)}


def test_incremental_lsh_candidates(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    existing = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, base + "tail"), (11, base + "tail!"), (12, "completely different " * 8)],
        "doc_id long, text string",
    )
    rows = {(r.doc_a, r.doc_b, r.vs_existing)
            for r in D.incremental_lsh_candidates(new, existing).collect()}
    assert (10, 1, True) in rows      # near-dup of corpus
    assert (10, 11, False) in rows    # within-batch near-dups
    assert not any(a == 12 or b == 12 for a, b, _ in rows)


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "aaa\naaa\nbbb"),          # 3 lines, one repeat -> 333
            (2, "aaa\n\naaa"),             # empty line dropped -> 2 lines -> 500
            (3, "x x y"),                  # 3 tokens, one repeat -> 333
            (4, ""),                       # degenerate -> 0 / 0
            (5, "spam spam spam spam"),    # 4 tokens, 3 repeats -> 750
        ],
        "doc_id long, text string",
    )
    t = F.col("text")
    rows = {
        r.doc_id: (r.dl, r.dt)
        for r in df.select(
            "doc_id",
            T.dup_line_permille(t).alias("dl"),
            T.dup_token_permille(t).alias("dt"),
        ).collect()
    }
    assert rows[1][0] == 333
    assert rows[2][0] == 500
    assert rows[3] == (0, 333)
    assert rows[4] == (0, 0)
    assert rows[5][1] == 750


def test_ngram_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim leak
            (2, "zzz qqq vvv totally unrelated corpus content"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.n_shingles, r.n_hits, r.contam_permille)
        for r in D.ngram_contamination(corpus, bench).collect()
    }
    assert set(rows) == {1, 2}            # every corpus doc keeps a row
    assert rows[1][2] == 1000             # exact copy: fully contaminated
    assert rows[2][1] == 0 and rows[2][2] == 0
    assert rows[1][0] > 0


def test_cross_corpus_neardup_pairs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog every day")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim leak — identical signature, collides in every band
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "zzz qqq vvv totally unrelated corpus content here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_id, r.bench_id)
             for r in D.cross_corpus_neardup_pairs(corpus, bench).collect()}
    assert (1, 100) in pairs
    assert all(d != 2 for d, _ in pairs)
    # max_bucket_size=0 drops every corpus bucket -> no candidates
    assert D.cross_corpus_neardup_pairs(
        corpus, bench, max_bucket_size=0).count() == 0


def test_quality_percentile_filter_per_group_cutoff(spark):
    from judy_graph_db_spark.operators.curation import quality_percentile_filter

    # group "hi": half good half junk -> a 600-permille cutoff (position
    # ceil(0.6*8)=5, i.e. the lowest GOOD score) drops exactly the junk.
    # group "lo": every doc identical -> cutoff == the common score, all kept
    # (a fixed global threshold would have zeroed the whole group).
    good = "the of and to a in is it you that " * 12     # stopword-rich, long
    junk = "!!!???;;;###"                                 # short, punct-heavy
    rows = [(i, good + str(i), "hi") for i in range(4)]
    rows += [(10 + i, junk, "hi") for i in range(4)]
    rows += [(20 + i, good, "lo") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_percentile_filter(docs, keep_permille=600)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {0, 1, 2, 3, 20, 21, 22, 23}


def test_quality_percentile_filter_top_only(spark):
    from judy_graph_db_spark.operators.curation import quality_percentile_filter

    # keep_permille=1000 -> cutoff is the group's max score: only max-score
    # docs survive
    good = "the of and to a in is it you that " * 12
    rows = [(0, good, "en"), (1, good, "en"), (2, "### ###", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r["doc_id"]
            for r in quality_percentile_filter(docs, keep_permille=1000).collect()}
    assert kept == {0, 1}


def _wav_bytes(rate=16000, channels=2, n_frames=800, bits=16):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (n_frames * channels * (bits // 8)))
    return buf.getvalue()


def test_audio_features_real_wav_parse(spark):
    from judy_graph_db_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, _wav_bytes(16000, 2, 800), "audio"),
         (2, _wav_bytes(8000, 1, 4000), "audio")],
        "doc_id long, content binary, media_type string",
    )
    out = {r["doc_id"]: r for r in
           MM.audio_features(media, decode_stub=False).collect()}
    assert (out[1]["sample_rate"], out[1]["n_channels"],
            out[1]["bits_per_sample"], out[1]["n_samples"]) == (16000, 2, 16, 800)
    assert out[1]["duration_ms"] == 800 * 1000 // 16000  # 50 ms
    assert (out[2]["sample_rate"], out[2]["n_samples"]) == (8000, 4000)
    assert out[2]["duration_ms"] == 500


def test_audio_features_rejects_non_wav(spark):
    import pytest as _pt

    from judy_graph_db_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, b"definitely not audio", "audio")],
        "doc_id long, content binary, media_type string",
    )
    with _pt.raises(Exception, match="unrecognized audio payload"):
        MM.audio_features(media, decode_stub=False).collect()


def test_audio_window_sample_counts(spark):
    from judy_graph_db_spark.operators import multimodal as MM

    # real WAV of 2.5 s in 1 s windows -> 3 windows (ceil)
    media = spark.createDataFrame(
        [(1, _wav_bytes(8000, 1, 20000), "audio")],
        "doc_id long, content binary, media_type string",
    )
    rows = MM.audio_window_sample(media, window_ms=1000,
                                  decode_stub=False).collect()
    assert sorted(r["window_idx"] for r in rows) == [0, 1, 2]
    assert len({r["window_hash"] for r in rows}) == 3


def test_token_commonness_ranks_common_above_rare(spark):
    from judy_graph_db_spark.operators.stats import token_commonness

    # doc 1 repeats the corpus-dominant token; doc 2 is all hapaxes
    rows = [(1, "aaa aaa aaa aaa"), (2, "qq ww ee rr"), (3, "aaa aaa zz yy")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["commonness_micro"])
           for r in token_commonness(docs).collect()}
    assert out[1][0] == 4 and out[2][0] == 4 and out[3][0] == 4
    # corpus: aaa x6, each other token x1, T=12
    # doc1: 4*6/(4*12) = 0.5 -> 500000; doc2: 4*1/(4*12) -> 83333
    assert out[1][1] == 500000
    assert out[2][1] == 83333
    assert out[1][1] > out[3][1] > out[2][1]


def test_pack_sequences_layout(spark):
    from judy_graph_db_spark.operators.curation import pack_sequences

    # token stream (L=4): doc1 3 toks [0,3), doc2 4 toks [3,7), doc3 2 [7,9)
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h i"), (4, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["seq_first"], r["seq_last"], r["offset_in_first"])
           for r in pack_sequences(docs, seq_len=4).collect()}
    assert out == {1: (0, 0, 0), 2: (0, 1, 3), 3: (1, 2, 3)}
    assert 4 not in out  # token-less docs occupy no positions


def test_pack_sequences_agrees_with_shard_boundaries(spark):
    from judy_graph_db_spark.operators.curation import (
        pack_sequences, shard_by_token_budget)

    rows = [(i, "w " * (i % 7 + 1)) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # a doc's shard under budget B equals the sequence id its FIRST token
    # lands in under seq_len B
    sh = {r["doc_id"]: r["shard"]
          for r in shard_by_token_budget(docs, 16).collect()}
    pk = {r["doc_id"]: r["seq_first"]
          for r in pack_sequences(docs, 16).collect()}
    assert sh == pk


def test_quantize_embeddings_zero_and_extremes(spark):
    from judy_graph_db_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -1.0]), (3, [0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["scale_micro"] == 0       # zero vector -> scale 0, q=0s
    # max |v|=1 -> scale=1/127; extremes quantize to ±127
    assert out[2]["scale_micro"] == round(1 / 127 * 1e6)
    assert out[1]["q_hash"] != out[2]["q_hash"]
    assert all(r["n_dims"] == 2 for r in out.values())


def test_grouped_outliers_exact_flagging(spark):
    from judy_graph_db_spark.operators.stats import grouped_outliers

    # user 1: nine 10.00s and one 1000.00 -> the spike flags at k=2 (a
    # single spike's z-score is bounded by (n-1)/sqrt(n) ~ 2.85 at n=10,
    # so k=3 mathematically CANNOT fire here — the classic z-bound);
    # user 2: constant values -> sigma 0, nothing flags;
    # user 3: a single row -> never flags (x == mean)
    rows = [(1, i, 10.0) for i in range(9)] + [(1, 99, 1000.0)]
    rows += [(2, 200 + i, 5.0) for i in range(4)]
    rows += [(3, 300, 123.45)]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = [(r["user_id"], r["event_id"], r["value_cents"])
           for r in grouped_outliers(ev, "user_id", "value", "event_id", k=2).collect()]
    assert out == [(1, 99, 100000)]
    none = grouped_outliers(ev, "user_id", "value", "event_id", k=3).collect()
    assert none == []


def test_pack_sequences_token_stream_is_contiguous(docs):
    from judy_graph_db_spark.operators.curation import pack_sequences

    rows = sorted(
        pack_sequences(docs, seq_len=256).collect(),
        key=lambda r: r["seq_first"] * 256 + r["offset_in_first"],
    )
    pos = 0
    for r in rows:
        start = r["seq_first"] * 256 + r["offset_in_first"]
        assert start == pos, "gap or overlap in the packed token stream"
        end = start + r["n_tokens"] - 1
        assert r["seq_last"] == end // 256
        pos = start + r["n_tokens"]


def test_quality_filter_monotone_in_percentile(docs):
    from judy_graph_db_spark.operators.curation import quality_percentile_filter

    lo = {r["doc_id"] for r in
          quality_percentile_filter(docs, keep_permille=300).collect()}
    hi = {r["doc_id"] for r in
          quality_percentile_filter(docs, keep_permille=800).collect()}
    assert hi <= lo  # raising the percentile can only shrink the kept set
    assert len(hi) > 0


def test_semantic_dedup_every_cluster_keeps_its_min(embs):
    from judy_graph_db_spark.operators import clustering as CL

    out = CL.semantic_dedup(embs, k=4, iters=1, dim=64,
                            threshold_micro=200000).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for c, rows in by_cluster.items():
        mn = min(r["vec_id"] for r in rows)
        kept = {r["vec_id"] for r in rows if r["kept"]}
        assert mn in kept, f"cluster {c} dropped its canonical min id"
        assert kept, f"cluster {c} emptied out"


def test_plan_mixture_water_filling(spark):
    from judy_graph_db_spark.operators.curation import plan_mixture

    # sources A (100 toks), B (400 toks); equal 500/500 target -> A is the
    # bottleneck (kept whole), B downsamples to ~A's size
    rows = [(1, "w " * 100, "A"), (2, "w " * 400, "B"), (3, "w " * 50, "C")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: (r["n_tokens"], r["target_permille"], r["keep_permille"])
           for r in plan_mixture(docs, {"A": 500, "B": 500}).collect()}
    assert out["A"] == (100, 500, 1000)
    assert out["B"][2] == (500 * ((100 * 1000) // 500)) // 400  # = 250
    assert out["C"] == (50, 0, 0)  # untargeted source excluded from the mix

    import pytest as _pt
    with _pt.raises(ValueError):
        plan_mixture(docs, {})


def test_temperature_mixture_flattens(spark):
    import math

    from judy_graph_db_spark.operators.curation import temperature_mixture

    # 100 vs 6400 tokens; alpha = 1/2 flattens 1:64 to 1:8
    rows = [(1, "w " * 100, "A"), (2, "w " * 6400, "B")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in
           temperature_mixture(docs, alpha_pow2=1).collect()}
    wa = math.floor(1e6 * math.sqrt(100.0))
    wb = math.floor(1e6 * math.sqrt(6400.0))
    assert out["A"]["target_permille"] == (wa * 1000) // (wa + wb)  # 111
    assert out["B"]["target_permille"] == (wb * 1000) // (wa + wb)  # 888
    # scarce source is the bottleneck: kept (nearly) whole — integer
    # water-filling floors twice, so 999 is exact here; big source
    # downsamples hard vs its 1000 proportional keep
    assert out["A"]["keep_permille"] >= 999
    assert out["B"]["keep_permille"] < 200
    # alpha = 1 (alpha_pow2=0) is the ~proportional no-op mix: keeps are
    # high for BOTH sources, limited only by permille granularity (A's
    # true share 15.38 rounds down to 15 -> its keep floors at 975)
    out0 = {r["source"]: r for r in
            temperature_mixture(docs, alpha_pow2=0).collect()}
    assert out0["A"]["keep_permille"] >= 970
    assert out0["B"]["keep_permille"] >= 970

    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_mixture(docs, alpha_pow2=9)


def test_temperature_mixture_matches_oracle(spark):
    from judy_graph_db_spark.operators.curation import temperature_mixture
    from judy_graph_db_spark.oracle import temperature_mixture_sql
    from tests.oracle_utils import compare, duck_connection

    duck = duck_connection("/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for k in (0, 1, 3):
        ok, msg = compare(temperature_mixture(docs, alpha_pow2=k),
                          duck, temperature_mixture_sql(alpha_pow2=k))
        assert ok, f"alpha_pow2={k}: {msg}"


def test_snapshot_diff_classifies(spark):
    from judy_graph_db_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d")], "doc_id long, text string")
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged: dropped


# --- video (MP4 container) path ---------------------------------------------

def _box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _tiny_mp4(width=320, height=240, timescale=600, duration=1800,
              frame_counts=(24, 6)) -> bytes:
    import struct

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = _box(b"mvhd", bytes(12) + struct.pack(">II", timescale, duration)
                + bytes(80))
    tkhd = _box(b"tkhd", bytes(4) + bytes(72)
                + struct.pack(">II", width << 16, height << 16))
    stts = _box(b"stts", bytes(4) + struct.pack(">I", len(frame_counts))
                + b"".join(struct.pack(">II", c, 25) for c in frame_counts))
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def _trak(width, height, frame_counts, handler=None) -> bytes:
    import struct

    tkhd = _box(b"tkhd", bytes(4) + bytes(72)
                + struct.pack(">II", width << 16, height << 16))
    stts = _box(b"stts", bytes(4) + struct.pack(">I", len(frame_counts))
                + b"".join(struct.pack(">II", c, 25) for c in frame_counts))
    mdia_kids = b""
    if handler is not None:
        mdia_kids += _box(b"hdlr", bytes(8) + handler + bytes(12))
    mdia_kids += _box(b"minf", _box(b"stbl", stts))
    return _box(b"trak", tkhd + _box(b"mdia", mdia_kids))


def test_mp4_meta_ignores_audio_track_samples():
    """n_frames counts only the 'vide' track — an MP4 with sound must not
    inflate the frame count by its audio sample count."""
    import struct

    from judy_graph_db_spark.operators.multimodal import _mp4_meta

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = _box(b"mvhd", bytes(12) + struct.pack(">II", 600, 1800)
                + bytes(80))
    # subtitle track FIRST, with nonzero tkhd dims (caption boxes do
    # carry dims) — neither its dims nor its samples may win
    subs = _trak(640, 60, (99,), handler=b"text")
    video = _trak(320, 240, (24, 6), handler=b"vide")
    audio = _trak(0, 0, (44100,), handler=b"soun")
    w, h, ts, nf, ms = _mp4_meta(
        ftyp + _box(b"moov", mvhd + subs + video + audio))
    assert (w, h, ts) == (320, 240, 600)  # NOT the 640x60 caption box
    assert nf == 30  # NOT 30 + 44100 + 99


def test_mp4_meta_parses_real_boxes():
    from judy_graph_db_spark.operators.multimodal import _mp4_meta

    w, h, ts, nf, ms = _mp4_meta(_tiny_mp4())
    assert (w, h, ts, nf) == (320, 240, 600, 30)
    assert ms == 1800 * 1000 // 600  # 3000ms


def test_mp4_meta_rejects_non_video():
    import pytest as _pytest

    from judy_graph_db_spark.operators.multimodal import _mp4_meta

    with _pytest.raises(ValueError):
        _mp4_meta(b"RIFF....WAVE")
    with _pytest.raises(ValueError):
        _mp4_meta(b"plain text, definitely not a container")


def test_video_features_real_decode(spark):
    from judy_graph_db_spark.operators import multimodal as MM

    payload = _tiny_mp4(width=640, height=480, timescale=1000,
                        duration=5000, frame_counts=(120,))
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, content binary"
    )
    row = MM.video_features(media, decode_stub=False).collect()[0]
    assert (row.width, row.height, row.timescale) == (640, 480, 1000)
    assert (row.n_frames, row.duration_ms) == (120, 5000)


def test_video_features_stub_deterministic(spark):
    from judy_graph_db_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, bytearray(b""))],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in MM.video_features(media).collect()}
    a = rows[1]
    assert a.width == 160 * (1 + ord("a") % 4)
    assert a.height == 120 * (1 + ord("b") % 4)
    assert a.n_frames == 12
    assert a.duration_ms == 12 * 1000 // (24 + ord("c") % 8)
    assert rows[2].width == 160 and rows[2].n_frames == 0


def test_url_signals(spark):
    """URL count + domain extraction: scheme required (bare domains don't
    count), case-normalized, document order preserved."""
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (1, "see HTTP://A.Example.COM/path and https://b.org plus c.net"),
            (2, "no urls at all"),
            (3, "https://x.io/a?q=1&r=2 https://x.io/b"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n, r.d) for r in docs.select(
        "doc_id", T.url_count(F.col("text")).alias("n"),
        F.array_join(T.url_domains(F.col("text")), "|").alias("d")).collect()}
    assert got == {1: (2, "a.example.com|b.org"), 2: (0, ""),
                   3: (2, "x.io|x.io")}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    for i, s in [(1, "see HTTP://A.Example.COM/path and https://b.org plus c.net"),
                 (2, "no urls at all"), (3, "https://x.io/a?q=1&r=2 https://x.io/b")]:
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    twin = {r[0]: (r[1], r[2]) for r in con.execute(
        f"SELECT doc_id, {O.url_count_sql('text')}, "
        f"COALESCE(array_to_string({O.url_domains_sql('text')}, '|'), '') "
        f"FROM t"
    ).fetchall()}
    assert twin == got


def test_winnow_fingerprints(spark):
    """Winnowing invariants: identical docs select identical (pos, fp)
    sets, density ≈ 2/(w+1), sub-k docs select nothing, sub-w docs select
    exactly one; DuckDB twin agrees row-for-row."""
    import duckdb

    from judy_graph_db_spark.oracle import winnow_fingerprints_sql

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "a very different document about graph databases and spark engines"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),
        (4, "short"),
        (5, "tiny doc ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r)
                 for r in D.winnow_fingerprints(docs, k=8, w=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = sorted(tuple(t) for t in con.execute(
        winnow_fingerprints_sql(k=8, w=4)).fetchall())
    assert got == twin
    by_doc = {}
    for d, p, f_ in got:
        by_doc.setdefault(d, set()).add((p, f_))
    assert by_doc[1] == by_doc[3]
    assert 4 not in by_doc          # 5 chars < k=8: no grams
    assert len(by_doc[5]) == 1      # 4 grams < w: single window
    n_grams = len(rows[0][1]) - 7
    assert 0.2 < len(by_doc[1]) / n_grams < 0.6   # ~2/(w+1) = 0.4
    # the winnowing guarantee: docs 1 and 3 share a >= k+w-1 substring,
    # so they MUST share at least one fingerprint hash
    assert {f_ for _, f_ in by_doc[1]} & {f_ for _, f_ in by_doc[3]}


def test_winnow_matches(spark):
    """MOSS pair detection: docs sharing a >= k+w-1 substring pair up,
    unrelated docs don't; the bucket cap kills boilerplate-only pairs;
    DuckDB twin agrees."""
    import duckdb

    from judy_graph_db_spark.oracle import (
        winnow_fingerprints_sql, winnow_matches_sql,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, shared + " near the quiet river bank this morning"),
        (2, "completely unrelated text about spark query planning today"),
        (3, "prefix words then " + shared + " and a different tail here"),
        (4, "another unrelated document mentioning columnar storage runs"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = D.winnow_fingerprints(docs, k=8, w=4)
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in D.winnow_matches(fps, min_shared=2).collect()}
    assert (1, 3) in got and got[(1, 3)] >= 2
    assert all(p == (1, 3) for p in got)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {(t[0], t[1]): t[2] for t in con.execute(winnow_matches_sql(
        winnow_fingerprints_sql(k=8, w=4), min_shared=2)).fetchall()}
    assert got == twin
    # a cap of 1 removes every shared fingerprint (each lives in 2 docs)
    assert D.winnow_matches(fps, min_shared=1, max_bucket=1).count() == 0


def test_fuzzy_match_pairs(spark):
    """Blocked Levenshtein linkage: typo pairs inside a block match,
    cross-block pairs never compare, the block cap drops degenerate keys;
    DuckDB twin agrees."""
    import duckdb

    from judy_graph_db_spark.oracle import fuzzy_match_sql

    rows = [
        (1, "acme", "laser widget deluxe"),
        (2, "acme", "lazer widget deluxe"),     # dist 1 from doc 1
        (3, "acme", "completely different name"),
        (4, "zorg", "laser widget deluxe"),     # other block: never paired
        (5, "zorg", "laser widget delux"),      # dist 1 from doc 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, brand string, name string")
    got = {(r.id_a, r.id_b): r.dist for r in D.fuzzy_match_pairs(
        df, "brand", "name", max_dist=2).collect()}
    assert got == {(1, 2): 1, (4, 5): 1}
    con = duckdb.connect()
    con.execute("CREATE TABLE r (doc_id BIGINT, brand VARCHAR, name VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rows)
    twin = {(t[0], t[1]): t[2] for t in con.execute(fuzzy_match_sql(
        "SELECT * FROM r", "brand", "name", max_dist=2)).fetchall()}
    assert got == twin
    # cap of 2 drops the 3-record acme block, keeps the 2-record zorg one
    capped = {(r.id_a, r.id_b) for r in D.fuzzy_match_pairs(
        df, "brand", "name", max_dist=2, max_block=2).collect()}
    assert capped == {(4, 5)}


def test_random_projection(spark):
    """JL ±1 projection: integer-exact, sign matrix shared with the twin,
    linearity holds (proj(2x) = 2·proj(x) for exactly-representable x)."""
    import duckdb

    from judy_graph_db_spark.oracle import random_projection_sql

    rows = [(0, [1.0, -2.0, 0.5, 4.0]), (1, [2.0, -4.0, 1.0, 8.0]),
            (2, [0.0, 0.0, 0.0, 0.0])]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.j): r.v for r in S.random_projection(
        embs, out_dim=4, seed=3).collect()}
    assert len(got) == 3 * 4
    for j in range(4):
        assert got[(1, j)] == 2 * got[(0, j)]   # exact doubling
        assert got[(2, j)] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    twin = {(t[0], t[1]): t[2] for t in con.execute(
        random_projection_sql(out_dim=4, seed=3)).fetchall()}
    assert got == twin


def test_ivf_pq_topk(spark, embs):
    """IVFADC composition: results are PQ-scored members of the probed
    IVF cells only, and the DuckDB twin agrees row-for-row."""
    import duckdb

    from judy_graph_db_spark.operators import clustering as CL
    from judy_graph_db_spark.oracle import ivf_candidates_sql, ivf_pq_topk_sql

    sub = embs.limit(64).cache()
    got = sorted(tuple(r) for r in CL.ivf_pq_topk(
        sub, query_id=3, topk=5, n_cells=4, n_probe=2,
        m=4, k=8, iters=2, dim=64).collect())
    rows = [(r.vec_id, r.embedding) for r in sub.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)",
                    [(i, [float(x) for x in v]) for i, v in rows])
    twin = sorted(tuple(t) for t in con.execute(ivf_pq_topk_sql(
        query_id=3, topk=5, n_cells=4, n_probe=2,
        m=4, k=8, iters=2, dim=64)).fetchall())
    assert got == twin
    # every hit must be inside the probed cells
    cand = {t[0] for t in con.execute(ivf_candidates_sql(
        query_id=3, n_cells=4, n_probe=2, dim=64)).fetchall()}
    assert {g[0] for g in got} <= cand
    assert 3 not in {g[0] for g in got}


def test_read_media_dir(spark, tmp_path):
    """binaryFile ingest: whole files land as binary rows with stable
    path-hash ids, extension-driven media types, and glob pruning."""
    from judy_graph_db_spark.operators import multimodal as MM

    (tmp_path / "a.png").write_bytes(b"\x89PNG fakepayload")
    (tmp_path / "b.wav").write_bytes(b"RIFFfakewav")
    (tmp_path / "notes.txt").write_text("skip me")
    out = MM.read_media_dir(
        spark, str(tmp_path), glob="*.{png,wav}",
        extension_types={"wav": "audio", "png": "image"})
    rows = {r.path.split("/")[-1]: r for r in out.collect()}
    assert set(rows) == {"a.png", "b.wav"}
    assert rows["a.png"].media_type == "image"
    assert rows["b.wav"].media_type == "audio"
    assert bytes(rows["b.wav"].content) == b"RIFFfakewav"
    assert rows["a.png"].byte_len == 16
    ids = {r.doc_id for r in out.collect()}
    assert len(ids) == 2 and all(i >= 0 for i in ids)
    # re-listing yields identical ids (path-hash stability)
    again = {r.path.split("/")[-1]: r.doc_id for r in MM.read_media_dir(
        spark, str(tmp_path), glob="*.{png,wav}").collect()}
    assert again == {k: r.doc_id for k, r in rows.items()}
    # the metadata pass runs unchanged on the ingested shape
    meta = MM.extract_metadata(out.select("doc_id", "content", "media_type"))
    assert meta.count() == 2


def test_salted_join_and_heavy_keys(spark):
    """Salted join == plain join row-for-row (inner/left/semi/anti);
    heavy_keys surfaces only the hot keys; the plan stays an equi-join."""
    from judy_graph_db_spark.operators import skew as SK

    big = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 0), (3, 7)],
        "k long, payload long")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm")], "k long, attr string")
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(map(tuple, SK.salted_join(
            big, small, "k", salt=4, how=how).collect()))
        want = sorted(map(tuple, big.join(small, "k", how).collect()))
        assert got == want, how
    hk = {r.k: r.n for r in SK.heavy_keys(big, "k", 100).collect()}
    assert hk == {1: 200}
    plan = SK.salted_join(big, small, "k", salt=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported"):
        SK.salted_join(big, small, "k", how="right")


def test_sentence_signals(spark):
    import duckdb

    from judy_graph_db_spark.oracle import (
        sentence_count_sql, words_per_sentence_sql,
    )

    rows = [(1, "One two three. Four five! Six?"),
            (2, "no terminal punctuation here"),
            (3, "...!!!"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.ns, r.wps) for r in df.select(
        "doc_id", T.sentence_count(F.col("text")).alias("ns"),
        T.words_per_sentence_milli(F.col("text")).alias("wps")).collect()}
    # doc 1: 3 sentences, 9 word-tokens (6 words + 3 punct symbols per
    # the BPE-ish pre-tokenizer) -> 3000 milli; doc 2: 1 trailing
    # segment with words; doc 3: punctuation only -> 0 sentences
    assert got[1] == (3, 3000)
    assert got[2] == (1, 4000)
    assert got[3] == (0, 0) and got[4] == (0, 0)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    twin = {t[0]: (t[1], t[2]) for t in con.execute(
        f"SELECT doc_id, {sentence_count_sql()}, {words_per_sentence_sql()} "
        f"FROM d").fetchall()}
    assert got == twin


def test_html_and_url_cleanup(spark):
    import duckdb

    from judy_graph_db_spark import oracle as ORC

    rows = [
        (1, "<p>Hello <b>world</b></p> plain",
         "https://Site.org/Page/?utm_source=x&q=1&utm_medium=y#frag"),
        (2, "no markup", "http://a.com/path/"),
        (3, "<div/>", "http://b.com/?utm_campaign=z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    got = {r.doc_id: (r.nt, r.clean, r.curl) for r in df.select(
        "doc_id", T.tag_count(F.col("text")).alias("nt"),
        T.strip_html(F.col("text")).alias("clean"),
        T.canonicalize_url(F.col("url")).alias("curl")).collect()}
    assert got[1] == (4, "Hello world plain",
                      "https://site.org/page/?q=1")
    assert got[2] == (0, "no markup", "http://a.com/path")
    assert got[3] == (1, "", "http://b.com")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, url VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    twin = {t[0]: (t[1], t[2], t[3]) for t in con.execute(
        f"SELECT doc_id, {ORC.tag_count_sql()}, {ORC.strip_html_sql()}, "
        f"{ORC.canonicalize_url_sql('url')} FROM d").fetchall()}
    assert got == twin


def test_distance_histogram(spark):
    """Bucket 0 captures exact duplicates, collapsed vectors pile low,
    spread vectors spread; python replica matches exactly."""
    from judy_graph_db_spark.operators.similarity import distance_histogram

    rows = [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.bucket: r.n_pairs
           for r in distance_histogram(
               df, sample_buckets=256, dim=2).collect()}

    import itertools
    want = {}
    for (i1, v1), (i2, v2) in itertools.combinations(rows, 2):
        q1 = [int(x * 1024 // 1) for x in v1]
        q2 = [int(x * 1024 // 1) for x in v2]
        d2 = sum((a - b) ** 2 for a, b in zip(q1, q2))
        b = 0 if d2 == 0 else d2.bit_length()
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert got.get(0, 0) > 0  # i and i+35 collide mod 5 and mod 7
    # sampling knob caps the pair count deterministically
    few = distance_histogram(df, sample_buckets=32, dim=2) \
        .agg({"n_pairs": "sum"}).collect()[0][0] or 0
    assert few < sum(want.values())


def test_image_ahash_stub_and_real(spark):
    """Stub path matches a python replica bit-for-bit; identical payloads
    share a hash; the real path decodes via PIL when importable (else the
    request fails loudly)."""
    import hashlib

    from judy_graph_db_spark.operators.multimodal import (as_media_table,
                                                          image_ahash)

    docs = spark.createDataFrame(
        [(1, "an image payload"), (2, "another payload"),
         (3, "an image payload")],
        "doc_id long, text string")
    media = as_media_table(docs)
    got = {r.doc_id: (r.ahash, r.mean_milli)
           for r in image_ahash(media).collect()}

    def replica(text):
        b = text.encode()
        h = hashlib.md5(b).hexdigest()
        px = [int(hashlib.md5(f"{h}:{i}".encode()).hexdigest()[:2], 16)
              for i in range(64)]
        s = sum(px)
        bits = 0
        for p in px:
            bits = (bits << 1) | (1 if p * 64 > s else 0)
        return format(bits, "016x"), 1000 * s // 64

    assert got[1] == replica("an image payload")
    assert got[2] == replica("another payload")
    assert got[1] == got[3]  # identical payloads, identical hash
    assert len(got[1][0]) == 16
    # real path: PIL-gated
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        import pytest as _pt
        with _pt.raises(Exception, match="PIL"):
            image_ahash(media, decode_stub=False).collect()


def test_hex_hamming_pairs(spark):
    """Lossless banding finds every pair within the bound, exact hamming
    computed; bucket cap drops degenerate constant bands."""
    from judy_graph_db_spark.operators.dedup import hex_hamming_pairs

    rows = [
        (1, "00000000000000ff"),
        (2, "00000000000000fe"),  # 1 bit from id 1
        (3, "00000000000000f0"),  # 4 bits from id 1 (> max 3)
        (4, "ffffffffffffffff"),
        (5, "00000000000000ff"),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, ahash string")
    got = {(r.id_a, r.id_b): r.hamming
           for r in hex_hamming_pairs(df).collect()}
    assert got == {(1, 2): 1, (1, 5): 0, (2, 5): 1, (2, 3): 3}
    # brute-force completeness on a random set
    import random
    rng = random.Random(11)
    hs = [(i, format(rng.getrandbits(64), "016x")) for i in range(30)]
    # inject close pairs
    hs.append((100, hs[0][1][:-1] + ("0" if hs[0][1][-1] != "0" else "1")))
    df2 = spark.createDataFrame(hs, "doc_id long, ahash string")
    got2 = {(r.id_a, r.id_b): r.hamming
            for r in hex_hamming_pairs(df2, max_hamming=3).collect()}

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")
    want = {}
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            (ia, ha), (ib, hb) = hs[i], hs[j]
            ia, ib = min(ia, ib), max(ia, ib)
            h = ham(ha, hb)
            if h <= 3:
                want[(ia, ib)] = h
    assert got2 == want
    # degenerate constant corpus: bucket cap suppresses the square
    const = spark.createDataFrame(
        [(i, "0" * 16) for i in range(50)], "doc_id long, ahash string")
    assert hex_hamming_pairs(const, max_bucket=10).count() == 0


def test_jaccard_similarity_join_exact(spark):
    """Prefix-filtered join returns EXACTLY the brute-force pairs at the
    threshold — zero false negatives (the property LSH cannot give)."""
    from judy_graph_db_spark.operators.dedup import (jaccard_similarity_join,
                                                     with_shingles)

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base),
         (2, base + " extra tail words here"),
         (3, base.replace("quick", "slow")),
         (4, "completely different content with no overlap at all xyz"),
         (5, base)],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.common, r.jaccard_permille)
           for r in jaccard_similarity_join(docs, 400).collect()}
    # brute force over the same shingle sets
    sh = {r.doc_id: set(r.shingles)
          for r in with_shingles(docs).select("doc_id", "shingles").collect()}
    want = {}
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            c = len(sh[a] & sh[b])
            u = len(sh[a] | sh[b])
            if c * 1000 >= 400 * u:
                want[(a, b)] = (c, 1000 * c // u)
    assert got == want
    assert (1, 5) in got and got[(1, 5)][1] == 1000  # exact dup pair
    assert all((4 not in p) for p in got)


def test_ppjoin_positional_filter(spark):
    """The positional filter is LOSSLESS (candidates still cover every
    true pair; final results identical with it on and off) and STRICTLY
    prunes on a corpus where docs share rare early tokens but their
    suffix budgets cannot reach the minimum overlap."""
    import random

    from pyspark.sql import Window

    from judy_graph_db_spark.operators import dedup as D

    rng = random.Random(17)
    base = [f"w{i:03d}" for i in range(60)]
    rows = []
    for d in range(25):
        # near-duplicates at graded edit distances: small edits pass the
        # threshold, large edits generate prefix collisions (the edited
        # rare tokens sort first) that only the positional bound kills
        toks = list(base)
        for pos in rng.sample(range(60), (d * 7) % 31):
            toks[pos] = f"doc{d}tok{pos}"
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 600

    toks = (D.with_shingles(docs.select("doc_id", "text"))
            .select(F.col("doc_id").alias("id"),
                    F.explode("shingles").alias("tok")).distinct())
    wdf = Window.partitionBy("tok")
    wdoc = Window.partitionBy("id").orderBy("df", "tok")
    wsz = Window.partitionBy("id")
    ranked = toks.select(
        "id", "tok", F.count(F.lit(1)).over(wdf).alias("df"),
    ).select("id", "tok", F.row_number().over(wdoc).alias("pos"),
             F.count(F.lit(1)).over(wsz).alias("sz")).cache()

    cand_off = {(r.doc_a, r.doc_b) for r in
                D._ppjoin_candidates(ranked, t, positional=False).collect()}
    cand_on = {(r.doc_a, r.doc_b) for r in
               D._ppjoin_candidates(ranked, t, positional=True).collect()}
    assert cand_on <= cand_off
    assert len(cand_on) < len(cand_off)  # strict prune on this corpus

    got = {(r.doc_a, r.doc_b) for r in
           D.jaccard_similarity_join(docs, t).collect()}
    sh = {r.doc_id: set(r.shingles) for r in
          D.with_shingles(docs).select("doc_id", "shingles").collect()}
    want = set()
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            c = len(sh[a] & sh[b])
            if c * 1000 >= t * len(sh[a] | sh[b]):
                want.add((a, b))
    assert got == want
    assert want <= cand_on  # every true pair survived the prune


def test_dimension_stats(spark):
    """Integer sufficient stats per dimension; dead dimension flagged by
    min == max."""
    from judy_graph_db_spark.operators.similarity import dimension_stats

    rows = [(1, [1.0, 0.5, 0.25]), (2, [2.0, 0.5, -0.25]),
            (3, [3.0, 0.5, 0.75])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.j: (r.n, r.sum_q, r.sum_sq, r.min_q, r.max_q)
           for r in dimension_stats(df, dim=3).collect()}
    assert got[0] == (3, 6144, 14680064, 1024, 3072)
    assert got[1] == (3, 1536, 786432, 512, 512)   # dead dim: min == max
    assert got[2] == (3, 768, 720896, -256, 768)  # floor(-0.25*1024)=-256
    assert got[1][3] == got[1][4]


def test_mrr(spark):
    """First-relevant rank reciprocal; missed queries count as zero."""
    from judy_graph_db_spark.operators.similarity import mrr

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)],
        "query_id long, id long, rank long")
    truth = spark.createDataFrame(
        [(1, 11), (2, 99), (3, 30)], "query_id long, id long")
    got = mrr(res, truth).collect()[0]
    # q1 hits at rank 2 -> 500000; q2, q3 miss -> 0
    assert (got.n_queries, got.n_hit, got.mrr_micro) == (3, 1, 500000 // 3)


def test_url_host_and_registered_domain(spark):
    """Host extraction (userinfo/port stripped) and the eTLD+1 heuristic
    (ccTLD second-level labels take three labels) match hand values AND
    the DuckDB twins."""
    import duckdb

    from judy_graph_db_spark.functions import text as T
    from judy_graph_db_spark.oracle import registered_domain_sql, url_host_sql

    rows = [
        (1, "https://News.BBC.co.uk:8080/path?q=1"),
        (2, "http://user:pw@sub.a.Example.COM/x#f"),
        (3, "https://example.org"),
        (4, "not a url"),
        (5, "//bare.host.net/y"),
        (6, "https://localhost/admin"),
        (7, "https://a.b.gov.br/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    host = T.url_host(F.col("url"))
    got = {r.doc_id: (r.h, r.d) for r in df.select(
        "doc_id", host.alias("h"),
        T.registered_domain(host).alias("d")).collect()}
    assert got[1] == ("news.bbc.co.uk", "bbc.co.uk")
    assert got[2] == ("sub.a.example.com", "example.com")
    assert got[3] == ("example.org", "example.org")
    assert got[4] == ("", "")
    assert got[5] == ("bare.host.net", "host.net")
    assert got[6] == ("localhost", "localhost")
    assert got[7] == ("a.b.gov.br", "b.gov.br")   # gov under ccTLD

    con = duckdb.connect()
    con.execute("CREATE TABLE u (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", rows)
    oracle = {d: (h, rd) for d, h, rd in con.execute(
        f"SELECT doc_id, {url_host_sql('url')}, "
        f"{registered_domain_sql(url_host_sql('url'))} FROM u").fetchall()}
    assert got == oracle


def test_url_blocklist_filter_and_dedup(spark):
    """Blocklist flag agrees between the inlined-tuple path and the
    broadcast-DataFrame path; URL dedup collapses canonicalization
    variants to one keeper."""
    from judy_graph_db_spark.operators import curation as CU

    rows = [
        (1, "https://ads.tracker.com/x"),
        (2, "https://news.tracker.com/y"),
        (3, "https://good.example.org/z"),
        (4, "https://shop.spam.co.uk/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = ("tracker.com", "spam.co.uk")
    tup = {r.doc_id: (r.reg_domain, r.blocked)
           for r in CU.url_blocklist_filter(df, blocked).collect()}
    assert tup == {1: ("tracker.com", True), 2: ("tracker.com", True),
                   3: ("example.org", False), 4: ("spam.co.uk", True)}
    bl_df = spark.createDataFrame([(d,) for d in blocked], "dom string")
    viadf = {r.doc_id: (r.reg_domain, r.blocked)
             for r in CU.url_blocklist_filter(df, bl_df).collect()}
    assert viadf == tup
    # broadcast path: the blocklist join must not shuffle the corpus
    plan = CU.url_blocklist_filter(df, bl_df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    dd_rows = [
        (1, "https://Site.com/page/?utm_source=x"),
        (2, "https://site.com/page/"),
        (3, "https://site.com/page"),
        (4, "https://site.com/other"),
    ]
    ddf = spark.createDataFrame(dd_rows, "doc_id long, url string")
    got = {r.canon_url: (r.keep_id, r.n_copies)
           for r in CU.url_dedup(ddf).collect()}
    assert got == {"https://site.com/page": (1, 3),
                   "https://site.com/other": (4, 1)}


def test_ndcg_hand_values(spark):
    """Whole-bit-discount NDCG@k: hand-check DCG/IDCG on a 3-query eval —
    perfect ranking scores 1e6, inverted ranking scores less, a query with
    truth but no hits scores 0 (truth-side outer join)."""
    from judy_graph_db_spark.operators.similarity import ndcg

    # discount(r) = 1000000 div bits(r+1): r=1 -> 500000, r=2 -> 500000,
    # r=3 -> 333333 (bits(4)=3)
    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2),          # q1: perfect order
         (2, 21, 1), (2, 20, 2)],         # q2: inverted order
        "query_id long, id long, rank long")
    truth = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1),
         (2, 20, 3), (2, 21, 1),
         (3, 30, 2)],                     # q3: never retrieved
        "query_id long, id long, rel long")
    got = {r.query_id: (r.dcg, r.idcg, r.ndcg_micro)
           for r in ndcg(res, truth, k=10, rel_col="rel").collect()}
    ideal = 3 * 500000 + 1 * 500000           # rel-desc at ranks 1, 2
    assert got[1] == (ideal, ideal, 1000000)
    inv = 1 * 500000 + 3 * 500000             # same discounts here (bits eq)
    assert got[2] == (inv, ideal, 1000000)    # step discount ties rank 1,2
    assert got[3] == (0, 2 * 500000, 0)
    # k truncation: with k=1 the inverted query keeps only its rank-1 hit
    got1 = {r.query_id: r.dcg
            for r in ndcg(res, truth, k=1, rel_col="rel").collect()}
    assert got1[2] == 1 * 500000


def test_ndcg_binary_default_and_rank3_discount(spark):
    """Binary relevance when rel_col is None; rank 3 uses the 333333
    discount step."""
    from judy_graph_db_spark.operators.similarity import ndcg

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, id long, rank long")
    truth = spark.createDataFrame(
        [(1, 10), (1, 12)], "query_id long, id long")
    got = ndcg(res, truth, k=3).collect()[0]
    assert got.dcg == 500000 + 333333
    assert got.idcg == 500000 + 500000          # ideal ranks 1, 2
    assert got.ndcg_micro == (833333 * 1000000) // 1000000


def test_corpus_containment_identical_and_disjoint(spark):
    """Identical corpora estimate J=1 and containment=1; disjoint corpora
    estimate 0; counts are exact distinct-shingle counts."""
    from judy_graph_db_spark.operators.dedup import corpus_containment

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [("a", 0, base), ("a", 1, "completely different words here " * 4),
            ("b", 2, base), ("b", 3, "completely different words here " * 4)]
    docs = spark.createDataFrame(rows, "corpus string, doc_id long, text string")
    got = corpus_containment(docs, "corpus").collect()[0]
    assert (got.corpus_a, got.corpus_b) == ("a", "b")
    assert got.n_a == got.n_b
    assert got.jaccard_micro == 1000000
    assert got.contain_a_micro == 1000000 and got.contain_b_micro == 1000000
    # inter_est = J/(1+J)·(n_a+n_b) = (n_a+n_b)/2 = n_a exactly
    assert got.inter_est == got.n_a

    rows2 = [("a", 0, "alpha beta gamma delta epsilon zeta " * 4),
             ("b", 1, "one two three four five six seven eight " * 4)]
    docs2 = spark.createDataFrame(rows2, "corpus string, doc_id long, text string")
    got2 = corpus_containment(docs2, "corpus").collect()[0]
    assert got2.n_match == 0 and got2.jaccard_micro == 0
    assert got2.inter_est == 0 and got2.contain_a_micro == 0


def test_corpus_containment_matches_duckdb(spark, docs):
    """Bit-for-bit twin agreement on the shared fixture corpus split."""
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.operators.dedup import corpus_containment
    from pyspark.sql import functions as F

    split = docs.withColumn(
        "corpus", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"))
    got = sorted(map(tuple, corpus_containment(split, "corpus").collect()))
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    want = sorted(map(tuple, duck.sql(O.corpus_containment_sql(
        "CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END")).fetchall()))
    assert got == want


def test_readability_hand_values(spark):
    """Flesch / FK integer-milli formulas on a hand-computed sentence,
    plus twin agreement and the zero-word guard."""
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.functions import text as T

    rows = [(0, "The cat sat on the mat. It was happy!"),
            (1, "Incomprehensibility characterizes bureaucratic "
                "administrations notwithstanding organizational "
                "simplification."),
            (2, ""), (3, "!!!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.y, r.fre, r.fk) for r in df.select(
        "doc_id",
        T.syllable_count(F.col("text")).alias("y"),
        T.flesch_reading_ease_milli(F.col("text")).alias("fre"),
        T.fk_grade_milli(F.col("text")).alias("fk")).collect()}
    # doc 0: W=9 tokens, S=2 sentences, Y=10 vowel groups ("happy" = a + y)
    w, s, y = 9, 2, 10
    assert got[0][0] == y
    assert got[0][1] == 206835 - w * 1015 // s - y * 84600 // w
    assert got[0][2] == w * 390 // s + y * 11800 // w - 15590
    # doc 1 is dense polysyllabic prose: much harder than doc 0
    assert got[1][1] < got[0][1] and got[1][2] > got[0][2]
    # empty / no-word docs: guards keep the formula total
    assert got[2] == (0, 206835, -15590)
    duck = duckdb.connect()
    duck.register("t", df.toPandas())
    want = {r[0]: (r[1], r[2], r[3]) for r in duck.sql(
        f"SELECT doc_id, {O.syllable_count_sql()}, "
        f"{O.flesch_reading_ease_sql()}, {O.fk_grade_sql()} FROM t"
    ).fetchall()}
    assert got == want


def test_bitext_mine_recovers_translations(spark):
    # three "languages-aligned" pairs + one hub target near everything:
    # the margin criterion must still map i -> 100+i and starve the hub
    src = spark.createDataFrame(
        [(1, [10.0, 0.0, 0.0, 0.0]),
         (2, [0.0, 10.0, 0.0, 0.0]),
         (3, [0.0, 0.0, 10.0, 0.0])],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(101, [9.0, 1.0, 0.0, 0.0]),
         (102, [1.0, 9.0, 0.0, 0.0]),
         (103, [0.0, 1.0, 9.0, 0.0]),
         (200, [5.0, 5.0, 5.0, 5.0])],   # hub
        "vec_id long, embedding array<double>")
    got = {(r.src_id, r.tgt_id): r.margin_milli
           for r in S.bitext_mine(src, tgt, k=2, threshold_milli=1000,
                                  dim=4).collect()}
    assert set(got) == {(1, 101), (2, 102), (3, 103)}
    assert all(m >= 1000 for m in got.values())


def test_bitext_mine_threshold_filters(spark):
    # orthogonal corpora: nothing clears an above-average margin by much
    src = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(11, [1.0, 0.0]), (12, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = S.bitext_mine(src, tgt, k=2, threshold_milli=1500, dim=2)
    rows = out.collect()
    # src 1 vs tgt 11: cos=1e6; its other neighbor is negative (dropped
    # from candidates but still in the top-k average) — margin well above
    # 1500. src 2 is orthogonal to both targets: no candidate survives
    # the sim>0 cut.
    assert {(r.src_id, r.tgt_id) for r in rows} == {(1, 11)}


def test_hard_negatives_excludes_positives_and_reranks(spark):
    cands = spark.createDataFrame(
        [(0, 10, 900000), (0, 11, 800000), (0, 12, 700000),
         (0, 13, 600000), (1, 10, 500000)],
        "query_id long, vec_id long, sim_micro long")
    pos = spark.createDataFrame([(0, 10)], "query_id long, vec_id long")
    got = {(r.query_id, r.vec_id): r.neg_rank
           for r in S.hard_negatives(cands, pos, k=2).collect()}
    # positive 10 excluded for query 0 (but NOT for query 1), dense rerank
    assert got == {(0, 11): 1, (0, 12): 2, (1, 10): 1}


def test_bitext_mine_bucketed_recovers_cobucketed_pairs(spark):
    src = spark.createDataFrame(
        [(1, [10.0, 0.0, 0.0, 0.0]),
         (2, [0.0, 10.0, 0.0, 0.0]),
         (3, [-9.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(101, [9.0, 1.0, 0.0, 0.0]),
         (102, [1.0, 9.0, 0.0, 0.0]),
         (103, [-8.0, 2.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    exact = {(r.src_id, r.tgt_id)
             for r in S.bitext_mine(src, tgt, k=2, threshold_milli=1000,
                                    dim=4).collect()}
    approx = {(r.src_id, r.tgt_id)
              for r in S.bitext_mine(src, tgt, k=2, threshold_milli=1000,
                                     dim=4, n_planes=1).collect()}
    # plane = src vector 1 ([10,0,0,0]): sign(dot) separates the -x pair
    # (3,103) from the +x pairs — true pairs co-bucket, so the bucketed
    # mining recovers them; mined set is a subset of plausible pairs
    assert (1, 101) in approx and (3, 103) in approx
    assert (1, 101) in exact
    # the scoring join is an EQUI-join on the bucket — no broadcast of
    # either corpus side, no cartesian
    from tests.test_plans import plan_of
    plan = plan_of(S.bitext_scored_pairs(src, tgt, dim=4))
    assert "CartesianProduct" not in plan


def test_bitext_mine_auto_planes_and_approx_n(spark):
    """'auto' sizes planes from the larger corpus; approx_n supplies
    that size without any count job, giving identical plane counts (and
    therefore identical mined pairs) for the same bound."""
    src = spark.createDataFrame(
        [(i, [float(i + 1), 0.0]) for i in range(6)],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(100 + i, [float(i + 1), 0.1]) for i in range(6)],
        "vec_id long, embedding array<double>")
    auto = sorted(map(tuple, S.bitext_mine(
        src, tgt, k=2, dim=2, n_planes="auto").collect()))
    hinted = sorted(map(tuple, S.bitext_mine(
        src, tgt, k=2, dim=2, n_planes="auto", approx_n=6).collect()))
    assert auto == hinted and auto  # non-empty, byte-identical


def test_fold_confusables_defeats_homoglyph_evasion(spark):
    import duckdb

    docs = spark.createDataFrame(
        [(1, "сlаim yоur рrizе"),       # Cyrillic с а о р е
         (2, "claim your prize"),       # ASCII
         (3, "“smart” – ‘quotes’"),
         (4, "zero​width‍joined")],
        "doc_id long, text string")
    got = {r.doc_id: r.f for r in docs.select(
        "doc_id", T.fold_confusables(F.col("text")).alias("f")).collect()}
    # the homoglyph spam folds to the exact ASCII text -> dedup/blocklist
    # sees one string
    assert got[1] == got[2] == "claim your prize"
    assert got[3] == "\"smart\" - 'quotes'"
    assert got[4] == "zerowidthjoined"
    # twin agreement on the same rows
    con = duckdb.connect()
    con.sql("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    for r in docs.collect():
        con.execute("INSERT INTO t VALUES (?, ?)", [r.doc_id, r.text])
    want = dict(con.sql(
        f"SELECT doc_id, {T.fold_confusables_sql()} FROM t").fetchall())
    assert got == want


# ------------------------------------------- exact-substring (ESD) dedup

def test_exact_substring_dedup_semantics(spark):
    """Non-first occurrences of duplicated k-token windows are excised;
    overlapping duplicate windows union; unique text survives intact;
    within-doc repeats count as duplicates."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
    docs = spark.createDataFrame(
        [(1, f"{shared} one two three"),
         (2, f"zero {shared} four five"),          # cross-doc dup of shared
         (3, "india juliet kilo lima mike november oscar papa"),
         (4, f"{shared} middle words {shared}")],  # within-doc repeat
        "doc_id long, text string")
    out = {r.doc_id: r for r in D.exact_substring_dedup(
        docs, k=8).collect()}
    # doc 1 is the keeper (min (doc_id, pos)): nothing removed
    assert out[1].n_removed_tokens == 0
    assert out[1].clean_text.startswith("alpha bravo")
    # doc 2 loses exactly the 8 shared tokens, keeps its own
    assert out[2].n_removed_tokens == 8
    assert out[2].clean_text == "zero four five"
    # unique doc untouched
    assert out[3].n_removed_tokens == 0
    # doc 4: first occurrence is NOT the global keeper (doc 1 is), and
    # the second occurrence is a dup too -> both excised
    assert out[4].n_removed_tokens == 16
    assert out[4].clean_text == "middle words"
    # totals line up
    assert out[2].n_tokens == 11 and out[4].n_tokens == 18


def test_exact_substring_dedup_matches_duckdb(spark, docs):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from tests.oracle_utils import compare

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT doc_id, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    out = D.exact_substring_dedup(
        docs.select("doc_id", "text"), k=6).select(
        "doc_id", "n_tokens", "n_removed_tokens",
        F.md5("clean_text").alias("clean_md5"))
    sql = f"""SELECT
        doc_id, n_tokens, n_removed_tokens, md5(clean_text) AS clean_md5
        FROM ({O.exact_substring_dedup_sql(k=6)}) t"""
    ok, msg = compare(out, con, sql)
    assert ok, msg
