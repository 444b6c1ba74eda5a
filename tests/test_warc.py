"""WARC / WET ingest (sources/warc.py) — record splitting, header
extraction, Content-Length framing, malformed flagging, HTTP body split,
gzip transparency, and the no-UDF plan shape."""

import gzip
import os

from pyspark.sql import functions as F

from judy_graph_db_spark.sources import warc as W


def _write(tmp_path, name, records, gz=False):
    p = os.path.join(str(tmp_path), name)
    blob = b"".join(records)
    if gz:
        with gzip.open(p, "wb") as f:
            f.write(blob)
    else:
        with open(p, "wb") as f:
            f.write(blob)
    return p


def _wet_fixture(tmp_path, gz=False):
    recs = [
        W.warc_record_bytes("warcinfo", {"WARC-Record-ID": "<urn:uuid:0>"},
                            "software: synthetic"),
        W.warc_record_bytes(
            "conversion",
            {"WARC-Record-ID": "<urn:uuid:1>",
             "WARC-Target-URI": "http://example.com/a",
             "WARC-Date": "2026-01-02T03:04:05Z"},
            "hello\nworld"),
        # unicode payload + embedded blank line + payload ENDING in CRLFCRLF
        W.warc_record_bytes(
            "conversion",
            {"WARC-Record-ID": "<urn:uuid:2>",
             "WARC-Target-URI": "http://example.com/b",
             "WARC-Date": "2026-01-02T03:04:06Z"},
            "café\r\n\r\nsecond paragraph\r\n\r\n"),
    ]
    return _write(tmp_path, "f.wet.gz" if gz else "f.wet", recs, gz=gz)


def test_read_wet_roundtrip(spark, tmp_path):
    p = _wet_fixture(tmp_path)
    rec = W.read_warc_records(spark, p)
    assert rec.count() == 3
    assert rec.filter("malformed").count() == 0
    rows = {r.url: r for r in W.read_wet(spark, p).collect()}
    assert set(rows) == {"http://example.com/a", "http://example.com/b"}
    assert rows["http://example.com/a"].text == "hello\nworld"
    assert rows["http://example.com/a"].record_id == "<urn:uuid:1>"
    assert rows["http://example.com/a"].warc_date == "2026-01-02T03:04:05Z"
    # blank lines inside and at the END of a payload survive framing
    assert rows["http://example.com/b"].text == \
        "café\r\n\r\nsecond paragraph\r\n\r\n"


def test_read_wet_gzip(spark, tmp_path):
    p = _wet_fixture(tmp_path, gz=True)
    assert W.read_wet(spark, p).count() == 2


def test_malformed_content_length(spark, tmp_path):
    good = W.warc_record_bytes(
        "conversion",
        {"WARC-Record-ID": "<urn:uuid:1>",
         "WARC-Target-URI": "http://example.com/a"}, "ok text")
    bad = good.replace(b"Content-Length: 7", b"Content-Length: 99")
    p = _write(tmp_path, "bad.wet", [bad, good])
    rec = W.read_warc_records(spark, p)
    assert rec.filter("malformed").count() == 1
    assert W.read_wet(spark, p).count() == 1  # DROPMALFORMED contract


def test_delimiter_collision_is_flagged_not_corrupted(spark, tmp_path):
    evil = W.warc_record_bytes(
        "conversion",
        {"WARC-Record-ID": "<urn:uuid:9>",
         "WARC-Target-URI": "http://example.com/evil"},
        "prefix" + W.RECORD_SEP + "suffix")
    good = W.warc_record_bytes(
        "conversion",
        {"WARC-Record-ID": "<urn:uuid:1>",
         "WARC-Target-URI": "http://example.com/a"}, "ok text")
    p = _write(tmp_path, "evil.wet", [evil, good])
    kept = {r.url for r in W.read_wet(spark, p).collect()}
    assert kept == {"http://example.com/a"}  # both evil halves flagged


def test_http_response_split_and_text(spark, tmp_path):
    body = "<html><body><p>Real  content</p></body></html>"
    http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            "Server: synthetic\r\n\r\n" + body)
    rec = W.warc_record_bytes(
        "response",
        {"WARC-Record-ID": "<urn:uuid:5>",
         "WARC-Target-URI": "http://example.com/page",
         "WARC-Date": "2026-01-02T00:00:00Z",
         "Content-Type": "application/http; msgtype=response"}, http)
    p = _write(tmp_path, "r.warc", [rec])
    out = W.warc_http_responses(
        W.read_warc_records(spark, p), extract_text=True).collect()
    assert len(out) == 1
    r = out[0]
    assert r.http_status == 200
    assert r.http_content_type == "text/html"
    assert r.body == body
    assert r.text == "Real content"


def test_warc_parse_plan_is_scan_stage(spark, tmp_path):
    """No Python in the plan: the parse is regexp/split expressions over
    one text scan — a 100 TB crawl pays exactly the read."""
    p = _wet_fixture(tmp_path)
    plan = W.read_wet(spark, p)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Scan text" in plan


def test_header_value_with_colon(spark, tmp_path):
    rec = W.warc_record_bytes(
        "conversion",
        {"WARC-Record-ID": "<urn:uuid:7>",
         "WARC-Target-URI": "http://example.com/x?a=b:c"}, "t")
    p = _write(tmp_path, "c.wet", [rec])
    row = W.read_wet(spark, p).collect()[0]
    assert row.url == "http://example.com/x?a=b:c"


def test_write_wet_read_wet_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "http://example.com/a", "hello\nworld"),
         (2, "http://example.com/b", "café\r\n\r\ntail\r\n\r\n")],
        "doc_id long, url string, text string")
    out = os.path.join(str(tmp_path), "wet_out")
    W.write_wet(docs, out)
    back = {r.url: r.text for r in W.read_wet(spark, out).collect()}
    assert back == {"http://example.com/a": "hello\nworld",
                    "http://example.com/b": "café\r\n\r\ntail\r\n\r\n"}
    assert W.read_warc_records(spark, out).filter("malformed").count() == 0


def test_streaming_wet_ingest_matches_batch(spark, tmp_path):
    """Two WET shards land in a directory; the streaming parse (same
    scan-stage expressions via read_warc_stream) drains them in
    micro-batches and matches the batch parse exactly."""
    d = os.path.join(str(tmp_path), "landing")
    os.makedirs(d)
    _write(d, "a.wet", [W.warc_record_bytes(
        "conversion", {"WARC-Target-URI": "http://example.com/a"}, "one")])
    _write(d, "b.wet", [W.warc_record_bytes(
        "conversion", {"WARC-Target-URI": "http://example.com/b"}, "two\n\n")])
    stream = (
        W.read_warc_stream(spark, d)
        .filter((F.col("warc_type") == "conversion") & ~F.col("malformed"))
        .select(F.col("target_uri").alias("url"), "payload")
    )
    q = (stream.writeStream.format("memory").queryName("wet_stream")
         .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.url, r.payload)
           for r in spark.sql("SELECT * FROM wet_stream").collect()}
    want = {(r.url, r.text) for r in W.read_wet(spark, d).collect()}
    assert got == want == {("http://example.com/a", "one"),
                           ("http://example.com/b", "two\n\n")}


def test_crawl_to_corpus_composition(spark, tmp_path):
    """WARC in → curated corpus out: read_wet output feeds
    web_corpus_funnel directly (the crawl-to-corpus path end to end)."""
    from judy_graph_db_spark.operators.curation import web_corpus_funnel

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "all the way home with a friend because that is what they do "
            "every single day of the week and nobody is surprised by it "
            "anymore after all this time in the field together") * 2
    recs = [
        W.warc_record_bytes("conversion",
                            {"WARC-Target-URI": "http://ok-site.com/a"},
                            good),
        W.warc_record_bytes("conversion",
                            {"WARC-Target-URI": "http://spam-mill.com/x"},
                            good),
    ]
    p = _write(tmp_path, "crawl.wet", recs)
    docs = W.read_wet(spark, p).select(
        F.monotonically_increasing_id().alias("doc_id"), "url", "text")
    out = web_corpus_funnel(docs, blocked_domains=("spam-mill.com",),
                            url_col="url", neardup=False)
    got = {r.url: r.keep for r in out.collect()}
    assert got["http://ok-site.com/a"] is True
    assert got["http://spam-mill.com/x"] is False


def test_streaming_web_corpus_matches_batch_funnel(spark, tmp_path):
    """Two crawl shards drained as separate micro-batches through the
    incremental funnel accept exactly the docs the BATCH funnel keeps
    over the union (batch-equivalence), incl. a cross-batch near-dup."""
    from judy_graph_db_spark.operators.curation import web_corpus_funnel
    from judy_graph_db_spark.streaming.web_corpus import (
        foreach_batch_web_corpus, read_corpus)

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "all the way home with a friend because that is what they do "
            "every single day of the week and nobody is surprised by it "
            "anymore after all this time out in the open field") * 2
    other = ("a completely different story begins here with a cat that "
             "sits on a warm roof all day long and watches the people "
             "walk by while thinking about dinner and other small things "
             "that make up a simple life in the quiet town") * 2
    docs = {
        1: ("http://ok-site.com/1", good),
        2: ("http://spam-mill.com/2", good),          # blocked
        3: ("http://ok-site.com/3", good + " tiny extra tail"),  # near-dup
        4: ("http://ok-site.com/4", other),
    }

    def shard(ids):
        return [W.warc_record_bytes(
            "conversion", {"WARC-Target-URI": docs[i][0]}, docs[i][1])
            for i in ids]

    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    store = os.path.join(str(tmp_path), "store")
    ck = os.path.join(str(tmp_path), "ck")

    def drain():
        stream = W.read_warc_stream(spark, landing).filter(
            (F.col("warc_type") == "conversion") & ~F.col("malformed")
        ).select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("long").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("payload").alias("text"))
        q = foreach_batch_web_corpus(
            stream, store, blocked_domains=("spam-mill.com",),
            checkpoint=ck, replay_id="rid")
        q.awaitTermination(180)

    _write(landing, "shard_a.wet", shard([1, 2]))
    drain()
    _write(landing, "shard_b.wet", shard([3, 4]))
    drain()

    got = {r.doc_id for r in read_corpus(spark, store).collect()}
    batch_docs = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in docs.items()],
        "doc_id long, url string, text string")
    want = {r.doc_id for r in web_corpus_funnel(
        batch_docs, blocked_domains=("spam-mill.com",),
        url_col="url").filter("keep").collect()}
    assert got == want == {1, 4}


def test_streaming_web_corpus_repairs_lost_corpus_slice(spark, tmp_path):
    """Crash between the near-dup fold and the corpus write: on
    re-delivery the fold is replay-skipped, but the missing corpus slice
    is recomputed from the content-idempotent flag store."""
    import shutil

    from judy_graph_db_spark.streaming.web_corpus import (
        foreach_batch_web_corpus, read_corpus)

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "all the way home with a friend because that is what they do "
            "every single day of the week and nobody is surprised") * 2
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    store = os.path.join(str(tmp_path), "store")
    _write(landing, "a.wet", [W.warc_record_bytes(
        "conversion", {"WARC-Target-URI": "http://ok-site.com/7"}, good)])

    def drain(ck):
        stream = W.read_warc_stream(spark, landing).filter(
            (F.col("warc_type") == "conversion") & ~F.col("malformed")
        ).select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("long").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("payload").alias("text"))
        q = foreach_batch_web_corpus(
            stream, store, checkpoint=os.path.join(str(tmp_path), ck),
            replay_id="rid")
        q.awaitTermination(180)

    drain("ck1")
    assert {r.doc_id for r in read_corpus(spark, store).collect()} == {7}
    # simulate the crash: the fold landed, the corpus slice did not
    shutil.rmtree(os.path.join(store, "corpus", "b=0"))
    assert read_corpus(spark, store) is None
    drain("ck2")  # fresh checkpoint re-delivers the shard as batch 0
    assert {r.doc_id for r in read_corpus(spark, store).collect()} == {7}


def test_streaming_web_corpus_compaction(spark, tmp_path):
    """compact_every folds the corpus/flags/buckets b=N slices into one
    compact dir each with identical read-back, and later folds keep
    working against the compacted store."""
    from judy_graph_db_spark.streaming.neardup import _complete_slices
    from judy_graph_db_spark.streaming.web_corpus import (
        foreach_batch_web_corpus, read_corpus)

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "all the way home with a friend because that is what they do "
            "every single day of the week and nobody is surprised") * 2
    other = ("a completely different story begins here with a cat that "
             "sits on a warm roof all day watching people walk past the "
             "house while thinking about dinner and other small things") * 2
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    store = os.path.join(str(tmp_path), "store")
    ck = os.path.join(str(tmp_path), "ck")

    def put(name, i, text):
        _write(landing, name, [W.warc_record_bytes(
            "conversion", {"WARC-Target-URI": f"http://ok-site.com/{i}"},
            text)])

    def drain():
        stream = W.read_warc_stream(spark, landing).filter(
            (F.col("warc_type") == "conversion") & ~F.col("malformed")
        ).select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("long").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("payload").alias("text"))
        q = foreach_batch_web_corpus(stream, store, checkpoint=ck,
                                     replay_id="rid", compact_every=2)
        q.awaitTermination(180)

    put("a.wet", 1, good)
    drain()
    put("b.wet", 2, other)
    drain()  # fold 2 triggers compaction of all three sub-stores
    for sub in ("corpus", "flags", "buckets"):
        slices = _complete_slices(store, sub)
        assert len(slices) == 1, (sub, slices)
        assert os.path.basename(slices[0]).startswith("compact=")
    assert {r.doc_id for r in read_corpus(spark, store).collect()} == {1, 2}
    # a post-compaction fold (incl. a near-dup of doc 1) still works
    put("c.wet", 3, good + " small tail")
    drain()
    assert {r.doc_id for r in read_corpus(spark, store).collect()} == {1, 2}
