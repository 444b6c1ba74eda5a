"""Temporal operators: as-of join, range join, funnel, top-k per group."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark.operators import temporal as T


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100.0),
            (1, ts("2024-01-01 12:00:00"), 110.0),
            (2, ts("2024-01-01 11:00:00"), 50.0),
        ],
        "user_id long, ts timestamp, value double",
    )


def test_asof_join_basic(spark, quotes):
    probes = spark.createDataFrame(
        [
            (10, 1, ts("2024-01-01 09:00:00")),  # before any quote -> null
            (11, 1, ts("2024-01-01 10:30:00")),  # -> 100
            (12, 1, ts("2024-01-01 12:00:00")),  # exact ts counts -> 110
            (13, 2, ts("2024-01-02 00:00:00")),  # -> 50
            (14, 3, ts("2024-01-01 10:00:00")),  # key has no quotes -> null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: r.value_asof
        for r in T.asof_join(probes, quotes, on="user_id").collect()
    }
    assert out == {10: None, 11: 100.0, 12: 110.0, 13: 50.0, 14: None}


def test_asof_join_tie_is_max_of_right_cols(spark):
    quotes = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 7.0), (1, ts("2024-01-01 10:00:00"), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    probes = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    [r] = T.asof_join(probes, quotes, on="user_id").collect()
    assert r.value_asof == 9.0


def test_asof_join_keeps_left_columns(spark, quotes):
    probes = spark.createDataFrame(
        [(11, 1, ts("2024-01-01 10:30:00"), "x")],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    [r] = T.asof_join(probes, quotes, on="user_id").collect()
    assert (r.event_id, r.tag, r.value_asof) == (11, "x", 100.0)


def test_asof_join_null_right_col_stays_row_consistent(spark):
    # a later quote with a NULL in one right col must NOT inherit that
    # column from an earlier quote — all attached columns come from the
    # same (latest) right row
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100.0, "early"),
            (1, ts("2024-01-01 11:00:00"), None, "late"),
        ],
        "user_id long, ts timestamp, value double, src string",
    )
    probes = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    [r] = T.asof_join(
        probes, quotes, on="user_id", right_cols=("value", "src")
    ).collect()
    assert r.src_asof == "late"
    assert r.value_asof is None  # NOT 100.0 from the 'early' row


def test_range_join_matches_between_semantics(spark):
    points = spark.createDataFrame(
        [(i, ts(f"2024-01-0{d} 12:00:00")) for i, d in enumerate([1, 2, 3, 5])],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (100, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),  # days 1,2
            (101, ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00")),  # day 3
        ],
        "iv_id long, start timestamp, end timestamp",
    )
    got = {
        (r.pid, r.iv_id)
        for r in T.range_join(points, iv, "ts", "start", "end").collect()
    }
    assert got == {(0, 100), (1, 100), (2, 101)}
    # small bins (interval spans many bins) must give the same answer
    got2 = {
        (r.pid, r.iv_id)
        for r in T.range_join(
            points, iv, "ts", "start", "end", bin_width_seconds=3600
        ).collect()
    }
    assert got2 == got


def test_range_join_end_exclusive(spark):
    points = spark.createDataFrame(
        [(0, ts("2024-01-02 00:00:00"))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))],
        "iv_id long, start timestamp, end timestamp",
    )
    assert T.range_join(points, iv, "ts", "start", "end").count() == 0


def test_funnel_counts(spark):
    rows = [
        # user 1: A at 10:00 completed by B at 10:10; A at 11:00 not completed
        (1, ts("2024-01-01 10:00:00"), "view"),
        (1, ts("2024-01-01 10:10:00"), "purchase"),
        (1, ts("2024-01-01 11:00:00"), "view"),
        # user 2: B before A only -> started 1, completed 0
        (2, ts("2024-01-01 09:00:00"), "purchase"),
        (2, ts("2024-01-01 10:00:00"), "view"),
        # user 3: B exactly at the gap boundary counts
        (3, ts("2024-01-01 10:00:00"), "view"),
        (3, ts("2024-01-01 10:30:00"), "purchase"),
        # user 4: only B -> no row
        (4, ts("2024-01-01 10:00:00"), "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, u, t, y) for i, (u, t, y) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {
        r.user_id: (r.n_started, r.n_completed)
        for r in T.funnel_completions(ev, "view", "purchase", 1800).collect()
    }
    assert out == {1: (2, 1), 2: (1, 0), 3: (1, 1)}


def test_funnel_equal_ts_b_is_not_strictly_after(spark):
    ev = spark.createDataFrame(
        [
            # B at exactly the A timestamp -> NOT a completion
            (0, 1, ts("2024-01-01 10:00:00"), "view"),
            (1, 1, ts("2024-01-01 10:00:00"), "purchase"),
            # a later strict B still completes a later A
            (2, 1, ts("2024-01-01 11:00:00"), "view"),
            (3, 1, ts("2024-01-01 11:00:01"), "purchase"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    [r] = T.funnel_completions(ev, "view", "purchase", 1800).collect()
    assert (r.n_started, r.n_completed) == (2, 1)


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [(g, i, (i * 7) % 10) for g in ("a", "b") for i in range(5)],
        "grp string, id long, score long",
    )
    out = T.topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], 2
    )
    got = {(r.grp, r.id, r.rank_in_group) for r in out.collect()}
    # scores: id0->0 id1->7 id2->4 id3->1 id4->8 ; top2 = id4(8), id1(7)
    assert got == {("a", 4, 1), ("a", 1, 2), ("b", 4, 1), ("b", 1, 2)}


def test_cohort_retention_matrix(spark):
    from judy_graph_db_spark.operators.temporal import cohort_retention

    # user 1 first active in period of 2024-01-01, returns 2 weeks later;
    # user 2 active only once; periods are 7-day bins of days-since-epoch
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-15 09:00:00"),
        (2, "2024-01-02 11:00:00"),
        (3, "2024-01-16 08:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = {(r["cohort_period"], r["period_offset"]): r["n_active"]
           for r in cohort_retention(ev, period_days=7).collect()}
    base = (19723) // 7  # 2024-01-01 is day 19723 since epoch
    assert out[(base, 0)] == 2          # users 1 and 2 start together
    assert out[(base, 2)] == 1          # user 1 returns two periods on
    assert out[(base + 2, 0)] == 1      # user 3 is a later cohort
    assert sum(v for (c, o), v in out.items() if o == 0) == 3


def test_cap_per_group_quota(spark):
    from judy_graph_db_spark.operators.curation import cap_per_group

    rows = [(i, "x", "web" if i < 20 else "books") for i in range(26)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = cap_per_group(docs, "source", n=5)
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["web"]) == 5 and len(by_src["books"]) == 5
    # deterministic: same pick every run
    again = {r["doc_id"] for r in cap_per_group(docs, "source", n=5).collect()}
    assert again == {d for v in by_src.values() for d in v}


def test_funnel_steps_greedy_and_deadlines(spark):
    from judy_graph_db_spark.operators.temporal import funnel_steps

    rows = [
        # user 1 completes view->click->buy, each within 60s
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:00:30"),
        (1, "buy", "2024-01-01 10:01:00"),
        # user 2: click comes too late -> stops at stage 1
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 10:05:00"),
        # user 3: greedy earliest view (10:00) makes the 10:00:50 click
        # qualify even though a later view (10:04) also exists
        (3, "view", "2024-01-01 10:00:00"),
        (3, "view", "2024-01-01 10:04:00"),
        (3, "click", "2024-01-01 10:00:50"),
        # user 4: never views -> absent
        (4, "click", "2024-01-01 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["user_id"]: r["steps_completed"] for r in
           funnel_steps(ev, ["view", "click", "buy"], 60).collect()}
    assert out == {1: 3, 2: 1, 3: 2}


def test_resample_counts_fills_gaps_with_zeros(spark):
    from judy_graph_db_spark.operators.temporal import resample_counts

    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 03:20:00", 2.5),   # hours 1 and 2 are EMPTY
        ("b", "2024-01-01 05:00:00", 4.0),   # single-bucket key: no fill
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts string, value double") \
        .select("event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {(r["event_type"], r["period"]): (r["n"], r["sum_cents"])
           for r in resample_counts(ev, 3600).collect()}
    base = 473352  # 2024-01-01 00:00 UTC in hours since epoch
    assert out[("a", base)] == (1, 100)
    assert out[("a", base + 1)] == (0, 0)
    assert out[("a", base + 2)] == (0, 0)
    assert out[("a", base + 3)] == (1, 250)
    assert out[("b", base + 5)] == (1, 400)
    assert len(out) == 5


def test_asof_tolerance_nulls_stale_quotes(spark):
    from judy_graph_db_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 500)], "k long, ts long"
    ).select("k", F.timestamp_seconds("ts").alias("ts"))
    right = spark.createDataFrame(
        [(1, 90, 7.0)], "k long, ts long, value double"
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "value")
    # without tolerance both probes match the ts=90 quote
    out = {r.ts.timestamp(): r.value_asof
           for r in asof_join(left, right, on="k").collect()}
    assert out[100.0] == 7.0 and out[500.0] == 7.0
    # 60s tolerance: the ts=500 probe's match is 410s stale -> NULL
    out2 = {r.ts.timestamp(): r.value_asof
            for r in asof_join(left, right, on="k",
                               tolerance_seconds=60).collect()}
    assert out2[100.0] == 7.0 and out2[500.0] is None


def test_transition_counts(spark):
    import duckdb

    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.operators.temporal import transition_counts
    from tests.oracle_utils import compare

    rows = [
        (1, 10, 1, "view"), (2, 20, 1, "click"), (3, 30, 1, "view"),
        (4, 15, 2, "view"), (5, 25, 2, "purchase"),
        (6, 40, 3, "view"),  # terminal only
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, t long, user_id long, event_type string"
    ).select("event_id", F.timestamp_seconds("t").alias("ts"),
             "user_id", "event_type")
    got = {(r.from_type, r.to_type): r.n
           for r in transition_counts(ev).collect()}
    assert got == {("view", "click"): 1, ("click", "view"): 1,
                   ("view", "purchase"): 1}
    con = duckdb.connect()
    con.sql("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, "
            "user_id BIGINT, event_type VARCHAR)")
    for eid, t, u, ty in rows:
        con.execute("INSERT INTO events VALUES (?, to_timestamp(?), ?, ?)",
                    [eid, t, u, ty])
    ok, msg = compare(transition_counts(ev), con, O.transition_counts_sql())
    assert ok, msg


def test_time_respecting_reachability(spark):
    from judy_graph_db_spark.operators import temporal as T

    # 1->2 @5; 2->3 @3 fired BEFORE arrival -> 1 cannot reach 3;
    # 2->4 @5 departs exactly at arrival -> reachable at min_wait=0 only
    e = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 4, 5)], "src long, dst long, ts long")
    got = {(r.src, r.dst): r.t_arr
           for r in T.time_respecting_reachability(e).collect()}
    assert got == {(1, 2): 5, (2, 3): 3, (2, 4): 5, (1, 4): 5}
    strict = {(r.src, r.dst): r.t_arr
              for r in T.time_respecting_reachability(e, min_wait=1).collect()}
    assert (1, 4) not in strict and len(strict) == 3
    # earliest arrival wins across parallel paths: 1->3 direct @9 vs via 2 @7
    e2 = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 7), (1, 3, 9)], "src long, dst long, ts long")
    got2 = {(r.src, r.dst): r.t_arr
            for r in T.time_respecting_reachability(e2).collect()}
    assert got2[(1, 3)] == 7


def test_time_respecting_reachability_matches_oracle(spark):
    import random

    import duckdb

    from judy_graph_db_spark.operators import temporal as T

    rng = random.Random(19)
    rows = [(rng.randrange(8), rng.randrange(8), rng.randrange(30))
            for _ in range(40)]
    rows = [(a, b, t) for a, b, t in rows if a != b]
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    con = duckdb.connect()
    con.execute("CREATE TABLE te (src BIGINT, dst BIGINT, ts BIGINT)")
    con.executemany("INSERT INTO te VALUES (?, ?, ?)", rows)
    for mw in (0, 2):
        got = sorted(tuple(r) for r in T.time_respecting_reachability(
            e, min_wait=mw).collect())
        twin = sorted(tuple(t) for t in con.execute(
            T.time_respecting_reachability_sql(
                "SELECT src, dst, ts FROM te", min_wait=mw)).fetchall())
        assert got == twin, mw


def test_temporal_wedge_counts(spark):
    """Hand-checked wedges, bucket-boundary pairs included, twin agrees;
    the banding must not change the answer vs the direct join."""
    import random

    import duckdb

    from judy_graph_db_spark.operators import temporal as T

    # wedges through 2: (1->2 @0, 2->3 @5) within 10; (1->2 @0, 2->4 @11)
    # outside; boundary (2->5 @10) exactly at delta -> included
    rows = [(1, 2, 0), (2, 3, 5), (2, 4, 11), (2, 5, 10)]
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    got = {r.mid: r.n_wedges for r in T.temporal_wedge_counts(
        e, 10).collect()}
    assert got == {2: 2}
    rng = random.Random(37)
    big = [(rng.randrange(6), rng.randrange(6), rng.randrange(100))
           for _ in range(60)]
    eb = spark.createDataFrame(big, "src long, dst long, ts long")
    got2 = sorted(tuple(r) for r in T.temporal_wedge_counts(
        eb, 7).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE tw (src BIGINT, dst BIGINT, ts BIGINT)")
    con.executemany("INSERT INTO tw VALUES (?, ?, ?)", big)
    twin = sorted(tuple(t) for t in con.execute(
        T.temporal_wedge_counts_sql("SELECT src, dst, ts FROM tw", 7)
    ).fetchall())
    assert got2 == twin


def test_interarrival_stats(spark):
    import datetime as dt

    import duckdb

    from judy_graph_db_spark.operators import temporal as T

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1), (1, t0 + dt.timedelta(seconds=10), 2),
            (1, t0 + dt.timedelta(seconds=40), 3),
            (2, t0, 4)]     # single event -> no gaps row
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {r.user_id: (r.n_gaps, r.sum_gap, r.sum_gap_sq, r.min_gap,
                       r.max_gap)
           for r in T.interarrival_stats(e).collect()}
    assert got == {1: (2, 40, 1000, 10, 30)}
    con = duckdb.connect()
    con.execute("CREATE TABLE events (user_id BIGINT, ts TIMESTAMP, "
                "event_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    twin = {t[0]: tuple(t[1:]) for t in con.execute(
        T.interarrival_stats_sql()).fetchall()}
    assert got == twin


def test_decayed_counts(spark):
    """Power-of-two half-life decay: exact shift contributions, future
    events excluded, shift-the-clock identity, twin equality."""
    import duckdb

    rows = [
        ("a", ts("2024-01-01 00:00:00")),   # age 4h = 4 half-lives
        ("a", ts("2024-01-01 03:00:00")),   # age 1h = 1 half-life
        ("a", ts("2024-01-01 04:00:00")),   # age 0
        ("b", ts("2024-01-01 03:30:00")),   # age 30m -> bucket 0
        ("b", ts("2024-01-01 05:00:00")),   # future -> excluded
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r.event_type: (r.n_events, r.decayed)
           for r in T.decayed_counts(
               ev, "2024-01-01 04:00:00", 3600, scale_pow2=8).collect()}
    # a: 256>>4 + 256>>1 + 256>>0 = 16 + 128 + 256; b: 256
    assert got == {"a": (3, 400), "b": (1, 256)}
    # advancing one half-life: old score halves (shift), new events add
    later = {r.event_type: r.decayed for r in T.decayed_counts(
        ev, "2024-01-01 05:00:00", 3600, scale_pow2=8).collect()}
    assert later["a"] == 400 // 2
    assert later["b"] == 256 // 2 + 256
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    twin = {t[0]: (t[1], t[2]) for t in con.execute(T.decayed_counts_sql(
        "2024-01-01 04:00:00", 3600, scale_pow2=8)).fetchall()}
    assert twin == got
    with pytest.raises(ValueError, match="positive"):
        T.decayed_counts(ev, "2024-01-01 04:00:00", 0)
    with pytest.raises(ValueError, match="scale_pow2"):
        T.decayed_counts(ev, "2024-01-01 04:00:00", 3600, scale_pow2=99)


def test_sliding_window_counts(spark):
    """Every event lands in ceil(size/slide) windows; python replica
    matches; slide == size degenerates to tumbling."""
    import pytest as _pt

    from judy_graph_db_spark.operators.temporal import sliding_window_counts

    rows = [("a", "2024-01-01 00:00:05", 1.0),
            ("a", "2024-01-01 00:00:25", 2.0),
            ("b", "2024-01-01 00:00:59", 3.0)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts", "value")
    got = {(r.event_type, r.win_start): (r.n, r.sum_cents)
           for r in sliding_window_counts(df, 30, 10).collect()}

    import calendar
    import datetime
    want = {}
    for k, ts, v in rows:
        t = calendar.timegm(datetime.datetime.strptime(
            ts, "%Y-%m-%d %H:%M:%S").timetuple())
        for kk in range((t - 30) // 10 + 1, t // 10 + 1):
            key = (k, kk * 10)
            n, s = want.get(key, (0, 0))
            want[key] = (n + 1, s + int(v * 100))
    assert got == want
    # each event covers exactly 3 windows (30/10)
    assert sum(n for n, _ in got.values()) == 3 * len(rows)
    # tumbling degenerate
    tum = {(r.event_type, r.win_start): r.n
           for r in sliding_window_counts(df, 10, 10).collect()}
    assert sum(tum.values()) == len(rows)
    with _pt.raises(ValueError, match="slide must not exceed"):
        sliding_window_counts(df, 10, 30)


def test_scd2_merge(spark):
    """Changed values close and reopen, unchanged are idempotent, new
    keys open, history passes through; a second identical merge is a
    no-op."""
    from judy_graph_db_spark.operators.temporal import scd2_merge

    cur = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
         (1, "b", "2024-02-01 00:00:00", None),
         (2, "x", "2024-01-15 00:00:00", None)],
        "key long, value string, valid_from string, valid_to string"
    ).selectExpr("key", "value", "CAST(valid_from AS TIMESTAMP) valid_from",
                 "CAST(valid_to AS TIMESTAMP) valid_to")
    upd = spark.createDataFrame(
        [(1, "c", "2024-03-01 00:00:00"),   # change -> close b, open c
         (2, "x", "2024-03-01 00:00:00"),   # unchanged -> no-op
         (3, "n", "2024-03-01 00:00:00")],  # new key
        "key long, value string, ts string"
    ).selectExpr("key", "value", "CAST(ts AS TIMESTAMP) ts")
    out = scd2_merge(cur, upd)
    rows = {(r.key, r.value): (str(r.valid_from), str(r.valid_to))
            for r in out.collect()}
    assert rows[(1, "a")] == ("2024-01-01 00:00:00", "2024-02-01 00:00:00")
    assert rows[(1, "b")] == ("2024-02-01 00:00:00", "2024-03-01 00:00:00")
    assert rows[(1, "c")][0] == "2024-03-01 00:00:00"
    assert rows[(1, "c")][1] == "None"
    assert rows[(2, "x")] == ("2024-01-15 00:00:00", "None")
    assert rows[(3, "n")][0] == "2024-03-01 00:00:00"
    assert out.count() == 5
    # replay idempotence: merging the same updates again changes nothing
    again = scd2_merge(out, upd)
    assert again.count() == 5
    r2 = {(r.key, r.value): (str(r.valid_from), str(r.valid_to))
          for r in again.collect()}
    assert r2 == rows


def test_scd2_merge_tombstones(spark):
    """CDC delete tombstones close the open row and open nothing; a
    tombstone for an absent key is a no-op (idempotent re-delivery);
    a later re-insert opens a fresh row; tombstone value cols ignored."""
    from judy_graph_db_spark.operators.temporal import scd2_merge

    cur = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", None),
         (2, "x", "2024-01-15 00:00:00", None)],
        "key long, value string, valid_from string, valid_to string"
    ).selectExpr("key", "value", "CAST(valid_from AS TIMESTAMP) valid_from",
                 "CAST(valid_to AS TIMESTAMP) valid_to")
    upd = spark.createDataFrame(
        [(1, "ignored", "2024-03-01 00:00:00", True),   # delete key 1
         (3, "zzz", "2024-03-01 00:00:00", True),       # absent key no-op
         (4, "n", "2024-03-01 00:00:00", False)],       # normal insert
        "key long, value string, ts string, is_deleted boolean"
    ).selectExpr("key", "value", "CAST(ts AS TIMESTAMP) ts", "is_deleted")
    out = scd2_merge(cur, upd, delete_col="is_deleted")
    rows = {(r.key, r.value): (str(r.valid_from), str(r.valid_to))
            for r in out.collect()}
    assert rows == {
        (1, "a"): ("2024-01-01 00:00:00", "2024-03-01 00:00:00"),
        (2, "x"): ("2024-01-15 00:00:00", "None"),
        (4, "n"): ("2024-03-01 00:00:00", "None"),
    }
    # replaying the same tombstone batch is a no-op (key 1 has no open
    # row anymore; key 3 still absent)
    again = scd2_merge(out, upd, delete_col="is_deleted")
    assert {(r.key, r.value): (str(r.valid_from), str(r.valid_to))
            for r in again.collect()} == rows
    # re-insert after delete opens a fresh row, history intact
    re_ins = spark.createDataFrame(
        [(1, "b2", "2024-04-01 00:00:00", False)],
        "key long, value string, ts string, is_deleted boolean"
    ).selectExpr("key", "value", "CAST(ts AS TIMESTAMP) ts", "is_deleted")
    r3 = {(r.key, r.value): (str(r.valid_from), str(r.valid_to))
          for r in scd2_merge(again, re_ins,
                              delete_col="is_deleted").collect()}
    assert r3[(1, "a")] == ("2024-01-01 00:00:00", "2024-03-01 00:00:00")
    assert r3[(1, "b2")] == ("2024-04-01 00:00:00", "None")


def test_rate_anomalies(spark):
    """A burst bucket and a silent (gap-filled zero) bucket both flag;
    steady buckets do not."""
    from judy_graph_db_spark.operators.temporal import rate_anomalies

    rows = []
    # steady: 3 events/hour for hours 0..9, except hour 4 bursts to 30
    # and hour 7 is silent
    for h in range(10):
        n = 30 if h == 4 else (0 if h == 7 else 3)
        for i in range(n):
            rows.append(("a", f"2024-01-01 {h:02d}:00:{i % 60:02d}"))
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) ts")
    out = {r.period: (r.n, r.is_anomaly)
           for r in rate_anomalies(df, 3600, k_milli=3000).collect()}
    assert len(out) == 10  # hour 7 present via gap fill
    ns = sorted(v[0] for v in out.values())
    assert ns.count(3) == 8 and 0 in ns and 30 in ns
    flagged = {p for p, (n, a) in out.items() if a}
    normal = {p for p, (n, a) in out.items() if not a}
    assert {out[p][0] for p in flagged} == {0, 30}
    assert all(out[p][0] == 3 for p in normal)


def test_concurrency_profile(spark):
    """Sweep counts match a brute-force per-bucket scan; keyed variant
    profiles per key; counts return to zero after the last interval."""
    rows = [("a", "2024-01-01 00:00:10", "2024-01-01 00:03:30"),
            ("a", "2024-01-01 00:01:00", "2024-01-01 00:02:00"),
            ("a", "2024-01-01 00:10:00", "2024-01-01 00:10:30"),
            ("b", "2024-01-01 00:00:00", "2024-01-01 00:00:59")]
    df = spark.createDataFrame(
        rows, "k string, start_ts string, end_ts string"
    ).selectExpr("k", "CAST(start_ts AS TIMESTAMP) start_ts",
                 "CAST(end_ts AS TIMESTAMP) end_ts")
    from judy_graph_db_spark.operators.temporal import concurrency_profile

    got = {(r.k, r.bucket): r.n_active
           for r in concurrency_profile(df, key_col="k",
                                        period_seconds=60).collect()}

    import calendar
    import datetime

    def b(ts):
        return calendar.timegm(datetime.datetime.strptime(
            ts, "%Y-%m-%d %H:%M:%S").timetuple()) // 60

    # brute force: for every bucket in range, count covering intervals
    brute = {}
    for key in ("a", "b"):
        ivs = [(b(s), b(e)) for kk, s, e in rows if kk == key]
        for t in range(min(s for s, _ in ivs), max(e for _, e in ivs) + 2):
            brute[(key, t)] = sum(1 for s, e in ivs if s <= t <= e)
    # at every change point the sweep must agree with brute force
    for (k, t), n in got.items():
        assert brute.get((k, t), 0) == n, (k, t)
    # count falls back to zero after the last interval
    assert got[("a", b("2024-01-01 00:10:00") + 1)] == 0
    # unkeyed global profile
    g2 = {r.bucket: r.n_active
          for r in concurrency_profile(df, period_seconds=60).collect()}
    assert g2[b("2024-01-01 00:00:10")] == 2  # a's first + b's session
