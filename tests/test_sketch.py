"""Sketch family: Bloom, count-min, HLL registers, Gram matrix — semantics
plus cross-engine (Spark vs DuckDB twin) equality at fixture scale."""

import duckdb
import pytest
from pyspark.sql import functions as F

from judy_graph_db_spark import oracle as O
from judy_graph_db_spark.operators import sketch as SK

from tests.oracle_utils import compare


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _names(spark):
    return spark.createDataFrame(
        [(i, f"name{i % 40}") for i in range(200)], "id long, s string"
    )


def test_bloom_no_false_negatives(spark):
    df = _names(spark)
    bloom = SK.bloom_build(df, "s", m_bits=1 << 12, k=4)
    probe = SK.bloom_probe(df, "s", bloom, m_bits=1 << 12, k=4)
    # every inserted value must probe positive
    assert probe.filter(F.col("maybe_member") == 0).count() == 0


def test_bloom_rejects_most_absent(spark):
    df = _names(spark)
    bloom = SK.bloom_build(df, "s", m_bits=1 << 14, k=4)
    absent = spark.createDataFrame(
        [(i, f"missing{i}") for i in range(200)], "id long, s string"
    )
    probe = SK.bloom_probe(absent, "s", bloom, m_bits=1 << 14, k=4)
    # 40 distinct values * 4 bits in 16384 -> fp rate well under 10%
    assert probe.filter(F.col("maybe_member") == 1).count() < 20


def test_bloom_matches_duckdb(spark, duck):
    df = _names(spark)
    df.createOrReplaceTempView("_bl")
    duck.sql("CREATE TABLE _bl AS " + " UNION ALL ".join(
        f"SELECT {i} AS id, 'name{i % 40}' AS s" for i in range(200)
    ))
    out = SK.bloom_build(df, "s", m_bits=1 << 12, k=3)
    sql = O.bloom_build_sql("s", "FROM _bl", m_bits=1 << 12, k=3)
    ok, msg = compare(out, duck, sql)
    assert ok, msg
    probe = SK.bloom_probe(
        df, "s", SK.bloom_build(df, "s", m_bits=1 << 12, k=3),
        m_bits=1 << 12, k=3,
    ).withColumnRenamed("id", "id")
    psql = O.bloom_probe_sql(
        "id", "s", "FROM _bl", "s", "FROM _bl", m_bits=1 << 12, k=3
    )
    ok, msg = compare(probe, duck, psql)
    assert ok, msg


def test_count_min_overestimates(spark):
    df = spark.createDataFrame(
        [(f"t{i % 10}",) for i in range(100)], "tok string"
    )
    cms = SK.count_min(df, "tok", width=64, depth=3)
    est = SK.cms_lookup(cms, df.select("tok").distinct(), "tok",
                        width=64, depth=3)
    rows = {r.tok: r.est for r in est.collect()}
    # true count of every token is 10; CMS never underestimates
    assert all(v >= 10 for v in rows.values())
    # with 10 distinct keys in 64*3 counters, collisions are rare
    assert sum(v for v in rows.values()) <= 110


def test_count_min_matches_duckdb(spark, duck):
    df = spark.createDataFrame(
        [(f"t{i % 13}",) for i in range(117)], "tok string"
    )
    duck.sql("CREATE TABLE _toks AS SELECT 't' || CAST(i % 13 AS VARCHAR) "
             "AS tok FROM range(117) t(i)")
    cms = SK.count_min(df, "tok", width=32, depth=4)
    ok, msg = compare(cms, duck, O.count_min_sql("tok", "FROM _toks",
                                                 width=32, depth=4))
    assert ok, msg
    est = SK.cms_lookup(cms, df, "tok", width=32, depth=4)
    ok, msg = compare(
        est.withColumnRenamed("tok", "item"), duck,
        O.cms_lookup_sql("tok", "FROM _toks", "tok", "FROM _toks",
                         width=32, depth=4),
    )
    assert ok, msg


def test_hll_registers_match_duckdb_and_estimate(spark, duck):
    n = 3000
    df = spark.range(n).select(F.col("id").alias("v"))
    duck.sql(f"CREATE TABLE _v AS SELECT i AS v FROM range({n}) t(i)")
    regs = SK.hll_registers(df, "v", p=8)
    ok, msg = compare(regs, duck, O.hll_registers_sql("v", "FROM _v", p=8))
    assert ok, msg
    est = SK.hll_estimate(regs, p=8)
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.2


def test_hll_merge_equals_union(spark):
    a = spark.range(0, 2000).select(F.col("id").alias("v"))
    b = spark.range(1000, 3000).select(F.col("id").alias("v"))
    direct = SK.hll_registers(a.unionByName(b), "v", p=6)
    merged = (
        SK.hll_registers(a, "v", p=6)
        .unionByName(SK.hll_registers(b, "v", p=6))
        .groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_gram_matrix_arrow_equals_relational(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(int(i), [float(x) for x in rng.randn(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g_arrow = SK.gram_matrix(df, dim=8, use_arrow=True)
    g_rel = SK.gram_matrix(df, dim=8, use_arrow=False)
    assert sorted(map(tuple, g_arrow.collect())) == sorted(
        map(tuple, g_rel.collect())
    )
    # exactness vs numpy on the same quantization
    q = np.floor(
        np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                  for _, v in rows]) * 1024
    ).astype(np.int64)
    expect = q.T @ q
    got = {(r.i, r.j): r.s for r in g_arrow.collect()}
    for i in range(8):
        for j in range(i, 8):
            assert got[(i, j)] == expect[i, j]


def test_pca_components_against_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(60, 6) * np.array([5.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    gram = SK.gram_matrix(df, dim=6)
    comps = SK.pca_components(gram, dim=6, n_rows=60, n_components=1)
    v = np.array(comps[0])
    # top second-moment direction should be dominated by coordinate 0
    assert abs(v[0]) > 0.9


def _zipfish(spark):
    """200 rows, key frequency ~ Zipf: k0 appears 40x, k1 20x, ... tail 1x."""
    rows = []
    for k, n in [("k0", 40), ("k1", 20), ("k2", 13), ("k3", 10), ("k4", 8)]:
        rows += [(k,)] * n
    rows += [(f"tail{i}",) for i in range(109)]
    return spark.createDataFrame(rows, "tok string")


def test_misra_gries_bounds_and_duckdb(spark, duck):
    df = _zipfish(spark)
    out = {r["key"]: (r["count"], r["subtracted"])
           for r in SK.misra_gries(df, "tok", m=4).collect()}
    # at most m counters survive; every survivor is a true heavy hitter
    assert len(out) <= 4
    true = {"k0": 40, "k1": 20, "k2": 13, "k3": 10, "k4": 8}
    for k, (cnt, sub) in out.items():
        assert k in true
        # lower bound: count <= true <= count + subtracted
        assert cnt <= true[k] <= cnt + sub
    # threshold here is the 5th largest count (=8), so k0..k3 survive
    assert set(out) == {"k0", "k1", "k2", "k3"}
    assert all(sub == 8 for _, sub in out.values())
    # cross-engine twin
    duck.sql("CREATE TABLE _mg(tok VARCHAR)")
    for (t,) in df.collect():
        duck.execute("INSERT INTO _mg VALUES (?)", [t])
    ok, msg = compare(SK.misra_gries(df, "tok", m=4), duck,
                      O.misra_gries_sql("tok", "FROM _mg", m=4))
    assert ok, msg


def test_misra_gries_fewer_keys_than_m(spark):
    # with fewer than m+1 distinct keys the threshold is 0: exact counts
    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 2, "tok string")
    out = {r["key"]: (r["count"], r["subtracted"])
           for r in SK.misra_gries(df, "tok", m=8).collect()}
    assert out == {"a": (3, 0), "b": (2, 0)}


def test_mg_merge_composes_error_bound(spark):
    df = _zipfish(spark)
    half_a = df.filter(F.col("tok").isin("k0", "k1", "k2") |
                       F.col("tok").startswith("tail"))
    half_b = df.filter(~F.col("tok").startswith("tail"))
    sa = SK.misra_gries(half_a, "tok", m=4)
    sb = SK.misra_gries(half_b, "tok", m=4)
    merged = {r["key"]: (r["count"], r["subtracted"])
              for r in SK.mg_merge(sa, sb, m=4).collect()}
    assert len(merged) <= 4
    # merged counter is still a lower bound within the summed undercount
    direct = {r["key"]: r["cnt"] for r in
              half_a.unionByName(half_b).groupBy(F.col("tok").alias("key"))
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for k, (cnt, sub) in merged.items():
        assert cnt <= direct[k] <= cnt + sub


def test_misra_gries_plan_has_no_global_window(spark):
    """The threshold must come from a TakeOrdered limit, never a global
    row_number over the counter relation (single-partition sort at
    vocabulary scale)."""
    df = _zipfish(spark)
    plan = SK.misra_gries(df, "tok", m=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "row_number" not in plan.lower()
    assert "TakeOrdered" in plan
    merged = SK.mg_merge(SK.misra_gries(df, "tok", m=4),
                         SK.misra_gries(df, "tok", m=4), m=4)
    plan2 = merged._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan2.lower()


# --- PII detection / scrubbing (functions/text.py additions) ----------------

def test_pii_counts_and_redaction(spark):
    from judy_graph_db_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, "mail a@b.co and c.d+x@e-f.org, ip 192.168.0.1, "
             "ssn 123-45-6789, call +1 (415) 555-0199 now")],
        "id long, text string",
    )
    row = df.select(
        T.pii_count(F.col("text"), "email").alias("e"),
        T.pii_count(F.col("text"), "ipv4").alias("i"),
        T.pii_count(F.col("text"), "ssn").alias("s"),
        T.pii_count(F.col("text"), "phone").alias("p"),
        T.redact_pii(F.col("text")).alias("r"),
    ).collect()[0]
    assert (row.e, row.i, row.s) == (2, 1, 1)
    # ssn also matches the looser phone pattern (documented overlap)
    assert row.p == 2
    assert "@" not in row.r and "123-45-6789" not in row.r
    assert "<EMAIL>" in row.r and "<IPV4>" in row.r
    assert "<SSN>" in row.r and "<PHONE>" in row.r


def test_pii_matches_duckdb(spark, duck):
    from judy_graph_db_spark import oracle as O
    from judy_graph_db_spark.functions import text as T

    texts = [
        (1, "plain text no pii 123"),
        (2, "x@y.io 10.0.0.255 999-88-7777 +44 20 7946 0958 end"),
        (3, "dots.1.2.3.4.5 and 1.2.3.4 edge +1-..-2"),
        (4, "a@@b a@b a@b.c a@b.cc 000-00-0000"),
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    duck.sql("CREATE TABLE _pii(id BIGINT, text VARCHAR)")
    for i, s in texts:
        duck.execute("INSERT INTO _pii VALUES (?, ?)", [i, s])
    out = df.select(
        "id",
        T.pii_count(F.col("text"), "email").alias("e"),
        T.pii_count(F.col("text"), "ipv4").alias("i"),
        T.pii_count(F.col("text"), "ssn").alias("s"),
        T.pii_count(F.col("text"), "phone").alias("p"),
        F.md5(T.redact_pii(F.col("text"))).alias("r"),
    )
    sql = f"""SELECT id, {O.pii_count_sql('email')} AS e,
       {O.pii_count_sql('ipv4')} AS i, {O.pii_count_sql('ssn')} AS s,
       {O.pii_count_sql('phone')} AS p, md5({O.redact_pii_sql()}) AS r
       FROM _pii"""
    ok, msg = compare(out, duck, sql)
    assert ok, msg


def test_hll_grouped_matches_duckdb_and_global(spark, duck):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i % 500) for i in range(2000)], "g string, v long"
    )
    duck.sql("CREATE TABLE _gv AS SELECT 'g' || CAST(i % 3 AS VARCHAR) AS g, "
             "i % 500 AS v FROM range(2000) t(i)")
    regs = SK.hll_registers_grouped(df, "v", ["g"], p=6)
    ok, msg = compare(
        regs, duck,
        O.hll_registers_grouped_sql("CAST(v AS VARCHAR)", "g", "FROM _gv", p=6),
    )
    assert ok, msg
    # a single group's registers equal the ungrouped sketch of its rows
    only_g0 = {(r.bucket, r.max_rho)
               for r in regs.filter(F.col("g") == "g0").collect()}
    direct = {(r.bucket, r.max_rho) for r in SK.hll_registers(
        df.filter(F.col("g") == "g0"), "v", p=6).collect()}
    assert only_g0 == direct


def test_mean_pool_embeddings(spark, duck):
    from judy_graph_db_spark.operators import similarity as S2

    rows = [
        (1, [1.0, -2.0, 0.5]), (1, [3.0, 0.0, 0.5]),   # doc 1: two chunks
        (2, [-1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc long, embedding array<float>")
    out = {r.doc: r for r in
           S2.mean_pool_embeddings(df, "doc").collect()}
    assert out[1].n_vecs == 2 and out[2].n_vecs == 1
    assert out[1].pooled == [2.0, -1.0, 0.5]
    assert out[1].pooled_q == [2 << 20, -(1 << 20), 1 << 19]
    # cross-engine: exploded integer fingerprint
    duck.sql("CREATE TABLE _mp(doc BIGINT, embedding FLOAT[])")
    for d, v in rows:
        duck.execute("INSERT INTO _mp VALUES (?, ?)", [d, v])
    flat = S2.mean_pool_embeddings(df, "doc").select(
        F.col("doc").alias("grp"), "n_vecs",
        F.posexplode("pooled_q").alias("i", "q"))
    ok, msg = compare(flat, duck, O.mean_pool_sql("doc", "FROM _mp"))
    assert ok, msg


def test_luhn_valid_count(spark):
    """Luhn-valid runs counted, invalid/short/long runs not; twin agrees."""
    import duckdb

    from judy_graph_db_spark.functions.text import (luhn_valid_count,
                                                    luhn_valid_count_sql)

    rows = [
        (1, "pay 4532015112830366 now"),          # valid Visa test number
        (2, "id 4532015112830367 isn't a card"),  # checksum off by one
        (3, "378282246310005 and 371449635398431"),  # two valid Amex
        (4, "order 123456789012 too short"),      # 12 digits: no candidate
        (5, "hash 12345678901234567890123 ok"),   # >19: greedy 19 + rest
        (6, "no digits at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n for r in docs.select(
        "doc_id", luhn_valid_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 1 and got[2] == 0 and got[3] == 2
    assert got[4] == 0 and got[6] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    twin = {t[0]: t[1] for t in con.execute(
        f"SELECT doc_id, {luhn_valid_count_sql('text')} FROM documents"
    ).fetchall()}
    assert twin == got
