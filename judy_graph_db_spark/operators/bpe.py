"""Byte-pair-encoding merge training as relational operators.

The classic BPE trainer (Sennrich et al. 2016) is usually presented as an
in-memory loop over a Python dict; the scale-relevant observation is that
every merge round only needs the WORD-FREQUENCY table (|vocab| rows), not
the corpus — so the corpus is scanned exactly once (tokenize → word
counts), and each of the ``n_merges`` rounds is one adjacent-pair
aggregation + one narrow fold over that small relation. At 100 TB the
corpus scan dominates and parallelizes; the merge loop's shuffles are
vocabulary-sized.

Determinism: the best pair each round maximizes ``(count, a ASC, b ASC)``
(lexicographic tiebreak), and the in-word merge is the standard
left-to-right greedy pass, expressed as a fold (``F.aggregate`` here,
``list_reduce`` in the DuckDB twin) — so Spark and SQL produce identical
merge tables and identical final symbolizations, and the driver gate can
hash them.

The only driver-side data movement is the one-row best-pair scalar per
round (house rule: scalar collects only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from judy_graph_db_spark.functions.text import WORD_TOKEN_RE

__all__ = ["bpe_train", "bpe_train_oracle_sql", "bpe_encode"]


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left-to-right greedy merge of adjacent (a, b) into a||b — a fold
    whose accumulator is the merged prefix; a freshly-merged symbol can't
    merge again in the same pass because its value is ``a||b``, not ``a``
    (unless a==b, where the standard greedy skip falls out the same way).
    """
    al, bl = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == al) & (x == bl),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text",
              end_of_word: str = "</w>") -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns ``(merges, symbol_vocab)``:
    ``merges(rank, a, b, count)`` in learned order and
    ``symbol_vocab(symbol, freq)`` — the corpus frequency of every symbol
    after all merges (the subword vocabulary the merges induce).

    Words carry an ``end_of_word`` marker symbol so merges can learn
    suffix units, per the original formulation.
    """
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_TOKEN_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.concat(
                F.expr("regexp_extract_all(word, '.', 0)"),
                F.array(F.lit(end_of_word)),
            ),
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, cnt))
        nxt = words.withColumn("syms", _merge_fold(F.col("syms"), a, b)) \
                   .localCheckpoint(eager=True)
        words = nxt
    merges_df = spark.createDataFrame(
        merges or [], "rank long, a string, b string, count long"
    )
    vocab = (
        words.select("freq", F.explode("syms").alias("symbol"))
        .groupBy("symbol").agg(F.sum("freq").alias("freq"))
    )
    return merges_df, vocab


def bpe_train_oracle_sql(n_merges: int, text_col: str = "text",
                         table: str = "documents",
                         end_of_word: str = "</w>",
                         word_token_re_sql: str | None = None) -> str:
    """DuckDB twin of :func:`bpe_train`: the merge loop unrolled as CTE
    rounds — per round an adjacent-pair count, a 1-row best pick with the
    same (count, a, b) order, and the same greedy fold via ``list_reduce``
    over singleton-list symbols. Emits ``op='merge'`` rows (the learned
    table) and ``op='vocab'`` rows (the induced subword vocabulary)."""
    from judy_graph_db_spark.oracle import WORD_TOKEN_RE_SQL

    wre = word_token_re_sql or WORD_TOKEN_RE_SQL
    parts = [f"""WITH w0 AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq,
         list_concat(regexp_extract_all(word, '.'), ['{end_of_word}']) AS syms
  FROM (
    SELECT unnest(regexp_extract_all(lower({text_col}), {wre})) AS word
    FROM {table}
  ) GROUP BY word
)"""]
    for r in range(1, n_merges + 1):
        parts.append(f""", p{r} AS (
  SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq,
           unnest(list_transform(generate_series(1, len(syms) - 1),
             i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS p
    FROM w{r - 1}
  ) GROUP BY p.a, p.b
), b{r} AS (
  SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT word, freq,
         CASE WHEN b.a IS NULL THEN syms ELSE
           list_reduce(list_transform(syms, s -> [s]),
             (acc, x) -> CASE
               WHEN acc[-1] = b.a AND x[1] = b.b
               THEN list_concat(acc[1:len(acc) - 1], [acc[-1] || x[1]])
               ELSE list_concat(acc, x) END)
         END AS syms
  FROM w{r - 1} LEFT JOIN b{r} b ON TRUE
)""")
    merge_rows = " UNION ALL ".join(
        f"SELECT 'merge' AS op, CAST({r - 1} AS BIGINT) AS rank, a, b, cnt "
        f"FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    parts.append(f"""
SELECT * FROM ({merge_rows})
UNION ALL
SELECT 'vocab', NULL, symbol, NULL, CAST(SUM(freq) AS BIGINT)
FROM (SELECT freq, unnest(syms) AS symbol FROM w{n_merges})
GROUP BY symbol""")
    return "\n".join(parts)


def bpe_encode(docs: DataFrame, merges: "list[tuple[str, str]] | DataFrame",
               id_col: str = "doc_id", text_col: str = "text",
               end_of_word: str = "</w>") -> DataFrame:
    """Apply a learned merge table to text: ``(doc_id, word_pos, sym_pos,
    symbol)`` — each word segmented by replaying the merges in rank order.

    The merge table is tiny by construction (``n_merges`` rows), so it
    rides into the plan as literals: the whole encode is ONE narrow pass —
    tokenize, char-split, then ``n_merges`` chained folds, all inside the
    scan stage with zero shuffles (verified: the plan has no Exchange).
    That is the property a 100 TB tokenization pass needs — embarrassingly
    parallel, no driver round-trips per row.
    """
    if isinstance(merges, DataFrame):
        rules = [(r["a"], r["b"]) for r in
                 sorted(merges.collect(), key=lambda r: r["rank"])]
    else:
        rules = list(merges)
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_TOKEN_RE), F.lit(0)
            )
        ).alias("word_pos", "word"),
    )
    syms = F.concat(
        F.expr("regexp_extract_all(word, '.', 0)"),
        F.array(F.lit(end_of_word)),
    )
    for a, b in rules:
        syms = _merge_fold(syms, a, b)
    return toks.select(
        id_col, F.col("word_pos").cast("long"),
        F.posexplode(syms).alias("sym_pos", "symbol"),
    ).select(id_col, "word_pos", F.col("sym_pos").cast("long"), "symbol")
