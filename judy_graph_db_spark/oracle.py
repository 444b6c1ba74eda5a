"""DuckDB-dialect SQL twins for the engine's operators.

The driver's correctness gate runs every ``__spark_entry__.queries()`` entry
on Spark AND its ``oracle_sql()`` twin on DuckDB over the same parquet
tables, then hash-compares values (columns sorted by name). These builders
keep the two dialects in one place so they stay in sync with the Spark
implementations they mirror:

- ``judy_graph_db_spark/functions/text.py``  (text analysis)
- ``judy_graph_db_spark/operators/dedup.py`` (shingles/minhash/simhash)
- ``judy_graph_db_spark/operators/similarity.py`` (cosine/LSH/IVF)

Dialect notes (Spark ↔ DuckDB):
    sequence(a,b,s)        ↔ generate_series(a,b,s)   (both inclusive)
    transform(l, x->f)     ↔ list_transform(l, x->f)
    array_min / array_distinct ↔ list_min / list_distinct
    slice(l, i, n)         ↔ list_slice(l, i, i+n-1)  (begin/end inclusive)
    concat_ws(',', arr)    ↔ array_to_string(l, ',')
    F.floor → LONG         ↔ CAST(floor(..) AS BIGINT)  (floor is DOUBLE there)
    regexp_replace(all)    ↔ regexp_replace(.., 'g')    (global flag!)
    regexp_count(x, re)    ↔ len(regexp_extract_all(x, re))
    F.split(x, re)         ↔ regexp_split_to_array(x, re)

All ratio outputs are integer permille and similarities integer micro —
no float columns ever reach a hash comparison.
"""

from __future__ import annotations

from judy_graph_db_spark.functions.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    PUNCT_RE,
    STOPWORDS,
    WORD_TOKEN_RE,
    luhn_valid_count_sql,
)
from judy_graph_db_spark.operators.dedup import (
    BAND_ROWS,
    NUM_HASHES,
    SHINGLE_LEN,
    SHINGLE_STRIDE,
)

# ------------------------------------------------------------------- text

def _sql_quote_regex(re: str) -> str:
    """Embed a regex in a single-quoted DuckDB literal (no backslash
    escaping there — only quotes double)."""
    return "'" + re.replace("'", "''") + "'"


PUNCT_RE_SQL = _sql_quote_regex(PUNCT_RE)
WORD_TOKEN_RE_SQL = _sql_quote_regex(WORD_TOKEN_RE)


def token_count_sql(col: str = "text") -> str:
    return (
        f"CAST(CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END AS BIGINT)"
    )


def word_token_count_sql(col: str = "text") -> str:
    return f"CAST(len(regexp_extract_all({col}, {WORD_TOKEN_RE_SQL})) AS BIGINT)"


def punct_permille_sql(col: str = "text") -> str:
    kept = f"length(regexp_replace({col}, {PUNCT_RE_SQL}, '', 'g'))"
    return (
        f"CAST(CASE WHEN length({col}) = 0 THEN 0 ELSE "
        f"floor((length({col}) - {kept}) * 1000.0 / length({col})) END AS BIGINT)"
    )


def upper_permille_sql(col: str = "text") -> str:
    kept = f"length(regexp_replace({col}, '[A-Z]', '', 'g'))"
    return (
        f"CAST(CASE WHEN length({col}) = 0 THEN 0 ELSE "
        f"floor((length({col}) - {kept}) * 1000.0 / length({col})) END AS BIGINT)"
    )


def stopword_count_sql(col: str = "text") -> str:
    parts = " + ".join(
        f"len(regexp_extract_all(lower({col}), '\\b{w}\\b'))" for w in STOPWORDS
    )
    return f"CAST(({parts}) AS BIGINT)"


def stopword_permille_sql(col: str = "text") -> str:
    n = token_count_sql(col)
    return (
        f"CAST(CASE WHEN {n} = 0 THEN 0 ELSE "
        f"floor({stopword_count_sql(col)} * 1000.0 / {n}) END AS BIGINT)"
    )


def quality_score_sql(col: str = "text") -> str:
    return (
        "CAST("
        f"(CASE WHEN length({col}) BETWEEN 50 AND 20000 THEN 300 ELSE 0 END)"
        f" + (CASE WHEN {stopword_permille_sql(col)} >= 20 THEN 400 ELSE 0 END)"
        f" + (CASE WHEN {punct_permille_sql(col)} <= 150 THEN 150 ELSE 0 END)"
        f" + (CASE WHEN {upper_permille_sql(col)} <= 300 THEN 150 ELSE 0 END)"
        " AS BIGINT)"
    )


def lang_id_sql(col: str = "text") -> str:
    """Twin of ``functions.text.lang_id`` — identical packed
    ``score·16 + priority`` max arithmetic."""
    def packed(lang, words):
        s = " + ".join(
            f"len(regexp_extract_all(lower({col}), '\\b{w}\\b'))" for w in words
        )
        return f"(({s}) * 16 + {LANG_PRIORITY[lang]})"

    packs = {lang: packed(lang, words) for lang, words in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(packs.values()) + ")"
    out = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        out = (
            f"CASE WHEN {best} >= 16 AND {best} = {packs[lang]} "
            f"THEN '{lang}' ELSE {out} END"
        )
    return out


def dup_line_permille_sql(col: str = "text") -> str:
    """Twin of ``functions.text.dup_line_permille``."""
    lines = f"list_filter(string_split({col}, chr(10)), x -> length(x) > 0)"
    return (
        f"CAST(CASE WHEN len({lines}) = 0 THEN 0 ELSE "
        f"floor((len({lines}) - len(list_distinct({lines}))) * 1000.0"
        f" / len({lines})) END AS BIGINT)"
    )


def dup_token_permille_sql(col: str = "text") -> str:
    """Twin of ``functions.text.dup_token_permille``."""
    toks = f"regexp_split_to_array(trim({col}), '\\s+')"
    n = token_count_sql(col)
    return (
        f"CAST(CASE WHEN {n} = 0 THEN 0 ELSE "
        f"floor(({n} - len(list_distinct({toks}))) * 1000.0 / {n})"
        f" END AS BIGINT)"
    )


def fingerprint_sql(col: str = "text", window: int = 8, stride: int = 16) -> str:
    return (
        f"list_min(list_transform("
        f"generate_series(1, greatest(length({col})-{window-1}, 1), {stride}),"
        f" i -> md5(substring({col}, i, {window}))))"
    )


def simhash_sql(col: str = "text", bits: int = 16) -> str:
    """Twin of ``operators.dedup.simhash``: majority vote per hex digit's
    high bit over token md5 hashes."""
    hashes = (
        f"list_transform(regexp_split_to_array(trim(lower({col})), '\\s+'),"
        f" t -> md5(t))"
    )
    n = f"len({hashes})"
    bit_exprs = []
    for k in range(1, bits + 1):
        votes = (
            f"len(list_filter({hashes}, h -> substring(h, {k}, 1) IN "
            f"('8','9','a','b','c','d','e','f')))"
        )
        bit_exprs.append(f"CASE WHEN {votes} * 2 >= {n} THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bit_exprs) + ")"


# ------------------------------------------------------------------ dedup

def shingles_sql(col: str = "text", length: int = SHINGLE_LEN,
                 stride: int = SHINGLE_STRIDE) -> str:
    norm = f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length({norm})-{length-1}, 1), {stride}),"
        f" i -> substring({norm}, i, {length})))"
    )


def minhash_sql(shingles: str = "shingles", num_hashes: int = NUM_HASHES) -> str:
    return (
        f"list_transform(generate_series(0, {num_hashes-1}), "
        f"s -> list_min(list_transform({shingles}, "
        f"x -> md5(concat(CAST(s AS VARCHAR), ':', x)))))"
    )


def _lsh_cte_chain(id_col: str, text_col: str, table: str,
                   num_hashes: int, band_rows: int) -> str:
    """The shingle→minhash→band CTE chain shared by ``lsh_pairs_sql`` and
    ``dedup_clusters_sql`` (no leading WITH, trailing ``pairs`` CTE
    included)."""
    n_bands = num_hashes // band_rows
    return f"""sh AS (
  SELECT {id_col} AS doc_id, {shingles_sql(text_col)} AS shingles FROM {table}
),
sig AS (
  SELECT doc_id, {minhash_sql('shingles', num_hashes)} AS minhash FROM sh
),
bands AS (
  SELECT doc_id, b.band_idx,
         md5(array_to_string(
           list_slice(minhash, b.band_idx*{band_rows}+1,
                      b.band_idx*{band_rows}+{band_rows}), ',')) AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {n_bands-1})) AS band_idx) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2 USING (band_idx, band_hash)
  WHERE a.doc_id < b2.doc_id
)"""


def lsh_pairs_sql(id_col: str = "doc_id", text_col: str = "text",
                  table: str = "documents",
                  num_hashes: int = NUM_HASHES, band_rows: int = BAND_ROWS) -> str:
    """Twin of ``minhash_lsh_candidates``: distinct (doc_a, doc_b) sharing a
    band bucket."""
    chain = _lsh_cte_chain(id_col, text_col, table, num_hashes, band_rows)
    return f"""
WITH {chain}
SELECT doc_a, doc_b FROM pairs
"""


def sft_sequences_sql(pairs_sql: str, seq_len: int, eod_id: int = 0,
                      train_on_eod: bool = True,
                      id_col: str = "example_id",
                      prompt_col: str = "prompt_ids",
                      response_col: str = "response_ids",
                      drop_partial: bool = True) -> str:
    """Twin of ``curation.emit_sft_sequences`` over a ``pairs_sql``
    relation yielding ``(id_col, prompt_col LIST, response_col LIST)``.
    Returns ``(seq_id, toks, mask, n_tokens)`` with toks/mask =
    '|'-joined aligned streams. The global prefix sum is one window here
    (oracle scale); Spark uses the two-pass partition-subtotal shape."""
    i, p, r = id_col, prompt_col, response_col
    eod_mask = 1 if train_on_eod else 0
    partial = (f"WHERE gpos // {int(seq_len)} < total // {int(seq_len)}"
               if drop_partial else "")
    return f"""
WITH sft_in AS ({pairs_sql}),
sft_n AS (
  SELECT {i}, CAST(len({p}) + len({r}) + 1 AS BIGINT) AS n FROM sft_in
),
sft_s AS (
  SELECT {i}, n, CAST(SUM(n) OVER (ORDER BY {i}
         ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS st
  FROM sft_n
),
sft_stream AS (
  SELECT s.st + u.ii - 1 AS gpos, d.{p}[u.ii] AS token_id,
         CAST(0 AS BIGINT) AS mask
  FROM sft_in d JOIN sft_s s USING ({i}),
       UNNEST(generate_series(1, len(d.{p}))) u(ii)
  UNION ALL
  SELECT s.st + len(d.{p}) + u.ii - 1, d.{r}[u.ii], CAST(1 AS BIGINT)
  FROM sft_in d JOIN sft_s s USING ({i}),
       UNNEST(generate_series(1, len(d.{r}))) u(ii)
  UNION ALL
  SELECT st + n - 1, CAST({int(eod_id)} AS BIGINT),
         CAST({eod_mask} AS BIGINT)
  FROM sft_s
),
sft_t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM sft_n)
SELECT CAST(gpos // {int(seq_len)} AS BIGINT) AS seq_id,
       string_agg(token_id, '|' ORDER BY gpos) AS toks,
       string_agg(mask, '|' ORDER BY gpos) AS mask,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM sft_stream, sft_t
{partial}
GROUP BY 1"""


def fim_sequences_sql(seqs_sql: str, fim_permille: int = 500,
                      prefix_id: int = 32100, middle_id: int = 32101,
                      suffix_id: int = 32102, id_col: str = "seq_id",
                      tokens_col: str = "tokens") -> str:
    """Twin of ``curation.emit_fim_sequences`` over a ``seqs_sql``
    relation ``(id_col, tokens_col LIST(BIGINT))``: identical seeded-md5
    selection and split points, PSM sentinel layout. Returns
    ``(id_col, tokens, is_fim)``."""
    i, t = id_col, tokens_col

    def h(seed):
        return (f"CAST(CAST('0x' || substring(md5('{seed}:' || "
                f"CAST({i} AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)")

    return f"""
WITH fim_in AS ({seqs_sql}),
fim_p AS (
  SELECT {i}, {t} AS toks,
         ({h('fimsel')} % 1000) < {int(fim_permille)} AS pick,
         {h('fimp1')} % (len({t}) + 1) AS p1,
         {h('fimp2')} AS h2
  FROM fim_in
),
fim_q AS (
  SELECT {i}, toks, pick AND len(toks) >= 2 AS is_fim,
         p1, p1 + h2 % (len(toks) - p1 + 1) AS p2
  FROM fim_p
)
SELECT {i},
  CASE WHEN is_fim THEN
    [CAST({int(prefix_id)} AS BIGINT)] || toks[1 : p1] ||
    [CAST({int(suffix_id)} AS BIGINT)] || toks[p2 + 1 : len(toks)] ||
    [CAST({int(middle_id)} AS BIGINT)] || toks[p1 + 1 : p2]
  ELSE toks END AS tokens,
  is_fim
FROM fim_q"""


def span_corruption_sql(seqs_sql: str, mean_span_len: int = 3,
                        noise_permille: int = 150,
                        sentinel_base: int = 32000, eos_id: int = 1,
                        id_col: str = "seq_id",
                        tokens_col: str = "tokens") -> str:
    """Twin of ``curation.emit_span_corruption`` over a ``seqs_sql``
    relation yielding ``(id_col, tokens_col LIST(BIGINT))``: identical
    blocked placement (seeded-md5 offset per full block), sentinel ids,
    and targets+EOS assembly. Returns ``(id_col, inputs, targets,
    n_spans)`` with list-typed inputs/targets."""
    L = int(mean_span_len)
    noise = int(noise_permille)
    B = max(L, round(L * 1000 / noise))
    rng = B - L + 1
    sent = int(sentinel_base)
    t, i = tokens_col, id_col
    off_p = f"offs[(p - 1) // {B} + 1]"
    return f"""
WITH sc_in AS ({seqs_sql}),
sc_o AS (
  SELECT {i}, {t} AS toks,
    list_transform(generate_series(0, len({t}) // {B} - 1),
      b -> CAST(CAST('0x' || substring(md5('spanc:' ||
             CAST({i} AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 15)
           AS UBIGINT) % {rng} AS BIGINT)) AS offs
  FROM sc_in
)
SELECT {i},
  flatten(list_transform(generate_series(1, len(toks)), p ->
    CASE WHEN {off_p} IS NOT NULL AND (p - 1) % {B} = {off_p}
         THEN [CAST({sent} + (p - 1) // {B} AS BIGINT)]
         WHEN {off_p} IS NOT NULL AND (p - 1) % {B} >= {off_p}
              AND (p - 1) % {B} < {off_p} + {L}
         THEN CAST([] AS BIGINT[])
         ELSE [toks[p]] END)) AS inputs,
  CASE WHEN len(offs) > 0 THEN
    flatten(list_transform(generate_series(1, len(offs)), b ->
      [CAST({sent} + b - 1 AS BIGINT)] ||
      toks[(b - 1) * {B} + offs[b] + 1 :
           (b - 1) * {B} + offs[b] + {L}]))
    || [CAST({int(eos_id)} AS BIGINT)]
  ELSE [CAST({int(eos_id)} AS BIGINT)] END AS targets,
  CAST(len(offs) AS BIGINT) AS n_spans
FROM sc_o"""


def exact_substring_dedup_sql(k: int = 8, id_col: str = "doc_id",
                              text_col: str = "text",
                              table: str = "documents",
                              pos_pack: int = 1 << 20) -> str:
    """Twin of ``dedup.exact_substring_dedup``: duplicated k-token
    windows (md5 over space-joined tokens), keeper = min packed
    ``doc_id * pos_pack + pos``, overlapping loser windows union into
    removed positions, docs rebuilt from survivors. Returns
    ``(id_col, n_tokens, n_removed_tokens, clean_text)``."""
    k = int(k)
    return f"""
WITH esd_t AS MATERIALIZED (
  SELECT {id_col}, regexp_extract_all(lower({text_col}),
                                      {WORD_TOKEN_RE_SQL}) AS toks
  FROM {table}
),
esd_g AS MATERIALIZED (
  SELECT {id_col}, i AS pos,
         md5(array_to_string(toks[i:i + {k - 1}], ' ')) AS h
  FROM esd_t,
       UNNEST(generate_series(1, greatest(len(toks) - {k - 1}, 0))) u(i)
),
esd_keep AS (
  SELECT h, MIN({id_col} * {int(pos_pack)} + pos) AS keep_key,
         COUNT(*) AS n FROM esd_g GROUP BY h
),
esd_rm AS (
  SELECT DISTINCT g.{id_col}, g.pos + o.off AS pos
  FROM esd_g g JOIN esd_keep USING (h),
       UNNEST(generate_series(0, {k - 1})) o(off)
  WHERE esd_keep.n > 1
    AND g.{id_col} * {int(pos_pack)} + g.pos <> esd_keep.keep_key
),
esd_tok AS (
  SELECT {id_col}, i AS pos, toks[i] AS tok
  FROM esd_t, UNNEST(generate_series(1, len(toks))) u(i)
),
esd_kept AS (
  SELECT tk.{id_col},
         COUNT(*) AS n_kept,
         array_to_string(list(tk.tok ORDER BY tk.pos), ' ') AS clean_text
  FROM esd_tok tk ANTI JOIN esd_rm r
    ON tk.{id_col} = r.{id_col} AND tk.pos = r.pos
  GROUP BY tk.{id_col}
)
SELECT t.{id_col}, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - COALESCE(kk.n_kept, 0) AS BIGINT)
         AS n_removed_tokens,
       COALESCE(kk.clean_text, '') AS clean_text
FROM esd_t t LEFT JOIN esd_kept kk USING ({id_col})"""


def cross_corpus_lsh_sql(corpus_where: str, benchmark_where: str,
                         table: str = "documents",
                         id_col: str = "doc_id", text_col: str = "text",
                         num_hashes: int = NUM_HASHES,
                         band_rows: int = BAND_ROWS) -> str:
    """Twin of ``dedup.cross_corpus_neardup_pairs``: distinct
    (doc_id, bench_id) band-bucket collisions between two filtered
    corpora."""
    n_bands = num_hashes // band_rows

    def side(name: str, where: str) -> str:
        return f"""{name}_sh AS (
  SELECT {id_col} AS doc_id, {shingles_sql(text_col)} AS shingles
  FROM {table} WHERE {where}
),
{name}_sig AS (
  SELECT doc_id, {minhash_sql('shingles', num_hashes)} AS minhash
  FROM {name}_sh
),
{name}_bands AS (
  SELECT doc_id, b.band_idx,
         md5(array_to_string(
           list_slice(minhash, b.band_idx*{band_rows}+1,
                      b.band_idx*{band_rows}+{band_rows}), ',')) AS band_hash
  FROM {name}_sig,
       (SELECT unnest(generate_series(0, {n_bands-1})) AS band_idx) b
)"""

    return f"""
WITH {side('xc', corpus_where)},
{side('xb', benchmark_where)}
SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
FROM xc_bands c JOIN xb_bands b USING (band_idx, band_hash)
"""


def neardup_flags_sql(id_col: str = "doc_id", text_col: str = "text",
                      table: str = "documents", where: str = "TRUE",
                      num_hashes: int = NUM_HASHES,
                      band_rows: int = BAND_ROWS) -> str:
    """Twin of ``streaming.neardup``'s batch-equivalent flags: per doc,
    the min first-arrival (= min id) keeper over its LSH band buckets,
    kept when smaller than the doc's own id."""
    chain = _lsh_cte_chain(id_col, text_col,
                           f"(SELECT * FROM {table} WHERE {where}) ndsrc",
                           num_hashes, band_rows)
    return f"""
WITH {chain},
ndkeep AS (
  SELECT band_idx, band_hash, MIN(doc_id) AS keep_id
  FROM bands GROUP BY band_idx, band_hash
)
SELECT b.doc_id, CAST(MIN(k.keep_id) AS BIGINT) AS dup_of
FROM bands b JOIN ndkeep k USING (band_idx, band_hash)
WHERE k.keep_id < b.doc_id
GROUP BY b.doc_id
"""


def dedup_clusters_sql(id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents",
                       num_hashes: int = NUM_HASHES,
                       band_rows: int = BAND_ROWS) -> str:
    """Twin of ``dedup.dedup_clusters``: near-dup families = transitive
    closure of the LSH candidate pairs, computed with a recursive CTE
    (reach = every node a doc can reach; component = MIN(reach)); singleton
    docs are their own cluster. The iterative Spark operator
    (large-star/small-star) is checked against this independent closure."""
    chain = _lsh_cte_chain(id_col, text_col, table, num_hashes, band_rows)
    return f"""
WITH RECURSIVE {chain},
reach(id, r) AS (
  SELECT id, id FROM (SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs) t
  UNION
  SELECT reach.id, s.b
  FROM reach JOIN (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL SELECT doc_b, doc_a FROM pairs
  ) s ON reach.r = s.a
),
comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
SELECT d.{id_col} AS doc_id,
       COALESCE(c.comp, d.{id_col}) AS cluster_id,
       d.{id_col} = COALESCE(c.comp, d.{id_col}) AS is_canonical
FROM {table} d LEFT JOIN comp c ON d.{id_col} = c.id
"""


def ngram_contamination_sql(
    corpus_sql: str,
    benchmark_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = SHINGLE_LEN,
    stride: int = SHINGLE_STRIDE,
) -> str:
    """Twin of ``operators.dedup.ngram_contamination``: per corpus doc, its
    distinct-shingle count and how many shingles the benchmark set shares."""
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id,
         unnest({shingles_sql(text_col, length, stride)}) AS sh
  FROM ({corpus_sql})
),
b AS (
  SELECT DISTINCT unnest({shingles_sql(text_col, length, stride)}) AS sh
  FROM ({benchmark_sql})
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(b.sh) AS BIGINT) AS n_hits,
       CAST(FLOOR(COUNT(b.sh) * 1000.0 / COUNT(*)) AS BIGINT) AS contam_permille
FROM c LEFT JOIN b ON b.sh = c.sh
GROUP BY c.doc_id"""


def corpus_containment_sql(group_expr: str,
                           table: str = "documents",
                           text_col: str = "text",
                           num_hashes: int = NUM_HASHES) -> str:
    """Twin of ``operators.dedup.corpus_containment`` — union-MinHash
    corpus-pair Jaccard/containment with exact distinct-shingle counts."""
    hcols = ",\n         ".join(
        f"MIN(md5(concat('{s}:', shingle))) AS h{s}"
        for s in range(num_hashes))
    match = " + ".join(
        f"(CASE WHEN a.h{s} = b.h{s} THEN 1 ELSE 0 END)"
        for s in range(num_hashes))
    return f"""
WITH cc_sh AS (
  SELECT {group_expr} AS grp,
         unnest({shingles_sql(text_col)}) AS shingle
  FROM {table}
),
cc_ds AS (SELECT DISTINCT grp, shingle FROM cc_sh),
cc_sig AS (
  SELECT grp, COUNT(*) AS n,
         {hcols}
  FROM cc_ds GROUP BY grp
),
cc_pair AS (
  SELECT a.grp AS corpus_a, b.grp AS corpus_b,
         a.n AS n_a, b.n AS n_b,
         CAST({match} AS BIGINT) AS n_match
  FROM cc_sig a JOIN cc_sig b ON a.grp < b.grp
),
cc_j AS (
  SELECT *, 1000000 * n_match // {num_hashes} AS jaccard_micro
  FROM cc_pair
),
cc_i AS (
  SELECT *, jaccard_micro * (n_a + n_b) // (1000000 + jaccard_micro)
            AS inter_est
  FROM cc_j
)
SELECT corpus_a, corpus_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, n_match,
       CAST(jaccard_micro AS BIGINT) AS jaccard_micro,
       CAST(inter_est AS BIGINT) AS inter_est,
       CAST(1000000 * inter_est // n_a AS BIGINT) AS contain_a_micro,
       CAST(1000000 * inter_est // n_b AS BIGINT) AS contain_b_micro
FROM cc_i
"""


def ngram_jaccard_sql(id_col: str = "doc_id", text_col: str = "text",
                      table: str = "documents") -> str:
    """Twin of ``ngram_jaccard_pairs`` over the LSH candidates."""
    return f"""
WITH cand AS ({lsh_pairs_sql(id_col, text_col, table)}),
sh AS (
  SELECT {id_col} AS doc_id, {shingles_sql(text_col)} AS shingles FROM {table}
)
SELECT c.doc_a, c.doc_b,
       CAST(floor(len(list_intersect(a.shingles, b.shingles)) * 1000.0
                  / len(list_distinct(list_concat(a.shingles, b.shingles))))
            AS BIGINT) AS jaccard_permille
FROM cand c
JOIN sh a ON c.doc_a = a.doc_id
JOIN sh b ON c.doc_b = b.doc_id
"""


def simhash_neardup_sql(max_hamming: int = 2, bits: int = 32,
                        table: str = "documents") -> str:
    """Twin of ``simhash_neardup_pairs``. The Spark side band-joins first;
    banding is lossless for hamming ≤ max_hamming (bands > max_hamming), so
    the plain O(n²) scan here produces the identical pair set."""
    ham = (
        f"len(list_filter(generate_series(1, {bits}), "
        f"k -> substring(a.sig, k, 1) <> substring(b.sig, k, 1)))"
    )
    return f"""
WITH s AS (SELECT doc_id, {simhash_sql('text', bits)} AS sig FROM {table})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({ham} AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
"""


def embedding_neardup_sql(threshold_micro: int = 400000, n_planes: int = 4,
                          dim: int = 64, table: str = "embeddings") -> str:
    """Twin of ``cosine_neardup_pairs`` — same LSH-bucket constraint."""
    return f"""
WITH p AS (
  SELECT vec_id AS pid, embedding AS pv FROM {table} ORDER BY vec_id LIMIT {n_planes}
),
bits AS (
  SELECT e.vec_id, p.pid,
         CASE WHEN {dot_sql('e.embedding', 'p.pv', dim)} >= 0
              THEN '1' ELSE '0' END AS bit
  FROM {table} e, p
),
bk AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY pid) AS bucket FROM bits GROUP BY vec_id
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {cosine_micro_sql('ea.embedding', 'eb.embedding', dim)} AS sim_micro
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
JOIN {table} ea ON ea.vec_id = a.vec_id
JOIN {table} eb ON eb.vec_id = b.vec_id
WHERE {cosine_micro_sql('ea.embedding', 'eb.embedding', dim)} >= {threshold_micro}
"""


# ------------------------------------------------------------- similarity

def dot_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_micro_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"CAST(ROUND({dot_sql(a, b, dim)} / "
        f"(sqrt({dot_sql(a, a, dim)}) * sqrt({dot_sql(b, b, dim)})) * 1e6) AS BIGINT)"
    )


def cosine_topk_sql(query_id: int = 0, k: int = 10, dim: int = 64,
                    table: str = "embeddings") -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM {table} WHERE vec_id = {query_id}),
scored AS (
  SELECT e.vec_id, {cosine_micro_sql('e.embedding', 'q.qv', dim)} AS sim_micro
  FROM {table} e, q WHERE e.vec_id <> {query_id}
)
SELECT vec_id,
       CAST(ROW_NUMBER() OVER (ORDER BY sim_micro DESC, vec_id) AS INTEGER) AS rank,
       sim_micro
FROM scored
ORDER BY sim_micro DESC, vec_id
LIMIT {k}
"""


def ivf_cells_sql(n_cells: int = 4, dim: int = 64, table: str = "embeddings") -> str:
    """Twin of ``ivf_assign`` + per-cell counts."""
    return f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM {table} ORDER BY vec_id LIMIT {n_cells}
),
scored AS (
  SELECT e.vec_id, c.cid, {cosine_micro_sql('e.embedding', 'c.cv', dim)} AS sim
  FROM {table} e, c
),
best AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
  FROM scored
)
SELECT cid AS cell, COUNT(*) AS n FROM best WHERE rn = 1 GROUP BY cid
"""


def lsh_bucket_sizes_sql(n_planes: int = 4, dim: int = 64,
                         table: str = "embeddings") -> str:
    """Twin of ``hyperplane_buckets`` + per-bucket counts."""
    return f"""
WITH p AS (
  SELECT vec_id AS pid, embedding AS pv FROM {table} ORDER BY vec_id LIMIT {n_planes}
),
bits AS (
  SELECT e.vec_id, p.pid,
         CASE WHEN {dot_sql('e.embedding', 'p.pv', dim)} >= 0
              THEN '1' ELSE '0' END AS bit
  FROM {table} e, p
),
b AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY pid) AS bucket FROM bits GROUP BY vec_id
)
SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
"""


# --------------------------------------------------------------- curation

def hash_bucket_sql(col: str) -> str:
    """Twin of ``curation.hash_bucket``: 2-hex-digit md5 prefix, compared as
    a string so neither engine needs hex→int conversion."""
    return f"substring(md5(CAST({col} AS VARCHAR)), 1, 2)"


def hash_split_case_sql(splits: dict[str, int], col: str = "doc_id") -> str:
    """Twin of ``curation.hash_split``: the same cumulative-cutoff CASE."""
    b = hash_bucket_sql(col)
    out = []
    hi = 0
    items = list(splits.items())
    for name, width in items[:-1]:
        hi += width
        out.append(f"WHEN {b} < '{format(hi, '02x')}' THEN '{name}'")
    return "CASE " + " ".join(out) + f" ELSE '{items[-1][0]}' END"


def chunk_documents_sql(size: int = 200, stride: int = 150,
                        id_col: str = "doc_id", text_col: str = "text",
                        table: str = "documents") -> str:
    """Twin of ``curation.chunk_documents``: same start-position series
    (generate_series is stop-inclusive in both engines; runs through the
    text end so the tail chunk is kept)."""
    return f"""
WITH starts AS (
  SELECT {id_col}, {text_col} AS t,
         unnest(generate_series(1, greatest(length({text_col}), 1), {stride})) AS s
  FROM {table}
)
SELECT {id_col}, CAST((s - 1) // {stride} AS BIGINT) AS chunk_idx,
       substring(t, CAST(s AS INTEGER), {size}) AS chunk
FROM starts
"""


def shard_by_token_budget_sql(budget_tokens: int, id_col: str = "doc_id",
                              text_col: str = "text",
                              table: str = "documents") -> str:
    """Twin of ``curation.shard_by_token_budget``: the two-pass distributed
    prefix sum reduces to one plain cumulative window here."""
    return f"""
WITH toks AS (
  SELECT {id_col}, {token_count_sql(text_col)} AS n_tokens FROM {table}
)
SELECT {id_col}, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY {id_col}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {budget_tokens} AS BIGINT) AS shard
FROM toks
"""


def canonical_corpus_sql(id_col: str = "doc_id", text_col: str = "text",
                         table: str = "documents") -> str:
    """Twin of ``curation.canonical_corpus``: the post-dedup corpus = docs
    that are their near-dup family's min-id representative, per the same
    recursive-closure clustering as ``dedup_clusters_sql``."""
    return f"""
SELECT d.{id_col}, {token_count_sql('d.' + text_col)} AS n_tokens
FROM {table} d
JOIN ({dedup_clusters_sql(id_col, text_col, table)}) c
  ON d.{id_col} = c.{id_col} AND c.is_canonical
"""


def knn_join_sql(n_queries: int = 5, k: int = 10, dim: int = 64,
                 table: str = "embeddings") -> str:
    """Twin of ``similarity.knn_join`` with queries = the ``n_queries``
    lowest vec_ids."""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM {table}
  ORDER BY vec_id LIMIT {n_queries}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {cosine_micro_sql('e.embedding', 'q.qv', dim)} AS sim_micro
  FROM {table} e, q WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, sim_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim_micro DESC, vec_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, sim_micro FROM r WHERE rank <= {k}
"""


def ivf_topk_sql(query_id: int = 0, k: int = 10, n_cells: int = 4,
                 n_probe: int = 2, dim: int = 64,
                 table: str = "embeddings") -> str:
    """Twin of ``similarity.ivf_topk``: probe the query's ``n_probe``
    closest cells, exact top-k within the probed candidates."""
    return f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM {table} ORDER BY vec_id LIMIT {n_cells}
),
q AS (SELECT embedding AS qv FROM {table} WHERE vec_id = {query_id}),
probe AS (
  SELECT cid FROM c, q
  ORDER BY {cosine_micro_sql('cv', 'qv', dim)} DESC, cid LIMIT {n_probe}
),
cscored AS (
  SELECT e.vec_id, c.cid, {cosine_micro_sql('e.embedding', 'c.cv', dim)} AS sim
  FROM {table} e, c
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM cscored
  ) WHERE rn = 1
),
cand AS (
  SELECT e.vec_id, e.embedding FROM {table} e
  JOIN assign a ON e.vec_id = a.vec_id
  JOIN probe p ON a.cell = p.cid
  WHERE e.vec_id <> {query_id}
),
scored AS (
  SELECT cand.vec_id,
         {cosine_micro_sql('cand.embedding', 'qv', dim)} AS sim_micro
  FROM cand, q
),
top AS (
  SELECT vec_id, sim_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY sim_micro DESC, vec_id) AS INTEGER) AS rank
  FROM scored
)
SELECT vec_id, rank, sim_micro FROM top WHERE rank <= {k}
"""


# --------------------------------------------------------------- temporal

def asof_join_sql(probe_type: str = "click", quote_type: str = "purchase",
                  table: str = "events") -> str:
    """Twin of ``temporal.asof_join`` on the events table: for every
    ``probe_type`` event, the latest ``quote_type`` value at-or-before it
    per user — same union + last_value(IGNORE NULLS) running-window
    formulation over ONE struct (all attached columns from the same right
    row), same (ts, quotes-first, max-value) tiebreak on plain columns."""
    return f"""
WITH u AS (
  SELECT user_id, ts AS t, 0 AS is_r, CAST(NULL AS DOUBLE) AS rv,
         NULL AS rs, event_id
  FROM {table} WHERE event_type = '{probe_type}'
  UNION ALL
  SELECT user_id, ts, 1, value, {{'value': value}}, NULL
  FROM {table} WHERE event_type = '{quote_type}'
),
f AS (
  SELECT event_id, is_r,
         LAST_VALUE(rs IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY t ASC, -is_r ASC, rv ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fr
  FROM u
)
SELECT event_id, CAST(round(fr.value * 100) AS BIGINT) AS value_asof_cents
FROM f WHERE is_r = 0
"""


def range_join_sql(days: int = 10, table: str = "orders") -> str:
    """Twin of ``temporal.range_join`` exercised as "orders in the first
    ``days`` days of each month": intervals derived from the same table, the
    oracle is the plain BETWEEN join the bin equi-join must reproduce."""
    return f"""
WITH iv AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS start_ts,
         date_trunc('month', o_orderdate) + INTERVAL {days} DAY AS end_ts
  FROM {table}
)
SELECT CAST(year(iv.start_ts) * 100 + month(iv.start_ts) AS BIGINT) AS month_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM {table} o
JOIN iv ON o.o_orderdate >= iv.start_ts AND o.o_orderdate < iv.end_ts
GROUP BY 1
"""


def funnel_sql(first_type: str = "view", then_type: str = "purchase",
               within_seconds: int = 3600, table: str = "events") -> str:
    """Twin of ``temporal.funnel_completions``: per user, A-events followed
    by a B *strictly* after within the gap — same min-over-following-frame
    formulation, same B-before-A order at equal timestamps."""
    return f"""
WITH ab AS (
  SELECT user_id, ts AS t, (event_type = '{then_type}') AS is_b
  FROM {table} WHERE event_type IN ('{first_type}', '{then_type}')
),
m AS (
  SELECT user_id, t, is_b,
         MIN(CASE WHEN is_b THEN t END) OVER (
           PARTITION BY user_id ORDER BY t ASC, is_b DESC
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_b
  FROM ab
)
SELECT user_id, COUNT(*) AS n_started,
       CAST(SUM(CASE WHEN next_b IS NOT NULL
                      AND epoch(next_b) - epoch(t) <= {within_seconds}
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_completed
FROM m WHERE NOT is_b
GROUP BY user_id
"""


def topk_per_group_sql(k: int = 3, table: str = "orders") -> str:
    """Twin of ``temporal.topk_per_group``: top-k orders per priority by
    (totalprice desc, orderkey asc)."""
    return f"""
SELECT o_orderpriority, o_orderkey, rank_in_group FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER
         ) AS rank_in_group
  FROM {table}
) WHERE rank_in_group <= {k}
"""


# ------------------------------------------------------------------ stats

def stratified_sample_sql(strata: dict[str, int], strata_col: str = "lang",
                          id_col: str = "doc_id",
                          table: str = "documents") -> str:
    """Twin of ``curation.stratified_sample``: per-stratum hash cutoff
    (width 256 → the 'zz' sentinel that keeps every bucket)."""
    b = hash_bucket_sql(id_col)
    whens = " ".join(
        f"WHEN '{name}' THEN '{format(w, '02x') if w < 256 else 'zz'}'"
        for name, w in strata.items()
    )
    return f"""
SELECT {id_col}, {strata_col}
FROM {table}
WHERE {b} < CASE {strata_col} {whens} ELSE '00' END
"""


def grouped_quantiles_sql(group_col: str, value_expr: str, qs: list[float],
                          table: str) -> str:
    """Twin of ``stats.grouped_quantiles`` — the same explicit
    percentile_disc formulation (value at row_number == ceil(q*n)), not the
    engine's quantile builtin, so both sides share one definition."""
    q_cols = ", ".join(
        f"MAX(CASE WHEN rn = greatest(CAST(ceil({q} * n) AS BIGINT), 1) "
        f"THEN v END) AS q_{int(round(q * 1000))}"
        for q in qs
    )
    return f"""
WITH ranked AS (
  SELECT {group_col}, {value_expr} AS v,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {value_expr} ASC) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table}
)
SELECT {group_col}, {q_cols} FROM ranked GROUP BY {group_col}
"""


def top_terms_sql(k: int = 5, id_col: str = "doc_id", text_col: str = "text",
                  table: str = "documents") -> str:
    """Twin of ``stats.top_terms_per_doc``: word tokens (same regex as
    ``word_token_count_sql``), tf per (doc, term), df per term, top-k by
    (tf desc, term asc)."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})) AS term
  FROM {table}
),
tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM toks GROUP BY {id_col}, term
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
)
SELECT {id_col}, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       rank_in_doc
FROM (
  SELECT tf.{id_col}, tf.term, tf.tf, dfreq.df,
         CAST(ROW_NUMBER() OVER (PARTITION BY tf.{id_col}
                                 ORDER BY tf.tf DESC, tf.term ASC) AS INTEGER
         ) AS rank_in_doc
  FROM tf JOIN dfreq USING (term)
)
WHERE rank_in_doc <= {k}
"""


def bipartite_projection_sql(min_count: int = 2, table: str = "lineitem",
                             src: str = "l_orderkey",
                             dst: str = "l_partkey") -> str:
    """Twin of ``analytics.bipartite_projection`` over the order→part
    containment: parts co-ordered ≥ min_count times."""
    return f"""
WITH d AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM {table})
SELECT l.dst AS a, r.dst AS b, COUNT(*) AS n_common
FROM d l JOIN d r ON l.src = r.src AND l.dst < r.dst
GROUP BY l.dst, r.dst
HAVING COUNT(*) >= {min_count}
"""


def jaccard_similarity_sql(table: str = "lineitem",
                           src_expr: str = "l_suppkey + 2000000000000",
                           dst_expr: str = "l_partkey + 4000000000000",
                           min_permille: int = 100,
                           max_b: int | None = None) -> str:
    """Twin of ``analytics.jaccard_similarity`` on the supplier~part
    incidence graph (ids offset into the shared node-id space)."""
    return f"""
WITH e AS (
  SELECT DISTINCT CAST({src_expr} AS BIGINT) AS src,
         CAST({dst_expr} AS BIGINT) AS dst
  FROM {table}
),
sym AS (
  SELECT src, dst FROM e WHERE src <> dst
  UNION
  SELECT dst, src FROM e WHERE src <> dst
),
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
wedge AS (
  SELECT l.src AS a, r.src AS b, COUNT(*) AS common
  FROM sym l JOIN sym r ON l.dst = r.dst AND l.src < r.src
  GROUP BY l.src, r.src
)
SELECT w.a, w.b, w.common,
       CAST(floor(w.common * 1000 / (da.d + db.d - w.common)) AS BIGINT)
         AS jaccard_permille
FROM wedge w
JOIN deg da ON w.a = da.src
JOIN deg db ON w.b = db.src
WHERE floor(w.common * 1000 / (da.d + db.d - w.common)) >= {min_permille}
{f'AND w.b < {max_b}' if max_b is not None else ''}
"""


def resource_allocation_sql(table: str = "lineitem",
                            src_expr: str = "l_suppkey + 2000000000000",
                            dst_expr: str = "l_partkey + 4000000000000",
                            min_micro: int = 0,
                            max_b: int | None = None) -> str:
    """Twin of ``analytics.resource_allocation`` (RA micro + preferential
    attachment over common-neighbor candidate pairs)."""
    return f"""
WITH e AS (
  SELECT DISTINCT CAST({src_expr} AS BIGINT) AS src,
         CAST({dst_expr} AS BIGINT) AS dst
  FROM {table}
),
sym AS (
  SELECT src, dst FROM e WHERE src <> dst
  UNION
  SELECT dst, src FROM e WHERE src <> dst
),
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
wedge AS (
  SELECT l.src AS a, r.src AS b, COUNT(*) AS common,
         SUM(1000000 // dv.d) AS ra_micro
  FROM sym l
  JOIN sym r ON l.dst = r.dst AND l.src < r.src
  JOIN deg dv ON l.dst = dv.src
  GROUP BY l.src, r.src
)
SELECT w.a, w.b, w.common, CAST(w.ra_micro AS BIGINT) AS ra_micro,
       CAST(da.d * db.d AS BIGINT) AS pa
FROM wedge w
JOIN deg da ON w.a = da.src
JOIN deg db ON w.b = db.src
WHERE w.ra_micro >= {min_micro}
{f'AND w.b < {max_b}' if max_b is not None else ''}
"""


def inverted_index_sql(min_df: int = 5, max_df: int = 400,
                       id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> str:
    """Twin of ``stats.inverted_index``: (term, df, md5 of the comma-joined
    ascending posting list)."""
    return f"""
WITH pairs AS (
  SELECT DISTINCT {id_col},
         unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})) AS term
  FROM {table}
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM pairs GROUP BY term
  HAVING COUNT(*) BETWEEN {min_df} AND {max_df}
)
SELECT p.term, CAST(d.df AS BIGINT) AS df,
       md5(string_agg(CAST(p.{id_col} AS VARCHAR), ',' ORDER BY p.{id_col}))
         AS posting_hash
FROM pairs p JOIN dfreq d USING (term)
GROUP BY p.term, d.df
"""


def incremental_dedup_sql(split: str = "80", id_col: str = "doc_id",
                          text_col: str = "text",
                          table: str = "documents") -> str:
    """Twin of the incremental-dedup bundle: the corpus is split by hash
    bucket into existing (< split) and a new batch (>= split); the exact
    part flags each new doc (code = dup_of_existing·2 + keep), the LSH part
    lists (new, existing) and within-batch band-bucket candidates."""
    b = hash_bucket_sql(id_col)
    chain = _lsh_cte_chain(id_col, text_col, table, NUM_HASHES, BAND_ROWS)
    return f"""
WITH {chain},
newdocs AS (SELECT {id_col}, {text_col} FROM {table} WHERE {b} >= '{split}'),
olddocs AS (SELECT {id_col}, {text_col} FROM {table} WHERE {b} < '{split}'),
exact AS (
  SELECT n.{id_col} AS a,
         (EXISTS (SELECT 1 FROM olddocs o WHERE md5(o.{text_col}) = md5(n.{text_col})))
           AS dup_of_existing,
         ROW_NUMBER() OVER (PARTITION BY md5(n.{text_col})
                            ORDER BY n.{id_col} ASC) AS rn
  FROM newdocs n
),
nb AS (SELECT bd.* FROM bands bd JOIN newdocs USING ({id_col})),
eb AS (SELECT bd.* FROM bands bd JOIN olddocs USING ({id_col})),
lsh_old AS (
  SELECT DISTINCT nb.{id_col} AS a, eb.{id_col} AS b2
  FROM nb JOIN eb USING (band_idx, band_hash)
),
lsh_new AS (
  SELECT DISTINCT x.{id_col} AS a, y.{id_col} AS b2
  FROM nb x JOIN nb y USING (band_idx, band_hash)
  WHERE x.{id_col} < y.{id_col}
)
SELECT 'exact' AS op, a, CAST(NULL AS BIGINT) AS b,
       CAST(CASE WHEN dup_of_existing THEN 2 ELSE 0 END
            + CASE WHEN NOT dup_of_existing AND rn = 1 THEN 1 ELSE 0 END
         AS BIGINT) AS code
FROM exact
UNION ALL
SELECT 'lsh_old', a, b2, CAST(1 AS BIGINT) FROM lsh_old
UNION ALL
SELECT 'lsh_new', a, b2, CAST(0 AS BIGINT) FROM lsh_new
"""


# ---------------------------------------------------- clustering / semdedup


def _sqdist_sql(e: str, c: str, dim: int = 64) -> str:
    """Twin of ``clustering._sqdist`` — same strict left-to-right fold."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> (CAST({e}[i] AS DOUBLE) - {c}[i]) * "
        f"(CAST({e}[i] AS DOUBLE) - {c}[i])))"
    )


def kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64,
                table: str = "embeddings",
                prefix: str = "") -> tuple[str, str]:
    """Unrolled-CTE twin of ``clustering.kmeans_assign``: one
    assign/update pair per Lloyd round, centroid coordinates quantized to
    the same 1e-6 grid. Returns ``(cte_chain, final_assign_cte_name)`` so
    callers compose it under their own WITH; ``prefix`` namespaces the CTE
    names so several chains (e.g. one per PQ subspace) coexist in one
    query."""
    avgs = ", ".join(
        f"ROUND(AVG(CAST(e.embedding[{i + 1}] AS DOUBLE)) * 1e6) / 1e6"
        for i in range(dim)
    )
    parts = [f"""{prefix}c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM (SELECT vec_id, embedding FROM {table} ORDER BY vec_id LIMIT {k})
)"""]
    for it in range(1, iters + 1):
        prev = f"{prefix}c{it - 1}"
        parts.append(f"""{prefix}s{it} AS (
  SELECT e.vec_id, c.cid, {_sqdist_sql('e.embedding', 'c.cv', dim)} AS d
  FROM {table} e, {prev} c
)""")
        parts.append(f"""{prefix}a{it} AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM {prefix}s{it}) WHERE rn = 1
)""")
        if it < iters:
            parts.append(f"""{prefix}m{it} AS (
  SELECT a.cluster AS cid, list_value({avgs}) AS cv
  FROM {prefix}a{it} a JOIN {table} e USING (vec_id)
  GROUP BY a.cluster
)""")
            parts.append(f"""{prefix}c{it} AS (
  SELECT c.cid, COALESCE(m.cv, c.cv) AS cv
  FROM {prev} c LEFT JOIN {prefix}m{it} m USING (cid)
)""")
    return ",\n".join(parts), f"{prefix}a{iters}"


def kmeans_sizes_sql(k: int = 8, iters: int = 2, dim: int = 64,
                     table: str = "embeddings") -> str:
    ctes, fin = kmeans_ctes(k, iters, dim, table)
    return (
        f"WITH {ctes}\n"
        f"SELECT cluster, COUNT(*) AS n FROM {fin} GROUP BY cluster"
    )


def semantic_dedup_sql(threshold_micro: int = 350000, k: int = 8,
                       iters: int = 2, dim: int = 64,
                       table: str = "embeddings") -> str:
    """Twin of ``clustering.semantic_dedup``: within-cluster lower-id
    neighbor at cosine ≥ threshold → dropped."""
    ctes, fin = kmeans_ctes(k, iters, dim, table)
    return f"""WITH {ctes},
e2 AS (
  SELECT e.vec_id, e.embedding, a.cluster,
         sqrt({dot_sql('e.embedding', 'e.embedding', dim)}) AS nrm
  FROM {table} e JOIN {fin} a USING (vec_id)
),
drops AS (
  SELECT DISTINCT y.vec_id
  FROM e2 x JOIN e2 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE CAST(ROUND({dot_sql('x.embedding', 'y.embedding', dim)} /
             (x.nrm * y.nrm) * 1e6) AS BIGINT) >= {threshold_micro}
)
SELECT a.vec_id, a.cluster, d.vec_id IS NULL AS kept
FROM {fin} a LEFT JOIN drops d ON a.vec_id = d.vec_id"""


def quality_percentile_filter_sql(keep_permille: int = 500,
                                  group_col: str = "lang",
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  table: str = "documents") -> str:
    """Twin of ``curation.quality_percentile_filter`` (percentile_disc
    cutoff at ceil(p·n), same tiebreaks)."""
    return f"""
WITH s AS (
  SELECT {id_col}, {group_col}, {quality_score_sql(text_col)} AS q_score
  FROM {table}
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY q_score, {id_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM s
),
c AS (
  SELECT *,
         MAX(CASE WHEN rn = GREATEST(
               CAST(CEIL({int(keep_permille)} * n / 1000.0) AS BIGINT), 1)
             THEN q_score END) OVER (PARTITION BY {group_col}) AS cut
  FROM r
)
SELECT {id_col}, {group_col}, q_score FROM c WHERE q_score >= cut"""


def url_count_sql(col: str = "text") -> str:
    """Twin of ``text.url_count``."""
    from judy_graph_db_spark.functions.text import URL_RE

    return (f"CAST(len(regexp_extract_all(lower({col}), "
            f"{_sql_quote_regex(URL_RE)})) AS BIGINT)")


def url_domains_sql(col: str = "text") -> str:
    """Twin of ``text.url_domains`` (returns a list; callers join/unnest)."""
    from judy_graph_db_spark.functions.text import URL_DOMAIN_RE

    return (f"regexp_extract_all(lower({col}), "
            f"{_sql_quote_regex(URL_DOMAIN_RE)}, 1)")


def dedup_lines_sql(col: str = "text") -> str:
    """Twin of ``curation.dedup_lines_col``: the same keep-first fold via
    ``list_reduce`` over singleton lists (DuckDB's reduce seeds from the
    first element, which equals Spark's empty-seed fold here because the
    first line is always kept). The skip branch appends ``x[2:]`` (empty,
    correctly typed) instead of returning ``acc`` verbatim — DuckDB 1.0's
    list_reduce mis-evaluates a CASE branch that yields the accumulator
    unchanged once a later element takes the other branch."""
    return (
        f"array_to_string(list_reduce("
        f"list_transform(string_split({col}, chr(10)), s -> [s]), "
        f"(acc, x) -> list_concat(acc, "
        f"CASE WHEN list_contains(acc, x[1]) THEN x[2:] ELSE x END)), "
        f"chr(10))"
    )


def bm25_sql(query_terms, k1: float = 1.2, b: float = 0.75,
             id_col: str = "doc_id", text_col: str = "text",
             table: str = "documents", scale: int = 1000) -> str:
    """Twin of ``stats.bm25_scores`` at ``floor(score·scale)`` integer
    precision. Float-identical by construction: avgdl is exact-long-sum /
    count (one division) on both sides, every float op appears in the
    same textual order, and the ln argument is a rational of integers —
    the only cross-engine exposure is ln's last ulp, ~1e-13 odds of
    flipping a milli-floor."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
WITH btoks AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}))
           AS term
  FROM {table}
),
bdl AS (SELECT {id_col}, COUNT(*) AS dl FROM btoks GROUP BY {id_col}),
bst AS (SELECT COUNT(*) AS N,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM bdl),
btf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM btoks
        WHERE term IN ({terms}) GROUP BY {id_col}, term),
bdf AS (SELECT term, COUNT(*) AS df FROM btf GROUP BY term)
SELECT btf.{id_col} AS {id_col},
       CAST(FLOOR(SUM(
         ln(1.0 + (bst.N - bdf.df + 0.5) / (bdf.df + 0.5))
         * (btf.tf * {k1 + 1!r})
         / (btf.tf + {k1!r} * (1 - {b!r} + {b!r} * bdl.dl / bst.avgdl))
       ) * {scale}) AS BIGINT) AS score_scaled
FROM btf
JOIN bdf USING (term) JOIN bdl USING ({id_col}) CROSS JOIN bst
GROUP BY btf.{id_col}"""


def token_commonness_sql(id_col: str = "doc_id", text_col: str = "text",
                         table: str = "documents") -> str:
    """Twin of ``stats.token_commonness``."""
    return f"""
WITH tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM (
    SELECT {id_col},
           unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})) AS term
    FROM {table}
  ) t GROUP BY 1, 2
),
wc AS (SELECT *, SUM(tf) OVER (PARTITION BY term) AS c FROM tf),
pd AS (
  SELECT {id_col}, SUM(tf) AS n_tokens, SUM(tf * c) AS wsum
  FROM wc GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS T FROM pd)
SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(wsum * 1e6 / (n_tokens * T)) AS BIGINT) AS commonness_micro
FROM pd, tot"""


def pack_sequences_sql(seq_len: int, id_col: str = "doc_id",
                       text_col: str = "text",
                       table: str = "documents") -> str:
    """Twin of ``curation.pack_sequences``."""
    return f"""
WITH toks AS (
  SELECT {id_col}, {token_count_sql(text_col)} AS n_tokens FROM {table}
),
pre AS (
  SELECT {id_col}, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM toks
)
SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start // {seq_len} AS BIGINT) AS seq_first,
       CAST((start + n_tokens - 1) // {seq_len} AS BIGINT) AS seq_last,
       CAST(start % {seq_len} AS BIGINT) AS offset_in_first
FROM pre WHERE n_tokens > 0"""


def cohort_retention_sql(period_days: int = 7, user_col: str = "user_id",
                         ts_col: str = "ts", table: str = "events") -> str:
    """Twin of ``temporal.cohort_retention`` (absolute days-since-epoch
    period bins, calendar-free)."""
    return f"""
WITH acts AS (
  SELECT DISTINCT {user_col} AS u,
         CAST(FLOOR(date_diff('day', DATE '1970-01-01',
              CAST({ts_col} AS DATE)) / {period_days}) AS BIGINT) AS p
  FROM {table}
),
firsts AS (SELECT u, MIN(p) AS cohort FROM acts GROUP BY u)
SELECT cohort AS cohort_period, p - cohort AS period_offset,
       COUNT(*) AS n_active
FROM acts JOIN firsts USING (u)
GROUP BY 1, 2"""


def cap_per_group_sql(group_col: str, n: int, id_col: str = "doc_id",
                      table: str = "documents") -> str:
    """Twin of ``curation.cap_per_group`` (md5-rank quota per group)."""
    return f"""
SELECT {id_col}, {group_col}, CAST(rank_in_group AS BIGINT) AS rank_in_group
FROM (
  SELECT {id_col}, {group_col},
         ROW_NUMBER() OVER (
           PARTITION BY {group_col}
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rank_in_group
  FROM {table}
) r WHERE rank_in_group <= {int(n)}"""


def quantize_embeddings_sql(id_col: str = "vec_id", vec_col: str = "embedding",
                            table: str = "embeddings") -> str:
    """Twin of ``similarity.quantize_embeddings``."""
    amax = (f"list_max(list_transform({vec_col}, "
            f"x -> abs(CAST(x AS DOUBLE))))")
    return f"""
SELECT {id_col},
       CAST(ROUND({amax} / 127.0 * 1e6) AS BIGINT) AS scale_micro,
       CAST(len({vec_col}) AS INTEGER) AS n_dims,
       md5(array_to_string(list_transform({vec_col},
         x -> CASE WHEN {amax} = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(ROUND(CAST(x AS DOUBLE) / ({amax} / 127.0)) AS BIGINT)
              END), ',')) AS q_hash
FROM {table}"""


def grouped_outliers_sql(group_col: str, value_col: str, id_col: str,
                         k: int = 3, table: str = "events") -> str:
    """Twin of ``stats.grouped_outliers`` (integer cross-multiplied
    z-test; DuckDB's HUGEINT sums cast back for the BIGINT compare)."""
    return f"""
WITH b AS (
  SELECT {group_col}, {id_col},
         CAST(ROUND({value_col} * 100) AS BIGINT) AS value_cents
  FROM {table}
),
w AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n,
         CAST(SUM(value_cents) OVER (PARTITION BY {group_col}) AS BIGINT) AS s,
         CAST(SUM(value_cents * value_cents)
              OVER (PARTITION BY {group_col}) AS BIGINT) AS ss
  FROM b
)
SELECT {group_col}, {id_col}, value_cents
FROM w
WHERE (n * value_cents - s) * (n * value_cents - s) > {int(k) * int(k)} * (n * ss - s * s)"""


def plan_mixture_sql(targets: dict[str, int], source_col: str = "source",
                     text_col: str = "text", table: str = "documents") -> str:
    """Twin of ``curation.plan_mixture``."""
    case = " ".join(
        f"WHEN '{s}' THEN {int(pm)}" for s, pm in targets.items()
    )
    return f"""
WITH tok AS (
  SELECT {source_col}, SUM({token_count_sql(text_col)}) AS n_tokens
  FROM {table} GROUP BY 1
),
t AS (
  SELECT {source_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(CASE {source_col} {case} ELSE 0 END AS BIGINT) AS target_permille
  FROM tok
),
k AS (
  SELECT MIN((n_tokens * 1000) // target_permille) AS kmax
  FROM t WHERE target_permille > 0
)
SELECT {source_col}, n_tokens, target_permille,
       CAST(CASE WHEN target_permille = 0 THEN 0
            ELSE LEAST(1000, (target_permille * kmax) // n_tokens)
            END AS BIGINT) AS keep_permille
FROM t, k"""


def temperature_mixture_sql(alpha_pow2: int = 1, source_col: str = "source",
                            text_col: str = "text",
                            table: str = "documents") -> str:
    """Twin of ``curation.temperature_mixture`` — the same nested-sqrt
    weight (IEEE sqrt is correctly rounded, so the doubles match
    bit-exactly), integer-micro floor, and ``//`` normalization.
    SUM(BIGINT) widens to HUGEINT in DuckDB — cast back."""
    expr = "CAST(n_tokens AS DOUBLE)"
    for _ in range(int(alpha_pow2)):
        expr = f"SQRT({expr})"
    return f"""
WITH tok AS (
  SELECT {source_col}, CAST(SUM({token_count_sql(text_col)}) AS BIGINT)
         AS n_tokens
  FROM {table} GROUP BY 1
),
w AS (
  SELECT {source_col}, n_tokens,
         CAST(FLOOR(1000000.0 * {expr}) AS BIGINT) AS w
  FROM tok
),
t AS (
  SELECT {source_col}, n_tokens,
         (w * 1000) // (SELECT CAST(SUM(w) AS BIGINT) FROM w)
         AS target_permille
  FROM w
),
k AS (
  SELECT MIN((n_tokens * 1000) // target_permille) AS kmax
  FROM t WHERE target_permille > 0
)
SELECT {source_col}, n_tokens, CAST(target_permille AS BIGINT)
       AS target_permille,
       CAST(CASE WHEN target_permille = 0 THEN 0
            ELSE LEAST(1000, (target_permille * kmax) // n_tokens)
            END AS BIGINT) AS keep_permille
FROM t, k"""


def funnel_steps_sql(steps, within_seconds: int, key_col: str = "user_id",
                     ts_col: str = "ts", type_col: str = "event_type",
                     table: str = "events") -> str:
    """Twin of ``temporal.funnel_steps`` (earliest-first greedy stages)."""
    parts = [f"""s0 AS (
  SELECT {key_col}, MIN({ts_col}) AS t FROM {table}
  WHERE {type_col} = '{steps[0]}' GROUP BY 1
)"""]
    for i, step in enumerate(steps[1:], start=1):
        parts.append(f"""s{i} AS (
  SELECT e.{key_col}, MIN(e.{ts_col}) AS t
  FROM {table} e JOIN s{i - 1} p ON e.{key_col} = p.{key_col}
   AND e.{ts_col} > p.t
   AND e.{ts_col} <= p.t + INTERVAL {int(within_seconds)} SECOND
  WHERE e.{type_col} = '{step}' GROUP BY 1
)""")
    hits = " + ".join(
        f"(CASE WHEN s{i}.{key_col} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(1, len(steps))
    )
    joins = " ".join(
        f"LEFT JOIN s{i} ON s0.{key_col} = s{i}.{key_col}"
        for i in range(1, len(steps))
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT s0.{key_col}, CAST(1 + {hits} AS BIGINT) AS steps_completed"
        + f"\nFROM s0 {joins}"
    )


def resample_counts_sql(period_seconds: int, key_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value",
                        table: str = "events") -> str:
    """Twin of ``temporal.resample_counts`` (zero-filled period grid)."""
    # seconds via date_diff (complete-second count = truncation), NOT
    # epoch()::BIGINT — that cast ROUNDS sub-second fractions up and shifts
    # boundary events into the next bucket, where Spark's unix_timestamp
    # truncates
    return f"""
WITH b AS (
  SELECT {key_col},
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00', {ts_col})
           // {int(period_seconds)} AS period,
         CAST(ROUND({value_col} * 100) AS BIGINT) AS cents
  FROM {table}
),
a AS (
  SELECT {key_col}, period, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM b GROUP BY 1, 2
),
g AS (
  SELECT {key_col}, unnest(generate_series(MIN(period), MAX(period))) AS period
  FROM b GROUP BY {key_col}
)
SELECT g.{key_col}, g.period,
       COALESCE(a.n, 0) AS n, COALESCE(a.sum_cents, 0) AS sum_cents
FROM g LEFT JOIN a ON g.{key_col} = a.{key_col} AND g.period = a.period"""


def snapshot_diff_sql(old_sql: str, new_sql: str,
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """Twin of ``curation.snapshot_diff``."""
    return f"""
WITH o AS (SELECT {id_col}, md5({text_col}) AS ho FROM ({old_sql}) t),
n AS (SELECT {id_col}, md5({text_col}) AS hn FROM ({new_sql}) t),
j AS (
  SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col}, o.ho, n.hn
  FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
)
SELECT {id_col},
       CASE WHEN ho IS NULL THEN 'added'
            WHEN hn IS NULL THEN 'removed'
            WHEN ho <> hn THEN 'changed' END AS status
FROM j
WHERE ho IS NULL OR hn IS NULL OR ho <> hn"""


# --- sketch family (operators/sketch.py) ------------------------------------

def _h60_sql(expr: str, seed: str) -> str:
    """Twin of ``sketch._h60``: 60-bit int from the first 15 hex chars of a
    seeded md5 (probed: identical values in Spark and DuckDB)."""
    return (f"CAST(CAST('0x' || substring(md5('{seed}:' || {expr}), 1, 15)"
            f" AS UBIGINT) AS BIGINT)")


def bloom_build_sql(expr: str, from_clause: str, m_bits: int = 1 << 16,
                    k: int = 4) -> str:
    """Twin of ``sketch.bloom_build`` (63-bit words, k seeded positions)."""
    pos_selects = " UNION ALL ".join(
        f"SELECT {_h60_sql(expr, f'bloom{i}')} % {m_bits} AS pos {from_clause}"
        for i in range(k)
    )
    return f"""
WITH p AS ({pos_selects}),
wb AS (SELECT DISTINCT pos // 63 AS word, pos % 63 AS bit FROM p)
SELECT word, SUM(CAST(1 AS BIGINT) << bit) AS bits
FROM wb GROUP BY word"""


def bloom_probe_sql(id_expr: str, expr: str, probe_from: str,
                    build_expr: str, build_from: str,
                    m_bits: int = 1 << 16, k: int = 4) -> str:
    """Twin of ``sketch.bloom_probe``: 1 iff all k bits present."""
    pos_selects = " UNION ALL ".join(
        f"SELECT {id_expr} AS id, {_h60_sql(expr, f'bloom{i}')} % {m_bits} "
        f"AS pos {probe_from}"
        for i in range(k)
    )
    return f"""
WITH bloom AS ({bloom_build_sql(build_expr, build_from, m_bits, k)}),
pp AS ({pos_selects}),
pb AS (SELECT id, pos // 63 AS word, pos % 63 AS bit FROM pp),
h AS (
  SELECT pb.id,
         CASE WHEN COALESCE((b.bits >> pb.bit) % 2, 0) = 1 THEN 1 ELSE 0 END
           AS hit
  FROM pb LEFT JOIN bloom b ON pb.word = b.word
)
SELECT id, MIN(hit) AS maybe_member FROM h GROUP BY id"""


def count_min_sql(expr: str, from_clause: str, width: int = 256,
                  depth: int = 4) -> str:
    """Twin of ``sketch.count_min``."""
    cell_selects = " UNION ALL ".join(
        f"SELECT {d} AS d, {_h60_sql(expr, f'cms{d}')} % {width} AS w "
        f"{from_clause}"
        for d in range(depth)
    )
    return f"""
WITH c AS ({cell_selects})
SELECT d, w, COUNT(*) AS cnt FROM c GROUP BY d, w"""


def cms_lookup_sql(item_expr: str, items_from: str, build_expr: str,
                   build_from: str, width: int = 256, depth: int = 4,
                   out_col: str = "item") -> str:
    """Twin of ``sketch.cms_lookup`` (min over depth counters, miss=0)."""
    probe_selects = " UNION ALL ".join(
        f"SELECT {out_col}, {d} AS d, "
        f"{_h60_sql(out_col, f'cms{d}')} % {width} AS w FROM it"
        for d in range(depth)
    )
    return f"""
WITH cms AS ({count_min_sql(build_expr, build_from, width, depth)}),
it AS (SELECT DISTINCT {item_expr} AS {out_col} {items_from}),
pr AS ({probe_selects})
SELECT pr.{out_col}, MIN(COALESCE(cms.cnt, 0)) AS est
FROM pr LEFT JOIN cms ON pr.d = cms.d AND pr.w = cms.w
GROUP BY pr.{out_col}"""


def misra_gries_sql(expr: str, from_clause: str, m: int = 64) -> str:
    """Twin of ``sketch.misra_gries``: exact counts, subtract the
    (m+1)-th largest count (0 when fewer than m+1 counters), keep the
    strictly positive — deterministic, no tiebreak needed."""
    return f"""
WITH counts AS (
  SELECT {expr} AS key, COUNT(*) AS cnt {from_clause} GROUP BY {expr}
),
t AS (
  SELECT CASE WHEN COUNT(*) = {m + 1} THEN MIN(cnt) ELSE 0 END AS t
  FROM (SELECT cnt FROM counts ORDER BY cnt DESC, key LIMIT {m + 1})
)
SELECT key, cnt - t.t AS count, t.t AS subtracted
FROM counts, t WHERE cnt > t.t"""


def hll_registers_sql(expr: str, from_clause: str, p: int = 8,
                      w: int = 48) -> str:
    """Twin of ``sketch.hll_registers``: rho from length(bin(r)) — pure
    integer/string ops, no floating log2."""
    h = _h60_sql(expr, "hll")
    return f"""
WITH h AS (
  SELECT {h} % {1 << p} AS bucket,
         ({h} // {1 << p}) % {1 << w} AS r
  {from_clause}
)
SELECT bucket,
       MAX(CASE WHEN r = 0 THEN {w + 1}
                ELSE {w + 1} - length(bin(r)) END) AS max_rho
FROM h GROUP BY bucket"""


def gram_matrix_sql(vec_col: str = "embedding", dim: int = 64,
                    scale_pow2: int = 10, id_col: str = "vec_id",
                    table: str = "embeddings") -> str:
    """Twin of ``sketch.gram_matrix``: floor(float64(x)·2^s) quantization
    (power-of-two scale ⇒ exact in every precision), upper-triangle
    integer sums."""
    scale = 1 << scale_pow2
    return f"""
WITH q AS (
  SELECT {id_col}, list_transform({vec_col},
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
  FROM {table}
),
e AS (
  SELECT {id_col}, t.i - 1 AS i, qv[t.i] AS v
  FROM q, range(1, {dim} + 1) t(i)
)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS s
FROM e a JOIN e b ON a.{id_col} = b.{id_col} AND a.i <= b.i
GROUP BY a.i, b.i"""


# --- PII detection / scrubbing (functions/text.py) --------------------------

def pii_count_sql(kind: str, col: str = "text") -> str:
    """Twin of ``text.pii_count``."""
    from judy_graph_db_spark.functions.text import PII_PATTERNS

    return (f"CAST(len(regexp_extract_all({col}, "
            f"{_sql_quote_regex(PII_PATTERNS[kind])})) AS BIGINT)")


def redact_pii_sql(col: str = "text") -> str:
    """Twin of ``text.redact_pii`` — same patterns, same order, global
    replace ('g')."""
    from judy_graph_db_spark.functions.text import (PII_PATTERNS,
                                                    PII_REDACT_ORDER)

    out = col
    for kind in PII_REDACT_ORDER:
        out = (f"regexp_replace({out}, "
               f"{_sql_quote_regex(PII_PATTERNS[kind])}, "
               f"'<{kind.upper()}>', 'g')")
    return out


def leakage_safe_split_sql(splits: dict[str, int], id_col: str = "doc_id",
                           text_col: str = "text",
                           table: str = "documents") -> str:
    """Twin of ``curation.leakage_safe_split`` over ``dedup_clusters``
    families: the split CASE hashed on the cluster id."""
    case = hash_split_case_sql(splits, col="__k")
    return f"""
WITH cl AS ({dedup_clusters_sql(id_col, text_col, table)})
SELECT {id_col}, split FROM (
  SELECT cl.{id_col}, cl.cluster_id AS __k FROM cl
) t
CROSS JOIN LATERAL (SELECT {case} AS split) s"""


def build_vocab_sql(min_count: int = 1, max_size: int | None = None,
                    text_col: str = "text",
                    table: str = "documents") -> str:
    """Twin of ``stats.build_vocab`` ((count DESC, token ASC) dense ids)."""
    cap = f"WHERE token_id < {int(max_size)}" if max_size is not None else ""
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower({text_col}),
                {WORD_TOKEN_RE_SQL})) AS token
  FROM {table}
),
c AS (
  SELECT token, COUNT(*) AS count FROM toks GROUP BY token
  HAVING COUNT(*) >= {int(min_count)}
)
SELECT token, token_id, count FROM (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token ASC) - 1
              AS BIGINT) AS token_id,
         count
  FROM c
) t {cap}"""


def encode_tokens_sql(min_count: int = 1, max_size: int | None = None,
                      id_col: str = "doc_id", text_col: str = "text",
                      table: str = "documents", unk_id: int = -1) -> str:
    """Twin of ``stats.encode_tokens`` over a ``build_vocab`` table."""
    return f"""
WITH vocab AS ({build_vocab_sql(min_count, max_size, text_col, table)}),
tk AS (
  SELECT {id_col}, unnest(ts) AS token,
         unnest(generate_series(1, len(ts))) - 1 AS pos
  FROM (
    SELECT {id_col},
           regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}) AS ts
    FROM {table}
  )
)
SELECT tk.{id_col}, CAST(tk.pos AS BIGINT) AS pos,
       COALESCE(v.token_id, {int(unk_id)}) AS token_id
FROM tk LEFT JOIN vocab v ON tk.token = v.token"""


def ngram_counts_sql(n: int = 2, min_count: int = 1, text_col: str = "text",
                     table: str = "documents") -> str:
    """Twin of ``stats.ngram_counts``."""
    return f"""
WITH t AS (
  SELECT regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}) AS ts
  FROM {table}
),
g AS (
  SELECT unnest(list_transform(
           generate_series(1, GREATEST(len(ts) - {int(n) - 1}, 0)),
           i -> array_to_string(ts[i:i + {int(n) - 1}], ' '))) AS gram
  FROM t
)
SELECT gram, COUNT(*) AS count FROM g GROUP BY gram
HAVING COUNT(*) >= {int(min_count)}"""


def hll_registers_grouped_sql(expr: str, group_cols: str, from_clause: str,
                              p: int = 8, w: int = 48) -> str:
    """Twin of ``sketch.hll_registers_grouped``."""
    h = _h60_sql(expr, "hll")
    return f"""
WITH h AS (
  SELECT {group_cols}, {h} % {1 << p} AS bucket,
         ({h} // {1 << p}) % {1 << w} AS r
  {from_clause}
)
SELECT {group_cols}, bucket,
       MAX(CASE WHEN r = 0 THEN {w + 1}
                ELSE {w + 1} - length(bin(r)) END) AS max_rho
FROM h GROUP BY {group_cols}, bucket"""


def mean_pool_sql(group_expr: str, from_clause: str,
                  vec_col: str = "embedding", scale_pow2: int = 20,
                  out_group: str = "grp") -> str:
    """Twin of ``similarity.mean_pool_embeddings``'s integer fingerprint:
    per-element floor(x·2^10) quantization, integer sums, integer-division
    mean; emits (group, n_vecs, i, q) rows (the exploded form hashes the
    same information as the array column)."""
    up = 1 << (scale_pow2 - 10)
    return f"""
WITH e AS (
  SELECT {group_expr} AS {out_group},
         unnest(generate_series(1, len({vec_col}))) - 1 AS i,
         CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * 1024) AS BIGINT) AS q
  {from_clause}
),
a AS (
  SELECT {out_group}, i, SUM(q) AS qs, COUNT(*) AS n
  FROM e GROUP BY {out_group}, i
)
SELECT {out_group}, CAST(n AS BIGINT) AS n_vecs, i,
       CAST((qs * {up}) // n AS BIGINT) AS q
FROM a"""


def transition_counts_sql(key_col: str = "user_id",
                          type_col: str = "event_type", ts_col: str = "ts",
                          id_col: str = "event_id",
                          table: str = "events") -> str:
    """Twin of ``temporal.transition_counts``."""
    return f"""
WITH s AS (
  SELECT {type_col} AS from_type,
         LEAD({type_col}) OVER (PARTITION BY {key_col}
                                ORDER BY {ts_col}, {id_col}) AS to_type
  FROM {table}
)
SELECT from_type, to_type, COUNT(*) AS n
FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type"""


def repetition_signals_sql(ns=(2, 3, 4), id_col: str = "doc_id",
                           text_col: str = "text",
                           table: str = "documents") -> str:
    """Twin of ``stats.repetition_signals``: the same one-window ``lead``
    n-gram construction (parallel ``unnest`` + ``generate_series`` for
    positions — DuckDB has no WITH ORDINALITY) and integer permille
    rollup."""
    ns = sorted(set(int(n) for n in ns))
    leads = ", ".join(
        f"lead(w, {k}) OVER (PARTITION BY __id ORDER BY pos) AS w{k}"
        for k in range(1, ns[-1]))
    gram_selects = []
    for n in ns:
        gram = " || ' ' || ".join(["w"] + [f"w{k}" for k in range(1, n)])
        gram_selects.append(
            f"SELECT __id, CAST({n} AS BIGINT) AS n, {gram} AS gram "
            f"FROM led WHERE w{n - 1} IS NOT NULL")
    grams = "\nUNION ALL\n".join(gram_selects)
    return f"""WITH rs_t AS (
  SELECT {id_col} AS __id,
         regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}) AS ws
  FROM {table}
),
toks AS (
  SELECT __id, unnest(ws) AS w,
         unnest(generate_series(1, len(ws))) AS pos
  FROM rs_t
),
led AS (SELECT __id, pos, w, {leads} FROM toks),
grams AS ({grams}),
gc AS (
  SELECT __id, n, gram, COUNT(*) AS c FROM grams GROUP BY __id, n, gram
)
SELECT __id AS {id_col}, n, SUM(c) AS n_grams,
       1000 * MAX(c) // SUM(c) AS top_gram_permille,
       1000 * SUM(CASE WHEN c > 1 THEN c ELSE 0 END) // SUM(c)
         AS dup_gram_permille
FROM gc GROUP BY __id, n"""


GOPHER_STOPWORDS_SQL = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"


def gopher_signals_sql(id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> str:
    """Twin of ``curation.gopher_quality_signals`` (Rae et al. 2021
    A1.1): whitespace words, '#'/ellipsis symbol runs, bullet/ellipsis
    line fractions, alpha-word fraction, distinct-stopword hits — all in
    the same integer milli units."""
    t = text_col
    words = f"list_filter(regexp_split_to_array({t}, '\\s+'), w -> w <> '')"
    lines = (f"list_filter(list_transform(string_split({t}, chr(10)), "
             f"x -> trim(x)), x -> x <> '')")
    return f"""WITH gq_b AS (
  SELECT {id_col}, {t} AS __t, {words} AS ws, {lines} AS ls FROM {table}
),
gq_s AS (
  SELECT {id_col},
         CAST(len(ws) AS BIGINT) AS nw,
         CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0)
              AS BIGINT) AS wl,
         CAST(length(__t) - length(replace(__t, '#', '')) AS BIGINT)
           + CAST((length(__t) - length(replace(__t, '...', ''))) // 3
                  AS BIGINT)
           + CAST(length(__t) - length(replace(__t, '…', '')) AS BIGINT)
           AS sym,
         CAST(len(ls) AS BIGINT) AS nl,
         CAST(len(list_filter(ls, x -> starts_with(x, '•')
              OR starts_with(x, '-') OR starts_with(x, '*'))) AS BIGINT)
           AS bul,
         CAST(len(list_filter(ls, x -> ends_with(x, '...')
              OR ends_with(x, '…'))) AS BIGINT) AS ell,
         CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
              AS BIGINT) AS alp,
         CAST(len(list_filter({GOPHER_STOPWORDS_SQL},
              s -> list_contains(list_transform(ws, w -> lower(w)), s)))
              AS BIGINT) AS sth
  FROM gq_b
)
SELECT {id_col}, nw AS n_words,
       CASE WHEN nw > 0 THEN CAST(FLOOR(wl * 1000 / nw) AS BIGINT)
            ELSE 0 END AS mean_word_len_milli,
       CASE WHEN nw > 0 THEN CAST(FLOOR(sym * 1000 / nw) AS BIGINT)
            ELSE 0 END AS symbol_word_milli,
       CASE WHEN nl > 0 THEN CAST(FLOOR(bul * 1000 / nl) AS BIGINT)
            ELSE 0 END AS bullet_line_milli,
       CASE WHEN nl > 0 THEN CAST(FLOOR(ell * 1000 / nl) AS BIGINT)
            ELSE 0 END AS ellipsis_line_milli,
       CASE WHEN nw > 0 THEN CAST(FLOOR(alp * 1000 / nw) AS BIGINT)
            ELSE 0 END AS alpha_word_milli,
       sth AS stop_hits
FROM gq_s"""


def gopher_keep_sql(id_col: str = "doc_id", text_col: str = "text",
                    table: str = "documents", min_words: int = 50,
                    min_stop_hits: int = 2) -> str:
    """Twin of ``curation.gopher_quality_filter``'s keep flag (the
    paper's thresholds by default; ``min_words``/``min_stop_hits``
    mirror the operator's corresponding knobs)."""
    return f"""SELECT {id_col},
       CAST(CASE WHEN n_words BETWEEN {int(min_words)} AND 100000
                  AND mean_word_len_milli BETWEEN 3000 AND 10000
                  AND symbol_word_milli <= 100
                  AND bullet_line_milli <= 900
                  AND ellipsis_line_milli <= 300
                  AND alpha_word_milli >= 800
                  AND stop_hits >= {int(min_stop_hits)}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM ({gopher_signals_sql(id_col, text_col, table)}) gk"""


def dup_line_signals_sql(id_col: str = "doc_id", text_col: str = "text",
                         table: str = "documents") -> str:
    """Twin of ``curation.dup_line_signals`` (Gopher A1.2 line level)."""
    lines = (f"list_filter(list_transform(string_split({text_col}, "
             f"chr(10)), x -> trim(x)), x -> x <> '')")
    return f"""WITH dl_l AS (
  SELECT {id_col} AS __id, unnest({lines}) AS line FROM {table}
),
dl_p AS (
  SELECT __id, line, COUNT(*) AS c FROM dl_l GROUP BY 1, 2
),
dl_a AS (
  SELECT __id, SUM(c) AS nl,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
         SUM(c * length(line)) AS chars,
         SUM(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dupch
  FROM dl_p GROUP BY 1
)
SELECT d.{id_col}, CAST(COALESCE(a.nl, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(CASE WHEN a.nl > 0
            THEN FLOOR(a.dup * 1000 / a.nl) ELSE 0 END, 0) AS BIGINT)
         AS dup_line_milli,
       CAST(COALESCE(CASE WHEN a.chars > 0
            THEN FLOOR(a.dupch * 1000 / a.chars) ELSE 0 END, 0) AS BIGINT)
         AS dup_line_char_milli
FROM {table} d LEFT JOIN dl_a a ON d.{id_col} = a.__id"""


def _gram_cte(n: int, id_col: str, text_col: str, table: str) -> str:
    return f"""tg_t AS (
  SELECT {id_col} AS __id, CAST(length({text_col}) AS BIGINT) AS nc,
         regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}) AS ts
  FROM {table}
),
tg_g AS (
  SELECT __id, nc,
         unnest(list_transform(
           generate_series(1, GREATEST(len(ts) - {int(n) - 1}, 0)),
           i -> array_to_string(ts[i:i + {int(n) - 1}], ' '))) AS gram
  FROM tg_t
),
tg_c AS (
  SELECT __id, nc, gram, COUNT(*) AS c FROM tg_g GROUP BY 1, 2, 3
)"""


def top_ngram_char_sql(n: int = 2, id_col: str = "doc_id",
                       text_col: str = "text",
                       table: str = "documents") -> str:
    """Twin of ``curation.top_ngram_char_fraction``."""
    return f"""WITH {_gram_cte(n, id_col, text_col, table)},
tg_r AS (
  SELECT *, row_number() OVER (
    PARTITION BY __id ORDER BY c DESC, gram ASC) AS rn
  FROM tg_c
)
SELECT d.{id_col}, r.gram,
       CAST(COALESCE(LEAST(1000,
            CASE WHEN r.nc > 0
                 THEN FLOOR(r.c * length(r.gram) * 1000 / r.nc)
                 ELSE 0 END), 0) AS BIGINT) AS top_ngram_char_milli
FROM {table} d LEFT JOIN tg_r r ON d.{id_col} = r.__id AND r.rn = 1"""


def dup_ngram_char_sql(n: int = 5, id_col: str = "doc_id",
                       text_col: str = "text",
                       table: str = "documents") -> str:
    """Twin of ``curation.dup_ngram_char_fraction``."""
    return f"""WITH {_gram_cte(n, id_col, text_col, table)},
tg_a AS (
  SELECT __id, nc,
         SUM(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) AS dupch
  FROM tg_c GROUP BY 1, 2
)
SELECT d.{id_col},
       CAST(COALESCE(LEAST(1000,
            CASE WHEN a.nc > 0 THEN FLOOR(a.dupch * 1000 / a.nc)
                 ELSE 0 END), 0) AS BIGINT) AS dup_ngram_char_milli
FROM {table} d LEFT JOIN tg_a a ON d.{id_col} = a.__id"""


def remove_boilerplate_sql(min_docs: int = 2, id_col: str = "doc_id",
                           text_col: str = "text",
                           out_col: str = "clean_text",
                           table: str = "documents") -> str:
    """Twin of ``curation.remove_boilerplate_lines``. Positions come from
    the parallel-unnest idiom; empty results COALESCE to '' (DuckDB
    string_agg over zero rows is NULL, Spark array_join of [] is '')."""
    return f"""WITH rb_t AS (
  SELECT {id_col} AS __id, string_split({text_col}, chr(10)) AS __ls
  FROM {table}
),
rb_l AS (
  SELECT __id, unnest(__ls) AS __line,
         unnest(generate_series(1, len(__ls))) AS __pos
  FROM rb_t
),
rb_common AS (
  SELECT __line FROM rb_l GROUP BY __line
  HAVING COUNT(DISTINCT __id) >= {int(min_docs)}
),
rb_kept AS (
  SELECT l.__id, l.__pos, l.__line FROM rb_l l
  ANTI JOIN rb_common c ON l.__line = c.__line
),
rb_clean AS (
  SELECT __id, string_agg(__line, chr(10) ORDER BY __pos) AS __clean
  FROM rb_kept GROUP BY __id
)
SELECT d.*, COALESCE(c.__clean, '') AS {out_col}
FROM {table} d LEFT JOIN rb_clean c ON d.{id_col} = c.__id"""


def pq_ctes(m: int = 4, k: int = 16, iters: int = 2, dim: int = 64,
            table: str = "embeddings") -> tuple[str, str]:
    """Twin of ``clustering.pq_train_encode``: one prefixed
    ``kmeans_ctes`` chain per subspace over the sliced vectors, unioned
    into ``pq_codes (vec_id, sub, code)``. Returns (cte_chain, name)."""
    d = dim // m
    chains, finals = [], []
    for s in range(m):
        sub_table = (f"(SELECT vec_id, embedding[{s * d + 1}:{(s + 1) * d}] "
                     f"AS embedding FROM {table})")
        ctes, fin = kmeans_ctes(k, iters, d, sub_table, prefix=f"pq{s}_")
        chains.append(ctes)
        finals.append(f"SELECT vec_id, CAST({s} AS BIGINT) AS sub, "
                      f"cluster AS code FROM {fin}")
    chain = (",\n".join(chains) + ",\npq_codes AS (\n"
             + "\nUNION ALL\n".join(finals) + "\n)")
    return chain, "pq_codes"


def pq_codes_sql(m: int = 4, k: int = 16, iters: int = 2, dim: int = 64,
                 table: str = "embeddings") -> str:
    chain, name = pq_ctes(m, k, iters, dim, table)
    return f"WITH {chain}\nSELECT vec_id, sub, code FROM {name}"


def pq_adc_topk_sql(m: int = 4, k: int = 16, iters: int = 2, dim: int = 64,
                    topk: int = 10, table: str = "embeddings",
                    query_sql: str | None = None,
                    restrict_sql: str | None = None) -> str:
    """Twin of ``clustering.pq_codebooks`` + ``pq_adc_topk``: final-Lloyd
    codebooks per (sub, code), the query's m·k integer distance table
    (``FLOOR(d² · 2^20)`` of the same strict-order double), and the
    order-free integer sum ranked with QUALIFY."""
    d = dim // m
    if query_sql is None:
        query_sql = (f"SELECT embedding FROM {table} "
                     f"ORDER BY vec_id LIMIT 1")
    chain, codes = pq_ctes(m, k, iters, dim, table)
    parts = [chain, f"pq_q AS ({query_sql})"]
    dts = []
    for s in range(m):
        avgs = ", ".join(
            f"ROUND(AVG(CAST(e.embedding[{s * d + i + 1}] AS DOUBLE)) * 1e6)"
            f" / 1e6"
            for i in range(d)
        )
        parts.append(f"""pqcb{s} AS (
  SELECT c.code, list_value({avgs}) AS cv
  FROM {codes} c JOIN {table} e USING (vec_id)
  WHERE c.sub = {s}
  GROUP BY c.code
)""")
        parts.append(f"""pqqs{s} AS (
  SELECT list_transform(embedding[{s * d + 1}:{(s + 1) * d}],
                        x -> CAST(x AS DOUBLE)) AS qv
  FROM pq_q
)""")
        parts.append(f"""pqdt{s} AS (
  SELECT CAST({s} AS BIGINT) AS sub, b.code,
         CAST(FLOOR({_sqdist_sql('q.qv', 'b.cv', d)} * 1048576) AS BIGINT)
           AS dq
  FROM pqcb{s} b, pqqs{s} q
)""")
        dts.append(f"SELECT * FROM pqdt{s}")
    parts.append("pq_dt AS (\n" + "\nUNION ALL\n".join(dts) + "\n)")
    all_ctes = ",\n".join(parts)
    return f"""WITH {all_ctes}
SELECT vec_id, dist_q,
       CAST(ROW_NUMBER() OVER (ORDER BY dist_q, vec_id) AS INTEGER) AS rank
FROM (
  SELECT c.vec_id, SUM(t.dq) AS dist_q
  FROM {codes} c JOIN pq_dt t ON c.sub = t.sub AND c.code = t.code
  {(f"JOIN ({restrict_sql}) pqrs ON c.vec_id = pqrs.vec_id"
    if restrict_sql else "")}
  GROUP BY c.vec_id
)
QUALIFY rank <= {topk}"""


def winnow_fingerprints_sql(k: int = 8, w: int = 16, id_col: str = "doc_id",
                            text_col: str = "text",
                            table: str = "documents") -> str:
    """Twin of ``dedup.winnow_fingerprints``: same gram hashes (1-based
    position aligned back to Spark's 0-based), same sliding-min window
    with the rightmost-tie struct, same full-window guard."""
    return f"""WITH wf_g AS (
  SELECT __id, unnest(hs) AS h,
         unnest(generate_series(1, len(hs))) AS j
  FROM (
    SELECT {id_col} AS __id,
           CASE WHEN length({text_col}) < {k} THEN CAST([] AS VARCHAR[])
                ELSE list_transform(
                    generate_series(1, length({text_col}) - {k - 1}),
                    i -> md5(substr({text_col}, i, {k})))
           END AS hs
    FROM {table}
  )
),
wf_s AS (
  SELECT __id, j,
         COUNT(*) OVER (PARTITION BY __id) AS n,
         MIN({{'h': h, 'nj': -(j - 1)}}) OVER (
           PARTITION BY __id ORDER BY j
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m
  FROM wf_g
)
SELECT DISTINCT __id AS {id_col}, CAST(-((m).nj) AS BIGINT) AS pos,
       (m).h AS fp
FROM wf_s
WHERE j - 1 <= GREATEST(n - {w}, 0)"""


def winnow_matches_sql(fps_sql: str, min_shared: int = 2,
                       max_bucket: int | None = 64,
                       id_col: str = "doc_id") -> str:
    """Twin of ``dedup.winnow_matches`` over a fingerprint relation."""
    cap = (f"WHERE bn <= {max_bucket}" if max_bucket is not None else "")
    return f"""WITH wm_d AS (
  SELECT DISTINCT {id_col} AS id, fp FROM ({fps_sql})
),
wm_c AS (
  SELECT id, fp FROM (
    SELECT id, fp, COUNT(*) OVER (PARTITION BY fp) AS bn FROM wm_d
  ) {cap}
)
SELECT a.id AS doc_a, b.id AS doc_b, COUNT(DISTINCT a.fp) AS n_shared
FROM wm_c a JOIN wm_c b ON a.fp = b.fp AND a.id < b.id
GROUP BY a.id, b.id
HAVING COUNT(DISTINCT a.fp) >= {min_shared}"""


def fuzzy_match_sql(records_sql: str, block_col: str, text_col: str,
                    max_dist: int = 2, id_col: str = "doc_id",
                    max_block: int | None = None) -> str:
    """Twin of ``dedup.fuzzy_match_pairs``."""
    cap = (f"WHERE bn <= {max_block}" if max_block is not None else "")
    return f"""WITH fm_d AS (
  SELECT id, blk, t FROM (
    SELECT {id_col} AS id, {block_col} AS blk, {text_col} AS t,
           COUNT(*) OVER (PARTITION BY {block_col}) AS bn
    FROM ({records_sql})
  ) {cap}
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM fm_d a JOIN fm_d b ON a.blk = b.blk AND a.id < b.id
WHERE levenshtein(a.t, b.t) <= {max_dist}"""


def random_projection_sql(out_dim: int = 16, seed: int = 0,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          table: str = "embeddings") -> str:
    """Twin of ``similarity.random_projection`` (delegates to the
    builder that lives beside the operator)."""
    from judy_graph_db_spark.operators.similarity import (
        random_projection_oracle_sql,
    )

    return random_projection_oracle_sql(out_dim=out_dim, seed=seed,
                                        vec_col=vec_col, id_col=id_col,
                                        table=table)


def ivf_candidates_sql(query_id: int = 0, n_cells: int = 4, n_probe: int = 2,
                       dim: int = 64, table: str = "embeddings") -> str:
    """The IVF candidate id set (the ``cand`` stage of ``ivf_topk_sql``,
    exposed so IVF-PQ can restrict PQ scoring to the probed cells)."""
    return f"""
WITH ivc_c AS (
  SELECT vec_id AS cid, embedding AS cv FROM {table}
  ORDER BY vec_id LIMIT {n_cells}
),
ivc_q AS (SELECT embedding AS qv FROM {table} WHERE vec_id = {query_id}),
ivc_p AS (
  SELECT cid FROM ivc_c, ivc_q
  ORDER BY {cosine_micro_sql('cv', 'qv', dim)} DESC, cid LIMIT {n_probe}
),
ivc_s AS (
  SELECT e.vec_id, c.cid, {cosine_micro_sql('e.embedding', 'c.cv', dim)} AS sim
  FROM {table} e, ivc_c c
),
ivc_a AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid)
             AS rn
    FROM ivc_s
  ) WHERE rn = 1
)
SELECT a.vec_id FROM ivc_a a JOIN ivc_p p ON a.cell = p.cid
WHERE a.vec_id <> {query_id}"""


def ivf_pq_topk_sql(query_id: int = 0, topk: int = 10, n_cells: int = 4,
                    n_probe: int = 2, m: int = 4, k: int = 16,
                    iters: int = 2, dim: int = 64,
                    table: str = "embeddings") -> str:
    """Twin of ``clustering.ivf_pq_topk`` — PQ ADC restricted to the
    IVF-probed candidate set."""
    return pq_adc_topk_sql(
        m=m, k=k, iters=iters, dim=dim, topk=topk, table=table,
        query_sql=f"SELECT embedding FROM {table} WHERE vec_id = {query_id}",
        restrict_sql=ivf_candidates_sql(query_id=query_id, n_cells=n_cells,
                                        n_probe=n_probe, dim=dim,
                                        table=table),
    )


def token_surprisal_sql(id_col: str = "doc_id", text_col: str = "text",
                        table: str = "documents") -> str:
    """Twin of ``stats.token_surprisal`` (floor-log2 via length(bin(x))-1,
    identical in both engines)."""
    return f"""
WITH tsf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM (
    SELECT {id_col},
           unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})) AS term
    FROM {table}
  ) t GROUP BY 1, 2
),
tsc AS (SELECT *, SUM(tf) OVER (PARTITION BY term) AS c FROM tsf),
tst AS (SELECT SUM(tf) AS T FROM tsf),
tsd AS (
  SELECT {id_col}, SUM(tf) AS n_tokens,
         SUM(tf * (length(bin(CAST(t.T // c AS BIGINT))) - 1))
           AS surprisal_bits
  FROM tsc, tst t GROUP BY {id_col}
)
SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(surprisal_bits AS BIGINT) AS surprisal_bits,
       CAST(1000 * surprisal_bits // n_tokens AS BIGINT) AS mean_bits_milli
FROM tsd"""


def hashed_tf_sql(n_features: int = 1024, id_col: str = "doc_id",
                  text_col: str = "text", table: str = "documents",
                  seed: int = 0) -> str:
    """Twin of ``stats.hashed_tf``."""
    h = _h60_sql("term", f"htf{seed}")
    return f"""WITH htf_t AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}))
           AS term
  FROM {table}
)
SELECT {id_col}, {h} % {int(n_features)} AS bucket,
       COUNT(*) AS tf
FROM htf_t GROUP BY {id_col}, bucket"""


def dsir_weights_sql(target_pred: str, n_features: int = 1024,
                     id_col: str = "doc_id", text_col: str = "text",
                     table: str = "documents", seed: int = 0) -> str:
    """Twin of ``curation.dsir_weights`` — ``target_pred`` is a WHERE
    predicate over ``table`` naming the target subset."""
    h = _h60_sql("term", f"dsir{seed}")
    return f"""WITH dsw_tk AS (
  SELECT {id_col},
         regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}) AS toks
  FROM {table}
),
dsw_g AS (
  SELECT {id_col}, term FROM (
    SELECT {id_col}, unnest(toks) AS term FROM dsw_tk
    UNION ALL
    SELECT {id_col}, toks[i] || ' ' || toks[i + 1] AS term FROM (
      SELECT {id_col}, toks,
             unnest(generate_series(1, len(toks) - 1)) AS i
      FROM dsw_tk WHERE len(toks) >= 2
    )
  )
),
dsw_f AS (
  SELECT {id_col}, {h} % {int(n_features)} AS bucket, COUNT(*) AS tf
  FROM dsw_g GROUP BY 1, 2
),
dsw_r AS (SELECT bucket, SUM(tf) + 1 AS c_r FROM dsw_f GROUP BY bucket),
dsw_tids AS (SELECT DISTINCT {id_col} FROM {table} WHERE {target_pred}),
dsw_tc AS (
  SELECT bucket, SUM(tf) AS ct FROM dsw_f
  WHERE {id_col} IN (SELECT {id_col} FROM dsw_tids) GROUP BY bucket
),
dsw_lm AS (
  SELECT r.bucket, r.c_r, COALESCE(t.ct, 0) + 1 AS c_t
  FROM dsw_r r LEFT JOIN dsw_tc t ON r.bucket = t.bucket
),
dsw_n AS (SELECT SUM(c_r) AS N_r, SUM(c_t) AS N_t FROM dsw_lm),
dsw_w AS (
  SELECT bucket,
         length(bin(CAST(GREATEST(1, (c_t * n.N_r * 1024)
           // (c_r * n.N_t)) AS BIGINT))) - 11 AS w_bits
  FROM dsw_lm, dsw_n n
)
SELECT f.{id_col}, CAST(SUM(f.tf) AS BIGINT) AS n_feats,
       CAST(SUM(f.tf * w.w_bits) AS BIGINT) AS score_bits,
       CAST(1000 * SUM(f.tf * w.w_bits) // SUM(f.tf) AS BIGINT)
         AS mean_bits_milli
FROM dsw_f f JOIN dsw_w w ON f.bucket = w.bucket
GROUP BY f.{id_col}"""


def collocation_scores_sql(min_count: int = 2, delta: int = 0,
                           text_col: str = "text",
                           table: str = "documents") -> str:
    """Twin of ``stats.collocation_scores``."""
    return f"""WITH co_t AS (
  SELECT unnest(regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL}))
           AS term
  FROM {table}
),
co_u AS (SELECT term, COUNT(*) AS c FROM co_t GROUP BY term),
co_n AS (SELECT CAST(SUM(c) AS BIGINT) AS N FROM co_u),
co_b AS (
  SELECT toks[i] AS w_a, toks[i + 1] AS w_b, COUNT(*) AS n_pair FROM (
    SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM (
      SELECT regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})
               AS toks
      FROM {table}
    ) WHERE len(toks) >= 2
  ) GROUP BY 1, 2 HAVING COUNT(*) >= {int(min_count)}
)
SELECT b.w_a, b.w_b, CAST(b.n_pair AS BIGINT) AS n_pair,
       CAST(1000 * (b.n_pair - {int(delta)}) * n.N // (ua.c * ub.c)
            AS BIGINT) AS score_milli
FROM co_b b
JOIN co_u ua ON b.w_a = ua.term
JOIN co_u ub ON b.w_b = ub.term
CROSS JOIN co_n n"""


def sentence_count_sql(col: str = "text") -> str:
    """Twin of ``functions.text.sentence_count``."""
    return (f"CAST(len(list_filter(string_split_regex({col}, '[.!?]+'), "
            f"s -> regexp_matches(s, '[A-Za-z0-9]'))) AS BIGINT)")


def words_per_sentence_sql(col: str = "text") -> str:
    """Twin of ``functions.text.words_per_sentence_milli``."""
    sc = sentence_count_sql(col)
    return (f"CAST(CASE WHEN {sc} > 0 THEN "
            f"{word_token_count_sql(col)} * 1000 // {sc} "
            f"ELSE 0 END AS BIGINT)")


def syllable_count_sql(col: str = "text") -> str:
    """Twin of ``functions.text.syllable_count``."""
    return (f"CAST(len(regexp_extract_all(lower({col}), '[aeiouy]+')) "
            f"AS BIGINT)")


def flesch_reading_ease_sql(col: str = "text") -> str:
    """Twin of ``functions.text.flesch_reading_ease_milli``."""
    w = token_count_sql(col)
    s = sentence_count_sql(col)
    y = syllable_count_sql(col)
    return (f"CAST(206835 - ({w}) * 1015 // greatest({s}, 1) "
            f"- ({y}) * 84600 // greatest({w}, 1) AS BIGINT)")


def fk_grade_sql(col: str = "text") -> str:
    """Twin of ``functions.text.fk_grade_milli``."""
    w = token_count_sql(col)
    s = sentence_count_sql(col)
    y = syllable_count_sql(col)
    return (f"CAST(({w}) * 390 // greatest({s}, 1) "
            f"+ ({y}) * 11800 // greatest({w}, 1) - 15590 AS BIGINT)")


def char_entropy_bits_sql(id_col: str = "doc_id", text_col: str = "text",
                          table: str = "documents") -> str:
    """Twin of ``stats.char_entropy_bits``."""
    return f"""WITH ce_c AS (
  SELECT {id_col}, unnest(string_split({text_col}, '')) AS ch FROM {table}
),
ce_h AS (
  SELECT {id_col}, ch, COUNT(*) AS n FROM ce_c
  WHERE ch <> '' GROUP BY {id_col}, ch
),
ce_l AS (SELECT {id_col}, CAST(SUM(n) AS BIGINT) AS L FROM ce_h
         GROUP BY {id_col})
SELECT h.{id_col}, CAST(MAX(l.L) AS BIGINT) AS n_chars,
       CAST(SUM(h.n * (length(bin(l.L // h.n)) - 1)) AS BIGINT)
         AS entropy_bits,
       CAST(1000 * SUM(h.n * (length(bin(l.L // h.n)) - 1)) // MAX(l.L)
            AS BIGINT) AS mean_milli_bits
FROM ce_h h JOIN ce_l l USING ({id_col})
GROUP BY h.{id_col}"""


def tag_count_sql(expr: str = "text") -> str:
    """Twin of ``functions.text.tag_count``."""
    return (f"CAST(len(regexp_extract_all({expr}, '<[^>]+>')) AS BIGINT)")


def strip_html_sql(expr: str = "text") -> str:
    """Twin of ``functions.text.strip_html``."""
    return (f"trim(regexp_replace(regexp_replace({expr}, '<[^>]+>', ' ', "
            f"'g'), '\\s+', ' ', 'g'))")


def canonicalize_url_sql(expr: str) -> str:
    """Twin of ``functions.text.canonicalize_url`` (same normalize-
    then-reinsert scheme)."""
    c = f"lower({expr})"
    c = f"regexp_replace({c}, '#.*$', '')"
    c = f"regexp_replace({c}, '\\?', '&', 'g')"
    c = (f"regexp_replace({c}, '&(utm_[a-z]+|fbclid|gclid)=[^&#]*', "
         f"'', 'g')")
    head = f"regexp_extract({c}, '^[^&]*', 0)"
    rest = f"substr({c}, length({head}) + 2)"
    c = (f"CASE WHEN {rest} = '' THEN {head} "
         f"ELSE {head} || '?' || {rest} END")
    c = f"regexp_replace({c}, '[?&]$', '')"
    return f"regexp_replace({c}, '/$', '')"


def zipf_bits_stats_sql(min_count: int = 1, text_col: str = "text",
                        table: str = "documents") -> str:
    """Twin of ``stats.zipf_bits_stats``."""
    return f"""WITH zv AS ({build_vocab_sql(min_count, None, text_col, table)})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(bin(token_id + 1)) - 1) AS BIGINT) AS sx,
       CAST(SUM(length(bin(count)) - 1) AS BIGINT) AS sy,
       CAST(SUM((length(bin(token_id + 1)) - 1)
                * (length(bin(count)) - 1)) AS BIGINT) AS sxy,
       CAST(SUM((length(bin(token_id + 1)) - 1)
                * (length(bin(token_id + 1)) - 1)) AS BIGINT) AS sxx
FROM zv"""


def ngram_novelty_sql(n: int = 3, id_col: str = "doc_id",
                      text_col: str = "text",
                      table: str = "documents") -> str:
    """Twin of ``stats.ngram_novelty``."""
    return f"""WITH nv_g AS (
  SELECT {id_col}, toks[i:i+{int(n) - 1}] AS g FROM (
    SELECT {id_col},
           regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})
             AS toks
    FROM {table}
  ), LATERAL unnest(generate_series(1, len(toks) - {int(n) - 1})) AS u(i)
  WHERE len(toks) >= {int(n)}
),
nv_c AS (
  SELECT {id_col}, array_to_string(g, ' ') AS gram, COUNT(*) AS c
  FROM nv_g GROUP BY 1, 2
),
nv_d AS (
  SELECT *, COUNT(*) OVER (PARTITION BY gram) AS df FROM nv_c
)
SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(1000 * SUM(CASE WHEN df = 1 THEN c ELSE 0 END) // SUM(c)
            AS BIGINT) AS novel_permille
FROM nv_d GROUP BY {id_col}"""


def corpus_summary_sql(group_cols=("lang", "source"),
                       text_col: str = "text",
                       table: str = "documents") -> str:
    """Twin of ``curation.corpus_summary``."""
    gc = ", ".join(group_cols)
    return f"""SELECT {gc}, COUNT(*) AS n_docs,
       CAST(SUM(length({text_col})) AS BIGINT) AS sum_chars,
       CAST(SUM({word_token_count_sql(text_col)}) AS BIGINT) AS sum_tokens
FROM {table} GROUP BY {gc}"""


def dedup_paragraphs_sql(sep_sql: str = "chr(10) || chr(10)",
                         id_col: str = "doc_id", text_col: str = "text",
                         out_col: str = "clean_text",
                         table: str = "documents") -> str:
    """Twin of ``curation.dedup_paragraphs``: keep-first by (id, pos);
    same parallel-unnest position idiom as ``remove_boilerplate_sql``."""
    return f"""WITH dp_t AS (
  SELECT {id_col} AS __id, string_split({text_col}, {sep_sql}) AS __ps
  FROM {table}
),
dp_p AS (
  SELECT __id, unnest(__ps) AS __para,
         unnest(generate_series(1, len(__ps))) AS __pos
  FROM dp_t
),
dp_first AS (
  SELECT __para, MIN(ROW(__id, __pos)) AS __first
  FROM dp_p GROUP BY __para
),
dp_kept AS (
  SELECT p.__id, p.__pos, p.__para
  FROM dp_p p JOIN dp_first f
    ON p.__para = f.__para AND ROW(p.__id, p.__pos) = f.__first
),
dp_clean AS (
  SELECT __id, string_agg(__para, {sep_sql} ORDER BY __pos) AS __clean
  FROM dp_kept GROUP BY __id
)
SELECT d.*, COALESCE(c.__clean, '') AS {out_col}
FROM {table} d LEFT JOIN dp_clean c ON d.{id_col} = c.__id"""


def score_bigrams_sql(score_where: str = "TRUE", ref_where: str = "TRUE",
                      id_col: str = "doc_id", text_col: str = "text",
                      table: str = "documents") -> str:
    """Twin of ``stats.score_bigrams`` (Stupid Backoff, α=½ ⇒ +1 bit per
    backoff): reference counts from ``ref_where`` rows, scored docs from
    ``score_where`` rows."""
    toks = (f"regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})")
    return f"""WITH sb_ref AS (
  SELECT {toks} AS ts FROM {table} WHERE {ref_where}
),
sb_runi AS (
  SELECT term, COUNT(*) AS cu
  FROM (SELECT unnest(ts) AS term FROM sb_ref) GROUP BY 1
),
sb_rbi AS (
  SELECT w1, w2, COUNT(*) AS cb FROM (
    SELECT ts[i] AS w1, ts[i + 1] AS w2
    FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
          FROM sb_ref)
  ) GROUP BY 1, 2
),
sb_rt AS (
  SELECT SUM(cu) AS tt, COUNT(*) AS vv FROM sb_runi
),
sb_pairs AS (
  SELECT {id_col}, ts[i] AS w1, ts[i + 1] AS w2
  FROM (SELECT {id_col}, ts,
               unnest(generate_series(1, len(ts) - 1)) AS i
        FROM (SELECT {id_col}, {toks} AS ts
              FROM {table} WHERE {score_where}))
),
sb_scored AS (
  SELECT p.{id_col},
         CASE WHEN b.cb IS NOT NULL
              THEN length(bin(u1.cu // b.cb)) - 1
              WHEN u2.cu IS NOT NULL
              THEN 1 + length(bin((rt.tt + rt.vv) // u2.cu)) - 1
              ELSE 1 + length(bin(rt.tt + rt.vv)) - 1 END AS bits,
         CASE WHEN b.cb IS NOT NULL THEN 0 ELSE 1 END AS backoff
  FROM sb_pairs p
  LEFT JOIN sb_rbi b ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN sb_runi u1 ON p.w1 = u1.term
  LEFT JOIN sb_runi u2 ON p.w2 = u2.term
  CROSS JOIN sb_rt rt
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(backoff) AS BIGINT) AS n_backoffs,
       CAST(SUM(bits) AS BIGINT) AS sb_bits,
       (1000 * CAST(SUM(bits) AS BIGINT)) // COUNT(*) AS mean_bits_milli
FROM sb_scored GROUP BY 1"""


def adamic_adar_sql(table: str = "lineitem",
                    src_expr: str = "l_suppkey + 2000000000000",
                    dst_expr: str = "l_partkey + 4000000000000",
                    min_milli: int = 0,
                    max_b: int | None = None) -> str:
    """Twin of ``analytics.adamic_adar`` (integer-log2 AA over
    common-neighbor candidate pairs)."""
    return f"""
WITH aa_e AS (
  SELECT DISTINCT CAST({src_expr} AS BIGINT) AS src,
         CAST({dst_expr} AS BIGINT) AS dst
  FROM {table}
),
aa_sym AS (
  SELECT src, dst FROM aa_e WHERE src <> dst
  UNION
  SELECT dst, src FROM aa_e WHERE src <> dst
),
aa_deg AS (SELECT src, COUNT(*) AS d FROM aa_sym GROUP BY src)
SELECT l.src AS a, r.src AS b, CAST(COUNT(*) AS BIGINT) AS common,
       CAST(SUM(1000 // (length(bin(dv.d)) - 1)) AS BIGINT) AS aa_milli
FROM aa_sym l
JOIN aa_sym r ON l.dst = r.dst AND l.src < r.src
JOIN aa_deg dv ON l.dst = dv.src
GROUP BY l.src, r.src
HAVING SUM(1000 // (length(bin(dv.d)) - 1)) >= {int(min_milli)}
{f'AND r.src < {max_b}' if max_b is not None else ''}
"""


# --- C4 rule set twins (Raffel et al. 2020 SS2.2) ----------------------------

C4_KEPT_LINES_SQL = (
    "list_filter(list_filter(list_transform(string_split({t}, chr(10)), "
    "x -> trim(x)), x -> x <> ''), "
    "x -> (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?') "
    "OR ends_with(x, '\"') OR ends_with(x, '”')) "
    "AND len(regexp_split_to_array(x, '\\s+')) >= {mw} "
    "AND NOT contains(lower(x), 'javascript'))")

C4_SENT_COUNT_SQL = (
    "len(list_filter(regexp_split_to_array({t}, '[.!?]+'), "
    "s -> regexp_matches(s, '[A-Za-z0-9]')))")


def c4_line_filter_sql(id_col: str = "doc_id", text_col: str = "text",
                       min_words_per_line: int = 3,
                       table: str = "documents") -> str:
    """Twin of ``curation.c4_line_filter``: terminal-punctuation /
    min-words / no-javascript line rules, survivors re-joined with
    newlines."""
    kept = C4_KEPT_LINES_SQL.format(t=text_col, mw=int(min_words_per_line))
    lines = (f"list_filter(list_transform(string_split({text_col}, "
             f"chr(10)), x -> trim(x)), x -> x <> '')")
    return f"""SELECT {id_col},
       COALESCE(array_to_string({kept}, chr(10)), '') AS clean_text,
       CAST(len({lines}) AS BIGINT) AS n_lines,
       CAST(len({kept}) AS BIGINT) AS n_kept_lines
FROM {table}"""


def c4_keep_sql(id_col: str = "doc_id", text_col: str = "text",
                min_words_per_line: int = 3, min_sentences: int = 5,
                bad_words: tuple = (),
                table: str = "documents") -> str:
    """Twin of ``curation.c4_quality_filter``: line rules, then the
    sentence minimum over the surviving lines and the kill rules (lorem
    ipsum / curly bracket / blocklist) over the full text."""
    kept = C4_KEPT_LINES_SQL.format(t=text_col, mw=int(min_words_per_line))
    lines = (f"list_filter(list_transform(string_split({text_col}, "
             f"chr(10)), x -> trim(x)), x -> x <> '')")
    if bad_words:
        bwlist = ("[" + ", ".join(
            "'" + str(w).lower().replace("'", "''") + "'"
            for w in bad_words) + "]")
        bw = (f"CAST(len(list_filter({bwlist}, s -> list_contains("
              f"list_transform(list_filter(regexp_split_to_array("
              f"{text_col}, '\\s+'), w -> w <> ''), w -> lower(w)), s)))"
              f" AS BIGINT)")
    else:
        bw = "CAST(0 AS BIGINT)"
    nsent = C4_SENT_COUNT_SQL.format(
        t=f"COALESCE(array_to_string({kept}, chr(10)), '')")
    return f"""SELECT {id_col},
       COALESCE(array_to_string({kept}, chr(10)), '') AS clean_text,
       CAST(len({lines}) AS BIGINT) AS n_lines,
       CAST(len({kept}) AS BIGINT) AS n_kept_lines,
       CAST({nsent} AS BIGINT) AS n_sentences,
       CAST(contains(lower({text_col}), 'lorem ipsum') AS BIGINT)
         AS has_lorem,
       CAST(contains({text_col}, chr(123)) AS BIGINT) AS has_curly,
       {bw} AS bad_word_hits,
       CAST(CASE WHEN {nsent} >= {int(min_sentences)}
                  AND NOT contains(lower({text_col}), 'lorem ipsum')
                  AND NOT contains({text_col}, chr(123))
                  AND {bw} = 0
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM {table}"""


def c4_span_dedup_sql(span_sentences: int = 3, id_col: str = "doc_id",
                      text_col: str = "text",
                      table: str = "documents") -> str:
    """Twin of ``curation.c4_span_dedup``: rolling ``span_sentences``-
    sentence span hashes, global keep-first on duplicated hashes,
    overlap-merged excision via a doc-keyed running max, sentence-
    normalized reassembly with '. '."""
    k = int(span_sentences)
    sarr = (f"list_filter(list_transform(regexp_split_to_array("
            f"{text_col}, '[.!?]+'), x -> trim(x)), "
            f"s -> regexp_matches(s, '[A-Za-z0-9]'))")
    return f"""WITH c4s_b AS (
  SELECT {id_col} AS __id, {sarr} AS sarr FROM {table}
),
c4s_sent AS (
  SELECT __id, unnest(generate_series(1, len(sarr))) - 1 AS pos, sarr
  FROM c4s_b
),
c4s_sp AS (
  SELECT __id, unnest(generate_series(1, GREATEST(len(sarr) - {k - 1},
         0))) - 1 AS st, sarr
  FROM c4s_b
),
c4s_h AS (
  SELECT __id, st,
         md5(array_to_string(sarr[st + 1:st + {k}], '|')) AS h
  FROM c4s_sp
),
c4s_r AS (
  SELECT __id, st, h,
         row_number() OVER (PARTITION BY h ORDER BY __id, st) AS rn,
         COUNT(*) OVER (PARTITION BY h) AS c
  FROM c4s_h
),
c4s_mk AS (SELECT __id, st FROM c4s_r WHERE c > 1 AND rn > 1),
c4s_lm AS (
  SELECT s.__id, s.pos, s.sarr[s.pos + 1] AS sent,
         MAX(CASE WHEN m.st IS NOT NULL THEN s.pos END)
           OVER (PARTITION BY s.__id ORDER BY s.pos) AS lastmk
  FROM c4s_sent s
  LEFT JOIN c4s_mk m ON s.__id = m.__id AND s.pos = m.st
),
c4s_surv AS (
  SELECT __id, pos, sent FROM c4s_lm
  WHERE lastmk IS NULL OR lastmk <= pos - {k}
),
c4s_clean AS (
  SELECT __id, string_agg(sent, '. ' ORDER BY pos) AS clean_text,
         COUNT(*) AS kept
  FROM c4s_surv GROUP BY __id
),
c4s_tot AS (
  SELECT __id, COUNT(*) AS tot FROM c4s_sent GROUP BY __id
)
SELECT d.{id_col},
       COALESCE(c.clean_text, '') AS clean_text,
       CAST(COALESCE(t.tot, 0) - COALESCE(c.kept, 0) AS BIGINT)
         AS n_removed_sentences
FROM {table} d
LEFT JOIN c4s_tot t ON d.{id_col} = t.__id
LEFT JOIN c4s_clean c ON d.{id_col} = c.__id"""


# --- URL host / registered domain twins --------------------------------------


#: the fixed robots.txt body the `robots` gate part evaluates — exercises
#: literal prefixes, allow-overrides, '$'-anchored wildcards, interior
#: wildcards, and the catch-all disallow
ROBOTS_GATE_BODY = ("User-agent: *\n"
                    "Disallow: /private/\n"
                    "Allow: /private/ok/\n"
                    "Disallow: /*.php$\n"
                    "Disallow: /tmp*junk\n"
                    "Allow: /p\n"
                    "Disallow: /\n")

#: parse_robots' output rows for ROBOTS_GATE_BODY (agent '*', 1-based
#: line order) — inlined as VALUES so the policy twin gates the PARSER
#: implicitly: a parse divergence shifts these rows and the hash breaks
_ROBOTS_GATE_RULES = [("disallow", "/private/", 1),
                      ("allow", "/private/ok/", 2),
                      ("disallow", "/*.php$", 3),
                      ("disallow", "/tmp*junk", 4),
                      ("allow", "/p", 5),
                      ("disallow", "/", 6)]


def robots_policy_sql(urls_sql: str, n_hosts: int = 5) -> str:
    """Twin of ``robots.robots_url_policy`` for the '*' agent over the
    fixed :data:`ROBOTS_GATE_BODY` rule set replicated across ``n_hosts``
    hosts ``h{0..n-1}.example.com``: same host/path extraction, same
    wildcard→anchored-regex translation, same raw-pattern-length rank
    with allow-beats-disallow ties. ``urls_sql`` must yield a ``url``
    column. Returns ``(url, host, allowed, matched_rule, matched_path,
    matched_wild)``."""
    rule_rows = ",\n  ".join(
        f"('h{h}.example.com', '{r}', '{p}', {o})"
        for h in range(int(n_hosts))
        for r, p, o in _ROBOTS_GATE_RULES)
    return f"""
WITH rb_rules(host, rule, path, ord) AS (VALUES
  {rule_rows}
),
rb_u AS (
  SELECT url, {url_host_sql('url')} AS host,
    COALESCE(NULLIF(regexp_extract(url,
      '^[a-z+.\\-]*://[^/]+(/.*)$', 1), ''), '/') AS upath
  FROM ({urls_sql}) rb_urls
),
rb_cand AS (
  SELECT rb_u.url, rb_u.host, r.rule, r.path AS rpath, r.ord,
    CASE WHEN r.path IS NULL THEN FALSE
         WHEN r.path LIKE '%*%' OR r.path LIKE '%$' THEN
           regexp_matches(rb_u.upath,
             '^' ||
             regexp_replace(
               regexp_replace(
                 CASE WHEN r.path LIKE '%$'
                      THEN substr(r.path, 1, len(r.path) - 1)
                      ELSE r.path END,
                 '([\\\\^$.|?+()\\[\\]{{}}])', '\\\\\\1', 'g'),
               '\\*', '.*', 'g')
             || CASE WHEN r.path LIKE '%$' THEN '$' ELSE '' END)
         ELSE starts_with(rb_u.upath, r.path) END AS m
  FROM rb_u LEFT JOIN rb_rules r USING (host)
),
rb_best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY url ORDER BY
    CASE WHEN m THEN len(rpath) ELSE -1 END DESC,
    rule ASC NULLS LAST, ord ASC NULLS LAST) AS rn
  FROM rb_cand
)
SELECT url, host,
  (NOT COALESCE(m, FALSE)) OR COALESCE(rule = 'allow', FALSE) AS allowed,
  CASE WHEN m THEN rule END AS matched_rule,
  CASE WHEN m THEN rpath END AS matched_path,
  COALESCE(CASE WHEN m THEN (rpath LIKE '%*%' OR rpath LIKE '%$') END,
           FALSE) AS matched_wild
FROM rb_best WHERE rn = 1"""


def url_host_sql(expr: str) -> str:
    """Twin of ``text.url_host``: authority between // and the first
    /?#, lowercased, userinfo and port stripped."""
    return (
        f"regexp_replace(regexp_replace(regexp_extract(lower({expr}), "
        f"'^(?:[a-z0-9+.\\-]*:)?//([^/?#]+)', 1), '^[^@]*@', ''), "
        f"':[0-9]+$', '')")


def registered_domain_sql(host_expr: str) -> str:
    """Twin of ``text.registered_domain``: last two labels, or last
    three when the middle label is a second-level registration label
    under a 2-letter ccTLD. DuckDB list indexing is NULL-safe out of
    bounds, mirroring Spark's ``F.get``."""
    p = f"string_split({host_expr}, '.')"
    sl = ", ".join(f"'{s}'" for s in
                   ("co", "com", "net", "org", "gov", "ac", "edu"))
    return f"""CASE
  WHEN len({p}) >= 3 AND length(({p})[-1]) = 2
       AND list_contains([{sl}], ({p})[-2])
  THEN ({p})[-3] || '.' || ({p})[-2] || '.' || ({p})[-1]
  WHEN len({p}) >= 2 THEN ({p})[-2] || '.' || ({p})[-1]
  ELSE {host_expr} END"""


def perceptron_sql(label_pred: str, n_features: int = 64, seed: int = 3,
                   lr: int = 1, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Twin of ``stats.perceptron_train`` UNROLLED for exactly 2
    iterations, followed by ``linear_score`` with the trained weights:
    returns ``(kind, doc_id, bucket, val)`` where kind 'w' rows carry
    the nonzero weights, 's' rows the final per-doc scores, and the
    single 'm' row (bias, n_mis_iter1, n_mis_iter2). Iteration 1 under
    all-zero weights misclassifies every featured doc by definition
    (y·0 ≤ 0), which the CTE chain exploits. Integer arithmetic
    end-to-end; every SUM is cast back to BIGINT (DuckDB widens to
    HUGEINT)."""
    lr = int(lr)
    tf = hashed_tf_sql(n_features, id_col=id_col, text_col=text_col,
                       table=table, seed=seed)
    return f"""
WITH ptf AS ({tf}),
plab AS (SELECT {id_col} AS doc_id,
                CASE WHEN {label_pred} THEN 1 ELSE -1 END AS y
         FROM {table}),
pf AS (SELECT ptf.{id_col} AS doc_id, bucket, CAST(tf AS BIGINT) AS tf, y
       FROM ptf JOIN plab ON ptf.{id_col} = plab.doc_id),
pdocs AS (SELECT DISTINCT doc_id, y FROM pf),
w1 AS (SELECT bucket, CAST({lr} * SUM(y * tf) AS BIGINT) AS w
       FROM pf GROUP BY bucket),
b1 AS (SELECT CAST({lr} * SUM(y) AS BIGINT) AS b FROM pdocs),
s2 AS (SELECT pf.doc_id, pf.y,
              CAST(COALESCE(SUM(pf.tf * w1.w), 0) AS BIGINT) AS s
       FROM pf LEFT JOIN w1 USING (bucket) GROUP BY pf.doc_id, pf.y),
mis2 AS (SELECT doc_id, y FROM s2, b1 WHERE y * (b1.b + s2.s) <= 0),
d2 AS (SELECT bucket, CAST({lr} * SUM(y * tf) AS BIGINT) AS d
       FROM pf WHERE doc_id IN (SELECT doc_id FROM mis2)
       GROUP BY bucket),
w2 AS (SELECT COALESCE(w1.bucket, d2.bucket) AS bucket,
              CAST(COALESCE(w1.w, 0) + COALESCE(d2.d, 0) AS BIGINT) AS w
       FROM w1 FULL OUTER JOIN d2 ON w1.bucket = d2.bucket),
b2 AS (SELECT CAST(b1.b + {lr} * COALESCE(
                (SELECT SUM(y) FROM mis2), 0) AS BIGINT) AS b FROM b1),
wnz AS (SELECT bucket, w FROM w2 WHERE w <> 0),
sf AS (SELECT pf.doc_id,
              CAST((SELECT b FROM b2)
                   + COALESCE(SUM(pf.tf * wnz.w), 0) AS BIGINT) AS score
       FROM pf LEFT JOIN wnz USING (bucket) GROUP BY pf.doc_id)
SELECT 'w' AS kind, CAST(NULL AS BIGINT) AS doc_id, bucket,
       w AS val FROM wnz
UNION ALL
SELECT 's', doc_id, NULL, score FROM sf
UNION ALL
SELECT 'm', NULL, (SELECT b FROM b2),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pdocs) * 1000000
       + (SELECT CAST(COUNT(*) AS BIGINT) FROM mis2)
"""


def bitext_mine_sql(src_where: str, tgt_where: str, k: int = 4,
                    threshold_milli: int = 1000, dim: int = 64,
                    table: str = "embeddings") -> str:
    """Twin of ``similarity.bitext_mine`` — forward-max margin mining
    between two filtered slices of the embeddings table."""
    cos = cosine_micro_sql("s.embedding", "t.embedding", dim)
    return f"""
WITH bx_s AS (SELECT vec_id, embedding FROM {table} WHERE {src_where}),
bx_t AS (SELECT vec_id, embedding FROM {table} WHERE {tgt_where}),
bx_sc AS (
  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id, {cos} AS sim_micro
  FROM bx_s s, bx_t t
),
bx_f AS (
  SELECT src_id, tgt_id, sim_micro,
         ROW_NUMBER() OVER (PARTITION BY src_id
           ORDER BY sim_micro DESC, tgt_id) AS rnk
  FROM bx_sc
),
bx_fk AS (SELECT * FROM bx_f WHERE rnk <= {int(k)}),
bx_b AS (
  SELECT src_id, tgt_id, sim_micro,
         ROW_NUMBER() OVER (PARTITION BY tgt_id
           ORDER BY sim_micro DESC, src_id) AS rnk
  FROM bx_sc
),
bx_bk AS (SELECT * FROM bx_b WHERE rnk <= {int(k)}),
bx_fs AS (
  SELECT src_id, CAST(SUM(sim_micro) AS BIGINT) AS ssum,
         CAST(COUNT(*) AS BIGINT) AS scnt
  FROM bx_fk GROUP BY src_id
),
bx_bs AS (
  SELECT tgt_id, CAST(SUM(sim_micro) AS BIGINT) AS tsum,
         CAST(COUNT(*) AS BIGINT) AS tcnt
  FROM bx_bk GROUP BY tgt_id
),
bx_m AS (
  SELECT f.src_id, f.tgt_id, f.sim_micro,
         CAST((2000 * f.sim_micro * scnt * tcnt)
              // (ssum * tcnt + tsum * scnt) AS BIGINT) AS margin_milli
  FROM bx_fk f
  JOIN bx_fs USING (src_id) JOIN bx_bs USING (tgt_id)
  WHERE f.sim_micro > 0 AND ssum * tcnt + tsum * scnt > 0
),
bx_best AS (
  SELECT src_id, tgt_id, sim_micro, margin_milli,
         ROW_NUMBER() OVER (PARTITION BY src_id
           ORDER BY margin_milli DESC, tgt_id) AS rnk
  FROM bx_m
)
SELECT src_id, tgt_id, sim_micro, margin_milli
FROM bx_best WHERE rnk = 1 AND margin_milli >= {int(threshold_milli)}
"""


def kneser_ney_sql(score_where: str = "TRUE", ref_where: str = "TRUE",
                   discount_milli: int = 750, id_col: str = "doc_id",
                   text_col: str = "text",
                   table: str = "documents") -> str:
    """Twin of ``stats.kneser_ney_score_bigrams`` (interpolated KN in
    integer micro-probabilities, whole-bit costs)."""
    D = int(discount_milli)
    toks = f"regexp_extract_all(lower({text_col}), {WORD_TOKEN_RE_SQL})"
    return f"""WITH kn_ref AS (
  SELECT {toks} AS ts FROM {table} WHERE {ref_where}
),
kn_rbi AS (
  SELECT w1, w2, COUNT(*) AS cb FROM (
    SELECT ts[i] AS w1, ts[i + 1] AS w2
    FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
          FROM kn_ref)
  ) GROUP BY 1, 2
),
kn_hist AS (
  SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1b,
         CAST(COUNT(*) AS BIGINT) AS n1f
  FROM kn_rbi GROUP BY 1
),
kn_cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM kn_rbi GROUP BY 1
),
kn_bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM kn_rbi),
kn_pairs AS (
  SELECT {id_col}, ts[i] AS w1, ts[i + 1] AS w2
  FROM (SELECT {id_col}, ts,
               unnest(generate_series(1, len(ts) - 1)) AS i
        FROM (SELECT {id_col}, {toks} AS ts
              FROM {table} WHERE {score_where}))
),
kn_scored AS (
  SELECT p.{id_col},
         CASE WHEN h.c1b IS NOT NULL THEN
           (greatest(1000 * COALESCE(b.cb, 0) - {D}, 0) * 1000000)
             // (1000 * h.c1b)
           + ({D} * h.n1f
              * ((1000000 * COALESCE(c.n1b, 0)) // t.bt))
             // (1000 * h.c1b)
         ELSE (1000000 * COALESCE(c.n1b, 0)) // t.bt END AS p_micro,
         CASE WHEN b.cb IS NULL THEN 1 ELSE 0 END AS unseen
  FROM kn_pairs p
  LEFT JOIN kn_rbi b ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN kn_hist h ON p.w1 = h.w1
  LEFT JOIN kn_cont c ON p.w2 = c.w2
  CROSS JOIN kn_bt t
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(unseen) AS BIGINT) AS n_unseen,
       CAST(SUM(length(bin(1000000 // greatest(p_micro, 1))) - 1)
            AS BIGINT) AS kn_bits,
       (1000 * CAST(SUM(length(bin(1000000 // greatest(p_micro, 1))) - 1)
                    AS BIGINT)) // COUNT(*) AS mean_bits_milli
FROM kn_scored GROUP BY 1"""


def web_funnel_sql(blocked_domains=("d3-site.com", "d7-site.com"),
                   keep_langs=("en",),
                   url_expr: str = ("'http://d' || (doc_id % 37) || "
                                    "'-site.com/p/' || doc_id"),
                   table: str = "documents", min_words: int = 50,
                   min_stop_hits: int = 2) -> str:
    """Twin of ``curation.web_corpus_funnel`` — the COMPOSED funnel,
    assembled from the already-twinned components (registered-domain
    blocklist, lang-id, Gopher keep, normalized-md5 keep-first among
    survivors, recursive-CTE LSH cluster canonical among exact
    survivors). Returns one row per doc:
    ``(doc_id, lang, url_ok, lang_ok, gopher_ok, exact_keep,
    neardup_keep)``."""
    from judy_graph_db_spark.functions.text import lang_id_sql

    rd = registered_domain_sql(url_host_sql(url_expr))
    bl = ", ".join(f"'{d}'" for d in blocked_domains)
    kl = ", ".join(f"'{x}'" for x in keep_langs)
    clusters = dedup_clusters_sql(
        table=f"(SELECT doc_id, text FROM fn_e WHERE exact_keep)")
    return f"""
WITH fn_u AS (
  SELECT doc_id, text, NOT ({rd} IN ({bl})) AS url_ok,
         {lang_id_sql('text')} AS lang
  FROM {table}
),
fn_f AS (
  SELECT u.doc_id, u.text, u.lang, u.url_ok,
         u.lang IN ({kl}) AS lang_ok,
         g.keep AS gopher_ok,
         md5(lower(regexp_replace(u.text, '\\s+', ' ', 'g'))) AS h
  FROM fn_u u JOIN ({gopher_keep_sql(table=table, min_words=min_words,
                                     min_stop_hits=min_stop_hits)}) g
    USING (doc_id)
),
fn_w AS (
  SELECT h, MIN(doc_id) AS win FROM fn_f
  WHERE url_ok AND lang_ok AND gopher_ok GROUP BY h
),
fn_e AS (
  SELECT f.*,
         (f.url_ok AND f.lang_ok AND f.gopher_ok
          AND f.doc_id = w.win) AS exact_keep
  FROM fn_f f LEFT JOIN fn_w w ON f.h = w.h
),
fn_l AS (
  SELECT doc_id FROM ({clusters}) WHERE NOT is_canonical
)
SELECT e.doc_id, e.lang, e.url_ok, e.lang_ok, e.gopher_ok, e.exact_keep,
       (e.exact_keep AND l.doc_id IS NULL) AS neardup_keep
FROM fn_e e LEFT JOIN fn_l l ON e.doc_id = l.doc_id
"""
