"""Text-analysis column functions for large-scale training-data pipelines.

Parity-plus surface (the reference has no scalar text functions — SURVEY.md
§2.7); designed for 100 TB corpora: every function is a pure JVM-side Column
expression (whole-stage codegen, no Python in the hot path), applied to the
``documents`` table with pushdown-friendly shapes.

Each function has an exact ANSI-SQL twin used by the DuckDB oracle — ratios
are integer permille (no float hashing hazards) and regex classes are spelled
explicitly so Java/RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# explicit punctuation class (identical semantics in Java regex and RE2)
PUNCT_RE = r"""[.,;:!?'"()\[\]{}<>/\\|@#$%^&*_+=~`-]"""
WORD_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as")

LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "nicht"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "que", "por"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count. SQL twin: CASE WHEN length(trim(x))=0 THEN 0
    ELSE length(regexp_split(trim(x),'\\s+')) END."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def word_token_count(text: Column) -> Column:
    """BPE-ish token count: alnum runs + isolated symbols (the pre-tokenizer
    regex shape). SQL twin: length(regexp_extract_all(x, re))."""
    return F.regexp_count(text, F.lit(WORD_TOKEN_RE)).cast("long")


def punct_permille(text: Column) -> Column:
    """Punctuation chars per 1000 chars (integer — hash-stable)."""
    total = F.length(text)
    punct = total - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    return F.when(total == 0, F.lit(0)).otherwise(
        F.floor(punct * 1000 / total)
    ).cast("long")


def upper_permille(text: Column) -> Column:
    """Uppercase chars per 1000 chars."""
    total = F.length(text)
    upper = total - F.length(F.regexp_replace(text, "[A-Z]", ""))
    return F.when(total == 0, F.lit(0)).otherwise(
        F.floor(upper * 1000 / total)
    ).cast("long")


def stopword_count(text: Column, words: tuple = STOPWORDS) -> Column:
    """Whole-token stopword occurrences (word-boundary regex count)."""
    c = F.lit(0)
    low = F.lower(text)
    for w in words:
        c = c + F.regexp_count(low, F.lit(rf"\b{w}\b"))
    return c.cast("long")


def stopword_permille(text: Column, words: tuple = STOPWORDS) -> Column:
    """Stopword tokens per 1000 tokens — a classic quality signal."""
    n = token_count(text)
    return F.when(n == 0, F.lit(0)).otherwise(
        F.floor(stopword_count(text, words) * 1000 / n)
    ).cast("long")


def quality_score(text: Column) -> Column:
    """Composite 0-1000 quality score: rewards stopword presence and length,
    penalizes extreme punctuation/caps — the usual cheap-filter shape for
    pretraining corpora. Integer arithmetic throughout."""
    length_ok = F.when(F.length(text).between(50, 20000), F.lit(300)).otherwise(F.lit(0))
    stop_ok = F.when(stopword_permille(text) >= 20, F.lit(400)).otherwise(F.lit(0))
    punct_ok = F.when(punct_permille(text) <= 150, F.lit(150)).otherwise(F.lit(0))
    caps_ok = F.when(upper_permille(text) <= 300, F.lit(150)).otherwise(F.lit(0))
    return (length_ok + stop_ok + punct_ok + caps_ok).cast("long")


LANG_PRIORITY = {lang: len(LANG_MARKERS) - i for i, lang in enumerate(LANG_MARKERS)}


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic: count whole-word hits per language,
    pick the max ('und' when no hits). Ties break by fixed language order via
    a packed ``score·16 + priority`` max — the same arithmetic the SQL twin
    uses, so both engines agree bit-for-bit."""
    low = F.lower(text)
    packed = {}
    for lang, words in LANG_MARKERS.items():
        s = F.lit(0)
        for w in words:
            s = s + F.regexp_count(low, F.lit(rf"\b{w}\b"))
        packed[lang] = s * 16 + F.lit(LANG_PRIORITY[lang])
    best = F.greatest(*packed.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((best >= 16) & (best == packed[lang]), F.lit(lang)).otherwise(out)
    return out


def dup_line_permille(text: Column) -> Column:
    """Gopher-style repetition signal (Rae et al. 2021 §A1.1, "duplicate
    line fraction"): per-1000 share of non-empty lines that repeat an
    earlier line. Pure codegen — split + ``array_distinct`` inside one
    projection, no shuffle, no UDF."""
    lines = F.filter(F.split(text, "\n"), lambda x: F.length(x) > 0)
    n = F.size(lines)
    dups = n - F.size(F.array_distinct(lines))
    return F.when(n == 0, F.lit(0)).otherwise(
        F.floor(dups * 1000 / n)
    ).cast("long")


def dup_token_permille(text: Column) -> Column:
    """Per-1000 share of whitespace tokens that repeat an earlier token —
    the cheap detector for degenerate "same word over and over" documents."""
    toks = F.split(F.trim(text), r"\s+")
    n = token_count(text)
    dups = n - F.size(F.array_distinct(toks))
    return F.when(n == 0, F.lit(0)).otherwise(
        F.floor(dups * 1000 / n)
    ).cast("long")


def fingerprint(text: Column, window: int = 8, stride: int = 16) -> Column:
    """Document fingerprint: min of md5 over strided character 8-grams — a
    rolling-hash-style content signature, O(len/stride) work, pure codegen."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({_n(text)})-{window-1},1), {stride}),"
        f" i -> md5(substring({_n(text)}, i, {window}))))"
    )


def _n(col: Column) -> str:
    """Extract the column name for expr() composition (works for plain
    attribute columns, which is all the fingerprint path needs)."""
    import re

    s = col._jc.toString()
    m = re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", s)
    if not m:
        raise ValueError(f"fingerprint needs a simple column reference, got {s}")
    return s


def lang_id_sql(col: str = "text") -> str:
    """The DuckDB/ANSI twin of :func:`lang_id` (kept adjacent so the two
    dialects stay in sync): identical packed score·16+priority max."""
    def packed(lang, words):
        s = " + ".join(
            f"length(regexp_extract_all(lower({col}), '\\b{w}\\b'))" for w in words
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


# --- PII detection / scrubbing ----------------------------------------------
# Deliberately ASCII-explicit character classes (no \d, no unicode classes)
# so Java regex (Spark) and RE2 (DuckDB) agree on every match; all four
# patterns produce identical leftmost-greedy matches in both engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # digits interleaved with ()/-/space, 9+ chars; overlaps ssn by design
    # (counts are per-pattern independent; redaction order disambiguates)
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}

# redaction applies in this order so earlier tokens (digit-free) can't be
# re-matched by later patterns; the same order is baked into the SQL twin
PII_REDACT_ORDER = ("email", "ipv4", "ssn", "phone")


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern kind (see ``PII_PATTERNS``)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind])).cast("long")


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a ``<KIND>`` token, in
    ``PII_REDACT_ORDER`` (email → ipv4 → ssn → phone, so the digit-free
    tokens never feed later patterns). Pure codegen — a chain of
    ``regexp_replace``; no UDF, safe in the scan stage of a 100 TB read."""
    out = text
    for kind in PII_REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# --- URL / domain signals -----------------------------------------------------
# ASCII-only classes (no \w, no unicode) so Java regex and RE2 agree; the
# scheme match is case-normalized by lowering the text first.
URL_RE = r"https?://[a-z0-9][a-z0-9.\-]*(?:/[a-z0-9._/?=&%\-]*)?"
URL_DOMAIN_RE = r"https?://([a-z0-9.\-]+)"


def url_count(text: Column) -> Column:
    """Number of http(s) URLs in the text — the signal behind URL-based
    dedup and per-domain corpus caps. Pure codegen (one regexp over the
    lowered text), scan-stage at any scale."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(URL_RE), F.lit(0))
    ).cast("long")


def url_domains(text: Column) -> Column:
    """Array of the domains of every http(s) URL in the text, in document
    order (duplicates kept — callers aggregate). Feeds per-domain quota
    caps (`curation.cap_per_group`) and domain-mixture planning without a
    separate URL table."""
    return F.regexp_extract_all(F.lower(text), F.lit(URL_DOMAIN_RE),
                                F.lit(1))


SENTENCE_SPLIT_RE = "[.!?]+"


def sentence_count(text: Column) -> Column:
    """Number of sentences: ``[.!?]+``-delimited segments containing at
    least one alphanumeric (pure Column expr, scan-stage — same contract
    as every signal here). Twin: ``sentence_count_sql``."""
    return F.size(F.filter(
        F.split(text, SENTENCE_SPLIT_RE),
        lambda s: s.rlike("[A-Za-z0-9]"))).cast("long")


def words_per_sentence_milli(text: Column) -> Column:
    """Mean words per sentence in integer milli (0 when no sentence) —
    the Gopher quality filter's sentence-length signal, log-free and
    hash-stable."""
    sc = sentence_count(text)
    # floor of a positive ratio == both engines' integer division
    return F.when(sc > 0, F.floor(word_token_count(text) * 1000 / sc)
                  .cast("long")).otherwise(F.lit(0)).cast("long")


HTML_TAG_RE = "<[^>]+>"


def tag_count(text: Column) -> Column:
    """Number of HTML/XML tags — the markup-density signal (high = page
    scaffolding survived extraction; CCNet drops such docs). Pure
    codegen, RE2-safe pattern."""
    return F.size(
        F.regexp_extract_all(text, F.lit(HTML_TAG_RE), F.lit(0))
    ).cast("long")


def strip_html(text: Column) -> Column:
    """Replace every HTML/XML tag with one space and collapse the
    resulting whitespace runs — the standard markup-removal cleanup
    before tokenization. Twin: ``strip_html_sql`` (same two regex
    passes, byte-identical output)."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(text, HTML_TAG_RE, " "), r"\s+", " "))


def canonicalize_url(url: Column) -> Column:
    """Canonical URL for dedup keys: lowercase, strip the fragment,
    strip ``utm_*``/``fbclid``/``gclid`` tracking parameters (dangling
    ``?``/``&`` tidied), drop one trailing slash — the normalization
    that collapses the syndication variants of one page before
    URL-exact dedup. Pure chained regexes, RE2-safe, twin-identical
    (``canonicalize_url_sql``)."""
    c = F.lower(url)
    c = F.regexp_replace(c, "#.*$", "")
    # normalize '?' to '&' so param stripping is uniform, then re-insert
    # '?' before the first surviving parameter (RE2 has no lookbehind, so
    # a direct "[?&]param" removal could eat the '?' and orphan '&q=1')
    c = F.regexp_replace(c, r"\?", "&")
    c = F.regexp_replace(c, "&(utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    head = F.regexp_extract(c, "^[^&]*", 0)
    rest = F.substr(c, F.length(head) + F.lit(2))
    c = F.when(rest == "", head).otherwise(
        F.concat(head, F.lit("?"), rest))
    c = F.regexp_replace(c, "[?&]$", "")
    c = F.regexp_replace(c, "/$", "")
    return c


# candidate card numbers: plain 13-19 digit runs (ASCII-only, RE2-safe;
# separator-tolerant variants would need lookarounds RE2 lacks)
CARD_CAND_RE = r"[0-9]{13,19}"


def luhn_valid_count(text: Column) -> Column:
    """Number of 13-19-digit runs that pass the Luhn mod-10 checksum
    (ISO/IEC 7812) — the checksum-validated layer of card-number PII
    detection: a bare ``[0-9]{16}`` regex flags order ids and hashes,
    while 90% of random digit runs fail Luhn, so this count is the
    high-precision signal a redaction pipeline keys on. Pure Column
    expression (regexp + higher-order transform/aggregate), scan-stage
    at any scale — no UDF. Doubled digit = every second from the RIGHT,
    i.e. 1-based left position ``i`` where ``(len - i)`` is odd."""

    def term(s, i):
        d = F.ascii(F.substr(s, i, F.lit(1))) - F.lit(48)
        return (F.when((F.length(s) - i) % 2 == 0, d)
                .when(d * 2 > 9, d * 2 - 9)
                .otherwise(d * 2))

    def luhn_ok(s):
        return F.aggregate(
            F.transform(F.sequence(F.lit(1), F.length(s)),
                        lambda i: term(s, i)),
            F.lit(0), lambda acc, x: acc + x) % 10 == 0

    cands = F.regexp_extract_all(text, F.lit(CARD_CAND_RE), F.lit(0))
    return F.size(F.filter(cands, luhn_ok)).cast("long")


def luhn_valid_count_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`luhn_valid_count`."""
    lam = (
        "s -> list_sum(list_transform(generate_series(1, length(s)), i -> "
        "CASE WHEN (length(s) - i) % 2 = 0 THEN ascii(substr(s, i, 1)) - 48 "
        "WHEN (ascii(substr(s, i, 1)) - 48) * 2 > 9 "
        "THEN (ascii(substr(s, i, 1)) - 48) * 2 - 9 "
        "ELSE (ascii(substr(s, i, 1)) - 48) * 2 END)) % 10 = 0"
    )
    return (f"CAST(len(list_filter(regexp_extract_all({col}, "
            f"'{CARD_CAND_RE}'), {lam})) AS BIGINT)")


# --- URL host / registered domain (the RefinedWeb-style URL filter unit) ----

URL_HOST_RE = r"^(?:[a-z0-9+.\-]*:)?//([^/?#]+)"

# common second-level registration labels: under a 2-letter ccTLD these
# mark a three-label registered domain (bbc.co.uk, not co.uk). The full
# public-suffix list is an external asset (publicsuffix.org) a production
# deploy would broadcast; this heuristic covers the dominant cases and is
# deterministic, so it hash-gates.
SECOND_LEVEL_LABELS = ("co", "com", "net", "org", "gov", "ac", "edu")


def url_host(url: Column) -> Column:
    """Host of a URL: the authority between ``//`` and the first ``/``,
    ``?`` or ``#``, lowercased, userinfo and port stripped. Empty string
    when the value has no ``//`` authority at all (relative references).
    Pure chained regexes, RE2-safe, scan-stage; twin ``url_host_sql``."""
    h = F.regexp_extract(F.lower(url), URL_HOST_RE, 1)
    h = F.regexp_replace(h, "^[^@]*@", "")
    h = F.regexp_replace(h, ":[0-9]+$", "")
    return h


def registered_domain(host: Column) -> Column:
    """eTLD+1 heuristic over a host: the last two labels, or the last
    THREE when the middle label is a common second-level registration
    label (``co``/``com``/``net``/``org``/``gov``/``ac``/``edu``) under
    a 2-letter ccTLD — ``news.bbc.co.uk`` → ``bbc.co.uk`` but
    ``a.b.example.com`` → ``example.com``. Hosts with fewer than two
    labels pass through unchanged. This is the per-domain key for
    blocklist filtering, per-domain quotas and domain-mix reporting;
    the full public-suffix list is a user-supplied broadcast asset.
    Pure Column exprs (``F.get`` is NULL-safe out of bounds, so short
    hosts never error under ANSI mode); twin ``registered_domain_sql``."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last = F.get(parts, n - 1)
    mid = F.get(parts, n - 2)
    third = F.get(parts, n - 3)
    three = (n >= 3) & (F.length(last) == 2) \
        & mid.isin(*SECOND_LEVEL_LABELS)
    return (
        F.when(three, F.concat_ws(".", third, mid, last))
        .when(n >= 2, F.concat_ws(".", mid, last))
        .otherwise(host)
    )


def syllable_count(text: Column) -> Column:
    """Approximate syllable count: vowel-group runs (``[aeiouy]+``) over
    the lowercased text — the standard readability-formula heuristic
    (exact syllabification needs a dictionary; vowel runs are the
    published closed-form stand-in). Twin: ``syllable_count_sql``."""
    return F.regexp_count(F.lower(text), F.lit("[aeiouy]+")).cast("long")


def flesch_reading_ease_milli(text: Column) -> Column:
    """Flesch reading ease (Flesch 1948) in integer milli:
    ``206835 − 1015·(words div sentences) − 84600·(syllables div words)``
    with each ratio floored AFTER scaling (numerators are non-negative, so
    Spark ``div`` and DuckDB ``//`` agree; the final subtraction may go
    negative but no division touches a negative). Zero-sentence /
    zero-word docs divide by the floor-1 guard."""
    w = token_count(text)
    s0 = F.greatest(sentence_count(text), F.lit(1))
    w0 = F.greatest(w, F.lit(1))
    y = syllable_count(text)
    return (F.lit(206835)
            - F.floor(w * 1015 / s0).cast("long")
            - F.floor(y * 84600 / w0).cast("long")).cast("long")


def fk_grade_milli(text: Column) -> Column:
    """Flesch–Kincaid grade level (Kincaid et al. 1975) in integer milli:
    ``390·(words div sentences) + 11800·(syllables div words) − 15590``,
    same guards and integer-exactness contract as
    :func:`flesch_reading_ease_milli`."""
    w = token_count(text)
    s0 = F.greatest(sentence_count(text), F.lit(1))
    w0 = F.greatest(w, F.lit(1))
    y = syllable_count(text)
    return (F.floor(w * 390 / s0).cast("long")
            + F.floor(y * 11800 / w0).cast("long")
            - F.lit(15590)).cast("long")


# Unicode homoglyph folding: visually-identical Cyrillic/Greek letters and
# fullwidth forms that web text (and adversarial spam) substitutes for
# Latin, plus typographic punctuation variants. Equal-length from/to
# tables — one JVM translate() pass; the zero-width/invisible characters
# need a regex pass (translate cannot delete).
CONFUSABLE_FROM = ("АВЕКМНОРСТХаеорсух"       # Cyrillic lookalikes
                   "ΑΒΕΖΗΙΚΜΝΟΡΤΧνο"          # Greek lookalikes
                   "‘’‚‛“”„‟"
                   "–—− ⁄")
CONFUSABLE_TO = ("ABEKMHOPCTXaeopcyx"
                 "ABEZHIKMNOPTXvo"
                 "''''\"\"\"\""
                 "---" + " /")
INVISIBLE_RE = "[​‌‍⁠﻿­]"


def fold_confusables(text: Column) -> Column:
    """Fold Unicode homoglyphs to their ASCII targets and drop
    zero-width/invisible characters — the normalization pass that makes
    exact/near dedup and blocklist matching robust to the Cyrillic-о
    trick ('сlаim' with Cyrillic с/а evades an ASCII blocklist and
    splits dedup clusters). Two scan-stage passes: one ``translate``
    (equal-length tables) + one invisible-char regex removal. Twin:
    :func:`fold_confusables_sql` (same tables, byte-identical)."""
    return F.regexp_replace(
        F.translate(text, CONFUSABLE_FROM, CONFUSABLE_TO),
        INVISIBLE_RE, "")


def fold_confusables_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`fold_confusables`."""
    frm = CONFUSABLE_FROM.replace("'", "''")
    to = CONFUSABLE_TO.replace("'", "''")
    return (f"regexp_replace(translate({col}, '{frm}', '{to}'), "
            f"'{INVISIBLE_RE}', '', 'g')")
