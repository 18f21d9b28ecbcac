"""Text-analysis operators for LLM-data pipelines (BASELINE.json north
star: language-ID, quality scoring, token counting, fingerprinting).

All hot-path expressions are built-in pyspark.sql.functions (JVM codegen,
no Python UDFs): regexp splits, array filters, md5. Every operator is a
pure projection or a single groupBy — scan-bound at 100 TB.

Portable-hash convention: where an operator needs a numeric hash that a
DuckDB oracle must reproduce, we use the first 7 hex chars of md5 (28-bit
int, overflow-safe in downstream modular arithmetic). The scale path can
swap in xxhash64 (single JVM op, no md5 string cost) via hash_fn='xxhash'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: whitespace tokenization shared by every operator (and mirrored in oracles)
TOKEN_RE = r"\s+"

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: language-ID (reference has no lang-ID; this is the LLM-pipeline extension)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "une"),
    "es": ("el", "los", "las", "una", "es"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}
#: deterministic tie-break priority (first wins ties)
LANG_PRIORITY = ("en", "de", "fr", "es", "zh")

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def let(expr: Column, body) -> Column:
    """Let-bind ``expr`` so ``body`` receives it as a materialized lambda
    variable: ``element_at(transform(array(expr), body), 1)``.

    Catalyst expression trees have no implicit sharing — every reference
    to a Column object re-evaluates its whole subtree (and higher-order
    lambdas are interpreted, so there is no codegen CSE to save you). A
    body that indexes into an array N times would re-run the producing
    expression N times; let-binding evaluates it once per row."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(F.col(text_col)), TOKEN_RE)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting — n_tokens, n_chars, avg token length."""
    toks = tokens_col(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks).cast("bigint"))
        .withColumn("n_chars_calc", F.length(text_col).cast("bigint"))
        .withColumn(
            "avg_token_len",
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / F.size(toks),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring — length/punctuation/stopword ratios composed into a
    [0,1]-ish score. Heuristics follow the common LLM-data-cleaning recipe
    (Gopher-style rules): too-short docs, punctuation-free docs and
    stopword-free docs are penalized."""
    # One let-bound struct holds every token-derived scalar: interpreted
    # higher-order expressions get no CSE, so naming the split N times
    # would re-run the regex split N times per row (this cost
    # dedup_minhash_lsh 11s before the same fix). The struct alias is
    # referenced >1 time, which also stops CollapseProject from inlining
    # (and thus re-expanding) it into each consumer.
    s = let(tokens_col(text_col), lambda toks: F.struct(
        F.size(toks).cast("double").alias("n_tok"),
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
        .cast("double").alias("stop_hits"),
    ))
    n_chars = F.length(text_col).cast("double")
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.!?,;:]", "")).cast("double")
    df = df.withColumn("__q", s)
    n_tok, stop_hits = F.col("__q.n_tok"), F.col("__q.stop_hits")
    df = (
        df.withColumn("punct_ratio", punct / n_chars)
        .withColumn("stopword_ratio", stop_hits / n_tok)
        .withColumn("mean_word_len", (n_chars - (n_tok - 1)) / n_tok)
    )
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    wl = F.col("mean_word_len")
    wordlen_ok = F.when((wl >= 2.0) & (wl <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when(F.col("stopword_ratio") > 0.0, 1.0).otherwise(0.0)
    return df.withColumn(
        "quality_score",
        (len_ok + wordlen_ok + stop_ok + F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) / 4.0,
    ).drop("__q")


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Language-ID — stopword-marker voting with a deterministic priority
    tie-break. Pure array expressions; at 100 TB this is a projection."""
    toks = tokens_col(text_col)

    def _marker_hits(markers):
        # single-arg lambda: a (t, m) signature would make PySpark pass the
        # array index as the second argument
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))

    scores = {lang: _marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    df = df.withColumn("__toks", toks)
    best: Column = F.lit(LANG_PRIORITY[-1])
    # fold right-to-left so earlier languages win ties via >= comparison
    for lang in reversed(LANG_PRIORITY[:-1]):
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)).otherwise(best)
    # re-derive tokens inside score columns (scores reference toks directly)
    return df.withColumn(out_col, best).drop("__toks")


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprinting — md5 of the whitespace-normalized,
    lower-cased text. Identical normalization is mirrored in the DuckDB
    oracle, so the fingerprint is engine-portable."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn(out_col, F.md5(norm))


def shingles_col(text_col: str = "text", n: int = 3) -> Column:
    """n-token shingles (distinct) as an array<string> column.

    The token array is let-bound: each of the n element_at accesses per
    shingle would otherwise re-run the regex split per access (3n regex
    passes per row instead of 1)."""
    def body(toks):
        # guard: sequence(0, negative) would descend ([0,-1]) and index 0
        # into the array (error) for docs shorter than n tokens — emit []
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        shingle = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
        )
        return F.array_distinct(F.transform(idx, shingle))

    return let(tokens_col(text_col), body)


def portable_hash(col: Column, bits: int = 28) -> Column:
    """28-bit integer hash from an md5 prefix — reproducible in any engine
    with md5 + hex parse (overflow-safe for (a*h+b) % p in int64)."""
    hexchars = bits // 4
    return F.conv(F.substring(F.md5(col), 1, hexchars), 16, 10).cast("bigint")


#: BPE-ish pretokenizer regex (GPT-2-style, lookahead-free so Java regex
#: and RE2 agree): contraction suffixes, optional-space letter runs,
#: optional-space digit runs, optional-space punctuation runs. Both
#: engines use leftmost-first alternation, so matches are identical.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def with_bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-style token counting — the LLM-pipeline cost estimator.

    Whitespace token counts (with_token_stats) under-count for BPE-style
    tokenizers; this runs a GPT-2-shaped pretokenizer regex (JVM-side,
    regexp_extract_all) and emits count + distinct count per document."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    return df.withColumn(
        "n_bpe_tokens", F.size(toks).cast("bigint")
    ).withColumn(
        "n_distinct_bpe", F.size(F.array_distinct(toks)).cast("bigint")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hashes, per-window
    minima — the MOSS local fingerprinting scheme of Schleimer, Wilkerson
    & Aiken, SIGMOD'03).

    Per doc: hash every k-char gram (portable md5-prefix stands in for
    Rabin-Karp — same selection semantics, engine-portable), slide a
    w-hash window, keep each window's minimum, emit the distinct minima
    as (id, fp) rows. Guarantees a shared fingerprint for any common
    substring of length >= k + w - 1, with density ~2/(w+1).

    Pure projection + explode: scan-bound at 100 TB, no shuffle needed —
    but a SMALL input (one parquet split) would serialize the md5-per-gram
    work on one core, so we pre-spread the raw (id, text) rows across the
    cluster first (same rationale as dedup._doc_shingles). Both array
    passes are let-bound so the gram hashes are computed once."""
    df = df.select(id_col, text_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    grams = let(
        F.col(text_col),
        lambda t: F.transform(
            F.when(F.length(t) >= k, F.sequence(F.lit(1), F.length(t) - k + 1))
            .otherwise(F.array().cast("array<int>")),
            lambda i: portable_hash(F.substr(t, i, F.lit(k))),
        ),
    )
    mins = let(
        grams,
        lambda hs: F.array_distinct(
            F.transform(
                F.when(F.size(hs) >= w, F.sequence(F.lit(1), F.size(hs) - w + 1))
                .otherwise(F.array().cast("array<int>")),
                lambda j: F.array_min(F.slice(hs, j, w)),
            )
        ),
    )
    return df.select(F.col(id_col), F.explode(mins).alias("fp"))


#: PII patterns, portable across Java regex and RE2 (no lookarounds):
#: order matters — emails before bare digit-runs so the local part survives
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "[IP]"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "[PHONE]"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """PII redaction — email/SSN/IPv4/phone patterns replaced by typed
    placeholder tokens, plus a per-row redaction count. Sequential
    JVM-side regexp passes (order: emails first so '@host' digits aren't
    half-eaten by the phone rule); pure projection at any scale."""
    n = F.lit(0)
    red = F.col(text_col)
    for pat, tok in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(red, F.lit(pat), 0))
        red = F.regexp_replace(red, pat, tok)
    return df.withColumn(out_col, red).withColumn("n_redactions", n.cast("bigint"))


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition scoring (Gopher-style): duplicate-token fraction and
    most-common-token frequency ratio. Shuffle-free: per-row array fold
    over the let-bound token array (O(distinct x tokens) per doc), instead
    of an explode + two groupBy shuffles of |docs| x |tokens| rows."""
    stats = let(tokens_col(text_col), lambda toks: F.struct(
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("d"),
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.size(F.filter(toks, lambda x: x == t)),
            )
        ).alias("topn"),
    ))
    return (
        df.withColumn("__s", stats)
        .withColumn(
            "dup_token_fraction",
            F.lit(1.0) - F.col("__s.d").cast("double") / F.col("__s.n"),
        )
        .withColumn(
            "top_token_ratio", F.col("__s.topn").cast("double") / F.col("__s.n")
        )
        .drop("__s")
    )
