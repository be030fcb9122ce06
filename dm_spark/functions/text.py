"""Text analysis for training-data pipelines — all built-in Catalyst
expressions (JVM-side, codegen), no Python in the hot path.

These are the transcript-payload analogs of a large-scale corpus
pipeline: token counting, quality signals, language ID heuristic,
document fingerprinting. Each has an exact ANSI-SQL twin used by the
DuckDB correctness oracle (integer/count outputs — no float drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed English stopword set (shared law with the SQL oracle)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty strings filtered (BPE-ish regex
    splitting is a drop-in replacement — whitespace keeps the oracle
    law trivially shared with SQL)."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column) -> Column:
    """Repetition-penalized informativeness: distinct whitespace tokens
    (NULL text scores 0). THE shared reward law of best-of-history
    mining — queries_cdc.best_of_history (the global argmax) and
    functions.incremental.incremental_best_of_batch (the semilattice
    fold) must score identically or the incremental index converges to
    a different argmax than the oracle, so both import this single
    definition (review r5)."""
    return F.size(F.array_distinct(tokens(F.coalesce(col, F.lit(""))))).cast("bigint")


def stopword_count(col: Column) -> Column:
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(sw, F.lower(x))))


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[\.,;:!\?]", ""))


def char_count(col: Column) -> Column:
    return F.length(col)


def is_english_heuristic(col: Column, min_ratio_pct: int = 10) -> Column:
    """n-gram-free language ID: share of stopword tokens >= threshold.
    Integer percent math so the SQL oracle is bit-identical."""
    n = token_count(col)
    return F.when(n > 0, (stopword_count(col) * 100 / n) >= min_ratio_pct).otherwise(F.lit(False))


BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_ish_tokens(col: Column) -> Column:
    """Coarse BPE-style pre-tokenization: letter runs, digit runs,
    single punctuation (the GPT-2 pre-tokenizer shape, minus unicode
    categories). Shared regex law with the SQL oracle."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint (md5 — shared with DuckDB)."""
    return F.md5(col)


def normalized_text(col: Column) -> Column:
    """Canonical form for fuzzy-exact dedup: lowercase, punctuation
    stripped, whitespace collapsed and trimmed — the standard
    normalization before fingerprinting (catches case/spacing/punct
    near-copies that byte-exact dedup misses). Regex law shared with
    the SQL oracle."""
    out = F.lower(col)
    out = F.regexp_replace(out, r"[\.,;:!\?]", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_stopwords", stopword_count(c))
        .withColumn("n_punct", punct_count(c))
        .withColumn("n_chars_calc", char_count(c))
        .withColumn("is_en_pred", is_english_heuristic(c))
        .withColumn("fp", fingerprint(c))
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document: word-bigram
    duplication. Returns (doc_id, n_bigrams, n_distinct_bigrams,
    top_bigram_n, dup_bigram_n, flagged) — dup_bigram_n counts bigram
    OCCURRENCES beyond the first of each distinct bigram (the "fraction
    of tokens inside repeated n-grams" rule, Rae et al. 2021 §A1.1),
    top_bigram_n the most frequent single bigram's count; flagged when
    duplicated occurrences exceed 20% of all bigrams (integer law:
    dup * 5 >= total, shared with the SQL oracle).

    Shape: explode(bigrams) -> two-level map-side-combinable count agg,
    one shuffle keyed (doc_id, bigram) then (doc_id) — no per-doc
    quadratic lambda work (Catalyst does no CSE inside lambdas), no
    Python. Docs with <2 tokens report zero bigrams, unflagged."""
    toks = tokens(F.col(text_col))
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda x, y: F.concat_ws(" ", x, y)
    )
    ex = df.select("doc_id", F.explode_outer(bigrams).alias("bg"))
    per_bigram = ex.groupBy("doc_id", "bg").agg(F.count("bg").alias("c"))
    return per_bigram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.sum(F.when(F.col("bg").isNotNull(), 1).otherwise(0)).alias(
            "n_distinct_bigrams"
        ),
        F.max(F.coalesce("c", F.lit(0))).alias("top_bigram_n"),
        (F.sum("c") - F.sum(F.when(F.col("bg").isNotNull(), 1).otherwise(0))).alias(
            "dup_bigram_n"
        ),
        (
            (F.sum("c") > 0)
            & (
                (F.sum("c") - F.sum(F.when(F.col("bg").isNotNull(), 1).otherwise(0))) * 5
                >= F.sum("c")
            )
        ).alias("flagged"),
    )


# PII patterns shared verbatim with the DuckDB oracle (both Java regex
# and RE2 interpret these identically: no lookaround, no backrefs,
# greedy quantifiers over disjoint character classes).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9][0-9 \-]{7,}[0-9]"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: emails, IPv4 addresses and
    phone-shaped digit runs are replaced with typed placeholder tokens
    (<EMAIL>/<IP>/<PHONE>), applied in that order so an earlier
    replacement cannot create or destroy a later match on the synthetic
    shapes (emails carry no dotted quads; dotted quads are excluded
    from the phone class by the '.'). Match COUNTS are computed per
    pattern on the ORIGINAL text (independent laws, shared with the
    SQL oracle). Pure Catalyst regexp_replace/regexp_count — JVM
    codegen, no Python, no shuffle: the op is a stateless projection
    that scales embarrassingly at 100 TB."""
    c = F.col(text_col)
    red = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IP_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    n_em = F.regexp_count(c, F.lit(PII_EMAIL_RE)).cast("bigint")
    n_ip = F.regexp_count(c, F.lit(PII_IP_RE)).cast("bigint")
    n_ph = F.regexp_count(c, F.lit(PII_PHONE_RE)).cast("bigint")
    return (
        df.withColumn("n_emails", n_em)
        .withColumn("n_ips", n_ip)
        .withColumn("n_phones", n_ph)
        .withColumn("has_pii", (n_em + n_ip + n_ph) > 0)
        .withColumn("redacted", red)
    )


# quality_filter reason bits (reasons == 0 <=> keep)
QF_TOKENS_OUT_OF_RANGE = 1  # token count outside [min_tokens, max_tokens]
QF_WORDLEN_OUT_OF_RANGE = 2  # mean token length outside [3, 10]
QF_PUNCT_HEAVY = 4  # punctuation >= 10% of characters
QF_FEW_STOPWORDS = 8  # fewer than 2 stopword tokens (C4 rule analog)
QF_REPETITIVE = 16  # duplicated bigram occurrences >= 20% of bigrams


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Composite C4/Gopher-style document quality filter: one keep/drop
    verdict per document plus a reason BITMASK (so a pipeline can report
    *why* volume was dropped, not just how much — the "no silent caps"
    rule applied to filtering). Rules (Raffel et al. 2020 §2.2, Rae et
    al. 2021 §A1.1), all integer laws shared with the SQL oracle:

      bit 1  token count outside [min_tokens, max_tokens]
      bit 2  mean token length outside [3, 10]   (3n <= sum_len <= 10n)
      bit 4  punctuation >= 10% of characters    (10 * punct >= chars)
      bit 8  fewer than 2 stopword tokens
      bit 16 duplicated-bigram occurrences >= 20% of bigrams
             (only when the doc has bigrams at all)

    sum_len is length(replace(text,' ','')) — exactly the sum of token
    lengths under whitespace tokenization regardless of repeated/edge
    spaces. Shape: a stateless projection joined with the
    repetition_signals aggregate on doc_id — the only shuffles are the
    bigram count-agg (map-side combinable) and the doc_id join, both
    key-bounded at 100 TB."""
    c = F.col(text_col)
    base = df.select(
        "doc_id",
        token_count(c).cast("bigint").alias("n_tokens"),
        F.length(F.regexp_replace(c, " ", "")).cast("bigint").alias("sum_tok_len"),
        punct_count(c).cast("bigint").alias("n_punct"),
        char_count(c).cast("bigint").alias("n_chars_q"),
        stopword_count(c).cast("bigint").alias("n_stopwords"),
    )
    rep = repetition_signals(df, text_col).select(
        "doc_id", "n_bigrams", "dup_bigram_n"
    )
    j = base.join(rep, "doc_id")
    r1 = ~F.col("n_tokens").between(min_tokens, max_tokens)
    r2 = ~(
        (F.col("sum_tok_len") >= 3 * F.col("n_tokens"))
        & (F.col("sum_tok_len") <= 10 * F.col("n_tokens"))
    )
    r3 = F.col("n_punct") * 10 >= F.col("n_chars_q")
    r4 = F.col("n_stopwords") < 2
    r5 = (F.col("n_bigrams") > 0) & (
        F.col("dup_bigram_n") * 5 >= F.col("n_bigrams")
    )
    reasons = (
        r1.cast("int") * QF_TOKENS_OUT_OF_RANGE
        + r2.cast("int") * QF_WORDLEN_OUT_OF_RANGE
        + r3.cast("int") * QF_PUNCT_HEAVY
        + r4.cast("int") * QF_FEW_STOPWORDS
        + r5.cast("int") * QF_REPETITIVE
    ).cast("bigint")
    return j.select(
        "doc_id",
        "n_tokens",
        "sum_tok_len",
        "n_punct",
        "n_stopwords",
        "n_bigrams",
        "dup_bigram_n",
        reasons.alias("reasons"),
        (reasons == 0).alias("keep"),
    )


def unigram_lm_bits(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM corpus-frequency quality score — the CCNet
    perplexity-filter shape (Wenzek et al. 2020 §3.3: score documents
    by a language model and split the corpus into head/middle/tail)
    reduced to an exact integer law. Each token's "evidence" surrogate
    is floor(log2(corpus_count(token))), computed EXACTLY as
    length(bin(count)) - 1 (binary-digit counting), so the Spark plan
    and the DuckDB oracle cannot drift in float rounding the way a real
    sum of -log p terms would. A document built from frequent corpus
    tokens scores high mean bits (CCNet's fluent "head"); rare-token
    noise lands in the tail.

    Buckets are CORPUS-RELATIVE (scale-free — no magic constant goes
    stale as counts grow with corpus size), decided by integer
    cross-multiplication against the corpus-wide mean bits/token:

      head   : sum_bits * tot_tok >= n_tok * tot_bits       (>= mean)
      middle : 8 * sum_bits * tot_tok >= 7 * n_tok * tot_bits
      tail   : otherwise                                     (< 7/8 mean)

    Zero-token documents drop (nothing to score; quality_filter's
    bit-1 rule already flags them). Overflow headroom: bits <= 63 so
    sum_bits <= 63*n_tok, and the cross-product stays under 2^63 for
    corpora up to ~10^13 tokens (the 100-TB regime); past that, scale
    tot_* down by a common power of two first.

    Shape: explode (no shuffle) -> token count-agg (map-side
    combinable, vocabulary-bounded) -> token equi-join back (AQE
    broadcasts the counts side when the vocabulary is small; at 100 TB
    it is a shuffled equi-join on the same bounded key class as
    line_dedup) -> one doc-keyed agg -> scalar totals broadcast back.
    No windows, no driver-side state."""
    ex = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
    cnt = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    bits = cnt.select(
        "tok", (F.length(F.bin(F.col("cnt"))) - 1).cast("bigint").alias("bits")
    )
    d = (
        ex.join(bits, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("bits").cast("bigint").alias("sum_bits"),
        )
    )
    tot = d.agg(
        F.sum("n_tok").cast("bigint").alias("tot_tok"),
        F.sum("sum_bits").cast("bigint").alias("tot_bits"),
    )
    j = d.crossJoin(F.broadcast(tot))
    bucket = (
        F.when(
            F.col("sum_bits") * F.col("tot_tok") >= F.col("n_tok") * F.col("tot_bits"),
            "head",
        )
        .when(
            F.col("sum_bits") * F.col("tot_tok") * 8
            >= F.col("n_tok") * F.col("tot_bits") * 7,
            "middle",
        )
        .otherwise("tail")
    )
    return j.select(id_col, "n_tok", "sum_bits", bucket.alias("ppl_bucket"))


# NOTE: a word_shingles helper built as slice-inside-transform used to
# live here — deleted: Catalyst does no common-subexpression
# elimination inside lambda bodies, so that shape re-evaluates the
# derived token array per element (O(tokens^2), the measured ~6x
# blowup documented in CLAUDE.md). Shingling is done with zip_with
# over shifted slices in functions/dedup.hashed_shingles.
