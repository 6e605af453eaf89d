"""Text analysis operators: tokenization, quality, language-ID, fingerprints.

Everything here is a pure Catalyst column expression (JVM-side, whole-stage
codegen, no Python in the hot path) built on two portable primitives that
DuckDB can reproduce bit-for-bit for the oracle gate:

- ``h32(s)`` — 32-bit hash = first 8 hex chars of md5, as BIGINT;
- left-fold over arrays — ``F.aggregate`` ≡ DuckDB ``list_reduce`` with a
  prepended zero-init element.

At 100 TB these run inside the scan's project (no shuffle); per-doc outputs
feed groupBy stages that aggregate partial→final automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FNV_PRIME = 131  # fold multiplier for the rolling fingerprint
FOLD_MOD = 2_147_483_647  # 2^31 - 1; keeps fold products < 2^39 (BIGINT-safe)

# tiny per-language stopword sets for the n-gram/stopword heuristic (public
# high-frequency function words; the heuristic, not the lists, is the point)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
}


def h32(col: Column) -> Column:
    """Portable 32-bit string hash: ``int(md5(s)[:8], 16)`` as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h60(col: Column) -> Column:
    """Portable 60-bit string hash: ``int(md5(s)[:15], 16)`` as BIGINT.

    60 bits (15 hex chars) rather than 64 so the value fits signed int64 in
    both engines without the sign-bit edge case (DuckDB's ``::BIGINT`` hex
    cast rejects values ≥ 2^63). Used by the 60-bit SimHash whose 15-bit
    bands need a wide, uniformly-hashed bit pool."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words(col: Column) -> Column:
    """Space-split word array (exactly DuckDB's ``string_split(s, ' ')``)."""
    return F.split(col, " ")


def regex_tokens(col: Column, pattern: str = "([a-z0-9]+)") -> Column:
    """BPE-ish regex tokenization: maximal ``[a-z0-9]+`` runs."""
    return F.regexp_extract_all(col, F.lit(pattern), 1)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and regex word tokens per doc."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit("(\\S+)"), 1)).alias("n_ws_tokens"),
        F.size(regex_tokens(t)).alias("n_re_tokens"),
        F.length(t).alias("n_chars"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length / mean-word-length / stopword-ratio features
    and a composite score. Mirrors the heuristic-filter stage of web-scale
    corpus pipelines (C4/Gopher-style rules), as plain column arithmetic."""
    t = F.col(text_col)
    ws = words(t)
    n_words = F.size(ws)
    sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    mean_wlen = (F.length(t) - (n_words - 1)) / n_words  # chars net of spaces
    stop_ratio = n_stop / n_words
    score = (
        F.when(n_words < 5, 0.0)
        .when(mean_wlen < 2.0, 0.25)
        .otherwise(
            F.round(
                F.least(F.lit(1.0), stop_ratio * 4.0) * 0.5
                + F.least(F.lit(1.0), n_words / F.lit(24.0)) * 0.5,
                6,
            )
        )
    )
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        n_stop.alias("n_stopwords"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language stopword hit-rate, argmax wins
    (ties broken by language code; 'und' when nothing matches)."""
    ws = words(F.col(text_col))
    langs = sorted(LANG_STOPWORDS)

    def _hits(stopwords: list[str]):
        sw = F.array(*[F.lit(s) for s in stopwords])
        return F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))

    hit_cols = [
        _hits(LANG_STOPWORDS[lang]).alias(f"hits_{lang}") for lang in langs
    ]
    out = df.select("doc_id", *hit_cols)
    max_hits = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # reversed: earliest code wins ties
        pred = F.when(
            (F.col(f"hits_{lang}") == max_hits) & (max_hits > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: left-fold rolling hash over word h32s —
    ``fp = fold(fp * 131 + h32(w)) mod (2^31-1)``. Order-sensitive (unlike a
    bag-of-words hash) and portable: DuckDB ``list_reduce`` with a 0 prepended
    reproduces the fold exactly."""
    ws = words(F.col(text_col))
    fp = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * FNV_PRIME + h32(w)) % FOLD_MOD,
    )
    return df.select("doc_id", fp.alias("fingerprint"), F.size(ws).alias("n_words"))


def repetition_features(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Within-document repetition: how much of a doc is repeated n-grams.

    The substring-level dedup signal (cf. "Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022 — public): documents dominated by
    repeated n-grams (boilerplate loops, generator glitches) are low-quality
    training data even when no OTHER document duplicates them. Per doc:
    distinct n-grams, total n-gram occurrences, how many distinct n-grams
    repeat, and the fraction of occurrences belonging to repeated n-grams.

    Plan: explode non-distinct n-grams → two-level groupBy (doc, gram) then
    (doc) — both partial-aggregated; shuffle keys are (doc_id, gram) then
    doc_id, high-cardinality and even. Docs with < n words emit no row
    (no n-grams), matching the oracle's inner grouping.
    """
    ws = words(F.col(text_col))
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        df.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.sum("c").alias("n_grams"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_repeated"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.sum("c"),
            6,
        ).alias("rep_ratio"),
    )


def pii_pattern_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII-pattern surface counts per document: email-shaped tokens and long
    digit runs — the cheap first-pass filter a web-scale pipeline runs before
    expensive NER-based PII scrubbing. Patterns are deliberately simple and
    RE2/Java-portable so the DuckDB oracle matches exactly; pure column
    expressions in the scan project (no shuffle)."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(t, F.lit("([a-z0-9.]+@[a-z0-9.]+)"), 1)
        ).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit("([0-9]{3,})"), 1)).alias(
            "n_digit_runs"
        ),
        (
            F.size(F.regexp_extract_all(t, F.lit("([a-z0-9.]+@[a-z0-9.]+)"), 1))
            > 0
        )
        .cast("int")
        .alias("has_pii_surface"),
    )
