"""Text analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All hot paths are JVM-side built-ins (split/transform/aggregate/regexp) —
no Python UDFs — so they run inside whole-stage codegen and scale linearly
with executors. Every operator here has a DuckDB-oracle twin in
__spark_entry__.py (same column names, same deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small built-in stopword lists for the n-gram/stopword language heuristic;
# priority order breaks score ties deterministically
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "para"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]


def tokens_of(text: Column) -> Column:
    """Whitespace tokens (the engine-wide v1 tokenizer, SURVEY.md §2.D)."""
    return F.split(F.trim(text), r"\s+")


def token_hash(tok: Column) -> Column:
    """Engine-portable 32-bit token hash: first 8 hex chars of md5.
    (md5 is identical in Spark and DuckDB; crc32/xxhash64 are not.)"""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens_of(F.col(text_col))))


# BPE-ish pre-tokenizer: contractions | space?+letters | space?+digits |
# space?+punct-run — the GPT-2-style split shape, restricted to syntax both
# Java regex (Spark) and RE2 (DuckDB) support identically (no lookahead),
# verified on unicode inputs. Counting THESE tokens approximates LLM token
# budgets far better than whitespace words (punctuation and number runs
# count separately).
BPE_PATTERN = r"'[a-zA-Z]+| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens_of(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LLM-budget token count: len(BPE-ish pre-tokens). Pure JVM regex."""
    return df.withColumn(
        "n_bpe_tokens", F.size(bpe_tokens_of(F.col(text_col)))
    )


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, F.lower(t))))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID. Scores are exact hit counts; ties break
    by LANG_PRIORITY order (stable under any execution plan)."""
    toks = tokens_of(F.col(text_col))
    scored = df
    for lang in LANG_PRIORITY:
        scored = scored.withColumn(
            f"score_{lang}", _stopword_hits(toks, LANG_STOPWORDS[lang])
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    pred = F.lit("und")
    for lang in reversed(LANG_PRIORITY):  # earlier priority wins ties
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


def with_quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features (length / punctuation / stopword
    ratios + mean token length), the standard pre-training filters."""
    text = F.col(text_col)
    toks = tokens_of(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    stop_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)), 6
            ),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: sum_i (i+1) * md5_32(token_i).

    Pure JVM expression (transform-with-index + aggregate). Position
    weighting makes token swaps change the fingerprint (unlike bag-of-words
    hashes); values fit int64 for any realistic document."""
    toks = tokens_of(F.col(text_col))
    weighted = F.transform(toks, lambda t, i: (i + F.lit(1)) * token_hash(t))
    return df.withColumn(
        "fingerprint",
        F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x),
    )
