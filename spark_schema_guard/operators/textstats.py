"""Text-analysis operators for web-corpus pipelines: token counting,
quality scoring, n-gram language identification, and document
fingerprinting — all native Column expressions (no Python in the row
path), so they ride the same scan as the validation rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets for the frequency heuristic — enough to
# separate the testdata languages deterministically
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
    "zh": ["的", "是", "不", "了", "在"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries (a cheap BPE stand-in for
    budget estimation)."""
    pieces = F.split(text, r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])|(?<=[^\w\s])")
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def _count_occurrences(text: Column, needle: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) \
        / F.lit(len(needle))


def word_occurrences(text: Column, word: str) -> Column:
    """Occurrences of a word with space delimiters (cheap, index-free)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return _count_occurrences(padded, f" {word} ").cast("long")


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features: n_chars, n_tokens, mean token length,
    stopword ratio, punctuation ratio, digit ratio, and a [0,1] score."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count(text)
    stop_hits = None
    for w in STOPWORDS:
        c = word_occurrences(text, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    mean_tok_len = F.when(n_tokens > 0,
                          (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.15
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(5.0), F.lit(1.0))) * 0.15
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_guess(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-frequency language id: the language whose marker words hit
    most often; deterministic tie-break by language code."""
    text = F.col(text_col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        hits = None
        for w in LANG_MARKERS[lang]:
            c = word_occurrences(text, w)
            hits = c if hits is None else hits + c
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max on struct: compares hits first, then lang (desc tie-break
    # would need inversion; asc lang on equal hits is deterministic)
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        best.getField("lang").alias("lang_guess"),
        best.getField("hits").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, *, prefix: int = 32) -> DataFrame:
    """Cheap stable document fingerprint: md5 over (normalized prefix,
    normalized suffix, length) — an O(1)-per-doc rolling-hash stand-in."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    fp = F.md5(F.concat_ws(
        "|",
        F.substring(norm, 1, prefix),
        F.substring(F.reverse(norm), 1, prefix),
        F.length(norm).cast("string"),
    ))
    return df.select(F.col(id_col), fp.alias("fingerprint"))
