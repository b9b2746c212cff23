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


# BPE-ish sub-word token classes: letter runs, digit runs, and single
# other non-space characters.  Deliberately lookaround-free so the exact
# same pattern runs under Java regex (Spark) and RE2 (DuckDB oracle).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: letter runs, digit runs, and individual
    punctuation/symbol characters each count as one token (a cheap BPE
    stand-in for budget estimation).  Counted as regex matches — one
    scan, engine-portable."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def _tokens(text: Column) -> Column:
    """Whitespace tokens of the trimmed text (empty text -> [''])."""
    return F.split(F.trim(text), r"\s+")


def _token_hits(toks: Column, words) -> Column:
    """How many tokens are exact members of ``words`` — one pass over the
    token array (array_contains per token), not one string-replace scan
    per word."""
    word_arr = F.array(*[F.lit(w) for w in sorted(words)])
    return F.size(F.filter(toks, lambda t: F.array_contains(word_arr, t))) \
        .cast("long")


def word_occurrences(text: Column, word: str) -> Column:
    """Occurrences of a word as a whitespace-delimited token."""
    return _token_hits(_tokens(text), [word])


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features: n_chars, n_tokens, mean token length,
    stopword ratio, punctuation ratio, digit ratio, and a [0,1] score.

    Single tokenize pass: the text is split once and every stopword test
    is an array membership check, instead of one full-string replace per
    stopword (22 scans per doc in the previous formulation).
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count(text)
    stop_hits = _token_hits(_tokens(text), STOPWORDS)
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
    toks = _tokens(text)
    scores = []
    for lang in sorted(LANG_MARKERS):
        hits = _token_hits(toks, LANG_MARKERS[lang])
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
