"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark corpus.

The standard LLM-pipeline hygiene step (GPT-3 appendix C, PaLM §7,
Llama 2 §A.6 all describe n-gram–overlap decontamination): a document
whose text contains any length-``n`` word n-gram that also appears in a
held-out benchmark is quarantined so eval scores stay honest.

Scale shape: the benchmark side is SMALL (eval suites are thousands of
rows, not billions) — its distinct n-gram set is broadcast, so the
training-corpus side stays a map-side hash join on the same scan that
produced the grams.  The doc side streams every gram (built via the
per-doc lead() window in word_ngram_stack — ~10x faster than HOF gram
arrays) into the broadcast probe, and one groupBy(id) counts DISTINCT
matched grams, so only matched grams (normally a tiny fraction) ever
shuffle.  No all-pairs comparison anywhere; at n>=8 grams are
near-unique so the join key carries no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import word_ngram_stack


def ngram_decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench: DataFrame,
    bench_text_col: str,
    *,
    n: int = 8,
) -> DataFrame:
    """Per-document contamination verdicts against a benchmark corpus.

    Returns one row per input document: ``n_matched_ngrams`` (how many of
    the doc's distinct word n-grams appear anywhere in the benchmark) and
    ``contaminated`` (any match).  Tokenization is lowercase whitespace
    splitting on both sides, so the check is symmetric and
    engine-portable (the DuckDB oracle reproduces it verbatim).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # all grams (not per-doc distinct) probe the broadcast set; the
    # per-doc count_distinct dedups AFTER the match, so the only shuffled
    # rows are matched grams (normally a tiny fraction) — a pre-join
    # distinct would shuffle the whole gram stream instead
    doc_grams = word_ngram_stack(df, id_col, text_col, (n,)) \
        .select(id_col, "gram")
    bench_grams = word_ngram_stack(
        bench.select(F.monotonically_increasing_id().alias("__bid"),
                     F.col(bench_text_col)),
        "__bid", bench_text_col, (n,)).select("gram").distinct()
    matched = doc_grams.join(F.broadcast(bench_grams), "gram") \
        .groupBy(id_col).agg(
            F.count_distinct("gram").alias("n_matched_ngrams"))
    return df.select(id_col).join(matched, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_matched_ngrams"), F.lit(0)).cast("long")
            .alias("n_matched_ngrams"),
        (F.coalesce(F.col("n_matched_ngrams"), F.lit(0)) > 0)
            .alias("contaminated"),
    )
