"""N-gram language-model perplexity scoring (CCNet-style quality signal).

The public Common-Crawl curation recipe (CCNet, Wenzek et al. 2019,
arXiv:1911.00359 — followed by RedPajama / Llama / Falcon data work)
scores every candidate document by the perplexity of a language model
trained on a trusted high-quality corpus, then splits the corpus into
head / middle / tail buckets by perplexity percentile: low-perplexity
("looks like the reference text") documents are kept preferentially.
This module reproduces that pipeline shape with a word-bigram
add-one-smoothed LM — deliberately simple enough to be an EXACT,
engine-portable computation (the DuckDB oracle replays it verbatim),
while exercising the same Spark plan a KenLM-backed scorer would use.

Model estimate, for token t following context token c with corpus
vocabulary size V (distinct training tokens):

    P(t | c) = (count(c, t) + 1) / (count(c) + V)

and the document score is the cross-entropy in bits over its bigrams:

    h_bits(doc) = -(1/m) * sum_i log2 P(t_i | c_i)

Out-of-vocabulary events degrade gracefully through the same formula
(unknown pair -> count 0; unknown context -> count 0 -> P = 1/V).
Documents with fewer than two tokens have no bigrams and score NULL.

Scale shape (10^12 docs): training is one explode -> groupBy count with
map-side partial aggregation — the classic word-count plan; ``min_count``
prunes the pair table exactly the way CCNet prunes its KenLM vocabulary,
bounding the model to what fits in a broadcast. Scoring joins each doc
bigram against the broadcast pair/context tables (map-side hash join on
the scan that produced the tokens — zero extra shuffle before the
per-doc groupBy). With ``broadcast=False`` the joins shuffle instead;
the bigram stream is Zipf-skewed on stopword contexts, which is exactly
the shape AQE skew-join splitting handles (see SCALE.md).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _token_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per in-document (ctx, tok) adjacent token pair — lowercase
    whitespace tokens, built with the per-doc lead() window (the
    A/B-measured fast gram build, see word_ngram_stack / SCALE.md).
    Blank docs produce no rows (the phantom '' token is dropped)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    st = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok")) \
        .where(F.col("tok") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    return st.select(F.col(id_col), F.col("tok").alias("ctx"),
                     F.lead("tok", 1).over(w).alias("tok")) \
        .where(F.col("tok").isNotNull())


@dataclass(frozen=True)
class NgramLM:
    """A trained bigram model: three lazy frames, no driver-side state.

    ``pairs``    — (ctx, tok, pair_n)  bigram counts, min_count-pruned
    ``contexts`` — (ctx, ctx_n)        unpruned context totals
    ``vsize``    — single row (v)      distinct training-token count
    """
    pairs: DataFrame
    contexts: DataFrame
    vsize: DataFrame

    def persist(self) -> "NgramLM":
        """Cache all three model frames (one training pass serves every
        scoring job instead of recomputing the counts per query)."""
        return NgramLM(self.pairs.persist(), self.contexts.persist(),
                       self.vsize.persist())


def train_ngram_lm(ref: DataFrame, id_col: str, text_col: str, *,
                   min_count: int = 1) -> NgramLM:
    """Fit the bigram LM on a reference corpus (the CCNet "trusted text"
    side — e.g. a wiki-like subset). ``min_count`` drops pair rows seen
    fewer times, bounding the model size for broadcast; context totals
    and vocabulary stay UNPRUNED so the smoothing denominator is exact.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    pairs_all = _token_pairs(ref, id_col, text_col)
    pairs = pairs_all.groupBy("ctx", "tok") \
        .agg(F.count(F.lit(1)).alias("pair_n"))
    if min_count > 1:
        pairs = pairs.where(F.col("pair_n") >= min_count)
    contexts = pairs_all.groupBy("ctx").agg(F.count(F.lit(1)).alias("ctx_n"))
    # vocabulary = distinct tokens anywhere in the training text (last
    # tokens of docs are contexts of nothing; count them too, matching
    # the documented "distinct training tokens" definition)
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    vsize = ref.select(F.explode(toks).alias("tok")) \
        .where(F.col("tok") != "") \
        .agg(F.count_distinct("tok").cast("long").alias("v"))
    return NgramLM(pairs=pairs, contexts=contexts, vsize=vsize)


def cross_entropy(df: DataFrame, lm: NgramLM, id_col: str,
                  text_col: str, *, broadcast: bool = True) -> DataFrame:
    """Per-document bits/bigram under the model: one row per input doc
    with ``n_bigrams`` (long) and ``h_bits`` (double, NULL when the doc
    has fewer than two tokens).

    The model side of both joins is broadcast by default (the pruned
    pair table is the CCNet-style bounded model); pass
    ``broadcast=False`` for a shuffle join when the model genuinely
    exceeds executor memory — AQE splits the stopword-context skew.
    """
    maybe_b = F.broadcast if broadcast else (lambda d: d)
    bi = _token_pairs(df, id_col, text_col)
    scored = (
        bi.join(maybe_b(lm.pairs), ["ctx", "tok"], "left")
          .join(maybe_b(lm.contexts.withColumnRenamed("ctx_n", "__ctx_n")),
                ["ctx"], "left")
          .join(maybe_b(lm.vsize))  # 1 row -> broadcast nested loop
          .select(
              F.col(id_col),
              (F.log2((F.coalesce(F.col("pair_n"), F.lit(0)) + 1.0)
                      / (F.coalesce(F.col("__ctx_n"), F.lit(0))
                         + F.col("v")))).alias("__lp"))
          .groupBy(id_col)
          .agg(F.count(F.lit(1)).alias("n_bigrams"),
               (-F.avg("__lp")).alias("h_bits"))
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("h_bits"))


def perplexity_bucket(score: Column, cutoffs: tuple) -> Column:
    """CCNet head/middle/tail assignment from EXPLICIT cutoffs
    (bits/bigram). Comparison happens on the score ROUNDED to 6
    decimals so the same literal cutoffs bucket identically in any
    engine (doubles differ across libm in the last ulp; the rounded
    value is the portable contract). NULL score (sub-bigram doc) ->
    NULL bucket."""
    lo, hi = cutoffs
    if not lo <= hi:
        raise ValueError(f"cutoffs must be ordered, got {cutoffs}")
    r = F.round(score, 6)
    return F.when(score.isNull(), F.lit(None).cast("string")) \
        .when(r <= F.lit(lo), F.lit("head")) \
        .when(r <= F.lit(hi), F.lit("middle")) \
        .otherwise(F.lit("tail"))


def perplexity_cutoffs(scored: DataFrame, *, score_col: str = "h_bits",
                       fractions: tuple = (1 / 3, 2 / 3)) -> tuple:
    """Exact score percentiles to use as bucket cutoffs — the CCNet
    recipe computes these once on a sample and reuses them as constants.
    Driver-side result is two floats (one scalar aggregate job); at
    10^12 rows swap ``percentile`` for ``approx_percentile`` — bucket
    boundaries are a tuning knob, not an exactness contract."""
    lo_f, hi_f = fractions
    if not 0.0 < lo_f <= hi_f < 1.0:
        raise ValueError(f"fractions must be ordered in (0,1), got {fractions}")
    row = scored.where(F.col(score_col).isNotNull()).agg(
        F.percentile(F.col(score_col), F.lit(lo_f)).alias("lo"),
        F.percentile(F.col(score_col), F.lit(hi_f)).alias("hi")).first()
    if row is None or row["lo"] is None:
        raise ValueError("no non-NULL scores to take percentiles of")
    lo, hi = float(row["lo"]), float(row["hi"])
    # the bucket contract compares rounded scores; publish cutoffs on
    # the same grid so a cutoff computed here never splits a rounded tie
    return (round(lo, 6), round(hi, 6))


def perplexity_score(df: DataFrame, ref: DataFrame, id_col: str,
                     text_col: str, *, ref_text_col: str = None,
                     min_count: int = 1, cutoffs: tuple = None,
                     broadcast: bool = True) -> DataFrame:
    """End-to-end CCNet shape: train on ``ref``, score ``df``, bucket.

    Returns (id, n_bigrams, h_bits, ppl_bucket). When ``cutoffs`` is
    None they are computed from the scored output's exact tertiles
    (one extra scalar job — pass explicit cutoffs in production)."""
    lm = train_ngram_lm(ref, id_col, ref_text_col or text_col,
                        min_count=min_count)
    scored = cross_entropy(df, lm, id_col, text_col, broadcast=broadcast)
    if cutoffs is None:
        scored = scored.persist()
        cutoffs = perplexity_cutoffs(scored)
    return scored.withColumn(
        "ppl_bucket", perplexity_bucket(F.col("h_bits"), cutoffs))


def perplexity(h_bits: Column) -> Column:
    """Perplexity = 2^h — same ordering as h_bits, conventional units."""
    return F.pow(F.lit(2.0), h_bits)


__all__ = ["NgramLM", "train_ngram_lm", "cross_entropy",
           "perplexity_bucket", "perplexity_cutoffs", "perplexity_score",
           "perplexity"]
