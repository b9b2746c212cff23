"""Unit tests for the CCNet-style bigram-LM perplexity operator
(operators/lmscore.py): hand-computed cross-entropies, OOV behavior,
min_count pruning, blank/short-doc NULL contract, bucket assignment on
the rounded-score grid, and exact-percentile cutoffs.
"""

import math

import pytest
from pyspark.sql import functions as F

from spark_schema_guard.operators.lmscore import (
    cross_entropy, perplexity_bucket, perplexity_cutoffs, perplexity_score,
    train_ngram_lm)

# training corpus: doc1 "a b a b c", doc2 "b a"
#   pair counts: (a,b)=2 (b,a)=2 (b,c)=1 | context totals: a=2 b=3 | V=3
REF_ROWS = [(1, "a b a b c"), (2, "b a")]


def _h(*ps):
    return -sum(math.log2(p) for p in ps) / len(ps)


@pytest.fixture(scope="module")
def lm(spark):
    return train_ngram_lm(
        spark.createDataFrame(REF_ROWS, "id long, text string"),
        "id", "text")


def test_model_counts(lm):
    pairs = {(r["ctx"], r["tok"]): r["pair_n"] for r in lm.pairs.collect()}
    assert pairs == {("a", "b"): 2, ("b", "a"): 2, ("b", "c"): 1}
    ctxs = {r["ctx"]: r["ctx_n"] for r in lm.contexts.collect()}
    assert ctxs == {"a": 2, "b": 3}
    assert lm.vsize.first()["v"] == 3


def test_cross_entropy_hand_computed(spark, lm):
    docs = spark.createDataFrame(
        [(10, "a b c d"),   # P(b|a)=3/5, P(c|b)=2/6, P(d|c)=1/3 (OOV pair)
         (11, "z z"),       # OOV context: P(z|z)=1/(0+3)
         (12, "a"),         # one token -> no bigrams -> NULL
         (13, "   "),       # blank -> NULL
         (14, None)],       # NULL text -> NULL
        "id long, text string")
    out = {r["id"]: r for r in cross_entropy(docs, lm, "id", "text").collect()}
    assert out[10]["n_bigrams"] == 3
    assert out[10]["h_bits"] == pytest.approx(_h(3 / 5, 2 / 6, 1 / 3))
    assert out[11]["n_bigrams"] == 1
    assert out[11]["h_bits"] == pytest.approx(_h(1 / 3))
    for i in (12, 13, 14):
        assert out[i]["n_bigrams"] == 0 and out[i]["h_bits"] is None
    assert len(out) == 5  # every input doc comes back exactly once


def test_min_count_prunes_pairs_not_denominator(spark):
    ref = (1, "a b a b c")
    lm2 = train_ngram_lm(
        spark.createDataFrame([ref], "id long, text string"),
        "id", "text", min_count=2)
    # (b,c) seen once -> pruned; its probability falls back to the
    # add-one floor over the UNpruned context total: (0+1)/(2+3)
    pairs = {(r["ctx"], r["tok"]) for r in lm2.pairs.collect()}
    assert pairs == {("a", "b")}
    docs = spark.createDataFrame([(1, "b c")], "id long, text string")
    row = cross_entropy(docs, lm2, "id", "text").first()
    assert row["h_bits"] == pytest.approx(_h(1 / 5))


def test_case_and_whitespace_normalization(spark, lm):
    docs = spark.createDataFrame([(1, "  A   B  ")], "id long, text string")
    row = cross_entropy(docs, lm, "id", "text").first()
    # "A   B" tokenizes to (a, b): P(b|a) = (2+1)/(2+3)
    assert row["n_bigrams"] == 1
    assert row["h_bits"] == pytest.approx(_h(3 / 5))


def test_bucket_assignment_on_rounded_grid(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 2.0000004), (4, 3.0), (5, None)],
        "id long, h double")
    out = {r["id"]: r["b"] for r in df.select(
        "id", perplexity_bucket(F.col("h"), (2.0, 2.5)).alias("b")).collect()}
    # 2.0000004 rounds to 2.0 on the 6-decimal grid -> still head
    assert out == {1: "head", 2: "head", 3: "head", 4: "tail", 5: None}


def test_bucket_rejects_unordered_cutoffs():
    with pytest.raises(ValueError):
        perplexity_bucket(F.lit(1.0), (2.0, 1.0))


def test_cutoffs_exact_percentiles(spark):
    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)] + [(99, None)],
        "id long, h_bits double")
    lo, hi = perplexity_cutoffs(scored)  # tertiles of 1..9
    assert (lo, hi) == (pytest.approx(3.666667), pytest.approx(6.333333))
    with pytest.raises(ValueError):
        perplexity_cutoffs(scored, fractions=(0.9, 0.1))
    with pytest.raises(ValueError):
        perplexity_cutoffs(
            spark.createDataFrame([(1, None)], "id long, h_bits double"))


def test_perplexity_score_end_to_end(spark):
    ref = spark.createDataFrame(REF_ROWS, "id long, text string")
    docs = spark.createDataFrame(
        [(10, "a b a b"), (11, "z z z"), (12, "a")],
        "id long, text string")
    out = {r["id"]: r for r in
           perplexity_score(docs, ref, "id", "text").collect()}
    # in-distribution doc scores lower than the OOV doc
    assert out[10]["h_bits"] < out[11]["h_bits"]
    assert out[10]["ppl_bucket"] == "head"
    assert out[11]["ppl_bucket"] in ("middle", "tail")
    assert out[12]["ppl_bucket"] is None


def test_broadcast_false_same_answer(spark, lm):
    docs = spark.createDataFrame(
        [(10, "a b c d"), (11, "z z")], "id long, text string")
    b = {r["id"]: r["h_bits"]
         for r in cross_entropy(docs, lm, "id", "text").collect()}
    s = {r["id"]: r["h_bits"]
         for r in cross_entropy(docs, lm, "id", "text",
                                broadcast=False).collect()}
    assert b == s


def test_scoring_plan_is_jvm_only(spark, lm):
    """The scoring hot path must stay whole-stage-codegen-able: no
    Python evaluation nodes anywhere in the plan."""
    docs = spark.createDataFrame([(10, "a b c")], "id long, text string")
    plan = cross_entropy(docs, lm, "id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
