"""Round-4 quiet-box A/B for the r3 bench regressions.

The r3 driver bench regressed decontaminate (0.764s -> 1.785s) and
text_repetition (0.842s -> 1.632s) vs r2 even at cross-pass minimums,
while their bench-leg DEFINITIONS and operator hot paths are unchanged
r2->r3 (verified via git: the lead()-window gram rewrite landed BEFORE
the r2 bench; the only shared-path diff is the cheap `tok != ''`
filter).  The live hypothesis is BENCH CONTEXT — by the time those
legs run, the session carries ~15 cached/persisted frames and dozens
of executed plans from earlier legs.

This tool times each leg twice in ONE session: first ISOLATED (fresh
session, docs cached, warmed) and then AFTER replaying the bench
prefix workload (the legs that precede them in bench.py).  A large
isolated-vs-after gap = context (cache pressure / JVM heap / code
cache), not a plan regression.

Usage: python tools/bench_ab_r4.py   (box-exclusive!)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_schema_guard.operators import ngram_decontaminate  # noqa: E402
from spark_schema_guard.operators.textstats import (  # noqa: E402
    gopher_rules, quality_features, repetition_features)
from spark_schema_guard.session import build_session  # noqa: E402


def legs(docs):
    return {
        "text_repetition": lambda: repetition_features(
            docs, "doc_id", "text").agg(
            F.sum("top2gram_frac"), F.sum("dup3gram_frac")).collect(),
        "decontaminate": lambda: ngram_decontaminate(
            docs, "doc_id", "text", docs.where(F.col("doc_id") % 97 == 0),
            "text", n=8).agg(
            F.sum(F.col("contaminated").cast("long")),
            F.sum("n_matched_ngrams")).collect(),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="bench-ab-r4", cores=cores)

    # EXACTLY bench.py's frame for these legs: the base table,
    # repartitioned, NOT cached — at sf0.1 that is 5k rows, so the leg
    # times are dominated by fixed costs (scheduling, window setup),
    # which is itself evidence for the context hypothesis
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(64)
    docs.count()

    out = {}
    for name, job in legs(docs).items():
        job()
        t0 = time.perf_counter()
        job()
        out[f"{name}_isolated"] = round(time.perf_counter() - t0, 3)

    # replay a bench-prefix-like workload: several cached frames +
    # executed heavy plans (quality, gopher, a second amplified cache)
    extra = docs.select("doc_id", F.reverse("text").alias("text")).cache()
    extra.count()
    quality_features(docs, "doc_id", "text").agg(
        F.sum("quality_score")).collect()
    gopher_rules(docs, "doc_id", "text").agg(
        F.sum(F.col("keep").cast("long"))).collect()
    quality_features(extra, "doc_id", "text").agg(
        F.sum("quality_score")).collect()

    for name, job in legs(docs).items():
        t0 = time.perf_counter()
        job()
        out[f"{name}_after_prefix"] = round(time.perf_counter() - t0, 3)

    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
