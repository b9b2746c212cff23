"""Pins for the round-3 VERDICT tasks and ADVICE-r02 findings."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- VERDICT #1 / ADVICE #4: ANN rank stage + degenerate vectors ------------


def _toy_vectors(spark):
    """12 well-formed 4-dim vectors + a NULL, a ragged, and a NaN row."""
    rows = []
    for i in range(12):
        rows.append((i, [1.0 + i * 0.01, 0.5, -0.25, float(i % 3)]))
    rows.append((100, None))
    rows.append((101, [1.0]))
    rows.append((102, [float("nan"), 1.0, 1.0, 1.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_brute_drops_malformed_vectors(spark):
    from spark_schema_guard.operators.similarity import cosine_topk

    df = _toy_vectors(spark)
    queries = [(0, [1.0, 0.5, -0.25, 0.0])]
    out = cosine_topk(df, "vec_id", "embedding", queries, k=20).collect()
    ids = {r["neighbor_id"] for r in out}
    assert ids == set(range(1, 12))  # self + malformed rows excluded
    assert all(r["cosine"] is not None for r in out)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, 12))


def test_lsh_and_ivf_bucket_columns_null_for_malformed(spark):
    from spark_schema_guard.operators.similarity import (
        hyperplanes, ivf_cell_column, lsh_bucket_column)

    df = _toy_vectors(spark)
    planes = hyperplanes(4, 3, seed=7)
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    got = df.select(
        "vec_id",
        lsh_bucket_column(F.col("embedding"), planes).alias("bucket"),
        ivf_cell_column(F.col("embedding"), cents).alias("cell"),
    ).collect()
    by_id = {r["vec_id"]: r for r in got}
    for bad in (100, 101, 102):
        assert by_id[bad]["bucket"] is None, bad
        assert by_id[bad]["cell"] is None, bad
    for ok in range(12):
        assert by_id[ok]["bucket"] is not None
        assert by_id[ok]["cell"] is not None


def test_lsh_max_bucket_drops_degenerate_bucket(spark):
    from spark_schema_guard.operators.similarity import cosine_topk_lsh

    # 30 near-identical vectors pile into one degenerate bucket; 3 live
    # in the opposite bucket.  With the cap the big bucket vanishes.
    rows = [(i, [1.0, 0.001 * i]) for i in range(30)]
    rows += [(200 + i, [-1.0, -0.001 * i]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(0, [1.0, 0.0])]

    uncapped = cosine_topk_lsh(df, "vec_id", "embedding", queries, k=5,
                               n_planes=2, multiprobe=0).collect()
    assert {r["neighbor_id"] for r in uncapped} <= set(range(30))
    assert len(uncapped) == 5

    capped = cosine_topk_lsh(df, "vec_id", "embedding", queries, k=5,
                             n_planes=2, multiprobe=0,
                             max_bucket=10).collect()
    assert capped == []  # the query's own bucket was degenerate -> dropped


def test_ann_two_stage_matches_single_partition_answer(spark):
    """Exactness of the per-partition prune: repartitioning the input
    must never change the top-k answer (any global winner is a local
    winner in its own partition)."""
    from spark_schema_guard.operators.similarity import cosine_topk

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(1, rows[1][1]), (2, rows[2][1])]

    one = cosine_topk(df.coalesce(1), "vec_id", "embedding", queries, k=7)
    many = cosine_topk(df.repartition(13), "vec_id", "embedding", queries, k=7)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(((r["query_id"], r["rank"], r["neighbor_id"])
                   for r in one.collect())) == \
           sorted(((r["query_id"], r["rank"], r["neighbor_id"])
                   for r in many.collect()))
