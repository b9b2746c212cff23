"""Unit tests for SemDeDup semantic dedup (operators/semdedup.py):
within-cell-only pairing, threshold semantics, clone collapse,
max_cell capping, malformed-vector handling, and the quality-aware
keep policy.
"""

import pytest
from pyspark.sql import functions as F

from spark_schema_guard.operators.semdedup import (
    semantic_cells, semantic_dedup, semantic_keep_best, semantic_near_dups)

# two well-separated directions in 4-d, plus scaled clones:
#  group X: ids 1, 2 (cosine 1.0 — clone), 3 (cosine ~0.995)
#  group Y: ids 10, 11 (cosine 1.0 — clone)
#  loner:   id 20 (orthogonal-ish to both)
ROWS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [2.0, 0.0, 0.0, 0.0]),
    (3, [1.0, 0.1, 0.0, 0.0]),
    (10, [0.0, 0.0, 1.0, 1.0]),
    (11, [0.0, 0.0, 0.5, 0.5]),
    (20, [0.0, 1.0, 0.0, -1.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(ROWS, "vec_id long, v array<double>")


def test_near_dups_within_cells(emb):
    pairs = {(r["id_a"], r["id_b"])
             for r in semantic_near_dups(emb, "vec_id", "v",
                                         threshold=0.95,
                                         n_centroids=3).collect()}
    # clones + the 0.995 neighbor group; never across groups
    assert (1, 2) in pairs and (10, 11) in pairs
    assert all(not ({a, b} & {1, 2, 3} and {a, b} & {10, 11, 20})
               for a, b in pairs)


def test_dedup_clusters_and_canonicals(emb):
    out = {r["vec_id"]: (r["cluster_id"], r["is_canonical"])
           for r in semantic_dedup(emb, "vec_id", "v", threshold=0.95,
                                   n_centroids=3).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)   # 0.995 > threshold, same cell as 1,2
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    assert out[20] == (20, True)  # loner survives as its own cluster


def test_threshold_is_exclusive_boundary(emb):
    # at threshold above the 1-vs-3 cosine (~0.99504) the clone pairs
    # survive but 3 drops out of the group
    out = {r["vec_id"]: r["is_canonical"]
           for r in semantic_dedup(emb, "vec_id", "v", threshold=0.999,
                                   n_centroids=3).collect()}
    assert out[3] is True and out[2] is False and out[11] is False


def test_malformed_vectors_are_singletons(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, None), (4, [1.0, 0.0, 9.9])],
        "vec_id long, v array<double>")
    # dim=2 keeps the ragged id-4 vector from seeding a 3-wide centroid
    # and silently redefining the space (md5('4') sorts first here)
    out = {r["vec_id"]: (r["cluster_id"], r["is_canonical"])
           for r in semantic_dedup(df, "vec_id", "v", threshold=0.9,
                                   n_centroids=1, dim=2).collect()}
    # NULL and wrong-dim rows never pair but still come back as rows
    assert out == {1: (1, True), 2: (1, False), 3: (3, True), 4: (4, True)}


def test_centroid_seeding_skips_null_and_ragged(spark):
    from spark_schema_guard.operators.similarity import ivf_centroids
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, None), (4, [1.0, 0.0, 9.9])],
        "vec_id long, v array<double>")
    # NULL never seeds even without dim; with dim the ragged one is out
    assert all(c is not None for _, c in ivf_centroids(df, "vec_id", "v", 3))
    cents = ivf_centroids(df, "vec_id", "v", 3, dim=2)
    assert [c for _, c in cents] == [[1.0, 0.0]]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ivf_centroids(df.where("vec_id = 3"), "vec_id", "v", 2)


def test_max_cell_caps_degenerate_cells(emb):
    # with ONE centroid every vector lands in cell 0 (size 6);
    # max_cell=5 drops the whole cell -> no pairs at all
    assert semantic_near_dups(emb, "vec_id", "v", threshold=0.95,
                              n_centroids=1, max_cell=5).count() == 0
    assert semantic_near_dups(emb, "vec_id", "v", threshold=0.95,
                              n_centroids=1, max_cell=6).count() > 0


def test_arrow_stream_survives_tiny_batches(spark):
    """The streaming pair stage must accumulate a cell ACROSS Arrow
    batch boundaries (and still enforce max_cell exactly) — forced by
    shrinking maxRecordsPerBatch below the cell sizes."""
    import numpy as np

    from spark_schema_guard.operators.dedup import embedding_near_dups

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        got = {(r["id_a"], r["id_b"]) for r in semantic_near_dups(
            df, "vec_id", "v", threshold=0.5, n_centroids=1).collect()}
        # single cell of 80 > cap 79 -> everything dropped, exactly
        assert semantic_near_dups(df, "vec_id", "v", threshold=0.5,
                                  n_centroids=1, max_cell=79).count() == 0
        assert semantic_near_dups(df, "vec_id", "v", threshold=0.5,
                                  n_centroids=1, max_cell=80).count() \
            == len(got)
    finally:
        spark.conf.set(key, old)
    want = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(
        df, "vec_id", "v", threshold=0.5, exact=True).collect()}
    assert got == want and len(got) > 0


def test_keep_best_prefers_score_then_low_id(emb):
    scored = emb.withColumn(
        "score", F.when(F.col("vec_id") == 2, 100.0).otherwise(1.0))
    kept = {r["vec_id"] for r in semantic_keep_best(
        scored, "vec_id", "v", "score", threshold=0.95,
        n_centroids=3).collect()}
    # group X keeps 2 (highest score), group Y keeps 10 (tie -> low id)
    assert kept == {2, 10, 20}


def test_cells_cover_all_valid_vectors(emb):
    cells = semantic_cells(emb, "vec_id", "v", n_centroids=3)
    assert cells.count() == len(ROWS)
    assert cells.where(F.col("cell").isNull()).count() == 0


def test_arrow_and_fold_methods_agree(emb):
    import pytest as _pytest
    a = {(r["id_a"], r["id_b"]): r["cosine"]
         for r in semantic_near_dups(emb, "vec_id", "v", threshold=0.95,
                                     n_centroids=3).collect()}
    f = {(r["id_a"], r["id_b"]): r["cosine"]
         for r in semantic_near_dups(emb, "vec_id", "v", threshold=0.95,
                                     n_centroids=3,
                                     method="fold").collect()}
    assert a.keys() == f.keys()
    for k in a:
        assert a[k] == _pytest.approx(f[k], abs=1e-12)
    with _pytest.raises(ValueError):
        semantic_near_dups(emb, "vec_id", "v", method="nope")


def test_reused_centroids_give_same_answer(emb):
    from spark_schema_guard.operators.similarity import ivf_centroids
    cents = ivf_centroids(emb, "vec_id", "v", 3)
    a = sorted((r["id_a"], r["id_b"]) for r in semantic_near_dups(
        emb, "vec_id", "v", threshold=0.95, centroids=cents).collect())
    b = sorted((r["id_a"], r["id_b"]) for r in semantic_near_dups(
        emb, "vec_id", "v", threshold=0.95, n_centroids=3).collect())
    assert a == b


def test_verify_jaccard_containment(spark):
    # doc 2's shingle set is a strict subset of doc 1's -> containment_b
    # is 1.0 while jaccard is well below it (the partial-dup signature)
    from spark_schema_guard.operators.dedup import verify_jaccard
    docs = spark.createDataFrame(
        [(1, "abcdefghij" * 4), (2, "abcdefghij")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = verify_jaccard(docs, "doc_id", "text", pairs, shingle_k=8,
                         containment=True).first()
    assert row["containment_b"] == 1.0
    assert row["containment_a"] < 1.0
    assert row["jaccard"] == row["containment_a"]  # A∪B = A here
    # default output keeps the legacy 3-column shape
    cols = verify_jaccard(docs, "doc_id", "text", pairs,
                          shingle_k=8).columns
    assert cols == ["id_a", "id_b", "jaccard"]


def test_single_cell_equals_exact_near_dups(spark):
    # n_centroids=1 (one cell = all pairs, arrow path) must agree with
    # dedup.embedding_near_dups(exact=True) (crossJoin, JVM fold path)
    # on pair membership — two independent implementations of the same
    # math
    from spark_schema_guard.operators.dedup import embedding_near_dups
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .where("vec_id < 120"))
    a = {(r["id_a"], r["id_b"]) for r in semantic_near_dups(
        emb, "vec_id", "embedding", threshold=0.3, n_centroids=1).collect()}
    b = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.3, exact=True).collect()}
    assert a == b and len(a) > 0
