"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k — the query set is collected (it is
small by construction) and becomes a dense numpy matrix captured in an
Arrow-batched pandas UDF: each executor batch computes ONE BLAS matmul
``(batch × dim) @ (dim × n_queries)`` and a per-query window ranks the
scores.  Scale paths: random-hyperplane LSH bucketing — only same-bucket
candidates are scored, with multi-probe (flipping the weakest bit) to
recover recall — and IVF (inverted file): vectors bucket by nearest
coarse centroid and queries probe their ``nprobe`` nearest cells.
Hyperplanes are seed-deterministic; IVF centroids are md5-order-seeded
(engine-portable, SQL-oracle-reproducible) with optional Lloyd
refinement.

Expression strategy (A/B-measured on this box):
* higher-order ``F.aggregate`` folds are CodegenFallback — interpreted
  per row, ~16 folds/row for IVF assignment;
* unrolling the literal dots into ``v[0]*c0 + ...`` Column chains is
  worse end-to-end: a 64-dim × 16-centroid projection is ~3000
  expression nodes and costs ~12s of driver-side analysis per plan
  (measured), dwarfing execution;
* a pandas UDF with the constant matrix captured once is both: a
  single plan node, and vectorized C execution (one matmul per Arrow
  batch).  This is exactly the "vectorized Arrow UDF, no per-row
  Python" shape the engine uses for its exact JSON path.

Determinism note: numpy sums in SIMD/pairwise order, so cosines can
differ from a sequential fold in the last ulp.  Outputs expose ranks
(ordering), not raw floats; an ordering flip needs two distinct
neighbors within ~1e-16 cosine of each other — not observed across the
oracle gate's corpora (the DuckDB oracle recomputes with its own fold
order and matches row-for-row).
"""

from __future__ import annotations


import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    """Column-column dot product (HOF fold) — for callers whose both
    sides are data columns (e.g. pair scoring after a self-join)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _batch_matrix(series: pd.Series, dim: int) -> np.ndarray:
    """Arrow batch of array<double> -> dense (n, dim) float64 matrix.
    Ragged/NULL rows become NaN rows (cosine NaN, ranked last — the same
    fate a fold-based cosine hands them via NULL propagation)."""
    out = np.full((len(series), dim), np.nan, dtype=np.float64)
    for i, v in enumerate(series):
        if v is not None and len(v) == dim:
            out[i] = v
    return out


def _cosines_udf(queries):
    """pandas UDF: vector -> array of cosines against every query vector
    (one BLAS matmul per Arrow batch)."""
    Q = np.asarray([[float(x) for x in vec] for _, vec in queries],
                   dtype=np.float64)
    qnorms = np.sqrt((Q * Q).sum(axis=1))
    dim = Q.shape[1]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def cosines(v: pd.Series) -> pd.Series:
        M = _batch_matrix(v, dim)
        with np.errstate(invalid="ignore", divide="ignore"):
            S = (M @ Q.T) / (np.sqrt((M * M).sum(axis=1))[:, None] * qnorms)
        return pd.Series([row.tolist() for row in S])

    return cosines


def _query_id_at(queries, pos_col):
    """Literal qid lookup table indexed by query position."""
    return F.array(*[F.lit(qid) for qid, _ in queries])[pos_col]


def _cosine_for_query(queries, cos_arr_col, query_id_col):
    """Pick this row's query's cosine out of the all-queries array."""
    expr = None
    for i, (qid, _) in enumerate(queries):
        cond = query_id_col == F.lit(qid)
        expr = (F.when(cond, cos_arr_col[i]) if expr is None
                else expr.when(cond, cos_arr_col[i]))
    return expr


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple],
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each (query_id, query_vector).

    Returns ``query_id, neighbor_id, cosine, rank`` (rank 1 = nearest,
    ties broken by neighbor id for determinism; the query row itself is
    excluded when ids collide).
    """
    cosines = _cosines_udf(queries)
    scored = (
        df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
        .select("neighbor_id",
                F.posexplode(cosines(F.col("v"))).alias("pos", "cosine"))
        .withColumn("query_id", _query_id_at(queries, F.col("pos")))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seed-deterministic random hyperplanes (Box-Muller gaussians)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_column(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id of a vector under the given hyperplanes
    (pandas UDF: one matmul + sign-bit packing per Arrow batch)."""
    P = np.asarray(planes, dtype=np.float64)
    dim = P.shape[1]
    weights = np.asarray([1 << (len(planes) - 1 - j)
                          for j in range(len(planes))], dtype=np.int64)

    @F.pandas_udf(T.IntegerType())
    def bucket(v: pd.Series) -> pd.Series:
        M = _batch_matrix(v, dim)
        bits = (M @ P.T) > 0  # NaN projections compare False, like NULL>0
        return pd.Series((bits @ weights).astype("int32"))

    return bucket(vec_col)


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple],
    k: int = 5,
    *,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: int = 2,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket (plus
    ``multiprobe`` single-bit-flip neighbor buckets)."""
    dim = len(queries[0][1])
    planes = hyperplanes(dim, n_planes, seed)
    data = df.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    data = data.withColumn("bucket", lsh_bucket_column(F.col("v"), planes))

    def buckets_for(vec):
        base = 0
        projs = []
        for plane in planes:
            p = sum(x * y for x, y in zip(vec, plane))
            projs.append(p)
            base = base * 2 + (1 if p > 0 else 0)
        order = sorted(range(len(planes)), key=lambda i: abs(projs[i]))
        probes = [base]
        for i in order[:multiprobe]:
            probes.append(base ^ (1 << (len(planes) - 1 - i)))
        return probes

    # broadcast side carries only (query_id, bucket); query vectors live
    # in the scoring UDF's captured matrix
    query_structs = [
        F.struct(F.lit(qid).alias("query_id"), F.lit(bucket).alias("bucket"))
        for qid, vec in queries for bucket in buckets_for(vec)
    ]
    q = (
        df.sparkSession.range(1).select(
            F.explode(F.array(*query_structs)).alias("q")).select("q.*")
    )
    cosines = _cosines_udf(queries)
    candidates = data.join(F.broadcast(q), "bucket")
    scored = candidates.withColumn(
        "cosine",
        _cosine_for_query(queries, cosines(F.col("v")), F.col("query_id"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    *,
    iterations: int = 0,
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer for IVF: seed centroids are the
    ``n_centroids`` vectors with lexicographically-smallest
    ``md5(id)`` — the same engine-portable selection rule as the
    sampling/minhash md5 modes, so a SQL oracle reproduces it exactly.
    ``iterations`` Lloyd steps (element-wise mean of each cell, computed
    as Spark aggregations) refine recall; the default 0 is the
    oracle-portable mode.

    Returns ``[(cell_id, centroid_vector), ...]`` — small by
    construction (collected to the driver, broadcast into plans)."""
    seeded = (
        df.select(F.col(vec_col).cast("array<double>").alias("cv"),
                  F.md5(F.col(id_col).cast("string")).alias("__h__"))
        .orderBy("__h__").limit(n_centroids).collect())
    cents = [(i, list(r["cv"])) for i, r in enumerate(seeded)]
    for _ in range(iterations):
        assigned = df.select(
            F.col(vec_col).cast("array<double>").alias("v")
        ).withColumn("cell", ivf_cell_column(F.col("v"), cents))
        means = (assigned.select("cell", F.posexplode("v").alias("pos", "x"))
                 .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
                 .collect())
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents = [(cid, [by_cell[cid][p] for p in sorted(by_cell[cid])]
                  if cid in by_cell else vec)
                 for cid, vec in cents]
    return cents


def ivf_cell_column(vec_col, cents: list[tuple[int, list[float]]]):
    """Nearest-centroid cell id of a vector: argmax cosine, ties to the
    smaller cell id (centroids are ordered by cell id and ``argmax``
    returns the first maximum).  One matmul per Arrow batch; the
    row-norm factor is a positive per-row constant, so it cannot change
    the argmax and is skipped."""
    C = np.asarray([[float(x) for x in c] for _, c in cents],
                   dtype=np.float64)
    C = C / np.sqrt((C * C).sum(axis=1))[:, None]
    ids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    C, ids = C[order], ids[order]
    dim = C.shape[1]

    @F.pandas_udf(T.IntegerType())
    def cell(v: pd.Series) -> pd.Series:
        M = _batch_matrix(v, dim)
        S = np.nan_to_num(M @ C.T, nan=-np.inf)
        return pd.Series(ids[np.argmax(S, axis=1)].astype("int32"))

    return cell(vec_col)


def cosine_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple],
    k: int = 5,
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    iterations: int = 0,
) -> DataFrame:
    """IVF ANN top-k: vectors are bucketed by nearest coarse centroid
    (``ivf_centroids``), and each query scores only the vectors in its
    ``nprobe`` nearest cells.  Candidate count scales as
    ``nprobe/n_centroids`` of the corpus per query — the inverted-file
    alternative to the hyperplane-LSH path, with the same
    broadcast-join shape."""
    cents = ivf_centroids(df, id_col, vec_col, n_centroids,
                          iterations=iterations)
    data = df.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    data = data.withColumn("cell", ivf_cell_column(F.col("v"), cents))

    def probes_for(vec):
        vnorm = sum(x * x for x in vec) ** 0.5
        scored = []
        for cid, c in cents:
            cnorm = sum(x * x for x in c) ** 0.5
            cos = sum(x * y for x, y in zip(vec, c)) / (vnorm * cnorm)
            scored.append((-cos, cid))
        return [cid for _, cid in sorted(scored)[:nprobe]]

    query_structs = [
        F.struct(F.lit(qid).alias("query_id"), F.lit(cell).alias("cell"))
        for qid, vec in queries for cell in probes_for(vec)
    ]
    q = (df.sparkSession.range(1)
         .select(F.explode(F.array(*query_structs)).alias("q")).select("q.*"))
    cosines = _cosines_udf(queries)
    candidates = data.join(F.broadcast(q), "cell")
    scored = candidates.withColumn(
        "cosine",
        _cosine_for_query(queries, cosines(F.col("v")), F.col("query_id"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
