"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k — the query set is collected (it is
small by construction) and broadcast as literal arrays, so the scan side
streams once with a JVM ``zip_with``/``aggregate`` dot product and a
per-query window rank.  Scale paths: random-hyperplane LSH bucketing — only
same-bucket candidates are scored, with multi-probe (flipping the weakest
bit) to recover recall — and IVF (inverted file): vectors bucket by
nearest coarse centroid and queries probe their ``nprobe`` nearest
cells.  Hyperplanes are seed-deterministic; IVF centroids are
md5-order-seeded (engine-portable, SQL-oracle-reproducible) with
optional Lloyd refinement.
"""

from __future__ import annotations


import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


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
    query_structs = [
        F.struct(F.lit(qid).alias("query_id"),
                 F.array(*[F.lit(float(x)) for x in vec]).alias("qv"))
        for qid, vec in queries
    ]
    q = F.explode(F.array(*query_structs)).alias("q")
    exploded = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"), q
    ).select("neighbor_id", "v", "q.query_id", "q.qv")
    scored = exploded.withColumn(
        "cosine",
        _dot(F.col("v").cast("array<double>"), F.col("qv"))
        / (_norm(F.col("v").cast("array<double>")) * _norm(F.col("qv"))),
    ).where(F.col("query_id") != F.col("neighbor_id"))
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
    """Sign-pattern bucket id of a vector under the given hyperplanes."""
    bucket = F.lit(0)
    for plane in planes:
        proj = F.aggregate(
            F.zip_with(vec_col,
                       F.array(*[F.lit(p) for p in plane]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket * 2 + (proj > 0).cast("int")
    return bucket


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

    query_structs = []
    for qid, vec in queries:
        for bucket in buckets_for(vec):
            query_structs.append(F.struct(
                F.lit(qid).alias("query_id"),
                F.lit(bucket).alias("bucket"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("qv")))
    q = (
        df.sparkSession.range(1).select(
            F.explode(F.array(*query_structs)).alias("q")).select("q.*")
    )
    candidates = data.join(F.broadcast(q), "bucket")
    scored = candidates.withColumn(
        "cosine", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
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
    """Nearest-centroid cell id of a vector (argmax cosine; ties break
    to the smaller cell id — ``array_min`` over (−cosine, cell)
    structs, all JVM-side)."""
    entries = []
    for cid, c in cents:
        cnorm = sum(x * x for x in c) ** 0.5
        cos = _dot(vec_col, F.array(*[F.lit(float(x)) for x in c])) / (
            _norm(vec_col) * F.lit(float(cnorm)))
        entries.append(F.struct((-cos).alias("negcos"),
                                F.lit(cid).alias("cell")))
    return F.array_min(F.array(*entries)).getField("cell")


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

    query_structs = []
    for qid, vec in queries:
        for cell in probes_for(vec):
            query_structs.append(F.struct(
                F.lit(qid).alias("query_id"),
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("qv")))
    q = (df.sparkSession.range(1)
         .select(F.explode(F.array(*query_structs)).alias("q")).select("q.*"))
    candidates = data.join(F.broadcast(q), "cell")
    scored = candidates.withColumn(
        "cosine",
        _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
