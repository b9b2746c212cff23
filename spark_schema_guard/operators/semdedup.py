"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, arXiv:2303.09540, the public LAION/web-text
recipe): cluster the corpus with k-means in embedding space, then
within every cluster drop all but one of each group of documents whose
pairwise cosine exceeds a threshold.  Near-duplicate *meaning* —
template rewrites, boilerplate paraphrases — is caught even when the
text differs too much for MinHash.

Spark shape, composed from already-hardened pieces:

* clustering = `similarity.ivf_centroids` (md5-seeded, deterministic,
  optional Lloyd refinement) + `ivf_cell_column` (argmax-cosine cell,
  one BLAS matmul per Arrow batch) — the corpus is never shuffled for
  this, the cell is a projection;
* candidate pairs = same-cell only (`max_cell` caps degenerate cells,
  mirroring the LSH bucket cap); the default `method="arrow"` computes
  each cell's Gram matrix with blocked BLAS matmuls via
  `applyInPandas`, `method="fold"` keeps the sequential JVM dot
  products whose cosines are bit-identical to a SQL engine's;
* group resolution = `dedup.connected_components` (adaptive
  driver/distributed) and the keep policy of `dedup.duplicate_clusters`
  / `cluster_representatives` (lowest id, or best `score_col`).

At 10^12 rows the quadratic term lives ONLY inside a cell: k-means
with enough centroids bounds cell sizes (SemDeDup uses ~10^5 clusters
at web scale), `max_cell` hard-caps the stragglers, and everything
else is one scan + one bounded self-join + the CC rounds on the tiny
near-dup edge list.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import duplicate_clusters, keep_canonical
from .similarity import (_batch_matrix, _valid_vectors, ivf_cell_column,
                         ivf_centroids)

# Density-adaptive cell count ("auto", round 5): target a CELL SIZE,
# not a cell count — in-cell pair work is then N * SEM_TARGET_CELL / 2,
# linear in the corpus, the SemDeDup paper's own scaling posture
# (fixed per-cluster budget; cross-cell near-dups are the accepted
# approximation).  Past SEM_MAX_CENTROIDS the centroid table would
# stop being driver-small, so cells grow instead (pair budget grows
# linearly from there — still far from quadratic).
SEM_TARGET_CELL = 1_000
SEM_MAX_CENTROIDS = 100_000


def _auto_sem_centroids(n: int) -> int:
    return max(2, min(SEM_MAX_CENTROIDS,
                      math.ceil(max(n, 1) / SEM_TARGET_CELL)))


def _resolve_centroids(df, id_col, vec_col, n_centroids, iterations, dim):
    """Shared ``n_centroids="auto"`` resolution: one narrow count of
    the non-NULL vectors, then ``ceil(n / SEM_TARGET_CELL)`` clamped to
    [2, SEM_MAX_CENTROIDS].  Pass an explicit int (or ``centroids``) to
    skip the count job."""
    if isinstance(n_centroids, str):
        if n_centroids != "auto":
            raise ValueError(
                f"n_centroids must be an int or 'auto'; got {n_centroids!r}")
        n_centroids = _auto_sem_centroids(
            df.where(F.col(vec_col).isNotNull()).count())
    return ivf_centroids(df, id_col, vec_col, n_centroids,
                         iterations=iterations, dim=dim)


def semantic_cells(df: DataFrame, id_col: str, vec_col: str, *,
                   n_centroids: int | str = "auto", iterations: int = 0,
                   dim: int | None = None, centroids=None) -> DataFrame:
    """``(id, cell)`` k-means cell assignment for every well-formed
    vector (NULL / mis-dimensioned embeddings get no row — they cannot
    be semantically compared).  Pass ``centroids`` (the
    ``ivf_centroids`` return shape) to reuse a trained quantizer.
    ``n_centroids="auto"`` (default since round 5) targets
    ``SEM_TARGET_CELL`` rows per cell — see ``_resolve_centroids``."""
    if centroids is None:
        centroids = _resolve_centroids(df, id_col, vec_col, n_centroids,
                                       iterations, dim)
    dim = len(centroids[0][1])
    data = _valid_vectors(df, id_col, vec_col, dim)
    return data.select(
        F.col("neighbor_id").alias(id_col),
        ivf_cell_column(F.col("v"), centroids).alias("cell"))


def _arrow_cell_pairs(base: DataFrame, threshold: float, dim: int,
                      id_type, *, block: int = 1024,
                      max_cell: int | None = None) -> DataFrame:
    """In-cell pair generation in ONE corpus pass: the base frame is
    hash-repartitioned on ``cell`` and sorted within partitions by
    ``(cell, id)``, then a STREAMING ``mapInPandas`` walks the sorted
    Arrow batches accumulating one cell at a time and emits each cell's
    Gram-matrix pairs (one BLAS matmul per ``block`` of rows).  Pairs
    are id_a < id_b (rows arrive id-sorted, so the strict upper
    triangle IS that order).  ~100× the fold path's throughput at
    64-dim.

    ``max_cell`` is enforced IN-STREAM and exactly (a cell lives wholly
    in one partition, so the streamed run length is its global size):
    once a cell's buffer passes the cap its rows are discarded and the
    rest of the run skipped — peak buffer memory is ``max_cell × dim``
    doubles.  The previous shape (groupBy-size + broadcast pre-join +
    ``applyInPandas``) recomputed the scan AND the cell-assignment
    matmul a second time for the size histogram and materialized whole
    cells per group; this one pays one scan, one shuffle, bounded
    memory (A/B at the family-scaling amplification, local[4]:
    9.9s -> 5.8s with the cap, and the cap is now free when unused)."""
    schema = T.StructType([
        T.StructField("id_a", id_type), T.StructField("id_b", id_type),
        T.StructField("cell", T.IntegerType()),
        T.StructField("cosine", T.DoubleType())])
    cap = float("inf") if max_cell is None else int(max_cell)

    def stream(batches):
        ids_buf: list = []
        v_buf: list = []
        nrm_buf: list = []
        cur = None
        skipping = False

        def flush():
            if not ids_buf:
                return None
            ids = np.concatenate(ids_buf)
            m = len(ids)
            if m < 2:
                return None
            M = np.vstack(v_buf)
            nrm = np.concatenate(nrm_buf)
            out = []
            for s in range(0, m, block):
                e = min(s + block, m)
                S = (M[s:e] @ M.T) / np.outer(nrm[s:e], nrm)
                rows, cols = np.nonzero(S >= threshold)  # NaN -> False
                keep = cols > rows + s                   # upper triangle
                rows, cols = rows[keep], cols[keep]
                if len(rows):
                    out.append(pd.DataFrame({
                        "id_a": ids[rows + s], "id_b": ids[cols],
                        "cell": int(cur), "cosine": S[rows, cols]}))
            return pd.concat(out) if out else None

        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            # contiguous runs of equal cell within the sorted batch
            bounds = [0] + list(np.nonzero(np.diff(cells))[0] + 1) \
                + [len(pdf)]
            emitted = []
            for s, e in zip(bounds, bounds[1:]):
                c = int(cells[s])
                if c != cur:
                    if cur is not None and not skipping:
                        got = flush()
                        if got is not None:
                            emitted.append(got)
                    ids_buf, v_buf, nrm_buf = [], [], []
                    cur, skipping = c, False
                if skipping:
                    continue
                if len(ids_buf) and sum(map(len, ids_buf)) + (e - s) > cap:
                    ids_buf, v_buf, nrm_buf = [], [], []
                    skipping = True
                    continue
                if e - s > cap:
                    skipping = True
                    continue
                chunk = pdf.iloc[s:e]
                ids_buf.append(chunk["id"].to_numpy())
                v_buf.append(_batch_matrix(chunk["v"], dim))
                nrm_buf.append(chunk["nrm"].to_numpy(dtype=np.float64))
            if emitted:
                yield pd.concat(emitted)
        if cur is not None and not skipping:
            got = flush()
            if got is not None:
                yield got

    shuffled = base.repartition("cell").sortWithinPartitions("cell", "id")
    return shuffled.mapInPandas(stream, schema)


def semantic_near_dups(df: DataFrame, id_col: str, vec_col: str, *,
                       threshold: float = 0.95,
                       n_centroids: int | str = "auto",
                       iterations: int = 0, max_cell: int | None = None,
                       dim: int | None = None, centroids=None,
                       method: str = "arrow") -> DataFrame:
    """Within-cell cosine near-duplicate pairs: ``id_a, id_b, cell,
    cosine`` with ``id_a < id_b`` and ``cosine >= threshold``.

    Only same-cell pairs are compared — the SemDeDup approximation
    (cross-cell near-dups are missed by construction; more centroids =
    finer cells = cheaper join but more misses).  ``max_cell`` drops
    cells larger than the bound before the self-join, the same safety
    valve as the LSH bucket caps.

    ``method``: ``"arrow"`` (default) computes each cell's Gram matrix
    with blocked BLAS matmuls — the throughput path; its cosines carry
    normal float reassociation noise (~1 ulp), so PAIR MEMBERSHIP is
    stable for any threshold not within ~1e-12 of a real cosine.
    ``"fold"`` computes sequential left-to-right dot products in the
    JVM — bit-identical to a SQL engine's ``list_dot_product``, the
    mode an exactness oracle replays — at ~100× the cost per pair."""
    if method not in ("arrow", "fold"):
        raise ValueError(f"method must be 'arrow' or 'fold', got {method!r}")
    if centroids is None:
        centroids = _resolve_centroids(df, id_col, vec_col, n_centroids,
                                       iterations, dim)
    dim = len(centroids[0][1])
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
    base = (_valid_vectors(df, id_col, vec_col, dim)
            .select(F.col("neighbor_id").alias("id"), "v",
                    ivf_cell_column(F.col("v"), centroids).alias("cell"),
                    norm.alias("nrm"))
            .where(F.col("cell").isNotNull()))
    if method == "arrow":
        # the cap is enforced in-stream inside the pair stage — exact
        # (a cell is partition-local after the repartition) and FREE:
        # the old broadcast pre-join paid a second scan + cell-matmul
        # pass just to build the size histogram
        return _arrow_cell_pairs(base, threshold, dim,
                                 df.schema[id_col].dataType,
                                 max_cell=max_cell)
    if max_cell is not None:
        sizes = base.groupBy("cell").agg(F.count(F.lit(1)).alias("__cn"))
        base = base.join(
            F.broadcast(sizes.where(F.col("__cn") <= max_cell)
                        .select("cell")), "cell")
    a = base.select("cell", F.col("id").alias("id_a"),
                    F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = base.select("cell", F.col("id").alias("id_b"),
                    F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, "cell")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cell", "cosine"))


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str, *,
                   threshold: float = 0.95,
                   n_centroids: int | str = "auto",
                   iterations: int = 0, max_cell: int | None = None,
                   dim: int | None = None, method: str = "arrow",
                   max_iter: int = 25,
                   driver_max_edges: int = 2_000_000) -> DataFrame:
    """Per-document SemDeDup verdicts: every input row gains
    ``cluster_id`` (MIN id over its semantic near-dup group; singletons
    are their own cluster) and ``is_canonical`` (the one kept copy per
    group — keep-lowest-id; for a quality-aware keep run
    :func:`semantic_near_dups` + ``dedup.keep_canonical`` with a
    ``score_col``)."""
    edges = semantic_near_dups(
        df, id_col, vec_col, threshold=threshold, n_centroids=n_centroids,
        iterations=iterations, max_cell=max_cell, dim=dim, method=method)
    return duplicate_clusters(df, id_col, edges, max_iter=max_iter,
                              driver_max_edges=driver_max_edges)


def semantic_keep_best(df: DataFrame, id_col: str, vec_col: str,
                       score_col: str, *, threshold: float = 0.95,
                       n_centroids: int | str = "auto", iterations: int = 0,
                       max_cell: int | None = None,
                       dim: int | None = None, method: str = "arrow",
                       max_iter: int = 25,
                       driver_max_edges: int = 2_000_000) -> DataFrame:
    """The corpus minus semantic near-duplicates, keeping the
    highest-``score_col`` member of every group (ties to lowest id) —
    the RefinedWeb-style quality-aware keep applied to SemDeDup
    groups."""
    members = semantic_dedup(
        df, id_col, vec_col, threshold=threshold, n_centroids=n_centroids,
        iterations=iterations, max_cell=max_cell, dim=dim, method=method,
        max_iter=max_iter, driver_max_edges=driver_max_edges
    ).select(id_col, "cluster_id", score_col)
    return keep_canonical(df, members.where(F.col("cluster_id").isNotNull()),
                          id_col, score_col=score_col)


__all__ = ["semantic_cells", "semantic_near_dups", "semantic_dedup",
           "semantic_keep_best"]
