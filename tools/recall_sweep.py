"""Recall@k of the approximate ANN paths vs the brute-force oracle.

The LSH/IVF operators are exactly-oracled as DETERMINISTIC algorithms
(the driver gate reproduces their candidate generation cell-for-cell),
which pins correctness — but a user choosing ``n_planes``/``multiprobe``
or ``n_centroids``/``nprobe`` needs the measured recall curve.  This
tool sweeps both grids against :func:`cosine_topk` ground truth on the
``embeddings`` table and rewrites the recall section of SCALE.md.

The sweep runs at TWO corpus scales — the base table and a 10x
deterministic amplification (each copy is ``normalize(a*x + b*noise)``
with seed-fixed noise, cosine ~0.5 to its base: the same
local-neighborhood flavor as the synthetic table, 10x denser) — so the
recommendation is confirmed at a vector count an order of magnitude
past where it was first measured.

Usage:
    python tools/recall_sweep.py [sf_dir] [--write]

Defaults: ``$SPARK_GRAFT_SF_DIR`` or /root/testdata/sf0.1; ``--write``
replaces the marked section in SCALE.md (otherwise prints only).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_schema_guard.operators.similarity import (  # noqa: E402
    cosine_topk, cosine_topk_ivf, cosine_topk_lsh)
from spark_schema_guard.session import build_session, load_table  # noqa: E402

K = 5
N_QUERIES = 20
SCALES = (1, 10)
START = "<!-- recall-sweep:start -->"
END = "<!-- recall-sweep:end -->"


def amplify_embeddings(spark, emb, copies: int):
    """``copies``x the embedding table, driver-built (20k x 64 floats is
    ~5 MB — far under any driver bound): copy ``c`` of vector ``x`` is
    ``normalize(0.5*x + 0.75*g_c)`` with ``g_c`` seed-fixed standard
    normals — cosine ~0.5 to its base, preserving the base table's
    local-neighborhood structure at ``copies``x the density."""
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.asarray([[float(x) for x in r["embedding"]] for r in rows],
                   dtype=np.float64)
    span = int(ids.max()) + 1
    out_ids, out_vecs = [ids], [M]
    for c in range(1, copies):
        g = np.random.RandomState(1000 + c).standard_normal(M.shape)
        V = 0.5 * M + 0.75 * g
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        out_ids.append(ids + c * span)
        out_vecs.append(V)
    all_ids = np.concatenate(out_ids)
    all_vecs = np.concatenate(out_vecs)
    data = [(int(i), [float(x) for x in v])
            for i, v in zip(all_ids, all_vecs)]
    return spark.createDataFrame(
        data, "vec_id long, embedding array<float>").repartition(16)


def _truth_sets(frame) -> dict:
    out: dict = {}
    for r in frame.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall_at_k(approx, truth: dict) -> float:
    got = _truth_sets(approx)
    shares = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    return sum(shares) / len(shares)


def run_grids(emb, queries, truth):
    lsh_rows = []
    for n_planes, multiprobe, n_tables in (
            (4, 1, 1), (4, 2, 1), (4, 4, 1),
            (6, 1, 1), (6, 2, 1), (6, 4, 1),
            (8, 1, 1), (8, 2, 1), (8, 4, 1),
            (6, 2, 2), (6, 2, 4), (6, 2, 8)):
        r = recall_at_k(
            cosine_topk_lsh(emb, "vec_id", "embedding", queries, k=K,
                            n_planes=n_planes, multiprobe=multiprobe,
                            n_tables=n_tables),
            truth)
        frac = n_tables * (1 + multiprobe) / 2 ** n_planes
        lsh_rows.append((n_planes, multiprobe, n_tables, r, frac))
        print(f"lsh planes={n_planes} multiprobe={multiprobe} "
              f"tables={n_tables} recall@{K}={r:.3f} scanned~{frac:.1%}")

    # the density-adaptive defaults (round 5): what a caller passing no
    # tuning parameters actually gets at this corpus size
    from spark_schema_guard.operators.similarity import (
        LSH_AUTO_TABLES, _auto_n_centroids, _auto_n_planes)
    n = emb.count()
    ap, at = _auto_n_planes(n), LSH_AUTO_TABLES
    r = recall_at_k(
        cosine_topk_lsh(emb, "vec_id", "embedding", queries, k=K), truth)
    frac = at * 3 / 2 ** ap
    lsh_rows.append((f"auto={ap}", 2, at, r, frac))
    print(f"lsh AUTO (planes={ap} tables={at}) recall@{K}={r:.3f} "
          f"scanned~{frac:.1%}")

    ivf_rows = []
    for n_centroids in (8, 16, 32):
        for nprobe in (1, 2, 4):
            r = recall_at_k(
                cosine_topk_ivf(emb, "vec_id", "embedding", queries, k=K,
                                n_centroids=n_centroids, nprobe=nprobe),
                truth)
            frac = nprobe / n_centroids
            ivf_rows.append((n_centroids, nprobe, r, frac))
            print(f"ivf centroids={n_centroids} nprobe={nprobe} "
                  f"recall@{K}={r:.3f} scanned~{frac:.1%}")
    ac = _auto_n_centroids(n)
    r = recall_at_k(
        cosine_topk_ivf(emb, "vec_id", "embedding", queries, k=K), truth)
    frac = 4 / ac
    ivf_rows.append((f"auto={ac}", 4, r, frac))
    print(f"ivf AUTO (centroids={ac}) recall@{K}={r:.3f} "
          f"scanned~{frac:.1%}")
    return lsh_rows, ivf_rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    write = "--write" in sys.argv

    spark = build_session(app_name="recall-sweep", cores=16,
                          shuffle_partitions=16)
    base = load_table(spark, sf_dir, "embeddings")

    lines = [
        START,
        "### Measured recall@5 of the approximate ANN paths",
        "",
        f"`tools/recall_sweep.py` on `{sf_dir}` embeddings vs the brute "
        f"`cosine_topk` oracle ({N_QUERIES} md5-picked queries per "
        "scale).  'scanned' is the expected corpus fraction each query "
        "scores (the speed side of the tradeoff).  The 10x corpus is a "
        "deterministic amplification (each copy `normalize(0.5x + "
        "0.75*seeded noise)`, cosine ~0.5 to its base) — same "
        "local-neighborhood structure, 10x the density.",
    ]
    for scale in SCALES:
        emb = (base if scale == 1
               else amplify_embeddings(spark, base, scale)).cache()
        n_rows = emb.count()
        print(f"--- scale {scale}x: {n_rows} vectors ---")
        # deterministic query picks: md5-smallest vec_ids (the engine's
        # portable selection rule)
        qrows = (emb.select(
            "vec_id", "embedding",
            F.md5(F.col("vec_id").cast("string")).alias("h"))
            .orderBy("h").limit(N_QUERIES).collect())
        queries = [(r["vec_id"], [float(x) for x in r["embedding"]])
                   for r in qrows]
        truth = _truth_sets(cosine_topk(emb, "vec_id", "embedding",
                                        queries, k=K))
        lsh_rows, ivf_rows = run_grids(emb, queries, truth)
        lines += [
            "",
            f"**Corpus scale {scale}x ({n_rows} vectors):**",
            "",
            "| LSH n_planes | multiprobe | n_tables | recall@5 "
            "| ~scanned |",
            "|---|---|---|---|---|",
        ]
        for n_planes, multiprobe, n_tables, r, frac in lsh_rows:
            mark = (" **(old fixed default)**"
                    if (n_planes, multiprobe, n_tables) == (6, 2, 1)
                    else (" **(auto default)**"
                          if isinstance(n_planes, str) else ""))
            lines.append(f"| {n_planes} | {multiprobe} | {n_tables} "
                         f"| {r:.3f}{mark} | {frac:.1%} |")
        lines += [
            "",
            "| IVF n_centroids | nprobe | recall@5 | ~scanned |",
            "|---|---|---|---|",
        ]
        for n_centroids, nprobe, r, frac in ivf_rows:
            mark = (" **(old fixed default)**"
                    if (n_centroids, nprobe) == (16, 4) else
                    (" **(auto default)**"
                     if isinstance(n_centroids, str) else ""))
            lines.append(f"| {n_centroids} | {nprobe} | {r:.3f}{mark} "
                         f"| {frac:.1%} |")
        if scale != 1:
            emb.unpersist()
    lines += [
        "",
        "Reading the grids: recall tracks the scanned fraction, and on "
        "these synthetic embeddings IVF dominates at BOTH scales — its "
        "cells follow the data where sign-LSH buckets cut it blindly, "
        "so **IVF is the recommended scale path**.  For LSH, `n_tables` "
        "is the recall lever: 4 independent tables at 6/2 reach what "
        "one table needs ~10x the scan for (classic 1-(1-r)^L "
        "compounding).  The **auto defaults** (round 5) target a bucket/"
        "cell SIZE instead of a fixed count — n_planes = "
        "clamp(ceil(log2(n/512)), 4, 16) with 4 tables, IVF n_centroids "
        "= clamp(round(sqrt(n)), 8, 65536) — so an untuned caller holds "
        "recall as density grows instead of the old fixed default's "
        "~0.2.  `tests/test_round3_fixes.py` pins recall@5 floors at "
        "1x and `tests/test_round5_fixes.py` pins the auto defaults at "
        "10x density (LSH >= 0.5, IVF >= 0.8) so neither a refactor "
        "nor density can silently degrade them.",
        END,
    ]
    block = "\n".join(lines)
    print()
    print(block)
    if write:
        path = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "SCALE.md")
        text = open(path).read()
        if START in text:
            head = text.split(START)[0]
            tail = text.split(END)[1]
            text = head + block + tail
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
        open(path, "w").write(text)
        print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
