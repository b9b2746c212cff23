"""Pair recall of SemDeDup's cell approximation vs exact all-pairs.

`semantic_near_dups` only compares SAME-CELL pairs — the SemDeDup
approximation: more centroids = cheaper join (expected pair volume
N²/2C) but more cross-cell misses.  The operator is exactly oracled,
which pins correctness of what it computes; this tool measures WHAT
FRACTION of the true near-dup pairs the cell blocking retains, per
`n_centroids`, so a user can place the cost/recall knob.

Ground truth = the same operator at ``n_centroids=1`` (one cell =
exact all-pairs, computed with the blocked-BLAS arrow path, so the
truth run is cheap too).

The sweep runs at TWO corpus scales — the base table and a 10x
deterministic amplification (recall_sweep's construction) — so the
decay curve is confirmed an order of magnitude past where it was
first measured.

Usage:
    python tools/semdedup_recall.py [sf_dir] [--write]

``--write`` replaces the marked section in SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from recall_sweep import amplify_embeddings  # noqa: E402

from spark_schema_guard.operators.semdedup import (_auto_sem_centroids,  # noqa: E402
                                                   semantic_near_dups)
from spark_schema_guard.session import build_session, load_table  # noqa: E402

START = "<!-- semdedup-recall:start -->"
END = "<!-- semdedup-recall:end -->"
GRID = (2, 4, 8, 16, 32)
SCALES = (1, 10)
CLUSTER_SIZES = (2000, 20000)


def clustered_embeddings(spark, n: int, *, dim: int = 64,
                         n_clusters: int = 50, sigma: float = 0.08,
                         seed: int = 7):
    """A CLUSTERED synthetic corpus — the regime real document
    embeddings live in (topical clusters), where SemDeDup's guidance
    says cell blocking decays gently: vector i = normalize(centroid of
    cluster i%C + sigma*noise), so near-dup pairs overwhelmingly share
    a cluster and k-means cells track the clusters.  sigma counts PER
    DIMENSION: total noise norm is sigma*sqrt(dim), so 0.08 at 64 dims
    gives ~0.64 noise vs the unit centroid (in-cluster cosine ~0.7,
    cross-cluster ~0.05) — crisp topics.  (0.35 would give noise norm
    2.8: effectively a diffuse corpus, measured as such.)"""
    rng = np.random.RandomState(seed)
    C = rng.standard_normal((n_clusters, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    V = C[np.arange(n) % n_clusters] + sigma * rng.standard_normal((n, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    data = [(int(i), [float(x) for x in v]) for i, v in enumerate(V)]
    return spark.createDataFrame(
        data, "vec_id long, embedding array<float>").repartition(16)


def _pairs(frame) -> set:
    return {(r["id_a"], r["id_b"]) for r in frame.collect()}


def run_scale(spark, base, scale: int, emb=None,
              thresholds=(0.4, 0.35, 0.3, 0.25, 0.2)):
    if emb is None:
        emb = (base if scale == 1
               else amplify_embeddings(spark, base, scale))
    emb = emb.cache()
    n_rows = emb.count()

    # pick the highest threshold that still yields a meaningful truth
    # set on this synthetic corpus (its cosines are diffuse by design)
    truth: set = set()
    threshold = None
    for t in thresholds:
        truth = _pairs(semantic_near_dups(
            emb, "vec_id", "embedding", threshold=t, n_centroids=1))
        if len(truth) >= 200:
            threshold = t
            break
        threshold = t
    print(f"truth: {len(truth)} pairs at cosine >= {threshold} "
          f"({n_rows} vectors)")

    rows = []
    auto_c = _auto_sem_centroids(n_rows)
    for c in list(GRID) + [auto_c]:
        is_auto = c == auto_c
        got = _pairs(semantic_near_dups(
            emb, "vec_id", "embedding", threshold=threshold,
            n_centroids=c))
        missed = truth - got
        recall = len(got & truth) / len(truth) if truth else 1.0
        assert not (got - truth), "cell pairs must be a subset of truth"
        rows.append((c, recall, 1.0 / c, is_auto))
        print(f"n_centroids={c}{' (auto)' if is_auto else ''} "
              f"recall={recall:.3f} "
              f"(~{1.0 / c:.1%} of pairs compared, "
              f"missed {len(missed)})")
    emb.unpersist()
    return n_rows, threshold, truth, rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    write = "--write" in sys.argv

    spark = build_session(app_name="semdedup-recall", cores=16,
                          shuffle_partitions=16)
    base = load_table(spark, sf_dir, "embeddings")

    lines = [
        START,
        "### Measured pair recall of SemDeDup's cell blocking",
        "",
        f"`tools/semdedup_recall.py` on `{sf_dir}` embeddings at two "
        "corpus scales (10x = recall_sweep's deterministic "
        "amplification) PLUS a clustered synthetic corpus at two sizes "
        "(round 5 — the regime real topical embeddings live in): "
        "same-cell near-dup pairs vs the exact all-pairs truth (cell "
        "pairs are a verified SUBSET of truth — blocking only ever "
        "misses, never invents).  'compared' is the expected fraction "
        "of all pairs the in-cell join scores (N²/2C over N²/2) — the "
        "cost side of the knob.",
    ]
    def table(rows):
        out = ["", "| n_centroids | pair recall | ~pairs compared |",
               "|---|---|---|"]
        for c, r, frac, is_auto in rows:
            mark = " **(auto default)**" if is_auto else (
                " *(old fixed default)*" if c == 16 else "")
            out.append(f"| {c}{mark} | {r:.3f} | {frac:.1%} |")
        return out

    for scale in SCALES:
        print(f"--- diffuse scale {scale}x ---")
        n_rows, threshold, truth, rows = run_scale(spark, base, scale)
        lines += [
            "",
            f"**Diffuse corpus, scale {scale}x ({n_rows} vectors, "
            f"{len(truth)} truth pairs at cosine >= {threshold}):**",
        ] + table(rows)
    for n in CLUSTER_SIZES:
        print(f"--- clustered n={n} ---")
        # cluster count scales with n (fixed ~40-vector topics) so the
        # truth set stays driver-collectable at any size
        emb = clustered_embeddings(spark, n, n_clusters=max(50, n // 40))
        n_rows, threshold, truth, rows = run_scale(
            spark, None, 1, emb=emb,
            thresholds=(0.9, 0.8, 0.7, 0.6, 0.5, 0.4))
        lines += [
            "",
            f"**Clustered corpus (~40-vector topical clusters, "
            f"sigma=0.08/dim), "
            f"n={n_rows} ({len(truth)} truth pairs at cosine >= "
            f"{threshold}):**",
        ] + table(rows)
    lines += [
        "",
        "Reading the grids: on the DIFFUSE set recall decays with cell "
        "count exactly as the SemDeDup paper accepts (cross-cell "
        "neighbors are unreachable by construction) — it is the worst "
        "case for cell blocking.  The CLUSTERED corpus (the regime "
        "real document embeddings live in) turns the r4 production "
        "guidance from argument into measurement: at equal "
        "compared-pair cost recall runs ~2.5-3x the diffuse floor and "
        "the decay flattens (20k vectors: 0.489 at 5% compared vs the "
        "diffuse set's 0.178; 32 cells: 0.457 vs 0.140) because "
        "in-cluster near-dups co-locate in k-means cells.  "
        "`n_centroids=\"auto\"` (round 5) targets SEM_TARGET_CELL=1000 "
        "rows per cell — in-cell pair work N*1000/2, LINEAR in the "
        "corpus — and the grids show what that policy retains per "
        "corpus shape; treat the diffuse column as the floor and "
        "lower the cell count when pair recall matters more than "
        "cost.",
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
            text = text.split(START)[0] + block + text.split(END)[1]
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
        open(path, "w").write(text)
        print(f"\nwrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
