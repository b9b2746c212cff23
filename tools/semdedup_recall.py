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

from recall_sweep import amplify_embeddings  # noqa: E402

from spark_schema_guard.operators.semdedup import semantic_near_dups  # noqa: E402
from spark_schema_guard.session import build_session, load_table  # noqa: E402

START = "<!-- semdedup-recall:start -->"
END = "<!-- semdedup-recall:end -->"
GRID = (2, 4, 8, 16, 32)
SCALES = (1, 10)


def _pairs(frame) -> set:
    return {(r["id_a"], r["id_b"]) for r in frame.collect()}


def run_scale(spark, base, scale: int):
    emb = (base if scale == 1
           else amplify_embeddings(spark, base, scale)).cache()
    n_rows = emb.count()

    # pick the highest threshold that still yields a meaningful truth
    # set on this synthetic corpus (its cosines are diffuse by design)
    truth: set = set()
    threshold = None
    for t in (0.4, 0.35, 0.3, 0.25, 0.2):
        truth = _pairs(semantic_near_dups(
            emb, "vec_id", "embedding", threshold=t, n_centroids=1))
        if len(truth) >= 200:
            threshold = t
            break
        threshold = t
    print(f"truth: {len(truth)} pairs at cosine >= {threshold} "
          f"({n_rows} vectors)")

    rows = []
    for c in GRID:
        got = _pairs(semantic_near_dups(
            emb, "vec_id", "embedding", threshold=threshold,
            n_centroids=c))
        missed = truth - got
        recall = len(got & truth) / len(truth) if truth else 1.0
        assert not (got - truth), "cell pairs must be a subset of truth"
        rows.append((c, recall, 1.0 / c))
        print(f"n_centroids={c} recall={recall:.3f} "
              f"(~{1.0 / c:.1%} of pairs compared, "
              f"missed {len(missed)})")
    if scale != 1:
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
        "amplification): same-cell near-dup pairs vs the exact "
        "all-pairs truth (cell pairs are a verified SUBSET of truth — "
        "blocking only ever misses, never invents).  'compared' is the "
        "expected fraction of all pairs the in-cell join scores "
        "(N²/2C over N²/2) — the cost side of the knob.",
    ]
    for scale in SCALES:
        print(f"--- scale {scale}x ---")
        n_rows, threshold, truth, rows = run_scale(spark, base, scale)
        lines += [
            "",
            f"**Corpus scale {scale}x ({n_rows} vectors, "
            f"{len(truth)} truth pairs at cosine >= {threshold}):**",
            "",
            "| n_centroids | pair recall | ~pairs compared |",
            "|---|---|---|",
        ]
        for c, r, frac in rows:
            mark = " **(default)**" if c == 16 else ""
            lines.append(f"| {c} | {r:.3f}{mark} | {frac:.1%} |")
    lines += [
        "",
        "Reading the grid: recall decays with cell count exactly as the "
        "SemDeDup paper accepts (cross-cell neighbors are unreachable "
        "by construction); on real clustered embeddings the decay is "
        "far gentler than on this deliberately diffuse synthetic set, "
        "because true near-dups co-locate in the same cell.  Production "
        "guidance: size `n_centroids` for the in-cell pair budget "
        "(N²/2C), and treat the recall column as the floor.",
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
