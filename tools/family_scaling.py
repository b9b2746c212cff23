"""Per-operator-family N -> 4N scaling evidence.

The headline ladder (bench.py --scaling) scales web_validate — the
zero-shuffle validation scan.  This tool runs one N -> 4N pair
(local[4] -> local[16]) for each SHUFFLING operator family, because
their scale stories are different plans entirely:

* dedup_minhash   — explode + groupBy MIN signatures + banded self-join
* dedup_clusters  — iterative connected components over candidate edges
* ann_topk_lsh    — bucketed broadcast join + two-stage top-k
* decontaminate   — gram explode + broadcast bench probe + groupBy

Inputs are the sf tables AMPLIFIED (default 16x, id-offset per copy) so
each leg measures seconds of real work, not the ~0.3s fixed scheduling
floor.  Legs run in their own JVM, interleaved over rounds with
best-of-round kept (same discipline as the headline ladder), and the
result section replaces its marked block in BENCH/BASELINE.md.

Usage: python tools/family_scaling.py [--write]   (whole-box exclusive!)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

START = "<!-- family-scaling:start -->"
END = "<!-- family-scaling:end -->"
FAMILIES = ("dedup_minhash", "dedup_clusters", "ann_topk_lsh",
            "decontaminate", "strip_boilerplate", "dedup_verify",
            "semantic_dedup", "text_dup_spans")


def _amplify(df, id_col, copies, varier=None):
    """Stack ``copies`` of the table with offset ids.  ``varier(df, c)``
    perturbs copy ``c``'s content — REQUIRED for dedup inputs: verbatim
    copies would give every doc ``copies`` exact near-duplicates, which
    inflates the banded self-join quadratically (a measurement artifact,
    not the operator's scaling).  Variation keeps the ORIGINAL planted
    duplicate structure per copy, so candidate/edge counts scale
    linearly with the input like a real corpus."""
    from pyspark.sql import functions as F

    span = df.agg(F.max(id_col)).collect()[0][0] + 1
    out = None
    for c in range(copies):
        leg = df.withColumn(id_col, F.col(id_col) + F.lit(c * span))
        if varier is not None:
            leg = varier(leg, c)
        out = leg if out is None else out.unionByName(leg)
    return out.repartition(64)


_AL = "abcdefghijklmnopqrstuvwxyz"


def _rotate_text(leg, c):
    from pyspark.sql import functions as F

    rot = _AL[c % 26:] + _AL[:c % 26]
    return leg.withColumn("text", F.translate("text", _AL, rot))


def _perturb_vec(leg, c):
    from pyspark.sql import functions as F

    eps = 1.0 + (c % 7) * 1e-3
    return leg.withColumn(
        "embedding",
        F.transform("embedding",
                    lambda x: (x * F.lit(eps)).cast("float")))


def _diag_rescale(leg, c):
    """Copy c rescales element i by 1+((c*(i+1))%5): copies with
    c ≡ c' (mod 5) are exact-direction clones (bounded ~copies/5
    cliques per base vector), other patterns land ~0.9 cosine — the
    semdedup leg's edge list stays linear in the amplification instead
    of one giant clique per direction (same construction as bench.py's
    semantic_dedup leg)."""
    from pyspark.sql import functions as F

    return leg.withColumn(
        "embedding",
        F.transform("embedding",
                    lambda x, i: (x * (1.0 + (F.lit(c) * (i + 1)) % 5))
                    .cast("float")))


def run_leg(cores: int) -> dict:
    from pyspark.sql import functions as F

    from spark_schema_guard.operators import ngram_decontaminate
    from spark_schema_guard.operators.dedup import (dup_span_features,
                                                    duplicate_clusters,
                                                    minhash_candidates,
                                                    strip_boilerplate,
                                                    verify_jaccard)
    from spark_schema_guard.operators.semdedup import semantic_dedup
    from spark_schema_guard.operators.similarity import cosine_topk_lsh
    from spark_schema_guard.session import build_session, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # PER-LEG amplification: the sf0.1 base tables are tiny (5k docs /
    # 2k vectors), and at low amp a leg measures FIXED costs (broadcast
    # builds, Arrow batch setup, round barriers), not the scaling term
    # — worse, every time an optimization cuts a leg's distributed work
    # the same amp reads as a LOWER efficiency (w shrinks, c doesn't).
    # The heavy banded/CC legs stay at 64x (their edge build already
    # costs minutes); the cheap per-row legs get 256x so each again
    # times seconds of real distributed work.
    copies = int(os.environ.get("SPARK_GRAFT_FAMILY_AMP", "64"))
    copies_hi = int(os.environ.get("SPARK_GRAFT_FAMILY_AMP_HI", "256"))
    spark = build_session(app_name=f"family-scaling-{cores}", cores=cores,
                          shuffle_partitions=max(cores * 2, 32))
    docs0 = load_table(spark, sf_dir, "documents")
    docs = _amplify(docs0, "doc_id", copies, varier=_rotate_text).cache()
    docs_hi = _amplify(docs0, "doc_id", copies_hi,
                       varier=_rotate_text).cache()
    emb_hi = _amplify(load_table(spark, sf_dir, "embeddings"),
                      "vec_id", copies_hi, varier=_perturb_vec).cache()
    emb2_hi = _amplify(load_table(spark, sf_dir, "embeddings"),
                       "vec_id", copies_hi, varier=_diag_rescale).cache()
    docs.count(), docs_hi.count(), emb_hi.count(), emb2_hi.count()
    # the benchmark side of decontamination is FIXED-SIZE by nature
    # (eval suites do not grow with the corpus): slice the BASE table,
    # so the leg scales the corpus against a constant broadcast set —
    # the amplified-bench variant timed the broadcast build, not the
    # corpus scan
    bench = docs0.where(F.col("doc_id") % 7 == 0)
    n_q = int(os.environ.get("SPARK_GRAFT_FAMILY_QUERIES", "256"))
    qvecs = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in emb_hi.where(F.col("vec_id") < n_q).collect()]

    # the clusters leg must time the DISTRIBUTED CC loop (the 10^12-row
    # path), not the adaptive driver union-find (serial by design — it
    # can't scale and isn't claimed to); cache the candidate edges so the
    # leg isolates CC instead of re-timing minhash
    edges = minhash_candidates(docs, "doc_id", "text", num_hashes=8,
                               bands=4, shingle_k=8,
                               hash_fn="xxhash64").persist()
    edges.count()

    jobs = {
        # NOT the same (num_hashes, bands) as the cached `edges` above:
        # an identical analyzed plan would be silently substituted by the
        # CacheManager's InMemoryRelation and this leg would time a cache
        # count instead of the minhash+banding work (observed: 0.5s flat
        # across core counts, bogus 0.27 "efficiency")
        "dedup_minhash": lambda: minhash_candidates(
            docs, "doc_id", "text", num_hashes=16, bands=8, shingle_k=8,
            hash_fn="xxhash64").count(),
        "dedup_clusters": lambda: duplicate_clusters(
            docs.select("doc_id"), "doc_id", edges, driver_max_edges=0)
        .where(~F.col("is_canonical")).count(),
        "ann_topk_lsh": lambda: cosine_topk_lsh(
            emb_hi, "vec_id", "embedding", qvecs, k=5, n_planes=6,
            multiprobe=2, n_tables=4).collect(),
        "decontaminate": lambda: ngram_decontaminate(
            docs_hi, "doc_id", "text", bench, "text", n=8).agg(
            F.sum(F.col("contaminated").cast("long"))).collect(),
        # docs text is single-line: split on spaces so every token is a
        # candidate "line" — the df-count/join/reassembly machinery runs
        # at full line volume; the consumer forces the rebuilt text
        "strip_boilerplate": lambda: strip_boilerplate(
            docs_hi, "doc_id", "text", "lang", min_docs=2, min_frac=0.5,
            split_pattern=" ", join_sep=" ").agg(
            F.sum(F.length("text"))).collect(),
        # the verify stage over a deterministic 1/64 slice of the
        # PERSISTED candidate edges with restrict=True — the
        # sparse-coverage scale path (shingle work ∝ covered docs);
        # the FULL amplified edge list (~6M pairs at 64x) fans out
        # ~2.5B shingle rows, which times the box's memory ceiling
        # rather than the plan's scaling
        "dedup_verify": lambda: verify_jaccard(
            docs, "doc_id", "text",
            edges.where((F.col("id_a") + F.col("id_b")) % 64 == 0),
            shingle_k=8, restrict=True).agg(F.sum("jaccard")).collect(),
        # in-cell Gram matmuls dominate (the operator's quadratic term);
        # clone cliques are bounded by the diag-rescale construction so
        # CC stays the adaptive driver path and the leg times the
        # streaming blocked-BLAS pair stage; centroids scale with the
        # amplification so cell SIZE (and thus pair volume per row)
        # stays what SemDeDup targets at any corpus scale
        "semantic_dedup": lambda: semantic_dedup(
            emb2_hi, "vec_id", "embedding", threshold=0.99,
            n_centroids=64 * max(copies_hi // 64, 1),
            max_cell=200_000).agg(
            F.sum(F.col("is_canonical").cast("long"))).collect(),
        # gram-count reduction + join-back + the per-doc coverage lag()
        # window — the only leg with a window stage; xxhash64-free
        # (bucketing is md5 by construction) and the rotated-text
        # amplification keeps cross-copy dup grams real
        "text_dup_spans": lambda: dup_span_features(
            docs, "doc_id", "text", n=8).agg(
            F.sum("n_dup_grams"), F.sum("dup_tokens"),
            F.sum("dup_gram_frac"), F.sum("dup_token_frac")).collect(),
    }
    timings = {}
    for name, job in jobs.items():
        job()  # warm (JIT, cache, broadcast build)
        t0 = time.perf_counter()
        job()
        timings[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return timings


def main() -> None:
    if "--leg" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--leg") + 1])
        print(json.dumps(run_leg(cores)))
        return

    rounds = int(os.environ.get("SPARK_GRAFT_FAMILY_ROUNDS", "2"))
    # 4 -> 16, mirroring the headline ladder's most demanding pair: the
    # 32-thread leg saturates the single box's DRAM bandwidth and would
    # measure the machine, not the plans
    ladder = (4, 16)
    best: dict = {c: {} for c in ladder}
    for _ in range(rounds):
        for cores in ladder:
            time.sleep(5)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--leg", str(cores)],
                capture_output=True, text=True, timeout=3600, cwd=REPO)
            got = json.loads(out.stdout.strip().splitlines()[-1])
            for name, sec in got.items():
                prev = best[cores].get(name)
                best[cores][name] = sec if prev is None else min(prev, sec)

    lo, hi = ladder
    lines = [
        START,
        "### Per-family scaling (one N -> 4N pair per shuffling operator)",
        "",
        f"`tools/family_scaling.py`: sf0.1 tables amplified per leg — "
        f"{os.environ.get('SPARK_GRAFT_FAMILY_AMP', '64')}x for the "
        f"banded/CC legs (minhash, clusters, verify, dup_spans), "
        f"{os.environ.get('SPARK_GRAFT_FAMILY_AMP_HI', '256')}x for the "
        "per-row legs (ann, decontaminate, boilerplate, semdedup; fixed "
        "base-table bench for decontaminate) — "
        f"local[{lo}] vs local[{hi}], interleaved best-of-"
        f"{rounds} rounds.",
        "",
        f"| family | local[{lo}] sec | local[{hi}] sec | speedup "
        "(ideal 4x) | efficiency (target >= 0.8) | fitted serial sec "
        "| predicted eff at 16x input |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = {}
    for name in FAMILIES:
        t_lo, t_hi = best[lo][name], best[hi][name]
        speed = t_lo / t_hi
        effs[name] = round(speed / (hi / lo), 3)
        # two-point Amdahl fit: t(N) = c + w/N  ->  c is the per-JOB
        # fixed cost (driver plan analysis, broadcast builds, per-round
        # barriers), w the parallelizable work.  c does NOT grow with
        # input size, so at m-times the data eff -> (c + m*w/lo) /
        # ((hi/lo) * (c + m*w/hi)) -> 1 as m grows.
        w = max((t_lo - t_hi) / (1 / lo - 1 / hi), 0.0)
        c = max(t_lo - w / lo, 0.0)
        m = 16
        pred = ((c + m * w / lo) / ((hi / lo) * (c + m * w / hi))
                if (c + m * w / hi) > 0 else float("nan"))
        lines.append(f"| {name} | {t_lo} | {t_hi} | {speed:.2f}x "
                     f"| **{effs[name]}** | {c:.1f} | {pred:.2f} |")
    lines += [
        "",
        "These are the operators whose plans SHUFFLE (banded self-joins, "
        "iterative CC rounds, bucketed broadcast joins, gram groupBys) — "
        "the families where a scaling obstruction would hide.  The "
        "clusters leg times the DISTRIBUTED min-label loop over cached "
        "candidate edges (`driver_max_edges=0`): the adaptive driver "
        "union-find the operator picks for small graphs is serial by "
        "design and is not the path whose scaling is claimed.",
        "",
        "The last two columns decompose each leg with the two-point "
        f"Amdahl model `t(N) = c + w/N` fitted to the local[{lo}]/"
        f"local[{hi}] pair: `c` is per-JOB fixed cost — driver plan "
        "analysis, broadcast construction, per-CC-round scheduling "
        "barriers — which is INDEPENDENT of input size, while `w` is "
        "the distributed work that grows with the data.  The measured "
        "efficiency therefore UNDERSTATES the at-scale behavior: at "
        "16x this input (still tiny by the 100-TB target) the same fit "
        "predicts the efficiencies in the final column, converging to "
        "the headline ladder's as `w` dominates.  Same single-box "
        "caveat as the headline ladder: all threads share one "
        "machine's DRAM bandwidth, so the 4N leg under-reads versus a "
        "real 4x-executor cluster that brings 4x the bandwidth and scan "
        "I/O.",
        END,
    ]
    block = "\n".join(lines)
    print(block)
    if "--write" in sys.argv:
        path = os.path.join(REPO, "BENCH", "BASELINE.md")
        text = open(path).read()
        if START in text:
            text = text.split(START)[0] + block + text.split(END)[1]
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
        open(path, "w").write(text)
        print(f"wrote {path}")
    print(json.dumps({"efficiencies": effs}))


if __name__ == "__main__":
    main()
