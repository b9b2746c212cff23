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

``--marker big`` writes to a SECOND marked block
(``family-scaling-big``) instead of the main table — the
"measured at larger amplification" evidence run; combine with
``SPARK_GRAFT_FAMILY_ONLY=a,b,c`` (subset of legs) and
``SPARK_GRAFT_FAMILY_AMP``/``_HI`` (bigger copies) so the run measures
the previously-extrapolated legs without re-timing the green ones.
Inputs are built LAZILY per selected leg, so a subset run never pays
for the others' amplified caches.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = ("dedup_minhash", "dedup_clusters", "ann_topk_lsh",
            "decontaminate", "strip_boilerplate", "dedup_verify",
            "semantic_dedup", "text_dup_spans")


def _selected() -> tuple:
    only = [s for s in os.environ.get(
        "SPARK_GRAFT_FAMILY_ONLY", "").split(",") if s]
    if not only:
        return FAMILIES
    bad = [s for s in only if s not in FAMILIES]
    if bad:
        raise SystemExit(f"unknown families: {bad}")
    return tuple(f for f in FAMILIES if f in only)


def _amplify(df, id_col, copies, varier=None):
    """Stack ``copies`` of the table with offset ids via ONE
    ``explode(sequence)`` — O(1) plan nodes at any copy count (the
    previous per-copy union built a ``copies``-way union plan whose
    driver analysis went superlinear past a few hundred copies — the
    same lesson as similarity's probe frame).  ``varier(df)`` perturbs
    content ROW-WISE as a function of the ``__c`` copy column —
    REQUIRED for dedup inputs: verbatim copies would give every doc
    ``copies`` exact near-duplicates, which inflates the banded
    self-join quadratically (a measurement artifact, not the operator's
    scaling).  Variation keeps the ORIGINAL planted duplicate structure
    per copy, so candidate/edge counts scale linearly with the input
    like a real corpus."""
    from pyspark.sql import functions as F

    span = df.agg(F.max(id_col)).collect()[0][0] + 1
    out = (df.select(
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__c"),
        "*")
        .withColumn(id_col,
                    F.col(id_col) + F.col("__c").cast("long") * span))
    if varier is not None:
        out = varier(out)
    return out.drop("__c").repartition(64)


_AL = "abcdefghijklmnopqrstuvwxyz"


def _rotate_text(df):
    """Copy c Caesar-rotates the alphabet by c%26 — 26 static translate
    branches picked per row (CASE evaluates one branch), so every copy
    keeps the base table's duplicate structure but shares no shingles
    with neighboring copies."""
    from pyspark.sql import functions as F

    expr = F.when((F.col("__c") % 26) == 0, F.col("text"))
    for c in range(1, 26):
        expr = expr.when((F.col("__c") % 26) == c,
                         F.translate("text", _AL, _AL[c:] + _AL[:c]))
    return df.withColumn("text", expr)


def _perturb_vec(df):
    from pyspark.sql import functions as F

    eps = F.lit(1.0) + (F.col("__c") % 7).cast("double") * 1e-3
    return df.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x * eps).cast("float")))


def _diag_rescale(df):
    """Every 8 consecutive copies share one diagonal-rescale direction
    (group = c // 8); distinct groups draw near-distinct patterns from
    a large-prime residue, so clone cliques are CONSTANT size 8 at any
    amplification — near-dup PAIR volume grows linearly with the input,
    like a real corpus.  (The previous mod-5 pattern made clique size
    copies/5: pair volume QUADRATIC in the amplification — at 2048
    copies the semdedup leg timed a 64x-edges artifact, 1156s/1084s
    nearly flat across 4x cores, not the operator's scaling.)"""
    from pyspark.sql import functions as F

    g = (F.col("__c") / 8).cast("long")
    return df.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: (x * (F.lit(1.0)
                               + ((g * (i + 1)) % 9973)
                               .cast("double") * (4.0 / 9973.0)))
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

    # LAZY memoized inputs: a subset run (SPARK_GRAFT_FAMILY_ONLY)
    # builds only the amplified caches its legs touch — at big-amp
    # evidence runs the unused caches would cost minutes and RAM
    _built: dict = {}

    def _get(name, build):
        if name not in _built:
            _built[name] = build()
        return _built[name]

    def _cached(df):
        df = df.cache()
        df.count()
        return df

    def docs():
        return _get("docs", lambda: _cached(
            _amplify(docs0, "doc_id", copies, varier=_rotate_text)))

    def docs_hi():
        return _get("docs_hi", lambda: _cached(
            _amplify(docs0, "doc_id", copies_hi, varier=_rotate_text)))

    def emb_hi():
        return _get("emb_hi", lambda: _cached(
            _amplify(load_table(spark, sf_dir, "embeddings"),
                     "vec_id", copies_hi, varier=_perturb_vec)))

    def emb2_hi():
        return _get("emb2_hi", lambda: _cached(
            _amplify(load_table(spark, sf_dir, "embeddings"),
                     "vec_id", copies_hi, varier=_diag_rescale)))

    # the benchmark side of decontamination is FIXED-SIZE by nature
    # (eval suites do not grow with the corpus): slice the BASE table,
    # so the leg scales the corpus against a constant broadcast set —
    # the amplified-bench variant timed the broadcast build, not the
    # corpus scan
    bench = docs0.where(F.col("doc_id") % 7 == 0)
    n_q = int(os.environ.get("SPARK_GRAFT_FAMILY_QUERIES", "256"))

    def qvecs():
        return _get("qvecs", lambda: [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb_hi().where(F.col("vec_id") < n_q).collect()])

    # the clusters leg must time the DISTRIBUTED CC loop (the 10^12-row
    # path), not the adaptive driver union-find (serial by design — it
    # can't scale and isn't claimed to); cache the candidate edges so the
    # leg isolates CC instead of re-timing minhash
    def edges():
        def build():
            e = minhash_candidates(docs(), "doc_id", "text", num_hashes=8,
                                   bands=4, shingle_k=8,
                                   hash_fn="xxhash64").persist()
            e.count()
            return e
        return _get("edges", build)

    # big-amp evidence runs scale the CC GRAPH without re-running
    # minhash at the larger amp (the edge build is input prep, not the
    # timed operator): the 64x edge list is amplified edge_mult times
    # with offset ids — each copy is an isomorphic component-disjoint
    # replica, exactly the graph a bigger rotated-copy corpus yields
    edge_mult = int(os.environ.get("SPARK_GRAFT_FAMILY_EDGE_MULT", "1"))

    def cc_input():
        def build():
            e = edges()
            if edge_mult <= 1:
                return docs().select("doc_id"), e
            span = docs().agg(F.max("doc_id")).collect()[0][0] + 1
            off = F.col("__c").cast("long") * span
            big_e = (e.select(
                F.explode(F.sequence(F.lit(0), F.lit(edge_mult - 1)))
                .alias("__c"), "*")
                .withColumn("id_a", F.col("id_a") + off)
                .withColumn("id_b", F.col("id_b") + off)
                .drop("__c").repartition(64).persist())
            big_ids = _amplify(docs().select("doc_id"), "doc_id",
                               edge_mult).persist()
            big_e.count(), big_ids.count()
            return big_ids, big_e
        return _get("cc_input", build)

    jobs = {
        # NOT the same (num_hashes, bands) as the cached `edges` above:
        # an identical analyzed plan would be silently substituted by the
        # CacheManager's InMemoryRelation and this leg would time a cache
        # count instead of the minhash+banding work (observed: 0.5s flat
        # across core counts, bogus 0.27 "efficiency")
        "dedup_minhash": lambda: minhash_candidates(
            docs(), "doc_id", "text", num_hashes=16, bands=8, shingle_k=8,
            hash_fn="xxhash64").count(),
        "dedup_clusters": lambda: duplicate_clusters(
            cc_input()[0], "doc_id", cc_input()[1], driver_max_edges=0)
        .where(~F.col("is_canonical")).count(),
        "ann_topk_lsh": lambda: cosine_topk_lsh(
            emb_hi(), "vec_id", "embedding", qvecs(), k=5, n_planes=6,
            multiprobe=2, n_tables=4).collect(),
        "decontaminate": lambda: ngram_decontaminate(
            docs_hi(), "doc_id", "text", bench, "text", n=8).agg(
            F.sum(F.col("contaminated").cast("long"))).collect(),
        # docs text is single-line: split on spaces so every token is a
        # candidate "line" — the df-count/join/reassembly machinery runs
        # at full line volume; the consumer forces the rebuilt text
        "strip_boilerplate": lambda: strip_boilerplate(
            docs_hi(), "doc_id", "text", "lang", min_docs=2, min_frac=0.5,
            split_pattern=" ", join_sep=" ").agg(
            F.sum(F.length("text"))).collect(),
        # the verify stage over a deterministic 1/64 slice of the
        # PERSISTED candidate edges with restrict=True — the
        # sparse-coverage scale path (shingle work ∝ covered docs);
        # the FULL amplified edge list (~6M pairs at 64x) fans out
        # ~2.5B shingle rows, which times the box's memory ceiling
        # rather than the plan's scaling
        "dedup_verify": lambda: verify_jaccard(
            docs(), "doc_id", "text",
            edges().where((F.col("id_a") + F.col("id_b")) % 64 == 0),
            shingle_k=8, restrict=True).agg(F.sum("jaccard")).collect(),
        # in-cell Gram matmuls dominate (the operator's quadratic term);
        # clone cliques are bounded by the diag-rescale construction so
        # CC stays the adaptive driver path and the leg times the
        # streaming blocked-BLAS pair stage; centroids scale with the
        # amplification so cell SIZE (and thus pair volume per row)
        # stays what SemDeDup targets at any corpus scale
        "semantic_dedup": lambda: semantic_dedup(
            emb2_hi(), "vec_id", "embedding", threshold=0.99,
            n_centroids=64 * max(copies_hi // 64, 1),
            max_cell=200_000).agg(
            F.sum(F.col("is_canonical").cast("long"))).collect(),
        # gram-count reduction + join-back + the per-doc coverage lag()
        # window — the only leg with a window stage; xxhash64-free
        # (bucketing is md5 by construction) and the rotated-text
        # amplification keeps cross-copy dup grams real
        "text_dup_spans": lambda: dup_span_features(
            docs(), "doc_id", "text", n=8).agg(
            F.sum("n_dup_grams"), F.sum("dup_tokens"),
            F.sum("dup_gram_frac"), F.sum("dup_token_frac")).collect(),
    }
    timings = {}
    for name in _selected():
        job = jobs[name]
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

    marker = "family-scaling"
    if "--marker" in sys.argv:
        marker = f"family-scaling-{sys.argv[sys.argv.index('--marker') + 1]}"
    START = f"<!-- {marker}:start -->"
    END = f"<!-- {marker}:end -->"
    fams = _selected()
    rounds = int(os.environ.get("SPARK_GRAFT_FAMILY_ROUNDS", "2"))
    # 4 -> 16 by default, mirroring the headline ladder's most demanding
    # pair: the 32-thread leg saturates the single box's DRAM bandwidth
    # and would measure the machine, not the plans.  SPARK_GRAFT_FAMILY_
    # LADDER="2,8" selects the LOW-CORE pair — the in-envelope protocol
    # for legs whose 16-thread point is bandwidth/disk-bound (the r4
    # ann_topk_lsh diagnosis run).
    ladder = tuple(int(x) for x in os.environ.get(
        "SPARK_GRAFT_FAMILY_LADDER", "4,16").split(","))
    assert len(ladder) == 2 and ladder[1] == 4 * ladder[0], ladder
    best: dict = {c: {} for c in ladder}
    for _ in range(rounds):
        for cores in ladder:
            time.sleep(5)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--leg", str(cores)],
                capture_output=True, text=True,
                timeout=int(os.environ.get(
                    "SPARK_GRAFT_FAMILY_TIMEOUT", "3600")), cwd=REPO)
            got = json.loads(out.stdout.strip().splitlines()[-1])
            for name, sec in got.items():
                prev = best[cores].get(name)
                best[cores][name] = sec if prev is None else min(prev, sec)

    lo, hi = ladder
    if marker == "family-scaling":
        title = ("### Per-family scaling (one N -> 4N pair per "
                 "shuffling operator)")
    elif "lowcore" in marker:
        title = ("### Per-family scaling, LOW-CORE in-envelope pair "
                 "(2 -> 8 busy threads stay a minority of the 32-vCPU "
                 "box at both points — the protocol that isolates plan "
                 "scaling from single-box DRAM/disk saturation)")
    else:
        title = ("### Per-family scaling, MEASURED at larger "
                 "amplification (evidence run for the previously-"
                 "extrapolated legs)")
    lines = [
        START,
        title,
        "",
        f"`tools/family_scaling.py`: sf0.1 tables amplified per leg — "
        f"{os.environ.get('SPARK_GRAFT_FAMILY_AMP', '64')}x for the "
        f"banded/CC legs (minhash, clusters, verify, dup_spans), "
        f"{os.environ.get('SPARK_GRAFT_FAMILY_AMP_HI', '256')}x for the "
        "per-row legs (ann, decontaminate, boilerplate, semdedup; fixed "
        "base-table bench for decontaminate) — "
        f"local[{lo}] vs local[{hi}], interleaved best-of-"
        f"{rounds} rounds."
        + (f"  CC graph scaled {os.environ['SPARK_GRAFT_FAMILY_EDGE_MULT']}"
           "x by edge-list replication (isomorphic offset copies) on top "
           "of the doc amp."
           if int(os.environ.get("SPARK_GRAFT_FAMILY_EDGE_MULT", "1")) > 1
           else ""),
        "",
        f"| family | local[{lo}] sec | local[{hi}] sec | speedup "
        "(ideal 4x) | efficiency (target >= 0.8) | fitted serial sec "
        "| predicted eff at 16x input |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = {}
    for name in fams:
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
