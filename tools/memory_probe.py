"""Memory-pressure scale probe (VERDICT r01 #9): run the headline
validation plus the shuffle-heavy operators on a web table amplified
well past the page-cache sweet spot (default 16M rows ≈ 8x the bench
table), at local[32], and append the measured section to
BENCH/BASELINE.md.  Evidence that the plan shapes hold when data >>
memory comfort, not just at the 2M-row bench point.

Usage: python tools/memory_probe.py [rows]
NEVER run concurrently with other Spark jobs (CLAUDE.md invariant).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    rows_target = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000

    from pyspark.sql import functions as F

    import spark_schema_guard as ssg
    from spark_schema_guard.operators import uniqueness_report, domain_skew
    from spark_schema_guard.operators.dedup import exact_duplicates
    from spark_schema_guard.session import build_session
    from spark_schema_guard.webgen import WEB_PAGE_SCHEMA, web_pages

    spark = build_session(app_name="memory-probe", cores=32,
                          shuffle_partitions=64,
                          extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = docs.count()
    replicas = max(1, rows_target // n_base)

    cache_dir = os.path.join(REPO, ".bench_cache")
    web_path = os.path.join(cache_dir, f"web_probe_{n_base * replicas}")
    if not os.path.isdir(web_path):
        web_pages(docs.repartition(64), replicas=replicas) \
            .write.mode("overwrite").parquet(web_path)
    web = spark.read.parquet(web_path)
    n_rows = web.count()

    timings = {}

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 2)

    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, web.schema)
    timed("web_validate", lambda: plan.apply(web).agg(
        F.sum(F.col("verdict").cast("long")),
        F.sum(F.size("violations"))).collect())
    timed("web_uniqueness", lambda: uniqueness_report(web, "url").collect())
    timed("domain_skew", lambda: domain_skew(web, "url", k=10).collect())
    timed("dedup_exact", lambda: exact_duplicates(
        web, "doc_id", "text").count())
    from spark_schema_guard.operators import chi_square_by_unit
    timed("drift_by_unit", lambda: chi_square_by_unit(
        web, "lang", F.col("doc_id") % 64).collect())
    spark.stop()

    docs_per_sec = round(n_rows / timings["web_validate"], 1)
    section = [
        "",
        f"## Memory-pressure probe ({n_rows:,} rows, local[32])",
        "",
        "Same operators at ~8x the bench table — data well past the "
        "page-cache sweet spot on this box; shapes must hold, not just "
        "small-table timings.",
        "",
        "| operator | sec | rows/sec |",
        "|---|---|---|",
    ]
    for name, sec in timings.items():
        section.append(f"| {name} | {sec} | {round(n_rows / sec):,} |")
    section += [
        "",
        f"Headline validation throughput at this scale: "
        f"**{docs_per_sec:,.0f} docs/s** — the zero-shuffle projection "
        "is scan-bound, so throughput tracks I/O, not row count; the "
        "shuffle operators (uniqueness, domain_skew, dedup_exact) stay "
        "map-side-combine-bounded.",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "## Memory-pressure probe"
    text = open(path).read() if os.path.exists(path) else "# BENCH\n"
    # replace ONLY this tool's section: everything from the next section
    # boundary on (e.g. the family-scaling block, itself a box-exclusive
    # multi-round run) must survive a probe re-run
    tail = ""
    if marker in text:
        start = text.index(marker)
        bounds = [text.find(b, start + len(marker))
                  for b in ("\n## ", "\n<!-- family-scaling:start -->")]
        bounds = [b for b in bounds if b != -1]
        if bounds:
            tail = text[min(bounds):]
        text = text[:start].rstrip("\n")
    with open(path, "w") as fh:
        fh.write(text.rstrip("\n") + "\n" + "\n".join(section) + "\n" + tail)
    print(json.dumps({"rows": n_rows, "timings": timings,
                      "docs_per_sec": docs_per_sec, "report": path}))


if __name__ == "__main__":
    main()
