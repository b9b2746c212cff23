"""Single-core apples-to-apples baseline on THIS hardware: the reference
validator vs our closure row validator over identical web-page dicts
(the reference's own 40k docs/s figure is from unspecified hardware).
Appends a section to BENCH/BASELINE.md.  Usage:
  python tools/single_core_baseline.py [n_docs]
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")  # read-only import, measurement only


def _ladder_per_core(ref_rate):
    """Per-core rate of the local[2] ladder leg vs the reference rate
    measured in THIS run (same box, same docs) — read back from the
    scaling section so the two numbers are always same-file coherent."""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    try:
        text = open(path).read()
        m = re.search(r"\| local\[2\] \| [\d.]+ \| ([\d.]+) \|", text)
        per_core = float(m.group(1)) / 2
        return (f"~{per_core:,.0f} docs/s/core — "
                f"{per_core / ref_rate:.2f}x the reference on the same "
                "box, while emitting full violation arrays rather than "
                "first-exception-only.")
    except Exception:
        return "(scaling ladder section not present in this file)."


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    import fastjsonschema as reference

    import spark_schema_guard as ssg
    from spark_schema_guard.session import build_session
    from spark_schema_guard.webgen import WEB_PAGE_SCHEMA, web_pages

    spark = build_session(app_name="single-core", cores=4)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    replicas = max(1, n_target // docs.count())
    rows = [
        {k: v for k, v in r.asDict().items()
         if k in ("url", "text", "lang") and v is not None}
        | {"warc_ts": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")}
        for r in web_pages(docs, replicas=replicas).collect()
    ]
    spark.stop()
    n = len(rows)

    def run(validator):
        ok = bad = 0
        t0 = time.perf_counter()
        for row in rows:
            try:
                validator(row)
                ok += 1
            except Exception:
                bad += 1
        return time.perf_counter() - t0, ok, bad

    ref_validator = reference.compile(WEB_PAGE_SCHEMA)
    mine_validator = ssg.compile(WEB_PAGE_SCHEMA)

    # warmup then measure
    run(ref_validator); run(mine_validator)
    t_ref, ok_r, bad_r = run(ref_validator)
    t_mine, ok_m, bad_m = run(mine_validator)
    assert (ok_r, bad_r) == (ok_m, bad_m), "verdict mismatch!"

    # realistic from-storage variant: docs arrive serialized, so the
    # single-process pipeline must parse before validating
    import json as _json

    serialized = [_json.dumps(row) for row in rows]
    t0 = time.perf_counter()
    for blob in serialized:
        try:
            ref_validator(_json.loads(blob))
        except Exception:
            pass
    t_ref_parse = time.perf_counter() - t0

    section = [
        "",
        "## Single-core baselines on this hardware (same web-page docs)",
        "",
        "| validator | docs | sec | docs/sec |",
        "|---|---|---|---|",
        f"| fastjsonschema (reference, compiled) | {n} | {t_ref:.3f} | "
        f"{n / t_ref:,.0f} |",
        f"| spark-schema-guard row validator (1 core) | {n} | {t_mine:.3f} | "
        f"{n / t_mine:,.0f} |",
        f"| fastjsonschema + json.loads (from storage) | {n} | "
        f"{t_ref_parse:.3f} | {n / t_ref_parse:,.0f} |",
        "",
        f"Verdict agreement: {ok_r} valid / {bad_r} invalid on both.",
        "The columnar engine's measured per-core rate (scaling table above) "
        "is the JVM whole-stage-codegen path — the docs/sec to compare "
        "against the reference per core: at local[2] the ladder runs "
        "the scan + full collect-all violation arrays at "
        f"{_ladder_per_core(n / t_ref)}",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "## Single-core baselines"
    existing = ""
    if os.path.exists(path):
        with open(path) as fh:
            existing = fh.read()
    # replace ONLY this tool's section: keep everything from the next
    # "## " heading on (memory probe, family scaling) intact
    tail = ""
    if marker in existing:
        start = existing.index(marker)
        nxt = existing.find("\n## ", start + len(marker))
        if nxt != -1:
            tail = existing[nxt:]
        existing = existing[:start].rstrip() + "\n"
    with open(path, "w") as fh:
        fh.write(existing + "\n".join(section) + "\n" + tail)
    print(f"reference: {n / t_ref:,.0f} docs/s | rowcheck: {n / t_mine:,.0f} "
          f"docs/s | written to {path}")


if __name__ == "__main__":
    main()
