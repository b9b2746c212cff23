"""Synthetic web table, multimodal plumbing, and audited resumable runs."""

import os

import pytest

from pyspark.sql import functions as F

import spark_schema_guard as ssg
from spark_schema_guard.webgen import WEB_PAGE_SCHEMA, languages, web_pages
from spark_schema_guard.operators.multimodal import (
    attach_media_metadata, extract_features, sample_frames,
)
from spark_schema_guard.audit import AuditedRun


def test_web_pages_deterministic_and_seeded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    web = web_pages(docs)
    a = web.orderBy("doc_id").limit(20).collect()
    b = web_pages(docs).orderBy("doc_id").limit(20).collect()
    assert a == b  # fully deterministic

    n = web.count()
    stats = web.agg(
        F.sum((F.length("text") == 0).cast("long")).alias("empty_text"),
        F.sum((F.col("lang") == "xx").cast("long")).alias("bad_lang"),
        F.sum(F.col("html").isNull().cast("long")).alias("null_html"),
        F.count_distinct("url").alias("urls"),
    ).collect()[0]
    assert 0 < stats["empty_text"] < n * 0.05
    assert 0 < stats["bad_lang"] < n * 0.03
    assert 0 < stats["null_html"] < n * 0.05
    assert stats["urls"] < n  # planted duplicates
    hot = web.where(F.col("url").contains("hot.example.com")).count()
    assert 0.15 < hot / n < 0.25  # hot-domain skew


def test_web_schema_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    web = web_pages(docs)
    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, web.schema)
    out = plan.apply(web)
    agg = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("verdict").cast("long")).alias("ok")).collect()[0]
    assert 0 < agg["ok"] < agg["n"]
    rules = {r["rule"] for r in
             plan.violation_rows(web, keys=["url"]).select("rule").distinct().collect()}
    assert {"minLength", "enum"} <= rules


def test_multimodal_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    web = web_pages(docs).limit(100)
    with_meta = attach_media_metadata(web, "html", media_type="document")
    metas = with_meta.select("html_meta").where(F.col("html").isNotNull()).collect()
    assert all(m["html_meta"]["size_bytes"] > 0 for m in metas)

    feats = extract_features(web, "doc_id", "html").collect()
    ok = [f for f in feats if f["ok"]]
    bad = [f for f in feats if not f["ok"]]
    assert ok and all(len(f["features"]) == 16 for f in ok)
    assert all(f["error"] == "null payload" for f in bad)

    frames = sample_frames(web, "doc_id", "html", every_n_bytes=64, max_frames=3)
    got = frames.groupBy("doc_id").count().collect()
    assert got and all(1 <= r["count"] <= 3 for r in got)


def test_audited_run_resumes(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    input_path = str(tmp_path / "webpages")
    audit_path = str(tmp_path / "audit")
    web_pages(docs).repartition(4).write.parquet(input_path)

    plan = ssg.compile_plan(WEB_PAGE_SCHEMA,
                            spark.read.parquet(input_path).schema)
    first = AuditedRun(spark, plan, input_path, audit_path, run_id="r1").run()
    assert first["units_validated"] == 4
    total_rows = first["rows"]
    assert total_rows == docs.count()

    # second run: everything checkpointed, nothing re-validated
    second = AuditedRun(spark, plan, input_path, audit_path, run_id="r2").run()
    assert second["units_validated"] == 0
    assert second["rows"] == 0

    audit = spark.read.parquet(audit_path)
    assert audit.where(F.col("run_id") == "r1").count() == 4
    row = audit.where(F.col("run_id") == "r1").limit(1).collect()[0]
    assert row["rule_counts"] is None or all(
        n > 0 for n in row["rule_counts"].values())

    # a new file appears -> only it is validated
    web_pages(docs.limit(50)).write.mode("append").parquet(input_path)
    third = AuditedRun(spark, plan, input_path, audit_path, run_id="r3").run()
    assert third["units_validated"] >= 1
    assert third["rows"] == 50


def test_languages_dim_fk(spark, sf_dir):
    from spark_schema_guard.operators import orphan_rows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    web = web_pages(docs)
    orphans = orphan_rows(web, languages(spark), "lang", "lang_code")
    got = {r["lang"] for r in orphans.select("lang").distinct().collect()}
    assert got == {"xx"}


def test_pillow_decode_when_importable(spark):
    """Opt-in real-codec path: skips unless Pillow is installed (it is
    not baked into this container).  With Pillow present, pillow_decode
    rides the same mapInPandas plumbing as the deterministic fake."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from spark_schema_guard.operators.multimodal import (
        FEATURE_DIM, extract_features, pillow_decode)

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(b"no"))],
                               "doc_id long, html binary")
    rows = {r["id"]: r for r in
            extract_features(df, "doc_id", "html",
                             decoder=pillow_decode).collect()}
    assert rows[1]["ok"] and len(rows[1]["features"]) == FEATURE_DIM
    assert rows[2]["ok"] is False and rows[2]["error"]


def test_pillow_decode_absent_raises_not_implemented():
    """Without Pillow the decoder raises the honest NotImplementedError
    (driver-side check — no silent fake substitution)."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed; the absent-path is not testable")
    except ImportError:
        pass
    from spark_schema_guard.operators.multimodal import pillow_decode
    with pytest.raises(NotImplementedError, match="Pillow"):
        pillow_decode(b"\x89PNG")
