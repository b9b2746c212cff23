"""Physical-plan shape assertions: the jvm-mode plan must stay entirely
JVM-side (no Python evaluation nodes), read only needed columns, and the
python regex mode must be the only thing that introduces Arrow UDFs."""

from pyspark.sql import functions as F

import spark_schema_guard as ssg
from spark_schema_guard.webgen import WEB_PAGE_SCHEMA, web_pages


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_jvm_plan_has_no_python_nodes(spark, sf_dir):
    web = web_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, web.schema)
    text = _physical(plan.apply(web).select("url", "verdict"))
    assert "BatchEvalPython" not in text
    assert "ArrowEvalPython" not in text
    assert "RLIKE" in text or "rlike" in text


def test_python_regex_mode_uses_arrow(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(
        {"type": "object", "properties": {"source": {"pattern": "^src[0-9]+$"}}},
        docs.schema, regex_engine="python")
    text = _physical(plan.apply(docs).select("doc_id", "verdict"))
    assert "ArrowEvalPython" in text  # vectorized, never row-at-a-time
    assert "BatchEvalPython" not in text


def test_column_pruning_reaches_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(
        {"type": "object", "properties": {"lang": {"enum": ["en", "de"]}}},
        docs.schema)
    text = _physical(plan.apply(docs).select("doc_id", "verdict"))
    # scan must read only doc_id + lang, not text/source/n_chars
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in text


def test_partition_verdicts(spark, sf_dir):
    from spark_schema_guard.operators.stats import partition_verdicts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(4)
    plan = ssg.compile_plan(
        {"type": "object", "properties": {"lang": {"enum": ["en", "de"]}}},
        docs.schema)
    out = partition_verdicts(plan.apply(docs)).collect()
    assert sum(r["rows"] for r in out) == docs.count()
    assert all(r["valid_rows"] <= r["rows"] for r in out)
