"""CLI, streaming, and lean-mode coverage."""

import json
import subprocess
import sys

from pyspark.sql import functions as F

import spark_schema_guard as ssg

SCHEMA = {
    "type": "object",
    "required": ["doc_id", "text"],
    "properties": {"text": {"type": "string", "minLength": 60},
                   "lang": {"enum": ["en", "de", "fr", "es"]}},
}


def test_cli_plan_and_validate(sf_dir, tmp_path):
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(SCHEMA))
    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "plan",
         "--schema", str(schema_file),
         "--table", f"{sf_dir}/documents.parquet", "--cores", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ValidationPlan" in out.stdout
    assert "minLength" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "validate",
         "--schema", str(schema_file),
         "--table", f"{sf_dir}/documents.parquet",
         "--out", str(tmp_path / "out"), "--cores", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    counts = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(counts) == {"True", "False"}


def test_lean_mode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(SCHEMA, docs.schema, detailed_exceptions=False)
    rows = plan.apply(docs).where(~F.col("verdict")).limit(5).collect()
    assert rows
    for r in rows:
        for v in r["violations"]:
            assert v["rule"] is not None
            assert v["name"] is None and v["message"] is None


def test_streaming_validation(spark, sf_dir, tmp_path):
    from spark_schema_guard.streaming import (
        validate_stream, violation_rate_by_window,
    )
    from spark_schema_guard.webgen import WEB_PAGE_SCHEMA, web_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "stream_src")
    web_pages(docs).write.parquet(src)
    static = spark.read.parquet(src)

    stream = spark.readStream.schema(static.schema).parquet(src)
    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, static.schema)
    validated = validate_stream(stream, plan)
    windowed = violation_rate_by_window(validated, "warc_ts",
                                        window="1 day", watermark="2 days")
    query = (windowed.writeStream.format("memory")
             .queryName("winagg").outputMode("append")
             .trigger(availableNow=True).start())
    query.awaitTermination(120)

    # append-mode windows below the watermark may be withheld; check the
    # stateless validation path end-to-end instead via a second sink
    q2 = (validated.writeStream.format("memory").queryName("flat")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    flat = spark.sql("SELECT count(*) AS n, sum(CAST(verdict AS INT)) AS ok "
                     "FROM flat").collect()[0]
    assert flat["n"] == static.count()
    batch_ok = plan.apply(static).where("verdict").count()
    assert flat["ok"] == batch_ok


def test_include_value(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(SCHEMA, docs.schema, include_value=True)
    rows = plan.apply(docs).where(~F.col("verdict")).limit(5).collect()
    assert rows
    for r in rows:
        for v in r["violations"]:
            assert "value" in v.asDict()
            if v["name"] == "data.lang":
                assert v["value"] is not None


def test_plan_spec_roundtrip(spark, sf_dir):
    """save -> load rebuilds a plan producing identical violations (the
    compile_to_code persist/import parity, reference
    tests/test_compile_to_code.py:9-30)."""
    import tempfile

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(SCHEMA, df.schema, include_value=True)
    with tempfile.NamedTemporaryFile(suffix=".json", mode="w", delete=False) as fh:
        path = fh.name
    plan.save(path)
    loaded = ssg.load_plan(path)
    assert loaded.describe() == plan.describe()
    assert loaded.include_value and loaded.detailed
    a = plan.apply(df).select("doc_id", "verdict", "violations").collect()
    b = loaded.apply(df).select("doc_id", "verdict", "violations").collect()
    assert sorted(a) == sorted(b)


def test_plan_spec_retarget_and_custom_format_guard(spark, sf_dir):
    import pytest

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(SCHEMA, df.schema)
    spec = plan.to_spec()
    # retarget at a narrower projection of the same table
    narrow = df.select("doc_id", "text")
    loaded = ssg.load_plan(spec, narrow.schema)
    out = loaded.apply(narrow)
    assert out.where(~F.col("verdict")).count() > 0

    # custom format callables can't ride in the spec; load must demand them
    fmt_plan = ssg.compile_plan(
        {"properties": {"text": {"format": "shouty"}}}, df.schema,
        formats={"shouty": lambda v: v.isupper()})
    spec2 = fmt_plan.to_spec()
    with pytest.raises(ValueError, match="custom formats"):
        ssg.load_plan(spec2)
    reloaded = ssg.load_plan(spec2, df.schema,
                             formats={"shouty": lambda v: v.isupper()})
    assert reloaded.describe() == fmt_plan.describe()


def test_cli_plan_save_and_validate_from_spec(sf_dir, tmp_path):
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(SCHEMA))
    spec_file = tmp_path / "plan.json"
    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "plan",
         "--schema", str(schema_file),
         "--table", f"{sf_dir}/documents.parquet",
         "--save", str(spec_file), "--cores", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert spec_file.exists()

    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "validate",
         "--plan-spec", str(spec_file),
         "--table", f"{sf_dir}/documents.parquet", "--cores", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    counts = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(counts) == {"True", "False"}


def test_stream_unique_within_watermark(spark, tmp_path):
    from spark_schema_guard.streaming import stream_unique

    src = str(tmp_path / "uniq_src")
    rows = [("u1", "2024-03-01 00:00:00"), ("u1", "2024-03-01 00:05:00"),
            ("u2", "2024-03-01 00:01:00"), ("u3", "2024-03-01 00:02:00"),
            ("u3", "2024-03-01 00:03:00")]
    df = spark.createDataFrame(rows, "url string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    deduped = stream_unique(stream, "url", time_col="ts", watermark="1 hour")
    q = (deduped.writeStream.format("memory").queryName("uniq")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT url FROM uniq").collect()
    assert sorted(r["url"] for r in got) == ["u1", "u2", "u3"]


def test_stream_drift_chisq_windowed(spark, tmp_path):
    from spark_schema_guard.streaming import stream_drift_chisq

    src = str(tmp_path / "drift_src")
    # window 1 (00:00-01:00): 6 en, 2 de, 2 novel ("xx")
    # sentinel far in the future closes window 1 past the watermark
    rows = ([("en", "2024-03-01 00:10:00")] * 6 +
            [("de", "2024-03-01 00:20:00")] * 2 +
            [("xx", "2024-03-01 00:30:00")] * 2 +
            [("en", "2024-03-02 12:00:00")])
    df = spark.createDataFrame(rows, "lang string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    drift = stream_drift_chisq(
        stream, "lang", {"en": 0.5, "de": 0.5},
        time_col="ts", window="1 hour", watermark="30 minutes")
    q = (drift.writeStream.format("memory").queryName("drift")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM drift").collect()}
    row = got["2024-03-01 00:00:00"]
    # n=10, expected 5/5; obs en=6, de=2; novel xx=2
    # stat = (6-5)^2/5 + (2-5)^2/5 = 0.2 + 1.8 = 2.0
    assert row["rows"] == 10
    assert row["novel_rows"] == 2
    assert row["dof"] == 1
    assert abs(row["statistic"] - 2.0) < 1e-9


def test_violation_streaks_stateful(spark, tmp_path):
    from spark_schema_guard.streaming import violation_streaks

    src = str(tmp_path / "streak_src")
    # domain A: 4 consecutive invalid; domain B: valid run broken, streak 1
    rows = []
    for i, (dom, ok) in enumerate(
            [("a", False)] * 4 + [("b", True), ("b", False)] +
            [("c", True)] * 3):
        rows.append((dom, ok, f"2024-03-01 00:0{i}:00"))
    df = spark.createDataFrame(rows, "domain string, verdict boolean, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    alarms = violation_streaks(stream, "domain", min_streak=3, time_col="ts")
    q = (alarms.writeStream.format("memory").queryName("streaks")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["key"]: r for r in spark.sql("SELECT * FROM streaks").collect()}
    assert "a" in got and got["a"]["streak"] == 4 and got["a"]["rows_seen"] == 4
    assert "b" not in got and "c" not in got


def test_cli_package_builds_importable_pyfiles_zip(tmp_path):
    """`python -m spark_schema_guard package` builds the spark-submit
    --py-files artifact: the package importable from the zip root in a
    fresh interpreter (what executors do with --py-files)."""
    import subprocess
    import sys

    out = tmp_path / "engine.zip"
    r = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "package",
         "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["files"] > 10
    probe = subprocess.run(
        [sys.executable, "-c",
         "import spark_schema_guard as ssg;"
         "v = ssg.compile({'type': 'object', 'required': ['u']});"
         "print(v.collect({})[0].rule)"],
        env={"PYTHONPATH": str(out), "PATH": "/usr/bin:/bin"},
        capture_output=True, text=True, timeout=120)
    assert probe.returncode == 0, probe.stderr
    assert probe.stdout.strip() == "required"


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """The north-rule invocation mode for real: `spark-submit --py-files
    engine.zip job.py` in a FRESH JVM with the repo absent from the job's
    import path — the engine must reach the driver via the zip, and the
    executors via the shipped closure of the python-engine UDF."""
    import os
    import subprocess
    import sys

    zip_path = tmp_path / "engine.zip"
    r = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "package",
         "--out", str(zip_path)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr

    job = tmp_path / "job.py"
    job.write_text(
        "import json\n"
        "from pyspark.sql import SparkSession, functions as F\n"
        "import spark_schema_guard as ssg\n"                # from --py-files
        "from spark_schema_guard.jsoncol import validate_json_column\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "docs = spark.read.parquet('/root/testdata/sf0.001/documents.parquet')\n"
        "plan = ssg.compile_plan({'type': 'object',\n"
        "                         'required': ['doc_id', 'text'],\n"
        "                         'properties': {'n_chars': {'minimum': 0}}},\n"
        "                        docs.schema)\n"
        "out = plan.apply(docs)\n"
        "jvm_valid = out.agg(F.sum(F.col('verdict').cast('long')))"
        ".collect()[0][0]\n"
        "# executor-side import: the python engine's pandas UDF unpickles\n"
        "# rowcheck closures on workers, which resolve via the shipped zip\n"
        "j = docs.select(F.to_json(F.struct('doc_id', 'lang')).alias('js'))\n"
        "checked = validate_json_column(\n"
        "    j, 'js', {'type': 'object', 'required': ['doc_id', 'lang'],\n"
        "              'properties': {'lang': {'minLength': 2}}},\n"
        "    engine='python')\n"
        "py_valid = checked.agg(F.sum(F.col('verdict').cast('long')))"
        ".collect()[0][0]\n"
        "print(json.dumps({'rows': docs.count(),\n"
        "                  'jvm_valid': int(jvm_valid),\n"
        "                  'py_valid': int(py_valid)}))\n"
        "spark.stop()\n")

    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
        "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path), str(job)],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path))  # cwd WITHOUT the repo: only the zip provides it
    assert r.returncode == 0, r.stderr[-4000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])
    assert got["rows"] == 500
    assert got["jvm_valid"] == 500
    assert got["py_valid"] > 0


def test_stream_decontaminate_bloom(spark, tmp_path):
    """Streaming contamination flag via the broadcast Bloom of bench
    grams: flagged docs exactly match the batch operator's verdicts on
    this corpus (no false positive at this scale), and the plan is
    stateless (no aggregation, append-safe)."""
    from spark_schema_guard.operators.decontam import ngram_decontaminate
    from spark_schema_guard.streaming import stream_decontaminate

    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("pack my box with five dozen liquor jugs",)],
        "text string")
    docs = [
        (1, "intro text the quick brown fox jumps over the lazy dog outro",
         "2024-03-01 00:05:00"),
        (2, "a completely unrelated document about spark plans",
         "2024-03-01 00:06:00"),
        (3, "pack my box with five dozen liquor jugs end",
         "2024-03-01 00:07:00"),
        (4, "short", "2024-03-01 00:08:00"),
    ]
    src = str(tmp_path / "decon_src")
    df = spark.createDataFrame(docs, "doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)

    batch = {r["doc_id"]: r["contaminated"]
             for r in ngram_decontaminate(static, "doc_id", "text",
                                          bench, "text", n=8).collect()}

    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_decontaminate(stream, "text", bench, "text", n=8)
    q = (out.select("doc_id", "contaminated")
         .writeStream.format("memory").queryName("decon")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["contaminated"]
           for r in spark.sql("SELECT * FROM decon").collect()}
    assert got == batch == {1: True, 2: False, 3: True, 4: False}


def test_stream_text_quality_window(spark, tmp_path):
    from spark_schema_guard.streaming import stream_text_quality_by_window

    rows = [(1, "the cat sat on the mat and it was a good day for all",
             "2024-03-01 00:10:00"),
            (2, "zzz", "2024-03-01 00:20:00"),
            (3, "en", "2024-03-02 12:00:00")]  # sentinel closes window 1
    src = str(tmp_path / "q_src")
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_text_quality_by_window(
        stream, "doc_id", "text", time_col="ts",
        window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("tq")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM tq").collect()}
    row = got["2024-03-01 00:00:00"]
    assert row["rows"] == 2
    assert row["low_quality_share"] == 0.5  # doc 2 scores low
    assert row["mean_tokens"] == (14 + 1) / 2


def test_stream_encoding_window(spark, tmp_path):
    from spark_schema_guard.streaming import stream_encoding_by_window

    rows = [(1, "cafÃ© mojibake here", "2024-03-01 00:10:00"),
            (2, "perfectly clean ascii", "2024-03-01 00:20:00"),
            (3, "late\u0007control\ufffd", "2024-03-01 00:30:00"),
            (4, "x", "2024-03-02 12:00:00")]  # sentinel closes window 1
    src = str(tmp_path / "enc_src")
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_encoding_by_window(
        stream, "doc_id", "text", time_col="ts",
        window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("encw")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM encw").collect()}
    row = got["2024-03-01 00:00:00"]
    assert row["rows"] == 3
    assert row["n_mojibake"] == 1     # the Ã© sequence in doc 1
    assert row["n_control"] == 1 and row["n_replacement"] == 1
    assert row["n_nbsp"] == 0
    assert abs(row["dirty_share"] - 2 / 3) < 1e-12


def test_stream_repetition_window(spark, tmp_path):
    from spark_schema_guard.streaming import stream_repetition_by_window

    rows = [(1, "spam spam spam spam", "2024-03-01 00:10:00"),
            (2, "all words here differ fully", "2024-03-01 00:20:00"),
            (3, "x", "2024-03-02 12:00:00")]
    src = str(tmp_path / "rep_src")
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_repetition_by_window(
        stream, "text", time_col="ts", n=1,
        window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("rep")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM rep").collect()}
    row = got["2024-03-01 00:00:00"]
    assert row["rows"] == 2
    # doc1: top gram 'spam' 4/4 = 1.0; doc2: 1/5 = 0.2
    assert abs(row["mean_top_gram_frac"] - 0.6) < 1e-9
    assert row["repetitive_share"] == 0.5


def test_stream_pii_and_chunks_stateless(spark, tmp_path):
    """pii_features and chunk_documents are pure projections (zero
    shuffle, no aggregation), so they run UNCHANGED on a streaming
    DataFrame in append mode — streaming results match the batch
    operators row-for-row on the same input."""
    from spark_schema_guard.operators.textstats import (
        chunk_documents, pii_features)

    docs = [(1, "mail a@b.io from 10.0.0.1 " + "tok " * 40),
            (2, "clean text " * 3),
            (3, "")]
    src = str(tmp_path / "pii_src")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(src)
    static = spark.read.parquet(src)

    batch_pii = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["pii_free"])
                 for r in pii_features(static, "doc_id", "text").collect()}
    batch_chunks = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(static, "doc_id", "text",
                                 chunk_tokens=16, overlap=4).collect())

    stream = spark.readStream.schema(static.schema).parquet(src)
    q1 = (pii_features(stream, "doc_id", "text")
          .writeStream.format("memory").queryName("s_pii")
          .outputMode("append").trigger(availableNow=True).start())
    q2 = (chunk_documents(stream, "doc_id", "text",
                          chunk_tokens=16, overlap=4)
          .writeStream.format("memory").queryName("s_chunks")
          .outputMode("append").trigger(availableNow=True).start())
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    got_pii = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["pii_free"])
               for r in spark.sql("SELECT * FROM s_pii").collect()}
    got_chunks = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM s_chunks").collect())
    assert got_pii == batch_pii
    assert batch_pii[1][2] is False and batch_pii[2][2] is True
    assert got_chunks == batch_chunks and len(batch_chunks) >= 4


def test_stream_dedup_sink_foreachbatch(spark, tmp_path):
    """Micro-batch incremental dedup against a frozen index, with the
    parquet-backed delta guarding later batches against earlier ones:
    batch 1's corpus-dup drops, batch 2's dup OF BATCH 1's survivor
    drops (delta path), fresh docs survive — with zero streaming state."""
    from spark_schema_guard.operators.dedup import minhash_band_index
    from spark_schema_guard.streaming import stream_dedup_sink

    corpus_text = "the quick brown fox jumps over the lazy dog again today"
    novel_1 = "a totally new document about watermark semantics in spark"
    novel_2 = "another fresh page describing parquet bucketing strategies"
    corpus = spark.createDataFrame([(1, corpus_text)],
                                   "doc_id long, text string")
    kw = dict(num_hashes=16, bands=8)
    index = minhash_band_index(corpus, "doc_id", "text", **kw)

    src = str(tmp_path / "dd_src")
    # one file per micro-batch (maxFilesPerTrigger=1)
    spark.createDataFrame([(10, corpus_text), (11, novel_1)],
                          "doc_id long, text string") \
        .coalesce(1).write.parquet(src)
    spark.createDataFrame([(20, novel_1), (21, novel_2)],
                          "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)

    static = spark.read.parquet(src)
    out = str(tmp_path / "dd_out")
    delta = str(tmp_path / "dd_delta")
    sink = stream_dedup_sink(index, "doc_id", "text", out,
                             min_shared_bands=2, index_delta_path=delta,
                             **kw)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "dd_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["__batch_id"], set()).add(r["doc_id"])
    # 2 micro-batches ran; 10 matched the frozen index; one of the two
    # novel_1 copies (whichever batch came second) matched the delta
    assert len(by_batch) == 2
    survivors = {d for s in by_batch.values() for d in s}
    assert 10 not in survivors
    assert 21 in survivors
    assert len(survivors & {11, 20}) == 1  # exactly one novel_1 copy kept
    # delta holds band rows only for survivors
    delta_ids = {r["id"] for r in spark.read.parquet(delta).collect()}
    assert delta_ids == survivors


def test_stream_dedup_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the sink with the SAME
    batch_id (a post-write, pre-checkpoint crash replay) must not
    duplicate survivors or their delta band rows — both writes are
    per-batch dynamic partition overwrites."""
    from spark_schema_guard.operators.dedup import minhash_band_index
    from spark_schema_guard.streaming import stream_dedup_sink

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again today")],
        "doc_id long, text string")
    kw = dict(num_hashes=16, bands=8)
    index = minhash_band_index(corpus, "doc_id", "text", **kw)
    out = str(tmp_path / "rp_out")
    delta = str(tmp_path / "rp_delta")
    sink = stream_dedup_sink(index, "doc_id", "text", out,
                             min_shared_bands=2, index_delta_path=delta, **kw)

    batch = spark.createDataFrame(
        [(10, "a totally new document about watermark semantics in spark"),
         (11, "another fresh page describing parquet bucketing strategies")],
        "doc_id long, text string")
    sink(batch, 0)
    sink(batch, 0)  # replay of the same micro-batch
    rows = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in rows) == [10, 11]  # no doubles
    n_delta = spark.read.parquet(delta).count()
    sink(batch, 0)  # and again, now with the delta present
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(delta).count() == n_delta

    # a later batch still appends (its own partition), earlier kept
    batch2 = spark.createDataFrame(
        [(20, "completely different content for the second micro batch")],
        "doc_id long, text string")
    sink(batch2, 1)
    assert spark.read.parquet(out).count() == 3


def test_stream_dedup_sink_fails_loudly_on_bad_delta(spark, tmp_path):
    """Only the first-batch missing-path case is rescued; a corrupt delta
    must raise, not silently stop deduplicating against history."""
    import pytest as _pytest

    from spark_schema_guard.operators.dedup import minhash_band_index
    from spark_schema_guard.streaming import stream_dedup_sink

    corpus = spark.createDataFrame([(1, "some corpus text here")],
                                   "doc_id long, text string")
    index = minhash_band_index(corpus, "doc_id", "text")
    bad_delta = tmp_path / "bad_delta"
    bad_delta.mkdir()
    (bad_delta / "junk.parquet").write_bytes(b"not a parquet file")
    sink = stream_dedup_sink(index, "doc_id", "text",
                             str(tmp_path / "bd_out"),
                             index_delta_path=str(bad_delta))
    batch = spark.createDataFrame([(10, "whatever text")],
                                  "doc_id long, text string")
    with _pytest.raises(Exception):
        sink(batch, 0)


def test_stream_extraction_window(spark, tmp_path):
    from spark_schema_guard.streaming import stream_extraction_by_window

    rows = [
        (1, bytearray(b"<html><p>good text</p></html>"), "good text",
         "2024-03-01 00:10:00"),                       # match
        (2, bytearray(b"<html><p>page says A</p></html>"), "page says B",
         "2024-03-01 00:20:00"),                       # mismatch
        (3, None, "orphan text", "2024-03-01 00:30:00"),  # missing_html
        (4, bytearray(b"\xff\xfe\x00bad"), "x",
         "2024-03-01 00:40:00"),                       # undecodable
        (5, bytearray(b"<p>z</p>"), "z", "2024-03-02 12:00:00"),  # sentinel
    ]
    src = str(tmp_path / "ext_src")
    df = spark.createDataFrame(
        rows, "doc_id long, html binary, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_extraction_by_window(
        stream, time_col="ts", window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("ext")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM ext").collect()}
    row = got["2024-03-01 00:00:00"]
    assert row["rows"] == 4
    assert row["n_match"] == 1
    assert row["n_mismatch"] == 1
    assert row["n_missing_html"] == 1
    assert row["n_undecodable"] == 1
    assert row["n_missing_text"] == 0


def test_stream_validate_mined_json_contract(spark, tmp_path):
    """Mine-once / stream-validate-forever for a dynamic JSON column:
    suggested_json_schema on a trusted batch snapshot, then
    validate_json_column (pure Column expressions — stateless) applied
    directly to a readStream of the next, drifted batch.  Stream
    verdicts must equal the batch run's, and the drift (a novel key
    under the closed contract, an out-of-bounds integer) is flagged."""
    from spark_schema_guard.jsoncol import validate_json_column
    from spark_schema_guard.operators import suggested_json_schema

    snap = spark.createDataFrame(
        [(i, '{"k": %d, "lang": "l%d"}' % (i % 50, i % 3))
         for i in range(200)],
        "event_id long, doc string")
    mined = suggested_json_schema(snap, "doc", distinct="exact")
    assert mined["additionalProperties"] is False

    rows = []
    for i in range(300):
        extra = ', "surprise": 1' if i % 7 == 0 else ""
        k = 999 if i % 11 == 0 else i % 50
        rows.append((i, '{"k": %d, "lang": "l%d"%s}' % (k, i % 3, extra)))
    batch = spark.createDataFrame(rows, "event_id long, doc string")
    src = str(tmp_path / "json_stream_src")
    batch.write.parquet(src)
    static = spark.read.parquet(src)

    stream = spark.readStream.schema(static.schema).parquet(src)
    out = validate_json_column(stream, "doc", mined, engine="columnar")
    q = (out.select("event_id", "verdict")
         .writeStream.format("memory").queryName("jsonv")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["event_id"]: r["verdict"]
           for r in spark.sql("SELECT * FROM jsonv").collect()}
    want = {r["event_id"]: r["verdict"]
            for r in validate_json_column(static, "doc", mined,
                                          engine="columnar")
            .select("event_id", "verdict").collect()}
    assert len(got) == 300 and got == want
    assert not want[0]        # novel key + out-of-bounds k
    assert not want[7]        # novel key alone (closed contract)
    assert not want[11]       # k past the mined maximum
    assert want[1] and want[2]


def test_cli_suggest_mines_then_validates(sf_dir, tmp_path):
    """suggest --table mines a schema whose JSON feeds straight back
    into validate --schema; the mined contract is closed over its own
    snapshot (zero False verdicts)."""
    schema_out = tmp_path / "mined.json"
    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "suggest",
         "--table", f"{sf_dir}/documents.parquet",
         "--columns", "doc_id,lang,n_chars",
         "--distinct", "exact", "--out", str(schema_out), "--cores", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["properties"] == 3
    mined = json.loads(schema_out.read_text())
    assert mined["properties"]["doc_id"]["type"] == "integer"

    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "validate",
         "--schema", str(schema_out),
         "--table", f"{sf_dir}/documents.parquet", "--cores", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    counts = json.loads(out.stdout.strip().splitlines()[-1])
    assert counts == {"True": counts["True"]}  # closed: no False bucket


def test_cli_suggest_json_col(sf_dir, tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "spark_schema_guard", "suggest",
         "--table", f"{sf_dir}/events.parquet", "--json-col", "props",
         "--distinct", "exact"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    mined = json.loads(out.stdout)
    assert mined["properties"]["k"]["type"] == "integer"
    assert mined["additionalProperties"] is False


def test_stream_gate_window(spark, tmp_path):
    from spark_schema_guard.streaming import stream_gate_by_window

    good = " ".join(["the cat and dog have fun with all of that stuff"] * 6)
    rows = [(1, good, "2024-03-01 00:10:00"),
            (2, "too short", "2024-03-01 00:20:00"),
            (3, None, "2024-03-01 00:25:00"),
            (4, "x", "2024-03-02 12:00:00")]  # sentinel closes window 1
    src = str(tmp_path / "gate_src")
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_gate_by_window(
        stream, "doc_id", "text", time_col="ts", gate="gopher",
        window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("gate_q")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM gate_q").collect()}
    row = got["2024-03-01 00:00:00"]
    # doc 1 passes, doc 2 fails, doc 3 is NULL-verdict (excluded from share)
    assert row["rows"] == 3 and row["kept"] == 1
    assert row["keep_share"] == 0.5 and row["n_null_verdict"] == 1
    # the c4 variant accepts forwarded thresholds
    out2 = stream_gate_by_window(
        stream, "doc_id", "text", time_col="ts", gate="c4",
        window="1 hour", watermark="30 minutes",
        min_kept_lines=0, page_drop_phrases=())
    q2 = (out2.writeStream.format("memory").queryName("gate_q2")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = {str(r["window_start"]): r
            for r in spark.sql("SELECT * FROM gate_q2").collect()}
    assert got2["2024-03-01 00:00:00"]["rows"] == 3
    assert got2["2024-03-01 00:00:00"]["kept"] == 2  # min_kept_lines=0
    import pytest
    with pytest.raises(ValueError):
        stream_gate_by_window(stream, "doc_id", "text", time_col="ts",
                              gate="nope")


def test_stream_blocked_urls(spark, tmp_path):
    from spark_schema_guard.streaming import stream_blocked_urls

    rows = [(1, "https://ads.tracker.example/x"),
            (2, "https://ok.example/y"),
            (3, "https://user@sub.bad.org:8443/a"),
            (4, "not a url")]
    src = str(tmp_path / "bl_src")
    spark.createDataFrame(rows, "doc_id long, url string").write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    bl = spark.createDataFrame([("tracker.example",), ("BAD.org",)],
                               "domain string")
    out = stream_blocked_urls(stream, "url", bl)
    q = (out.writeStream.format("memory").queryName("blk")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["blocked"], r["matched_domain"])
           for r in spark.sql("SELECT * FROM blk").collect()}
    assert got == {1: (True, "tracker.example"), 2: (False, None),
                   3: (True, "bad.org"), 4: (False, None)}
    # streaming verdicts must agree with the batch operator
    from spark_schema_guard.operators.urlfilter import blocked_urls
    batch = {r["doc_id"]: (r["blocked"], r["matched_domain"])
             for r in blocked_urls(static, "doc_id", "url", bl).collect()}
    assert batch == got


def test_stream_lm_bits_window(spark, tmp_path):
    import math

    from spark_schema_guard.operators.lmscore import train_ngram_lm
    from spark_schema_guard.streaming import stream_lm_bits_by_window

    ref = spark.createDataFrame([(1, "a b a b c"), (2, "b a")],
                                "id long, text string")
    lm = train_ngram_lm(ref, "id", "text")
    rows = [(1, "a b c", "2024-03-01 00:10:00"),   # P=3/5, 2/6
            (2, "z z", "2024-03-01 00:20:00"),     # P=1/3 (OOV ctx)
            (3, "a", "2024-03-01 00:25:00"),       # no bigrams
            (4, "a b", "2024-03-02 12:00:00")]     # sentinel closes win 1
    src = str(tmp_path / "lm_src")
    spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts")).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_lm_bits_by_window(stream, "text", lm, time_col="ts",
                                   window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("lmw")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {str(r["window_start"]): r
           for r in spark.sql("SELECT * FROM lmw").collect()}
    row = got["2024-03-01 00:00:00"]
    assert row["n_bigrams"] == 3
    expect = -(math.log2(3 / 5) + math.log2(2 / 6) + math.log2(1 / 3)) / 3
    assert abs(row["mean_h_bits"] - expect) < 1e-12
