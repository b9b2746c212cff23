"""JSON string column validation: python (exact) and columnar (from_json)
engines over events.props and synthetic open-key documents."""

import json

import pytest
from pyspark.sql import functions as F

import spark_schema_guard as ssg
from spark_schema_guard.jsoncol import validate_json_column

PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 80}},
}

OPEN_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer"}},
    "patternProperties": {"^x_": {"type": "number"}},
    "additionalProperties": False,
    "propertyNames": {"maxLength": 8},
    "dependencies": {"a": ["b"]},
}


def test_events_props_python_engine(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = validate_json_column(df, "props", PROPS_SCHEMA, engine="python")
    rows = out.select("props", "violations", "verdict").limit(300).collect()
    validator = ssg.compile(PROPS_SCHEMA, fast_fail=False)
    for row in rows:
        expected = [e.as_row() for e in validator.collect(json.loads(row["props"]))]
        actual = [v.asDict() for v in row["violations"]]
        assert actual == expected
        assert row["verdict"] == (not expected)


def test_open_key_schema_python_engine(spark):
    docs = [
        '{"k": 1}',
        '{"k": "s"}',
        '{"k": 1, "x_a": 2.5}',
        '{"k": 1, "x_a": "bad"}',
        '{"k": 1, "zzz": 9}',
        '{"k": 1, "toolongkey": 1}',
        '{"k": 1, "a": 1}',
        '{"k": 1, "a": 1, "b": 2}',
        '{bad json',
        None,
        '{}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    out = validate_json_column(df, "props", OPEN_SCHEMA, engine="python")
    got = {row["props"]: [v["rule"] for v in row["violations"]]
           for row in out.collect()}
    validator = ssg.compile(OPEN_SCHEMA, fast_fail=False)
    for doc in docs:
        if doc is None:
            assert got[None] == []
        elif doc == "{bad json":
            assert got[doc] == [None]  # malformed JSON sentinel
        else:
            assert got[doc] == [e.rule for e in validator.collect(json.loads(doc))]


def test_events_props_columnar_engine(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    py = validate_json_column(df, "props", PROPS_SCHEMA, engine="python")
    jvm = validate_json_column(df, "props", PROPS_SCHEMA, engine="columnar")
    py_rows = {r["event_id"]: r["verdict"] for r in py.select("event_id", "verdict").collect()}
    jvm_rows = {r["event_id"]: r["verdict"] for r in jvm.select("event_id", "verdict").collect()}
    assert py_rows == jvm_rows


def test_columnar_engine_malformed(spark):
    df = spark.createDataFrame([('{"k": 5}',), ("{nope",), (None,)], "props string")
    out = validate_json_column(df, "props", PROPS_SCHEMA, engine="columnar")
    rows = {r["props"]: (r["verdict"], [v["message"] for v in r["violations"]])
            for r in out.collect()}
    assert rows['{"k": 5}'] == (True, [])
    assert rows["{nope"] == (False, ["data must be valid JSON"])
    assert rows[None] == (True, [])
