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


OPEN_KEY_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer"}},
    "additionalProperties": False,
    "propertyNames": {"maxLength": 8},
    "minProperties": 1,
    "maxProperties": 3,
    "dependencies": {"a": ["b"]},
}


def test_open_key_columnar_matches_python(spark):
    """Columnar open-key parity: additionalProperties False, propertyNames,
    min/maxProperties, dependencies presence, and required-with-explicit-
    null all see the TRUE runtime key set via json_object_keys."""
    docs = [
        '{"k": 1}',
        '{"k": null}',            # present key: fails type, NOT required
        '{}',                     # required + minProperties
        '{"k": 1, "zzz": 9}',     # additionalProperties
        '{"k": 1, "toolongkey": 1}',   # propertyNames + additional
        '{"k": 1, "a": 1}',       # dependencies (a needs b) + additional
        '{"k": 1, "a": 1, "b": 2, "c": 3}',  # maxProperties + additional
    ]
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    py = validate_json_column(df, "props", OPEN_KEY_SCHEMA, engine="python")
    cols = validate_json_column(df, "props", OPEN_KEY_SCHEMA, engine="columnar")
    py_rows = {r["props"]: [v["rule"] for v in r["violations"]]
               for r in py.collect()}
    col_rows = {r["props"]: [v["rule"] for v in r["violations"]]
                for r in cols.collect()}
    assert py_rows == col_rows
    # verdict parity also for non-object JSON (message approximated as
    # the malformed sentinel columnar-side, but verdict must agree)
    shapes = spark.createDataFrame(
        [('[1, 2]',), ('5',), ('"s"',)], "props string")
    pv = {r["props"]: r["verdict"] for r in validate_json_column(
        shapes, "props", OPEN_KEY_SCHEMA, engine="python").collect()}
    cv = {r["props"]: r["verdict"] for r in validate_json_column(
        shapes, "props", OPEN_KEY_SCHEMA, engine="columnar").collect()}
    assert pv == cv == {"[1, 2]": False, "5": False, '"s"': False}


def test_open_key_full_schema_columnar_matches_python(spark):
    """OPEN_SCHEMA (pattern value schemas + additionalProperties False +
    propertyNames + dependencies) runs columnar via the variant view of
    undeclared keys and must agree with the exact python engine."""
    docs = [
        '{"k": 1}',
        '{"k": "s"}',
        '{"k": 1, "x_a": 2.5}',
        '{"k": 1, "x_a": "bad"}',
        '{"k": 1, "x_a": true}',
        '{"k": 1, "zzz": 9}',
        '{"k": 1, "toolongkey": 1}',
        '{}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    py = validate_json_column(df, "props", OPEN_SCHEMA, engine="python")
    cols = validate_json_column(df, "props", OPEN_SCHEMA, engine="columnar")
    pv = {r["props"]: (r["verdict"], sorted(v["rule"] or "" for v in r["violations"]))
          for r in py.collect()}
    cv = {r["props"]: (r["verdict"], sorted(v["rule"] or "" for v in r["violations"]))
          for r in cols.collect()}
    assert pv == cv


def test_open_key_variant_value_schemas(spark):
    """additionalProperties/patternProperties VALUE schemas over
    undeclared keys: scalars AND nested containers compile via variant
    (array<variant> / map<string,variant> recursion)."""
    add_schema = {"type": "object",
                  "properties": {"k": {"type": "integer"}},
                  "additionalProperties": {"type": "string", "minLength": 2}}
    docs = ['{"k": 1, "a": "ok"}', '{"k": 1, "a": "x"}',
            '{"k": 1, "a": 7}', '{"k": 1}', '{"k": 1, "a": null}']
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    py = validate_json_column(df, "props", add_schema, engine="python")
    cols = validate_json_column(df, "props", add_schema, engine="columnar")
    pv = {r["props"]: [(v["rule"], v["message"]) for v in r["violations"]]
          for r in py.collect()}
    cv = {r["props"]: [(v["rule"], v["message"]) for v in r["violations"]]
          for r in cols.collect()}
    assert pv == cv

    nested = {"type": "object",
              "additionalProperties": {"type": "object",
                                       "required": ["x"],
                                       "properties": {
                                           "x": {"type": "array",
                                                 "items": {"type": "integer"},
                                                 "minItems": 1}}}}
    ndocs = ['{"o": {"x": [1]}}', '{"o": {"x": []}}', '{"o": {"x": ["s"]}}',
             '{"o": {}}', '{"o": 3}', '{"o": {"x": [1], "y": 0}}', '{}']
    ndf = spark.createDataFrame([(d,) for d in ndocs], "props string")
    npy = validate_json_column(ndf, "props", nested, engine="python")
    ncols = validate_json_column(ndf, "props", nested, engine="columnar")
    npv = {r["props"]: [(v["rule"], v["message"]) for v in r["violations"]]
           for r in npy.collect()}
    ncv = {r["props"]: [(v["rule"], v["message"]) for v in r["violations"]]
           for r in ncols.collect()}
    assert npv == ncv


def test_variant_deep_enum_const(spark):
    """enum/const members that are arrays/objects compare with the
    reference's type-strict deep equality (draft04.py:120-155) over the
    variant view: bool is identity, 1 == 1.0 but never True, dicts need
    the exact key set, lists exact length — all unrolled statically."""
    schema = {"type": "object",
              "properties": {"k": {"type": "integer"}},
              "additionalProperties": {
                  "enum": [[1, 2], {"a": 1, "b": [True, None]}, "x", 3,
                           [], {}, {"a": True}]}}
    docs = ['{"k":1,"z":[1,2]}', '{"k":1,"z":[1,2,3]}',
            '{"k":1,"z":[1.0,2]}', '{"k":1,"z":[true,2]}',
            '{"k":1,"z":{"a":1,"b":[true,null]}}',
            '{"k":1,"z":{"a":1,"b":[true,0]}}',
            '{"k":1,"z":{"a":1.0,"b":[true,null]}}',
            '{"k":1,"z":{"a":true}}', '{"k":1,"z":{"a":1}}',
            '{"k":1,"z":[]}', '{"k":1,"z":{}}', '{"k":1,"z":"x"}',
            '{"k":1,"z":3}', '{"k":1,"z":3.5}', '{"k":1,"z":null}']
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    py = {r["props"]: (r["verdict"],
                       [(v["rule"], v["message"]) for v in r["violations"]])
          for r in validate_json_column(df, "props", schema,
                                        engine="python").collect()}
    co = {r["props"]: (r["verdict"],
                       [(v["rule"], v["message"]) for v in r["violations"]])
          for r in validate_json_column(df, "props", schema,
                                        engine="columnar").collect()}
    assert py == co
    assert py['{"k":1,"z":[1.0,2]}'][0] is True       # 1.0 == 1
    assert py['{"k":1,"z":[true,2]}'][0] is False     # True is not 1

    const_schema = {"type": "object",
                    "additionalProperties": {"const": {"a": [1, "x"]}}}
    cdocs = ['{"z":{"a":[1,"x"]}}', '{"z":{"a":[1,"y"]}}',
             '{"z":{"a":[1,"x"],"b":1}}', '{"z":{"a":[1.0,"x"]}}']
    cdf = spark.createDataFrame([(d,) for d in cdocs], "props string")
    cpy = {r["props"]: (r["verdict"],
                        [(v["rule"], v["message"]) for v in r["violations"]])
           for r in validate_json_column(cdf, "props", const_schema,
                                         engine="python").collect()}
    cco = {r["props"]: (r["verdict"],
                        [(v["rule"], v["message"]) for v in r["violations"]])
           for r in validate_json_column(cdf, "props", const_schema,
                                         engine="columnar").collect()}
    assert cpy == cco
    assert cpy['{"z":{"a":[1,"x"]}}'][0] is True
    assert cpy['{"z":{"a":[1.0,"x"]}}'][0] is True


def test_open_key_message_parity(spark):
    """Byte parity of the open-key violation messages vs the reference
    row validator."""
    docs = ['{"k": 1, "zz": 1, "aa": 2}', '{"k": 1, "toolongkey": 1}']
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    schema = {"type": "object",
              "properties": {"k": {"type": "integer"}},
              "additionalProperties": False,
              "propertyNames": {"maxLength": 8}}
    py = validate_json_column(df, "props", schema, engine="python")
    cols = validate_json_column(df, "props", schema, engine="columnar")
    pm = {r["props"]: [v["message"] for v in r["violations"]] for r in py.collect()}
    cm = {r["props"]: [v["message"] for v in r["violations"]] for r in cols.collect()}
    assert pm == cm


def test_coerce_mode_fast_path(spark, sf_dir):
    """json_types='coerce' validates the typed struct parse directly:
    agrees with exact mode on well-typed data, and refuses undeclared-key
    value schemas instead of mistyping them."""
    from spark_schema_guard.columnar.compiler import PlanUnsupported

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = validate_json_column(events, "props", PROPS_SCHEMA,
                                 engine="columnar")
    coerce = validate_json_column(events, "props", PROPS_SCHEMA,
                                  engine="columnar", json_types="coerce")
    a = {r["event_id"]: r["verdict"]
         for r in exact.select("event_id", "verdict").collect()}
    b = {r["event_id"]: r["verdict"]
         for r in coerce.select("event_id", "verdict").collect()}
    assert a == b
    # key-level open-key rules still work in coerce mode
    df = spark.createDataFrame([('{"k": 1, "zz": 2}',), ('{"k": 1}',)],
                               "props string")
    closed = {**PROPS_SCHEMA, "additionalProperties": False}
    got = {r["props"]: r["verdict"] for r in validate_json_column(
        df, "props", closed, engine="columnar",
        json_types="coerce").collect()}
    assert got == {'{"k": 1, "zz": 2}': False, '{"k": 1}': True}
    # value schemas over undeclared keys need exact typing
    open_vals = {**PROPS_SCHEMA, "additionalProperties": {"type": "string"}}
    with pytest.raises(PlanUnsupported, match="exact"):
        validate_json_column(df, "props", open_vals, engine="columnar",
                             json_types="coerce")
    with pytest.raises(ValueError, match="json_types"):
        validate_json_column(df, "props", PROPS_SCHEMA, engine="columnar",
                             json_types="bogus")


def test_ref_transparent_struct_inference_and_open_keys(spark):
    """$ref is transparent end-to-end in the columnar engine: a root-level
    $ref infers the referenced object's struct (declared-field typing,
    explicit-null semantics) and keeps the runtime key view
    (additionalProperties) — byte-parity with the python engine."""
    plain = {"type": "object", "required": ["k"],
             "properties": {"k": {"type": "integer"}},
             "additionalProperties": False}
    reffed = {"definitions": {"obj": plain}, "$ref": "#/definitions/obj"}
    from spark_schema_guard.columnar import spark_struct_for
    assert spark_struct_for(reffed).simpleString() == "struct<k:bigint>"

    df = spark.createDataFrame(
        [('{"k": null}',), ('{"k": 1, "zz": 2}',), ('{"k": "s"}',),
         ('{"k": 7}',), ('not json',)], "props string")
    results = {}
    for eng in ("python", "columnar"):
        out = validate_json_column(df, "props", reffed, engine=eng)
        results[eng] = {
            r["props"]: (r["verdict"],
                         [v["message"] for v in (r["violations"] or [])])
            for r in out.collect()}
    assert results["python"] == results["columnar"]
    assert results["columnar"]['{"k": 7}'][0] is True
    assert results["columnar"]['{"k": null}'][0] is False


def test_recursive_ref_columnar_unrolls_to_depth(spark):
    """Recursive $ref compiles COLUMNAR now: the unroll repeats each
    canonical ref up to ref_unroll_depth times along a compile path
    (the reference compiles recursion to recursive functions,
    generator.py:192-217; expression trees must unroll).  In-bound
    documents validate with exact python-engine parity; data nested
    DEEPER than the bound raises at evaluation time by default (never a
    silently wrong verdict) or emits a distinguishable violation with
    on_depth_exceeded='violation'."""
    from spark_schema_guard.columnar import spark_struct_for

    rec = {"definitions": {"node": {
               "type": "object",
               "properties": {"v": {"type": "integer"},
                              "next": {"$ref": "#/definitions/node"}}}},
           "$ref": "#/definitions/node"}
    assert spark_struct_for(rec).simpleString() == "struct<v:bigint,next:string>"
    docs = ['{"v": 1, "next": {"v": 2}}',
            '{"v": "bad"}',
            '{"v": 1, "next": {"v": "bad"}}',
            '{"v": 1, "next": {"next": {"v": 3}}}',
            '{"v": 1, "next": {"next": {"next": {"v": "bad"}}}}']
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    results = {}
    for eng in ("python", "columnar"):
        out = validate_json_column(df, "props", rec, engine=eng)
        results[eng] = {
            r["props"]: (r["verdict"],
                         [v["message"] for v in (r["violations"] or [])])
            for r in out.collect()}
    assert results["python"] == results["columnar"]
    assert results["columnar"]['{"v": 1, "next": {"v": 2}}'][0] is True
    assert results["columnar"]['{"v": 1, "next": {"v": "bad"}}'] == (
        False, ["data.next.v must be integer"])

    # the columnar plan stays pure-JVM (no Arrow/Python eval)
    text = (validate_json_column(df, "props", rec, engine="columnar")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in text and "BatchEvalPython" not in text


def test_recursive_ref_depth_exceeded_is_loud(spark):
    """Data nested past ref_unroll_depth: 'error' mode raises at
    evaluation (the default — depth-1 keeps the plan small and honest),
    'violation' mode emits a distinguishable violation row."""
    rec = {"definitions": {"node": {
               "type": "object",
               "properties": {"v": {"type": "integer"},
                              "next": {"$ref": "#/definitions/node"}}}},
           "$ref": "#/definitions/node"}
    deep = '{"next": {"next": {"v": 1}}}'
    df = spark.createDataFrame([(deep,)], "props string")

    out = validate_json_column(df, "props", rec, engine="columnar",
                               ref_unroll_depth=1)
    with pytest.raises(Exception, match="unroll depth"):
        out.collect()

    out2 = validate_json_column(df, "props", rec, engine="columnar",
                                ref_unroll_depth=1,
                                on_depth_exceeded="violation")
    rows = out2.collect()
    assert rows[0]["verdict"] is False
    assert any("unroll depth" in v["message"]
               for v in rows[0]["violations"])
    # an in-bound sibling row is untouched by the guard
    df2 = spark.createDataFrame([('{"next": {"v": 1}}',)], "props string")
    ok = validate_json_column(df2, "props", rec, engine="columnar",
                              ref_unroll_depth=1).collect()
    assert ok[0]["verdict"] is True


def test_engine_auto_picks_columnar_else_python(spark):
    """engine='auto': JVM columnar plan when expressible, exact python
    engine on PlanUnsupported — never an error, never silent wrongness."""
    df = spark.createDataFrame([('{"k": 1}',), ('{"k": "s"}',)], "props string")
    expressible = {"type": "object", "properties": {"k": {"type": "integer"}}}
    out = validate_json_column(df, "props", expressible, engine="auto")
    text = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in text  # took the columnar path
    assert {r["props"]: r["verdict"] for r in out.collect()} == {
        '{"k": 1}': True, '{"k": "s"}': False}

    # recursion now stays columnar (depth-bounded unroll) — a CALLABLE
    # custom format over undeclared keys is still PlanUnsupported, so
    # auto falls back to the exact engine there
    unsupported = {"type": "object",
                   "additionalProperties": {"format": "always-ok"}}
    out2 = validate_json_column(df, "props", unsupported, engine="auto",
                                formats={"always-ok": lambda v: True})
    text2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in text2  # fell back to the exact engine
    assert all(r["verdict"] for r in out2.collect())


def test_bigint_precision_parity_with_python_engine(spark):
    """Numeric keywords over dynamically-typed JSON values compare like
    the reference: bounds and enum/const are EXACT past 2^53 (BIGINT
    variants compare as longs — the double view rounds onto the wrong
    side), while multipleOf keeps the reference's float-division
    semantics (a huge odd int IS 'a multiple of 2' there)."""
    big = 2 ** 60 + 1
    docs = [f'{{"k": {big}}}', f'{{"k": {2 ** 60}}}',
            '{"k": 9007199254740993}', '{"k": -0.0}', '{"k": 1e308}',
            '{"k": 3.0}', '{"k": 2.5}', '{"k": true}',
            '{"k": -9223372036854775808}', '{"k": 9223372036854775807}']
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    cases = [
        {"type": "object", "properties": {"k": {"type": "integer", "minimum": big}}},
        {"type": "object", "properties": {"k": {"enum": [big, "x"]}}},
        {"type": "object", "properties": {"k": {"const": 3}}},
        {"type": "object", "properties": {"k": {"multipleOf": 2}}},
        # (bool + float-divisor multipleOf crashes IN THE REFERENCE —
        # Decimal(repr(True)) raises InvalidOperation — and the exact
        # engine faithfully mirrors that, so keep true out of this case)
        {"type": "object", "properties": {"k": {"multipleOf": 0.5}},
         "__skip_docs__": ['{"k": true}']},
        {"type": "object", "properties": {"k": {"maximum": 2.5}}},
        {"type": "object", "properties": {"k": {"exclusiveMinimum": float(2 ** 60)}}},
        {"type": "object", "properties": {"k": {"maximum": -2 ** 63}}},
    ]
    for sch in cases:
        skip = sch.pop("__skip_docs__", [])
        case_df = spark.createDataFrame(
            [(d,) for d in docs if d not in skip], "props string")
        res = {}
        for eng in ("python", "columnar"):
            out = validate_json_column(case_df, "props", sch, engine=eng)
            res[eng] = {r["props"]: r["verdict"] for r in out.collect()}
        assert res["python"] == res["columnar"], (sch, res)


def test_combinators_on_declared_json_fields(spark):
    """Combinator schemas (anyOf/oneOf/allOf/not/if-then-else) on
    DECLARED JSON fields compile over the variant view when every
    branch is scalar — exact dynamic-type semantics with byte-parity
    messages (incl. oneOf's dynamic '(N matches found)'), instead of
    the coercing struct fallback that mis-typed heterogeneous values."""
    docs = ['{"k": 5}', '{"k": "abc"}', '{"k": true}', '{"k": 5.5}',
            '{"k": null}', '{}', '{"k": 15}', '{"k": 9}']
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    cases = [
        {"type": "object", "properties": {"k": {"anyOf": [
            {"type": "integer"}, {"type": "boolean"}]}}},
        {"type": "object", "properties": {"k": {"oneOf": [
            {"type": "number", "multipleOf": 3},
            {"type": "number", "multipleOf": 5}]}}},
        {"type": "object", "properties": {"k": {"not": {"type": "string"}}}},
        {"type": "object", "properties": {"k": {
            "if": {"type": "integer"}, "then": {"minimum": 3},
            "else": {"type": "string"}}}},
        {"type": "object", "properties": {"k": {"allOf": [
            {"type": "number"}, {"minimum": 5}]}}},
        {"type": "object", "properties": {"k": {"not": True}}},
        {"type": "object", "properties": {"k": {"not": {}}}},
    ]
    for sch in cases:
        res = {}
        for eng in ("python", "columnar"):
            out = validate_json_column(df, "props", sch, engine=eng)
            res[eng] = {
                r["props"]: (r["verdict"],
                             [(x["rule"], x["message"])
                              for x in r["violations"]])
                for r in out.collect()}
        assert res["python"] == res["columnar"], (sch, res)
