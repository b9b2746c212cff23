"""suggest_json_constraints / suggested_json_schema / json_constraint_drift:
schema mining over dynamic JSON columns — the inverse of
validate_json_column (reference direction: schema -> validator,
/root/reference/fastjsonschema/__init__.py:212).

Key invariants pinned here:
* hand-computed per-key stats (types, presence, explicit nulls, bounds,
  lengths, enum eligibility, required) on literal docs;
* the mined contract is CLOSED over its snapshot (every object doc
  validates), and with additionalProperties=False a novel key in a new
  batch fails — the drift signal a mined contract exists for;
* integer bounds are EXACT past 2^53 and OMITTED (never rounded) when a
  value exceeded long range — a rounded bound would exclude real data;
* the doc-count sentinel key never leaks into the profile, even when a
  hostile doc carries the sentinel name itself.
"""

import pytest
from pyspark.sql import functions as F

from spark_schema_guard.jsoncol import validate_json_column
from spark_schema_guard.operators.suggest import (json_constraint_drift,
                                                  suggest_json_constraints,
                                                  suggested_json_schema)


def _profile(spark, docs, **kw):
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    prof = suggest_json_constraints(df, "doc", distinct="exact", **kw)
    return {r["key"]: r for r in prof.collect()}


def test_hand_computed_profile(spark):
    docs = [
        '{"k": 5, "lang": "en", "score": 0.25}',
        '{"k": -3, "lang": "de", "score": 1.5, "note": null}',
        '{"k": 96, "lang": "en", "score": 0.0, "tags": [1, 2]}',
        '{"k": 7, "lang": "fr", "score": 0.75, "meta": {"a": 1}, '
        '"mix": "txt"}',
        '{"k": 0, "lang": "en", "score": 1.0, "mix": 42, "flag": true}',
        '[1, 2]',      # array root -> nonobject
        '{"broken',    # malformed -> nonobject
    ]
    by = _profile(spark, docs)
    assert set(by) == {"k", "lang", "score", "note", "tags", "meta",
                       "mix", "flag"}
    k = by["k"]
    assert (k["json_types"], k["n_objects"], k["n_nonobject"]) == \
        ("integer", 5, 2)
    assert (k["n_present"], k["n_null"], k["required"]) == (5, 0, True)
    assert (k["min_int"], k["max_int"]) == (-3, 96)
    assert (k["min_num"], k["max_num"]) == (-3.0, 96.0)
    lang = by["lang"]
    assert lang["json_types"] == "string" and lang["required"]
    assert (lang["n_distinct"], lang["enum_vals"]) == (3, "de,en,fr")
    assert (lang["min_len"], lang["max_len"]) == (2, 2)
    score = by["score"]
    assert score["json_types"] == "number" and score["required"]
    assert (score["min_num"], score["max_num"]) == (0.0, 1.5)
    assert score["min_int"] is None  # no integer values
    note = by["note"]
    assert (note["json_types"], note["n_present"], note["n_null"],
            note["required"]) == ("null", 1, 1, False)
    assert by["tags"]["json_types"] == "array"
    assert by["meta"]["json_types"] == "object"
    mix = by["mix"]
    assert mix["json_types"] == "integer,string"
    assert (mix["min_int"], mix["max_int"]) == (42, 42)
    assert (mix["min_len"], mix["max_len"]) == (3, 3)
    assert mix["enum_vals"] is None  # mixed types: never an enum
    assert by["flag"]["json_types"] == "boolean"


def test_mined_schema_closure_and_novel_key(spark):
    docs = [
        '{"k": 5, "lang": "en", "score": 0.25}',
        '{"k": -3, "lang": "de", "score": 1.5, "note": null}',
        '{"k": 96, "lang": "en", "score": 0.0, "mix": "txt"}',
        '{"k": 7, "lang": "fr", "score": 0.75, "mix": 42}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    mined = suggested_json_schema(df, "doc", distinct="exact")
    assert mined["required"] == ["k", "lang", "score"]
    assert mined["additionalProperties"] is False
    assert mined["properties"]["k"] == {"type": "integer",
                                        "minimum": -3, "maximum": 96}
    assert mined["properties"]["lang"]["enum"] == ["de", "en", "fr"]
    assert mined["properties"]["mix"]["type"] == ["integer", "string"]
    assert mined["properties"]["note"]["type"] == "null"

    # closure: every snapshot doc validates through BOTH engines
    for engine in ("columnar", "python"):
        out = validate_json_column(df, "doc", mined, engine=engine)
        assert out.where(~F.col("verdict")).count() == 0, engine

    # a novel key in the next batch fails (the contract is closed)
    nxt = spark.createDataFrame(
        [('{"k": 5, "lang": "en", "score": 0.25, "surprise": 1}',)],
        "doc string")
    out = validate_json_column(nxt, "doc", mined, engine="columnar")
    assert out.where(F.col("verdict")).count() == 0


def test_exact_int_bounds_past_2_53(spark):
    lo, hi = (1 << 60) + 1, (1 << 60) + 4049
    docs = ['{"big": %d}' % lo, '{"big": %d}' % hi]
    by = _profile(spark, docs)
    assert (by["big"]["min_int"], by["big"]["max_int"]) == (lo, hi)
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    mined = suggested_json_schema(df, "doc", distinct="exact")
    assert mined["properties"]["big"] == {"type": "integer",
                                          "minimum": lo, "maximum": hi}
    out = validate_json_column(df, "doc", mined, engine="columnar")
    assert out.where(~F.col("verdict")).count() == 0


def test_long_overflow_omits_bounds(spark):
    huge = 1 << 64  # DECIMAL(20,0) variant tag; long cast loses it
    docs = ['{"big": 5}', '{"big": %d}' % huge]
    by = _profile(spark, docs)
    assert by["big"]["json_types"] == "integer"
    assert by["big"]["min_int"] is None and by["big"]["max_int"] is None
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    mined = suggested_json_schema(df, "doc", distinct="exact")
    assert "minimum" not in mined["properties"]["big"]  # omitted, not wrong
    out = validate_json_column(df, "doc", mined, engine="python")
    assert out.where(~F.col("verdict")).count() == 0


def test_mixed_numeric_with_unsafe_int_omits_double_bounds(spark):
    docs = ['{"x": 0.5}', '{"x": %d}' % ((1 << 60) + 1)]
    by = _profile(spark, docs)
    assert by["x"]["json_types"] == "integer,number"
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    mined = suggested_json_schema(df, "doc", distinct="exact")
    # the double view rounds the 2^60 int: bounds must be omitted
    assert "minimum" not in mined["properties"]["x"]
    # a SAFE mixed key keeps double bounds
    docs2 = ['{"x": 0.5}', '{"x": 7}']
    df2 = spark.createDataFrame([(d,) for d in docs2], "doc string")
    mined2 = suggested_json_schema(df2, "doc", distinct="exact")
    assert mined2["properties"]["x"] == {"type": ["integer", "number"],
                                         "minimum": 0.5, "maximum": 7.0}
    out = validate_json_column(df2, "doc", mined2, engine="python")
    assert out.where(~F.col("verdict")).count() == 0


def test_enum_separator_poisoning_and_nullable(spark):
    by = _profile(spark, ['{"s": "a,b"}', '{"s": "c"}'])
    assert by["s"]["enum_vals"] is None  # value embeds the separator
    # null-typed values make the key ineligible too (enum would reject null)
    by2 = _profile(spark, ['{"s": "a"}', '{"s": null}'])
    assert by2["s"]["json_types"] == "null,string"
    assert by2["s"]["enum_vals"] is None


def test_sentinel_key_collision_documented_corner(spark):
    """The NUL-prefixed sentinel key is a reserved namespace: a hostile
    doc carrying it is counted by its OWN entry's value (object iff JSON
    null) and that entry never reaches the profile — exactly one
    documented corner, no inflation of unrelated counters."""
    docs = ['{"k": 1}', '{"k": 2, "\\u0000__doc__": 9}']
    by = _profile(spark, docs)
    assert "\x00__doc__" not in by        # sentinel never leaks
    assert by["k"]["n_present"] == 2      # real keys fully profiled
    # the colliding doc's sentinel value (9, not null) buckets it as
    # non-object — the one documented miscount on the reserved key
    assert by["k"]["n_objects"] == 1
    assert by["k"]["n_nonobject"] == 1
    # a colliding doc whose sentinel value IS null counts as an object
    by2 = _profile(spark, ['{"k": 1}', '{"k": 2, "\\u0000__doc__": null}'])
    assert by2["k"]["n_objects"] == 2 and by2["k"]["n_nonobject"] == 0


def test_boolean_bearing_key_gets_no_bounds(spark):
    """Both engines bound-check booleans (bool is int in the reference),
    so a bound mined over the numeric values alone would reject the
    snapshot's own `false` — boolean-bearing keys must omit bounds."""
    docs = ['{"x": false}', '{"x": 5}']
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    mined = suggested_json_schema(df, "doc", distinct="exact")
    assert mined["properties"]["x"]["type"] == ["boolean", "integer"]
    assert "minimum" not in mined["properties"]["x"]
    for engine in ("columnar", "python"):
        out = validate_json_column(df, "doc", mined, engine=engine)
        assert out.where(~F.col("verdict")).count() == 0, engine


def test_integral_decimal_number_past_2_53_omits_double_bounds(spark):
    """A scale-0 decimal literal past 2^53 types as "number"
    (json.loads parity) but the columnar engine compares it EXACTLY on
    the decimal view — a rounded double bound would reject the
    snapshot's own value, so bounds must be omitted."""
    v = (1 << 60) + 1
    docs = ['{"x": %d.0}' % v, '{"x": 0.5}']
    by = _profile(spark, docs)
    assert by["x"]["json_types"] == "number"
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    mined = suggested_json_schema(df, "doc", distinct="exact")
    assert "minimum" not in mined["properties"]["x"]
    out = validate_json_column(df, "doc", mined, engine="columnar")
    assert out.where(~F.col("verdict")).count() == 0


def test_max_keys_guard_fails_loudly(spark):
    """A map-shaped JSON column (one key per entity) must fail loudly
    instead of collecting an unbounded per-key profile."""
    df = spark.createDataFrame(
        [('{"item_%d": 1}' % i,) for i in range(40)], "doc string")
    with pytest.raises(ValueError, match="max_keys"):
        suggest_json_constraints(df, "doc", max_keys=10)
    # at or under the cap: fine
    prof = suggest_json_constraints(df, "doc", max_keys=40)
    assert prof.count() == 40


def test_empty_and_nonobject_only(spark):
    by = _profile(spark, ["[1]", "42", "null"])
    assert by == {}
    prof = suggest_json_constraints(
        spark.createDataFrame([], "doc string"), "doc")
    assert prof.collect() == []
    with pytest.raises(ValueError):
        suggest_json_constraints(
            spark.createDataFrame([("{}",)], "doc string"), "doc",
            distinct="bogus")


def test_json_constraint_drift_findings(spark):
    old = spark.createDataFrame(
        [('{"k": 5, "lang": "en"}',), ('{"k": 9, "lang": "de"}',)],
        "doc string")
    new = spark.createDataFrame(
        [('{"k": 50, "lang": "en", "extra": 1}',),
         ('{"k": -2, "lang": 7}',)],
        "doc string")
    a = suggest_json_constraints(old, "doc", distinct="exact")
    b = suggest_json_constraints(new, "doc", distinct="exact")
    got = {(r["finding"], r["column"]): r
           for r in json_constraint_drift(a, b).collect()}
    assert ("column_added", "extra") in got
    assert got[("type_changed", "lang")]["detail"] == \
        "string->integer,string"
    assert got[("type_changed", "lang")]["breaking"]
    assert got[("min_widened", "k")]["new_num"] == -2.0
    assert got[("max_widened", "k")]["new_num"] == 50.0
    # 'extra' present in only one new doc: absence maps to nullability —
    # but extra is column_added so no value findings for it; lang's
    # type change suppresses its value findings likewise
    assert not any(c == "lang" and f not in ("type_changed",)
                   for (f, c) in got)


def test_approx_mode_smoke(spark):
    df = spark.createDataFrame(
        [('{"k": %d, "lang": "l%d"}' % (i, i % 3),) for i in range(200)],
        "doc string")
    by = {r["key"]: r
          for r in suggest_json_constraints(df, "doc").collect()}
    assert by["k"]["required"] and by["k"]["min_int"] == 0
    assert by["lang"]["enum_vals"] == "l0,l1,l2"


def test_suggest_by_unit_matches_per_slice_miner(spark, sf_dir):
    """The grouped per-unit profile must equal running the eager
    single-table miner on each unit's slice (modulo the unit column)."""
    from spark_schema_guard.operators.suggest import (suggest_by_unit,
                                                      suggest_constraints)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = ["doc_id", "source", "n_chars"]
    per_unit = {(r["unit"], r["column"]): r
                for r in suggest_by_unit(docs, cols, unit_col="lang",
                                         distinct="exact").collect()}
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert langs and set(u for u, _ in per_unit) == set(langs)
    for lang in langs:
        sliced = {r["column"]: r for r in suggest_constraints(
            docs.where(F.col("lang") == lang).select(*cols),
            distinct="exact").collect()}
        for c in cols:
            got, want = per_unit[(lang, c)], sliced[c]
            for field in ("spark_type", "n_rows", "n_nulls", "n_distinct",
                          "min_num", "max_num", "min_int", "max_int",
                          "min_len", "max_len", "enum_vals", "required"):
                assert got[field] == want[field], (lang, c, field)


def test_suggest_by_unit_hand_computed(spark):
    from spark_schema_guard.operators.suggest import suggest_by_unit

    rows = [("a", "x", 1), ("a", "y", 2), ("a", None, 3),
            ("b", "only", 9), ("b", "only", 4), (None, "nul-unit", 7)]
    df = spark.createDataFrame(rows, "u string, s string, n long")
    by = {(r["unit"], r["column"]): r
          for r in suggest_by_unit(df, ["s", "n"], unit_col="u",
                                   distinct="exact").collect()}
    a_s = by[("a", "s")]
    assert (a_s["n_rows"], a_s["n_nulls"], a_s["required"]) == (3, 1, False)
    assert a_s["enum_vals"] == "x,y"
    b_s = by[("b", "s")]
    assert b_s["required"] and b_s["enum_vals"] == "only"
    assert by[("b", "n")]["min_int"] == 4 and by[("b", "n")]["max_int"] == 9
    # NULL unit profiles under the NULL unit — including its enum (the
    # joins are null-safe on unit; a plain equi-join would drop it)
    assert by[(None, "s")]["n_rows"] == 1
    assert by[(None, "s")]["enum_vals"] == "nul-unit"
    assert by[(None, "n")]["min_int"] == 7
    # enum_max below a unit's cardinality: that unit loses its enum only
    by2 = {(r["unit"], r["column"]): r
           for r in suggest_by_unit(df, ["s"], unit_col="u", enum_max=1,
                                    distinct="exact").collect()}
    assert by2[("a", "s")]["enum_vals"] is None
    assert by2[("b", "s")]["enum_vals"] == "only"


def test_enum_pass_many_eligible_keys_uses_local_relation(spark):
    """Past 64 eligible keys the enum pass must not inline a literal
    per key (O(n) plan nodes — the documented driver-analysis trap);
    the local-relation semi-join path returns identical enums."""
    df = spark.createDataFrame(
        [('{"k%03d": "v%d"}' % (i, i % 3),) for i in range(100)],
        "doc string")
    prof = {r["key"]: r for r in
            suggest_json_constraints(df, "doc", distinct="exact").collect()}
    assert len(prof) == 100
    assert prof["k007"]["enum_vals"] == "v1"
    assert all(r["enum_vals"] is not None for r in prof.values())
