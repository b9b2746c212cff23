"""Differential tests: my closure-compiled validator vs the reference
implementation (imported read-only), over a corpus covering every keyword.

For each (schema, data) pair both validators run; outcomes must agree:
* both accept -> returned (transformed) data equal,
* both reject -> message, name, rule equal (detailed mode).
"""

import math
from decimal import Decimal

import pytest

import spark_schema_guard as ssg

# (schema, [data values...]) — every value is run through both validators.
CORPUS = [
    # type
    ({"type": "string"}, ["x", 1, 1.5, None, True, [], {}, ("a",)]),
    ({"type": "number"}, [1, 1.5, True, "1", None, Decimal("1.5")]),
    ({"type": "integer"}, [1, 1.0, 1.5, True, "1", None]),
    ({"type": "boolean"}, [True, False, 1, 0, "true", None]),
    ({"type": "null"}, [None, 0, False, ""]),
    ({"type": "array"}, [[], (1, 2), {}, "x"]),
    ({"type": "object"}, [{}, [], "x"]),
    ({"type": ["string", "null"]}, ["x", None, 1]),
    ({"type": ["number", "boolean"]}, [1, True, "x"]),
    ({"type": ["integer", "string"]}, [1, 1.0, "x", True, 1.5]),
    ({"$schema": "http://json-schema.org/draft-04/schema", "type": "integer"},
     [1, 1.0, True]),
    ({"$schema": "http://json-schema.org/draft-04/schema", "type": "number"},
     [1, 1.5, True, Decimal("2")]),
    # enum / const
    ({"enum": [1, 2, "a", "b'c"]}, [1, True, 12, "a", "b'c", None, 2.0]),
    ({"enum": [True, False]}, [True, 1, 0, False]),
    ({"enum": [None]}, [None, 0, ""]),
    ({"enum": [[1, 2], {"a": 1}]}, [[1, 2], (1, 2), [2, 1], {"a": 1}, {"a": True}, {"a": 1.0}]),
    ({"enum": [{"a": {"b": [1, True]}}]}, [{"a": {"b": [1, True]}}, {"a": {"b": [1, 1]}}]),
    ({"enum": []}, [1, None]),
    ({"const": 42}, [42, 42.0, "42", True, None]),
    ({"const": "foo"}, ["foo", "bar", 1]),
    ({"const": {"a": [1]}}, [{"a": [1]}, {"a": (1,)}, {"a": [1.0]}, {"a": [True]}]),
    ({"const": None}, [None, 0]),
    # numbers
    ({"minimum": 5}, [4, 5, 6, 4.9, "x", None, True, Decimal("4.5")]),
    ({"maximum": 5}, [4, 5, 6, 5.1, "x", True]),
    ({"minimum": 5, "exclusiveMinimum": True,
      "$schema": "http://json-schema.org/draft-04/schema"}, [4, 5, 6]),
    ({"maximum": 5, "exclusiveMaximum": True,
      "$schema": "http://json-schema.org/draft-04/schema"}, [4, 5, 6]),
    ({"exclusiveMinimum": 5}, [4, 5, 6, "x"]),
    ({"exclusiveMaximum": 5}, [4, 5, 6, "x"]),
    ({"multipleOf": 3}, [0, 3, 7, -9, "x", 3.0, 4.5]),
    ({"multipleOf": 0.01}, [19.01, 19.001, 1, 0.07, "x"]),
    ({"multipleOf": 0.0001}, [0.0075]),
    ({"multipleOf": 2.4}, [4.8, 7.2, 7.3]),
    # strings
    ({"minLength": 2}, ["a", "ab", "abc", "", 5, None, "é"]),
    ({"maxLength": 2}, ["a", "ab", "abc", 5]),
    ({"pattern": "ab+c"}, ["abc", "xabbbcx", "ac", 1]),
    ({"pattern": "a$"}, ["a", "a\n", "ba", "ab"]),
    ({"pattern": r"a\$"}, ["a$", "a"]),
    ({"pattern": "^[ab]*$"}, ["abab", "abc", "abab\n"]),
    # formats
    ({"format": "email"}, ["a@b.cz", "a@b", ".a@b.cz", "a..b@c.cz", 1, "a@b.c.d"]),
    ({"format": "hostname"}, ["example.com", "ex-ample.com", "example.example.com-",
                              "localhost", "-bad.com", "a" * 64 + ".com"]),
    ({"format": "ipv4"}, ["1.2.3.4", "01.2.3.4", "256.1.1.1", "1.2.3", "127.0.0.1"]),
    ({"format": "ipv6"}, ["::1", "::", "1:2:3:4:5:6:7:8", "1::8", "::ffff:1.2.3.4",
                          "12345::", "1:2:3:4:5:6:7:8:9"]),
    ({"format": "uri"}, ["http://example.com", "urn:x", "not a uri", "ftp://x/y"]),
    ({"format": "date-time"}, ["2018-01-02T03:04:05Z", "2018-01-02t03:04:05.123+01:00",
                               "2018-01-02 03:04:05Z", "2018-13-02T03:04:05Z\n"]),
    ({"format": "date"}, ["2018-01-02", "2018-13-02", "18-01-02"]),
    ({"format": "time"}, ["03:04:05", "3:4", "03:04:05.123Z", "x"]),
    ({"format": "uuid"}, ["12345678-1234-1234-1234-123456789abc", "nope"]),
    ({"format": "duration"}, ["P1Y2M3DT4H5M6S", "P4W", "P", "PT", "1Y"]),
    ({"format": "json-pointer"}, ["/a/b", "", "a/b", "/a~1b", "/a~2b"]),
    ({"format": "uri-reference"}, ["http://x/y", "/rel/path", "#frag", "a b"]),
    ({"format": "unknown-format"}, ["anything"]),
    ({"format": "regex"}, ["ab+", "[unclosed", 5]),
    # arrays
    ({"minItems": 2}, [[1], [1, 2], [1, 2, 3], "xx", (1,)]),
    ({"maxItems": 2}, [[1], [1, 2], [1, 2, 3]]),
    ({"uniqueItems": True}, [[1, 2], [1, 1], [1, "1"], [True, True], [True, 1],
                             [[1, 2], [2, 1]], [[1, 2], [1, 2]], [0, False], [1, 1.0],
                             [{"a": {"b": {"c": [1, 2]}}}, {"a": {"b": {"c": [1, 2]}}}],
                             "not-a-list"]),
    ({"uniqueItems": False}, [[1, 1]]),
    ({"items": {"type": "number"}}, [[1, 2.5], [1, "x"], "zz", [True]]),
    ({"items": [{"type": "number"}, {"type": "string"}]},
     [[1, "a"], ["a", 1], [1], [1, "a", True], []]),
    ({"items": [{"type": "number"}], "additionalItems": {"type": "string"}},
     [[1, "a", "b"], [1, "a", 2]]),
    ({"items": [{"type": "number"}], "additionalItems": False},
     [[1], [1, 2]]),
    ({"items": False}, [[], [1], "x"]),
    ({"items": True}, [[1, "x"]]),
    ({"contains": {"type": "number"}}, [[1], ["a", 2], ["a"], [], "x"]),
    ({"contains": True}, [[], [1]]),
    ({"contains": False}, [[], [1], "x"]),
    # objects
    ({"minProperties": 1}, [{}, {"a": 1}, [], "x"]),
    ({"maxProperties": 1}, [{}, {"a": 1}, {"a": 1, "b": 2}]),
    ({"required": ["a", "b"]}, [{"a": 1, "b": 2}, {"a": 1}, {}, [], "x"]),
    ({"properties": {"a": {"type": "number"}, "b": {"type": "string"}}},
     [{"a": 1, "b": "x"}, {"a": "x"}, {"b": 1}, {}, "z", {"a": True}]),
    ({"properties": {"a": {"type": "number"}}, "additionalProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {}]),
    ({"properties": {"a": {"type": "number"}}, "additionalProperties": {"type": "string"}},
     [{"a": 1, "b": "x"}, {"a": 1, "b": 2}]),
    ({"patternProperties": {"^x_": {"type": "number"}}},
     [{"x_a": 1}, {"x_a": "s"}, {"y": "s"}, {}]),
    ({"patternProperties": {"^x_": {"type": "number"}}, "additionalProperties": False},
     [{"x_a": 1}, {"x_a": 1, "y": 2}]),
    ({"propertyNames": {"maxLength": 3}}, [{"ab": 1}, {"abcd": 1}, {}, "x"]),
    ({"propertyNames": True}, [{"a": 1}]),
    ({"dependencies": {"bar": ["foo"]}},
     [{"bar": 1, "foo": 2}, {"bar": 1}, {"foo": 1}, {}, "x"]),
    ({"dependencies": {"bar": {"required": ["foo"]}}},
     [{"bar": 1, "foo": 2}, {"bar": 1}]),
    ({"dependencies": {"bar": False}}, [{"bar": 1}, {"foo": 1}]),
    ({"dependencies": {"bar": []}}, [{"bar": 1}]),
    ({"dependencies": {"bar": True}}, [{"bar": 1}]),
    # combinators
    ({"allOf": [{"type": "number"}, {"minimum": 5}]}, [6, 4, "x"]),
    ({"anyOf": [{"type": "number", "minimum": 10}, {"type": "number", "maximum": 5}]},
     [3, 8, 11, "x"]),
    ({"oneOf": [{"type": "number", "multipleOf": 3}, {"type": "number", "multipleOf": 5}]},
     [3, 5, 15, 2, "x"]),
    ({"not": {"type": "null"}}, [None, 1, "x"]),
    ({"not": {}}, [1, None]),
    ({"not": True}, [1]),
    ({"not": False}, [1]),
    ({"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}, "else": {"multipleOf": 2}},
     [-5, -15, 4, 3, "x"]),
    ({"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}}, [-5, -15, 4]),
    ({"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}}, [-5, 4, 3]),
    # boolean schemas
    (True, [1, None, "x"]),
    (False, [1, None, "x"]),
    ({}, [1, None]),
    # $ref
    ({"definitions": {"m3": {"type": "number", "multipleOf": 3},
                      "m5": {"type": "number", "multipleOf": 5}},
      "oneOf": [{"$ref": "#/definitions/m3"}, {"$ref": "#/definitions/m5"}]},
     [3, 5, 15, 2]),
    ({"properties": {"foo": {"type": "integer"}, "bar": {"$ref": "#/properties/foo"}}},
     [{"foo": 1, "bar": 2}, {"foo": 1, "bar": "x"}]),
    ({"definitions": {"node": {"type": "object",
                               "properties": {"v": {"type": "number"},
                                              "next": {"$ref": "#/definitions/node"}}}},
      "$ref": "#/definitions/node"},
     [{"v": 1}, {"v": 1, "next": {"v": 2}}, {"v": 1, "next": {"v": "x"}},
      {"v": 1, "next": {"v": 2, "next": {"v": "y"}}}]),
    # content (draft-07)
    ({"contentEncoding": "base64"}, ["aGVsbG8=", "###not-base64###", 1]),
    ({"contentMediaType": "application/json"}, ['{"a": 1}', "{bad json", 1]),
    ({"contentEncoding": "base64", "contentMediaType": "application/json"},
     ["eyJhIjogMX0=", "aGVsbG8="]),
    # nested structures
    ({"type": "object",
      "properties": {
          "meta": {"type": "object", "required": ["a", "b"], "minProperties": 3,
                   "properties": {"a": {"type": ["null", "string"]},
                                  "b": {"type": ["null", "string"]}},
                   "additionalProperties": {"type": "string"}},
          "triple": {"type": "array", "minItems": 1, "maxItems": 3,
                     "items": [{"type": "number"}, {"type": "string"},
                               {"type": "boolean"}]},
      }},
     [{"meta": {"a": None, "b": "x", "c": "y"}},
      {"meta": {"a": None, "b": "x"}},
      {"meta": {"a": 1, "b": "x", "c": "y"}},
      {"meta": {"a": None, "b": "x", "c": 3}},
      {"triple": [1, "a", True]},
      {"triple": []},
      {"triple": [1, "a", True, 5]},
      {"triple": ["a", 1]}]),
]


def _run_reference(reference, schema, data):
    import copy as _copy

    try:
        result = reference.compile(_copy.deepcopy(schema))(_copy.deepcopy(data))
        return ("ok", result)
    except reference.JsonSchemaValueException as exc:
        return ("err", exc.message, exc.name, exc.rule)
    except reference.JsonSchemaDefinitionException as exc:
        return ("deferr", str(exc))


def _run_mine(schema, data):
    import copy as _copy

    try:
        result = ssg.compile(_copy.deepcopy(schema))(_copy.deepcopy(data))
        return ("ok", result)
    except ssg.ValidationError as exc:
        return ("err", exc.message, exc.name, exc.rule)
    except ssg.SchemaDefinitionError as exc:
        return ("deferr", str(exc))


_CASES = [
    (i, j, schema, value)
    for i, (schema, values) in enumerate(CORPUS)
    for j, value in enumerate(values)
]


@pytest.mark.parametrize("i,j,schema,value", _CASES,
                         ids=[f"c{i}v{j}" for i, j, _, _ in _CASES])
def test_differential(reference, i, j, schema, value):
    theirs = _run_reference(reference, schema, value)
    mine = _run_mine(schema, value)
    assert mine[0] == theirs[0], f"outcome diverged: mine={mine} theirs={theirs}"
    if mine[0] == "ok":
        assert _canon(mine[1]) == _canon(theirs[1])
    elif mine[0] == "err":
        assert mine[1:] == theirs[1:]


def _canon(value):
    """NaN-safe structural comparison helper."""
    if isinstance(value, float) and math.isnan(value):
        return "NaN"
    if isinstance(value, dict):
        return {k: _canon(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_canon(v) for v in value]
    return value


def test_defaults_properties(reference):
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "string", "default": ""},
            "b": {"type": "number", "default": 42},
            "c": {"type": "object", "default": {}},
            "d": {"type": "array", "default": []},
        },
    }
    assert ssg.validate(schema, {}) == reference.validate(schema, {})
    # fresh objects per call (no shared mutable default)
    first = ssg.validate(schema, {})
    second = ssg.validate(schema, {})
    first["d"].append(1)
    assert second["d"] == []


def test_defaults_items(reference):
    schema = {"items": [{"type": "string", "default": ""}, {"type": "number", "default": 42}]}
    assert ssg.validate(schema, []) == reference.validate(schema, []) == ["", 42]
    assert ssg.validate(schema, ["x"]) == reference.validate(schema, ["x"]) == ["x", 42]


def test_use_default_off(reference):
    schema = {"properties": {"a": {"default": 1}}}
    assert ssg.validate(schema, {}, use_default=False) == {}


def test_collect_all_errors():
    schema = {
        "type": "object",
        "properties": {"string": {"type": "string"}, "number": {"type": "number"}},
    }
    validator = ssg.compile(schema, fast_fail=False)
    with pytest.raises(ssg.ValidationErrors) as exc_info:
        validator({"string": 1, "number": "a"})
    errors = exc_info.value.errors
    assert len(errors) == 2
    assert errors[0].message == "data.string must be string"
    assert errors[1].message == "data.number must be number"


def test_collect_api():
    validator = ssg.compile({"type": "object",
                             "properties": {"a": {"type": "number", "minimum": 5}},
                             "required": ["a", "b"]})
    rows = validator.violation_rows({"a": 3})
    assert [r["rule"] for r in rows] == ["required", "minimum"]
    assert rows[1]["name"] == "data.a"


def test_detailed_exceptions_off():
    validator = ssg.compile({"type": "string"}, detailed_exceptions=False)
    with pytest.raises(ssg.ValidationError) as exc_info:
        validator(1)
    assert exc_info.value.message == "data must be string"
    assert exc_info.value.rule is None


def test_definition_errors(reference):
    bad = [
        {"type": "bogus"},
        {"enum": 5},
        {"minLength": "x"},
        {"required": ["a", "a"]},
        {"required": ["a"], "additionalProperties": False},
        {"properties": {"a": 5}},
        {"$ref": "#/nope"},
    ]
    for schema in bad:
        with pytest.raises(ssg.SchemaDefinitionError):
            ssg.compile(schema)
        with pytest.raises(reference.JsonSchemaDefinitionException):
            reference.compile(schema)


def test_depth_cap():
    node = {}
    schema = node
    for _ in range(600):
        node["properties"] = {"a": {}}
        node = node["properties"]["a"]
    with pytest.raises(ssg.SchemaDefinitionError, match="too deeply nested"):
        ssg.compile(schema)


def test_custom_formats():
    validator = ssg.compile({"format": "my-fmt"}, formats={"my-fmt": r"^a+$"})
    assert validator("aaa") == "aaa"
    with pytest.raises(ssg.ValidationError, match="must be my-fmt"):
        validator("bbb")
    validator2 = ssg.compile({"format": "cb"}, formats={"cb": lambda v: v == "ok"})
    assert validator2("ok") == "ok"
    with pytest.raises(ssg.ValidationError):
        validator2("no")


def test_use_formats_off():
    assert ssg.validate({"format": "ipv4"}, "999.999.999.999", use_formats=False)


def test_error_object_fields(reference):
    schema = {"type": "object", "properties": {"a": {"type": "number", "maximum": 10}}}
    try:
        reference.compile(schema)({"a": 11})
    except reference.JsonSchemaValueException as exc:
        ref = exc
    try:
        ssg.compile(schema)({"a": 11})
    except ssg.ValidationError as exc:
        mine = exc
    assert mine.message == ref.message
    assert mine.name == ref.name == "data.a"
    assert mine.path == ref.path == ["data", "a"]
    assert mine.rule == ref.rule == "maximum"
    assert mine.definition == ref.definition
    assert mine.rule_definition == ref.rule_definition == 10
