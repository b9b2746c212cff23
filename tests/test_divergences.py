"""Deliberate, documented divergences from the reference implementation.

Each test pins OUR behavior and explains why it differs (see the module
docstring of spark_schema_guard/rowcheck/compiler.py).
"""

import pytest

import spark_schema_guard as ssg


def test_property_names_false_on_non_object_passes():
    # Reference crashes with AttributeError (missing is-dict guard,
    # draft06.py:117-120); JSON Schema spec says non-objects pass.
    assert ssg.validate({"propertyNames": False}, 42) == 42
    with pytest.raises(ssg.ValidationError):
        ssg.validate({"propertyNames": False}, {"a": 1})


def test_additional_properties_message_sorted():
    # Reference prints raw set repr (hash-order, nondeterministic across
    # executors); we sort keys for deterministic distributed output.
    with pytest.raises(ssg.ValidationError) as exc:
        ssg.validate({"additionalProperties": False}, {"b": 1, "a": 2})
    assert exc.value.message == "data must not contain {'a', 'b'} properties"


def test_collect_mode_through_ref():
    # Reference raises a nested JsonSchemaValuesException from inside $ref'd
    # validators in collect mode; we feed one flat error sink.
    schema = {
        "definitions": {"s": {"type": "string"}},
        "type": "object",
        "properties": {"a": {"$ref": "#/definitions/s"},
                       "b": {"$ref": "#/definitions/s"}},
    }
    validator = ssg.compile(schema, fast_fail=False)
    with pytest.raises(ssg.ValidationErrors) as exc:
        validator({"a": 1, "b": 2})
    assert [e.name for e in exc.value.errors] == ["data.a", "data.b"]
