"""The reference's flagship benchmark schema (/root/reference/schema.json =
performance.py:15-55) with its pinned valid/invalid documents
(performance.py:57-73, tests/test_integration.py:46-106), run differentially.
"""

import pytest

import spark_schema_guard as ssg

FLAGSHIP = {
    "$schema": "http://json-schema.org/draft-04/schema",
    "type": "array",
    "items": [
        {"type": "number", "maximum": 10, "exclusiveMaximum": True},
        {"type": "string", "enum": ["hello", "world"]},
        {
            "type": "array",
            "minItems": 1,
            "maxItems": 3,
            "items": [{"type": "number"}, {"type": "string"}, {"type": "boolean"}],
        },
        {
            "type": "object",
            "required": ["a", "b"],
            "minProperties": 3,
            "properties": {
                "a": {"type": ["null", "string"]},
                "b": {"type": ["null", "string"]},
                "c": {"type": ["null", "string"], "default": "abc"},
            },
            "additionalProperties": {"type": "string"},
        },
        {"not": {"type": ["null"]}},
        {"oneOf": [
            {"type": "number", "multipleOf": 3},
            {"type": "number", "multipleOf": 5},
        ]},
    ],
}

VALUES_OK = [
    [9, "hello", [1, "a", True], {"a": "a", "b": "b", "d": "d"}, 42, 3],
    [9, "world", [1, "a", True], {"a": "a", "b": "b", "d": "d"}, 42, 3],
    [9, "world", [1, "a", True], {"a": "a", "b": "b", "c": "xy"}, 42, 3],
    [9, "world", [1, "a", True], {"a": "a", "b": "b", "c": "xy"}, "str", 5],
]

VALUES_BAD = [
    [10, "world", [1, "a", True], {"a": "a", "b": "b", "c": "xy"}, "str", 5],
    [9, "xxx", [1, "a", True], {"a": "a", "b": "b", "c": "xy"}, "str", 5],
    [9, "hello", [], {"a": "a", "b": "b", "c": "xy"}, "str", 5],
    [9, "hello", [1, 2, 3], {"a": "a", "b": "b", "c": "xy"}, "str", 5],
    [9, "hello", [1, "a", True], {"a": "a", "x": "x", "y": "y"}, "str", 5],
    [9, "hello", [1, "a", True], {"a": "a", "b": "b"}, "str", 5],
    [9, "hello", [1, "a", True], {"a": "a", "b": "b", "x": "x"}, None, 5],
    [9, "hello", [1, "a", True], {"a": "a", "b": "b", "x": "x"}, 42, 15],
]


@pytest.mark.parametrize("doc", VALUES_OK, ids=[f"ok{i}" for i in range(len(VALUES_OK))])
def test_valid_docs(reference, doc):
    import copy

    ref_out = reference.compile(copy.deepcopy(FLAGSHIP))(copy.deepcopy(doc))
    my_out = ssg.compile(copy.deepcopy(FLAGSHIP))(copy.deepcopy(doc))
    assert my_out == ref_out


@pytest.mark.parametrize("doc", VALUES_BAD, ids=[f"bad{i}" for i in range(len(VALUES_BAD))])
def test_invalid_docs(reference, doc):
    import copy

    with pytest.raises(reference.JsonSchemaValueException) as ref_exc:
        reference.compile(copy.deepcopy(FLAGSHIP))(copy.deepcopy(doc))
    with pytest.raises(ssg.ValidationError) as my_exc:
        ssg.compile(copy.deepcopy(FLAGSHIP))(copy.deepcopy(doc))
    assert my_exc.value.message == ref_exc.value.message
    assert my_exc.value.name == ref_exc.value.name
    assert my_exc.value.rule == ref_exc.value.rule


def test_first_bad_doc_error_text():
    with pytest.raises(ssg.ValidationError) as exc:
        ssg.compile(FLAGSHIP)(VALUES_BAD[0])
    assert exc.value.message == "data[0] must be smaller than 10"
    assert exc.value.rule == "maximum"
    assert exc.value.name == "data[0]"


def test_oneof_match_counts():
    schema = {"oneOf": [{"type": "number", "multipleOf": 3},
                        {"type": "number", "multipleOf": 5}]}
    with pytest.raises(ssg.ValidationError, match=r"\(2 matches found\)"):
        ssg.compile(schema)(15)
    with pytest.raises(ssg.ValidationError, match=r"\(0 matches found\)"):
        ssg.compile(schema)(2)
