"""Golden examples from the reference's tests/examples corpus
(SURVEY.md §5.3), re-expressed: schema + instance -> expected error
substring, checked against both validators differentially."""

import copy

import pytest

import spark_schema_guard as ssg

ADDRESS_SCHEMA = {
    "type": "object",
    "properties": {
        "street_address": {"type": "string"},
        "country": {"default": "United States of America",
                    "enum": ["United States of America", "Canada"]},
    },
    "if": {"properties": {"country": {"const": "United States of America"}}},
    "then": {"properties": {"postal_code": {"pattern": "[0-9]{5}(-[0-9]{4})?"}}},
    "else": {"properties": {"postal_code": {"pattern": "[A-Z][0-9][A-Z] [0-9][A-Z][0-9]"}}},
}


def test_conditional_address_valid(reference):
    docs = [
        {"street_address": "1600 Pennsylvania Avenue NW",
         "country": "United States of America", "postal_code": "20500"},
        {"street_address": "24 Sussex Drive", "country": "Canada",
         "postal_code": "K1M 1M4"},
    ]
    for doc in docs:
        assert ssg.validate(ADDRESS_SCHEMA, copy.deepcopy(doc)) == \
            reference.validate(ADDRESS_SCHEMA, copy.deepcopy(doc))


def test_conditional_address_invalid(reference):
    doc = {"street_address": "24 Sussex Drive", "country": "Canada",
           "postal_code": "10000"}
    with pytest.raises(ssg.ValidationError) as mine:
        ssg.validate(ADDRESS_SCHEMA, copy.deepcopy(doc))
    with pytest.raises(reference.JsonSchemaValueException) as theirs:
        reference.validate(ADDRESS_SCHEMA, copy.deepcopy(doc))
    assert mine.value.message == theirs.value.message
    assert "data.postal_code must match pattern [A-Z][0-9][A-Z] [0-9][A-Z][0-9]" \
        in mine.value.message


def test_conditional_default_fills_country(reference):
    doc = {"street_address": "somewhere", "postal_code": "20500"}
    out = ssg.validate(ADDRESS_SCHEMA, copy.deepcopy(doc))
    ref = reference.validate(ADDRESS_SCHEMA, copy.deepcopy(doc))
    assert out == ref
    assert out["country"] == "United States of America"


NESTED_REF_SCHEMA = {
    "definitions": {
        "address": {
            "type": "object",
            "properties": {"street": {"type": "string"},
                           "city": {"type": "string"}},
            "required": ["street"],
        },
    },
    "type": "object",
    "properties": {
        "billing": {"$ref": "#/definitions/address"},
        "shipping": {"$ref": "#/definitions/address"},
    },
}


def test_ref_path_in_error(reference):
    doc = {"billing": {"street": "a"}, "shipping": {"city": "b"}}
    with pytest.raises(ssg.ValidationError) as mine:
        ssg.validate(NESTED_REF_SCHEMA, copy.deepcopy(doc))
    with pytest.raises(reference.JsonSchemaValueException) as theirs:
        reference.validate(NESTED_REF_SCHEMA, copy.deepcopy(doc))
    assert mine.value.message == theirs.value.message
    assert mine.value.name == theirs.value.name == "data.shipping"
    assert mine.value.path == ["data", "shipping"]


def test_fhir_scale_recursion(reference):
    """The reference's scale/recursion stress case (tests/examples/
    issue-109: 3.4MB FHIR schema, ~200-branch root oneOf, recursive
    definitions) — must compile, validate the 1MB instance identically,
    and produce byte-equal error objects on a mutated instance."""
    import json

    with open("/root/reference/tests/examples/issue-109/fhir.schema.json") as fh:
        schema = json.load(fh)
    with open("/root/reference/tests/examples/issue-109/"
              "85e52038-4d69-50e9-9e46-e379b8d830af.json") as fh:
        inst = json.load(fh)

    mine = ssg.compile(schema)
    theirs = reference.compile(schema)
    assert mine(json.loads(json.dumps(inst))) == \
        theirs(json.loads(json.dumps(inst)))

    bad = json.loads(json.dumps(inst))
    bad["entry"][3]["resource"] = {"resourceType": "Nope"}
    with pytest.raises(ssg.ValidationError) as m:
        mine(json.loads(json.dumps(bad)))
    with pytest.raises(reference.JsonSchemaValueException) as t:
        theirs(json.loads(json.dumps(bad)))
    assert m.value.message == t.value.message
    assert m.value.rule == t.value.rule
    assert m.value.definition == t.value.definition
