"""Security/robustness parity (reference tests/test_security.py):
schema-injection attempts must fail at compile time or be treated as
data, never execute.  Our compiler builds closures, not source code, so
the injection surface is structurally absent — these tests pin that bad
definitions still raise the same definition errors as the reference.
"""

import pytest

import spark_schema_guard as ssg


INJECTION_SCHEMAS = [
    # malformed keyword payloads modeled on the reference's injection suite
    {"type": 'string", "a": "b'},
    {"type": ["string", 'number", "a": "b']},
    {"pattern": '", "injection": "'},
    {"properties": {'a" + str(exec("import os")) + "': {"type": "string"}}},
    {"required": ['"); import os; ("']},
    {"enum": ['", "injected']},
]


@pytest.mark.parametrize("schema", INJECTION_SCHEMAS,
                         ids=[f"inj{i}" for i in range(len(INJECTION_SCHEMAS))])
def test_injection_compiles_safely_or_rejects(reference, schema):
    """Either both reject the definition, or both compile and the weird
    strings behave as plain data."""
    import copy

    def outcome(compiler, exc_def, exc_val, data):
        try:
            validator = compiler(copy.deepcopy(schema))
        except exc_def:
            return ("deferr",)
        try:
            validator(copy.deepcopy(data))
            return ("ok",)
        except exc_val as exc:
            return ("err", getattr(exc, "rule", None))

    for data in ["x", 1, {"a": 1}, {'a" + str(exec("import os")) + "': 5}]:
        mine = outcome(ssg.compile, ssg.SchemaDefinitionError,
                       ssg.ValidationError, data)
        theirs = outcome(reference.compile,
                         reference.JsonSchemaDefinitionException,
                         reference.JsonSchemaValueException, data)
        assert mine == theirs, (schema, data, mine, theirs)


def test_pattern_is_data_not_code():
    validator = ssg.compile({"pattern": "^imp"})
    assert validator("import os") == "import os"
    with pytest.raises(ssg.ValidationError):
        validator("no match")


def test_deep_data_no_crash():
    validator = ssg.compile({"type": "object"})
    deep = current = {}
    for _ in range(400):
        current["n"] = {}
        current = current["n"]
    assert validator(deep) is deep


def test_deep_recursive_ref_1000_levels():
    """1000-level data through a combinator-heavy recursive $ref schema —
    the worst frames-per-level shape (~8 frames/level) — must validate;
    the reference RecursionErrors on this at its default limit, and so
    did we before raising _RECURSION_HEADROOM past 8k."""
    schema = {
        "$ref": "#/definitions/node",
        "definitions": {"node": {
            "type": "object",
            "properties": {"a": {"anyOf": [{"type": "null"},
                                           {"$ref": "#/definitions/node"}]}},
        }},
    }
    validator = ssg.compile(schema)
    deep = current = {"a": None}
    for _ in range(999):
        current["a"] = {"a": None}
        current = current["a"]
    assert validator(deep) is deep
    assert validator.collect(deep) == []
    # invalid leaf deep down still reports, not crashes
    current["a"] = 5
    errs = validator.collect(deep)
    assert errs and errs[0].rule == "anyOf"


def test_draft_dialect_differences(reference):
    import copy

    cases = [
        ({"$schema": "http://json-schema.org/draft-04/schema#",
          "exclusiveMinimum": 5}, [4, 6]),  # d4: bare exclusiveMinimum ignored
        ({"$schema": "http://json-schema.org/draft-06/schema#",
          "exclusiveMinimum": 5}, [4, 5, 6]),
        ({"$schema": "http://json-schema.org/draft-04/schema#",
          "contains": {"type": "number"}}, [["a"]]),  # d4: contains ignored
        ({"$schema": "http://json-schema.org/draft-06/schema#",
          "contains": {"type": "number"}}, [["a"], [1]]),
        ({"$schema": "http://json-schema.org/draft-06/schema#",
          "if": {"minimum": 0}, "then": {"maximum": 5}}, [10]),  # d6: if ignored
        ({"$schema": "http://json-schema.org/draft-07/schema#",
          "if": {"minimum": 0}, "then": {"maximum": 5}}, [10, 3, -1]),
        ({"$schema": "http://json-schema.org/draft-04/schema#",
          "const": 5}, [4]),  # d4: const ignored
        ({"$schema": "http://json-schema.org/draft-06/schema#", "const": 5},
         [4, 5]),
    ]
    for schema, values in cases:
        for value in values:
            try:
                theirs = ("ok", reference.compile(copy.deepcopy(schema))(value))
            except reference.JsonSchemaValueException as exc:
                theirs = ("err", exc.message, exc.rule)
            try:
                mine = ("ok", ssg.compile(copy.deepcopy(schema))(value))
            except ssg.ValidationError as exc:
                mine = ("err", exc.message, exc.rule)
            assert mine == theirs, (schema, value, mine, theirs)
