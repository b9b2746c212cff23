"""Exception hierarchy for spark-schema-guard.

Semantics-parity note: mirrors the error *model* of the reference validator
(fastjsonschema ``exceptions.py:13-46``): a validation error carries
``message``, offending ``value``, dotted ``name`` path, the (ref-expanded)
``definition`` and the violated ``rule``.  The implementation is new.
"""

from __future__ import annotations

import re

_PATH_SPLIT = re.compile(r"[.\[\]]+")


class SchemaError(ValueError):
    """Base class for every error raised by this package."""


class SchemaDefinitionError(SchemaError):
    """The schema definition itself is invalid (raised at plan-build time,
    analog of the reference's ``JsonSchemaDefinitionException``)."""


class ValidationError(SchemaError):
    """A value failed validation.

    Attributes match the reference's ``JsonSchemaValueException`` so that
    error-object parity tests can assert on the same fields.
    """

    def __init__(self, message, value=None, name=None, definition=None, rule=None):
        super().__init__(message)
        self.message = message
        self.value = value
        self.name = name
        # ``definition`` may be a zero-arg thunk: $ref expansion of the
        # reported definition is deferred until someone actually reads it.
        # Combinator probes (oneOf/anyOf/not) create and discard thousands
        # of internal errors as control flow — eager expansion there turned
        # a 3.4MB recursive schema (FHIR) from seconds into minutes.
        self._definition = definition
        self.rule = rule

    @property
    def definition(self):
        d = self._definition
        if callable(d):
            d = self._definition = d()
        return d

    @property
    def path(self):
        return [p for p in _PATH_SPLIT.split(self.name or "") if p]

    @property
    def rule_definition(self):
        if not self.rule or not self.definition:
            return None
        return self.definition.get(self.rule)

    def as_row(self):
        """Violation as a plain dict — the shape of one element of the
        engine's ``violations`` array column."""
        return {
            "name": self.name,
            "rule": self.rule,
            "message": self.message,
        }


class ValidationErrors(SchemaError):
    """Collection of all validation errors (``fast_fail=False`` mode),
    analog of the reference's ``JsonSchemaValuesException``."""

    def __init__(self, errors):
        super().__init__()
        self.errors = errors


# Aliases with the reference's public names, so user code written against the
# reference API keeps working after switching to this engine.
JsonSchemaException = SchemaError
JsonSchemaDefinitionException = SchemaDefinitionError
JsonSchemaValueException = ValidationError
JsonSchemaValuesException = ValidationErrors
