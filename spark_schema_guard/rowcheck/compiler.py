"""Row-level validator: compiles a JSON-Schema definition into a tree of
Python closures, once, on the driver.

This is the engine's semantic core.  It replicates the *behavior* of the
reference validator (fastjsonschema) — keyword evaluation order
(``draft04.py:42-68`` + ``draft06.py:30-36`` + ``draft07.py:33-37``), error
messages, dotted-name paths, type-strict enum/const matching, default
filling, content decoding — with a brand-new architecture: instead of
generating Python source and ``exec``-ing it, each keyword compiles to a
closure ``step(value, name, emit) -> value`` and a schema node composes its
steps in registration order.  The compiled tree is picklable-free state that
pandas UDFs capture by closure, so one driver-side compile is shipped to
executors once per task and then evaluates Arrow batches value-by-value
without recompilation (the vectorized analog of the reference's
compile-once/call-many design, ``__init__.py:286``).

Known, deliberate divergences from the reference (all documented in
``tests/test_divergences.py``):

* ``propertyNames: false`` on non-object data passes instead of crashing
  with ``AttributeError`` (reference omits the is-dict guard,
  ``draft06.py:117-120``).
* ``additionalProperties: false`` error messages list the offending keys in
  sorted order instead of raw ``set`` repr order (executor-deterministic).
* In collect-all-errors mode, ``$ref`` targets feed the same error sink as
  inline keywords instead of raising a nested collection exception.
"""

from __future__ import annotations

import base64
import copy
import json
import re
from decimal import Decimal

from ..exceptions import (
    SchemaDefinitionError,
    ValidationError,
    ValidationErrors,
)
from ..formats import (
    FORMATS_DRAFT04,
    FORMATS_DRAFT06,
    FORMATS_DRAFT07,
    FORMATS_DRAFT2019,
)
from ..ref_resolver import SchemaStore

# Python ``re`` treats a trailing ``$`` as also matching before a final
# newline; the reference rewrites every unescaped ``$`` to ``\Z`` for exact
# end-of-string anchoring (``draft04.py:18``).  Same rewrite here.
_UNESCAPED_DOLLAR = re.compile(r"(?<!\\)\$")

_NUMERIC = (int, float, Decimal)


def ref_numeric(b):
    """A numeric schema value as the reference's COMPILED code compares
    it.  fastjsonschema interpolates bounds/divisors into generated
    source via str() (draft04.py generate_minimum etc.), so a
    ``Decimal('1000000000000000000.1')`` bound re-parses as the FLOAT
    literal 1e18 while ``Decimal('10')`` re-parses as an exact int —
    the comparison semantics follow the re-parsed literal, though the
    exception MESSAGE still renders the original str(Decimal).  Mirror
    that round-trip everywhere a bound is compared (all three engines),
    keeping the original value for messages.  int/float pass through.
    """
    if isinstance(b, Decimal):
        s = str(b)
        try:
            return int(s)
        except ValueError:
            return float(s)
    return b

_JSON_TYPES = {
    "null": (type(None),),
    "boolean": (bool,),
    "number": (int, float, Decimal),
    "integer": (int,),
    "string": (str,),
    "array": (list, tuple),
    "object": (dict,),
}


def _strict_equal(value, target) -> bool:
    """Type-strict deep equality used by enum/const: ``True != 1``,
    ``"1" != 1``, containers compared element-wise with the same strictness
    (parity with ``draft04.py:120-155``)."""
    if isinstance(target, bool):
        return isinstance(value, bool) and value is target
    if isinstance(target, (int, float)):
        return (
            isinstance(value, (int, float))
            and not isinstance(value, bool)
            and value == target
        )
    if target is None:
        return value is None
    if isinstance(target, str):
        return isinstance(value, str) and value == target
    if isinstance(target, dict):
        if not isinstance(value, dict) or len(value) != len(target):
            return False
        return all(
            key in value and _strict_equal(value[key], item)
            for key, item in target.items()
        )
    if isinstance(target, (list, tuple)):
        if not isinstance(value, (list, tuple)) or len(value) != len(target):
            return False
        return all(_strict_equal(value[i], item) for i, item in enumerate(target))
    return value == target


_SIMPLE_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"',
                   "'": "'", "a": "\a", "b": "\b", "f": "\f", "v": "\v",
                   "0": "\0"}


def _codegen_unescape(s: str) -> str:
    """Interpret backslash escapes the way the Python parser does for a
    double-quoted source literal.  The reference embeds ``str(enum)`` into
    generated source escaping only quotes (``e()``, generator.py:261-271),
    so backslashes inside value reprs get *halved* at parse time — that
    quirk is part of its observable message text."""
    out = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _SIMPLE_ESCAPES:
                out.append(_SIMPLE_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "x" and i + 3 < len(s):
                try:
                    out.append(chr(int(s[i + 2:i + 4], 16)))
                    i += 4
                    continue
                except ValueError:
                    pass
            if nxt == "u" and i + 5 < len(s):
                try:
                    out.append(chr(int(s[i + 2:i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
        out.append(ch)
        i += 1
    return "".join(out)


def schema_value_repr(value) -> str:
    """A schema value as it appears in the reference's error messages:
    ``str()`` pushed through the codegen escape/parse round trip.
    Strings pass through identically (unicode_escape then parse restores
    them); containers get their repr's backslashes halved."""
    if isinstance(value, str):
        return value
    return _codegen_unescape(str(value).replace('"', '\\"'))


def _freeze(value):
    """Canonical hashable form for uniqueItems: dicts to frozensets, lists to
    tuples, and bools to their string form so ``True`` never collides with
    ``1`` (parity with ``draft04.py:412-419``)."""
    if isinstance(value, dict):
        return frozenset((k, _freeze(v)) for k, v in value.items())
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    if isinstance(value, bool):
        return str(value)
    return value


class _Raise:
    """Error sink that raises immediately (fast-fail and probing)."""

    __slots__ = ()

    def __call__(self, err: ValidationError):
        raise err


_RAISE = _Raise()


class _Collect:
    """Error sink that accumulates (collect-all-errors / engine mode)."""

    __slots__ = ("errors",)

    def __init__(self):
        self.errors: list[ValidationError] = []

    def __call__(self, err: ValidationError):
        self.errors.append(err)


def _passes(node_fn, value, name) -> bool:
    """Probe: does ``value`` satisfy the compiled subschema?  Side effects
    (defaults, content decoding) apply exactly as in the reference, where
    probes are try/except around real validation code."""
    try:
        node_fn(value, name, _RAISE)
    except ValidationError:
        return False
    return True


class _NodeFn:
    """Compiled checker for one schema node: runs its steps in keyword
    order.  ``n_rules`` counts emitted checks — a zero-rule node is the
    reference's 'annotation-only' schema that matches everything.

    Each invocation gets a fresh ``scope`` dict shared by all steps of this
    node — the closure analog of the reference's per-scope cached variables
    (``{var}_keys`` etc., generator.py:307-351): the object keywords
    properties / patternProperties / additionalProperties consume keys from
    one shared set so later keywords skip what earlier ones handled."""

    __slots__ = ("steps", "n_rules")

    def __init__(self):
        self.steps = []
        self.n_rules = 0

    def __call__(self, value, name, emit):
        scope: dict = {}
        for step in self.steps:
            value = step(value, name, emit, scope)
        return value


def _scope_keys(scope: dict, value: dict) -> set:
    """Keys set shared by all keys-using steps of one node invocation,
    created at the first use (parity with generator.py:320-329)."""
    keys = scope.get("keys")
    if keys is None:
        keys = scope["keys"] = set(value.keys())
    return keys


class _Compiler:
    """One instance per ``compile_row_validator`` call.  Dialect-specific
    behavior is data-driven (keyword order list, format table, flags)."""

    _DRAFT04_ORDER = (
        "type", "enum", "allOf", "anyOf", "oneOf", "not",
        "minLength", "maxLength", "pattern", "format",
        "minimum", "maximum", "multipleOf",
        "minItems", "maxItems", "uniqueItems", "items",
        "minProperties", "maxProperties", "required",
        "dependencies", "properties", "patternProperties",
        "additionalProperties",
    )
    _DRAFT06_EXTRA = ("exclusiveMinimum", "exclusiveMaximum", "propertyNames", "contains", "const")
    _DRAFT07_EXTRA = ("if", "contentEncoding", "contentMediaType")

    _DIALECTS = {
        "draft04": (_DRAFT04_ORDER, FORMATS_DRAFT04),
        "draft06": (_DRAFT04_ORDER + _DRAFT06_EXTRA, FORMATS_DRAFT06),
        "draft07": (_DRAFT04_ORDER + _DRAFT06_EXTRA + _DRAFT07_EXTRA, FORMATS_DRAFT07),
        "draft2019": (_DRAFT04_ORDER + _DRAFT06_EXTRA + _DRAFT07_EXTRA, FORMATS_DRAFT2019),
    }

    def __init__(self, store: SchemaStore, dialect: str, config: dict):
        self.store = store
        self.dialect = dialect
        self.keyword_order, self.format_table = self._DIALECTS[dialect]
        self.booleans_allowed = dialect != "draft04"
        self.integral_float_is_int = dialect != "draft04"
        self.custom_formats = config.get("formats") or {}
        self.use_default = config.get("use_default", True)
        self.use_formats = config.get("use_formats", True)
        self.detailed = config.get("detailed_exceptions", True)
        # canonical uri -> _NodeFn (pre-registered for recursion)
        self._functions: dict[str, _NodeFn] = {}

    # -- error construction ----------------------------------------------

    def _error(self, message, value, name, definition, rule):
        if not self.detailed:
            return ValidationError(message)
        return ValidationError(
            message, value=value, name=name,
            # deferred: expansion walks the definition resolving $refs — far
            # too costly to pay for probe errors that combinators swallow
            definition=lambda d=definition: self._expand_refs(d), rule=rule,
        )

    def _expand_refs(self, definition):
        """Replace ``$ref`` nodes in a reported definition with their
        targets, one level deep (parity with ``generator.py:297-305``)."""
        if isinstance(definition, list):
            return [self._expand_refs(v) for v in definition]
        if not isinstance(definition, dict):
            return definition
        if "$ref" in definition and isinstance(definition["$ref"], str):
            node, _, _ = self.store.resolve(definition["$ref"], "")
            return node
        return {k: self._expand_refs(v) for k, v in definition.items()}

    # -- node compilation --------------------------------------------------

    def compile_root(self) -> _NodeFn:
        base = self.store.root_uri()
        fn = self.compile_node(self.store.root, base)
        return fn

    def compile_function(self, canonical_uri: str, definition, base_uri: str) -> _NodeFn:
        """Get-or-compile the checker for a ``$ref`` target.  Registering the
        (empty) _NodeFn before compiling its body makes recursion terminate —
        the closure analog of the reference's needed/done worklists
        (``generator.py:57-61``)."""
        if canonical_uri in self._functions:
            return self._functions[canonical_uri]
        fn = _NodeFn()
        self._functions[canonical_uri] = fn
        compiled = self.compile_node(definition, base_uri, into=fn)
        return compiled

    def compile_node(self, definition, base_uri: str, into: _NodeFn | None = None) -> _NodeFn:
        fn = into if into is not None else _NodeFn()

        if isinstance(definition, bool):
            if not self.booleans_allowed:
                raise SchemaDefinitionError("definition must be an object")
            if definition is False:
                def bool_false(value, name, emit, scope, _defn=definition):
                    emit(self._error(f"{name} must not be there", value, name, _defn, None))
                    return value
                fn.steps.append(bool_false)
                fn.n_rules += 1
            return fn
        if not isinstance(definition, dict):
            raise SchemaDefinitionError("definition must be an object")

        if "$ref" in definition:
            # ref overrides any sibling keywords (generator.py:178-181)
            target, doc_uri, canonical = self.store.resolve(definition["$ref"], base_uri)
            ref_fn = self.compile_function(canonical, target, doc_uri)

            def call_ref(value, name, emit, scope, _ref_fn=ref_fn):
                _ref_fn(value, name, emit)
                return value

            fn.steps.append(call_ref)
            fn.n_rules += 1
            return fn

        for keyword in self.keyword_order:
            if keyword in definition:
                builder = getattr(self, "_kw_" + _method_name(keyword))
                builder(fn, definition, base_uri)
        return fn

    # -- scalar keywords ---------------------------------------------------

    def _kw_type(self, fn, definition, base_uri):
        types = _as_list(definition["type"])
        try:
            allowed = tuple(t for jt in types for t in _JSON_TYPES[jt])
        except KeyError as exc:
            raise SchemaDefinitionError("Unknown type") from exc
        reject_bool = ("number" in types or "integer" in types) and "boolean" not in types
        integral_float_ok = self.integral_float_is_int and "integer" in types
        message_types = " or ".join(types)

        def check_type(value, name, emit, scope, _defn=definition):
            # Mirrors the reference's generated boolean expression including
            # its precedence: (not isinstance [and not integral-float]) or
            # bool-carve-out (draft04.py:96, draft06.py:83).
            mismatch = not isinstance(value, allowed)
            if mismatch and integral_float_ok and isinstance(value, float) and value.is_integer():
                mismatch = False
            if mismatch or (reject_bool and isinstance(value, bool)):
                emit(self._error(f"{name} must be {message_types}", value, name, _defn, "type"))
            return value

        fn.steps.append(check_type)
        fn.n_rules += 1

    def _kw_enum(self, fn, definition, base_uri):
        enum = definition["enum"]
        if not isinstance(enum, (list, tuple)):
            raise SchemaDefinitionError("enum must be an array")
        message = f"must be one of {schema_value_repr(enum)}"

        def check_enum(value, name, emit, scope, _defn=definition):
            if not any(_strict_equal(value, item) for item in enum):
                emit(self._error(f"{name} {message}", value, name, _defn, "enum"))
            return value

        fn.steps.append(check_enum)
        fn.n_rules += 1

    def _kw_const(self, fn, definition, base_uri):
        const = definition["const"]
        const_repr = schema_value_repr(const)

        def check_const(value, name, emit, scope, _defn=definition):
            if not _strict_equal(value, const):
                emit(self._error(
                    f"{name} must be same as const definition: {const_repr}",
                    value, name, _defn, "const",
                ))
            return value

        fn.steps.append(check_const)
        fn.n_rules += 1

    def _kw_min_length(self, fn, definition, base_uri):
        bound = definition["minLength"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("minLength must be a number")

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, str) and len(value) < bound:
                emit(self._error(
                    f"{name} must be longer than or equal to {bound} characters",
                    value, name, _defn, "minLength",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_max_length(self, fn, definition, base_uri):
        bound = definition["maxLength"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("maxLength must be a number")

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, str) and len(value) > bound:
                emit(self._error(
                    f"{name} must be shorter than or equal to {bound} characters",
                    value, name, _defn, "maxLength",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_pattern(self, fn, definition, base_uri):
        pattern = definition["pattern"]
        compiled = re.compile(_UNESCAPED_DOLLAR.sub(r"\\Z", pattern))

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, str) and not compiled.search(value):
                emit(self._error(
                    f"{name} must match pattern {pattern}", value, name, _defn, "pattern",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_format(self, fn, definition, base_uri):
        if not self.use_formats:
            return
        format_name = definition["format"]
        if format_name in self.custom_formats:
            custom = self.custom_formats[format_name]
            if isinstance(custom, str):
                compiled = re.compile(custom)

                def check(value, name, emit, scope, _defn=definition):
                    if isinstance(value, str) and not compiled.match(value):
                        emit(self._error(
                            f"{name} must be {format_name}", value, name, _defn, "format",
                        ))
                    return value
            else:
                def check(value, name, emit, scope, _defn=definition, _cb=custom):
                    if isinstance(value, str) and not _cb(value):
                        emit(self._error(
                            f"{name} must be {format_name}", value, name, _defn, "format",
                        ))
                    return value
        elif format_name in self.format_table:
            compiled = re.compile(self.format_table[format_name])

            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, str) and not compiled.match(value):
                    emit(self._error(
                        f"{name} must be {format_name}", value, name, _defn, "format",
                    ))
                return value
        elif format_name == "regex":
            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, str):
                    try:
                        re.compile(value)
                    except Exception:
                        emit(self._error(
                            f"{name} must be a valid regex", value, name, _defn, "format",
                        ))
                return value
        else:
            return  # unknown formats are ignored (draft04.py:305-306)

        fn.steps.append(check)
        fn.n_rules += 1

    # -- numeric keywords --------------------------------------------------

    def _kw_minimum(self, fn, definition, base_uri):
        bound = definition["minimum"]
        if not isinstance(bound, _NUMERIC):
            raise SchemaDefinitionError("minimum must be a number")
        cmp = ref_numeric(bound)  # messages keep the original str(bound)
        exclusive = bool(definition.get("exclusiveMinimum", False))

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, _NUMERIC):
                if exclusive:
                    if value <= cmp:
                        emit(self._error(
                            f"{name} must be bigger than {bound}", value, name, _defn, "minimum",
                        ))
                elif value < cmp:
                    emit(self._error(
                        f"{name} must be bigger than or equal to {bound}",
                        value, name, _defn, "minimum",
                    ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_maximum(self, fn, definition, base_uri):
        bound = definition["maximum"]
        if not isinstance(bound, _NUMERIC):
            raise SchemaDefinitionError("maximum must be a number")
        cmp = ref_numeric(bound)
        exclusive = bool(definition.get("exclusiveMaximum", False))

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, _NUMERIC):
                if exclusive:
                    if value >= cmp:
                        emit(self._error(
                            f"{name} must be smaller than {bound}", value, name, _defn, "maximum",
                        ))
                elif value > cmp:
                    emit(self._error(
                        f"{name} must be smaller than or equal to {bound}",
                        value, name, _defn, "maximum",
                    ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_exclusive_minimum(self, fn, definition, base_uri):
        bound = definition["exclusiveMinimum"]
        if not isinstance(bound, _NUMERIC):
            raise SchemaDefinitionError("exclusiveMinimum must be an integer, a float or a decimal")
        cmp = ref_numeric(bound)

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, _NUMERIC) and value <= cmp:
                emit(self._error(
                    f"{name} must be bigger than {bound}", value, name, _defn, "exclusiveMinimum",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_exclusive_maximum(self, fn, definition, base_uri):
        bound = definition["exclusiveMaximum"]
        if not isinstance(bound, _NUMERIC):
            raise SchemaDefinitionError("exclusiveMaximum must be an integer, a float or a decimal")
        cmp = ref_numeric(bound)

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, _NUMERIC) and value >= cmp:
                emit(self._error(
                    f"{name} must be smaller than {bound}", value, name, _defn, "exclusiveMaximum",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_multiple_of(self, fn, definition, base_uri):
        divisor = definition["multipleOf"]
        if not isinstance(divisor, _NUMERIC):
            raise SchemaDefinitionError("multipleOf must be a number")
        cmp_div = ref_numeric(divisor)  # message keeps the original
        use_decimal = isinstance(cmp_div, float)

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, _NUMERIC):
                # Float division accumulates error (19.01 / 0.01 ==
                # 1901.0000000000002); exact decimal quotient instead,
                # matching draft04.py:361-366.
                if use_decimal:
                    quotient = Decimal(repr(value)) / Decimal(repr(cmp_div))
                else:
                    quotient = value / cmp_div
                if int(quotient) != quotient:
                    emit(self._error(
                        f"{name} must be multiple of {divisor}", value, name, _defn, "multipleOf",
                    ))
                if value / cmp_div == float("inf"):
                    emit(self._error("inifinity reached", value, name, _defn, "multipleOf"))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    # -- combinators -------------------------------------------------------

    def _kw_all_of(self, fn, definition, base_uri):
        subs = [self.compile_node(d, base_uri) for d in definition["allOf"]]

        def check(value, name, emit, scope):
            for sub in subs:
                sub(value, name, emit)
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_any_of(self, fn, definition, base_uri):
        subs = [self.compile_node(d, base_uri) for d in definition["anyOf"]]

        def check(value, name, emit, scope, _defn=definition):
            for sub in subs:
                if _passes(sub, value, name):
                    break
            else:
                emit(self._error(
                    f"{name} cannot be validated by any definition", value, name, _defn, "anyOf",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_one_of(self, fn, definition, base_uri):
        subs = [self.compile_node(d, base_uri) for d in definition["oneOf"]]

        def check(value, name, emit, scope, _defn=definition):
            matched = 0
            for sub in subs:
                if _passes(sub, value, name):
                    matched += 1
                    if matched > 1:
                        break  # exactly-one already violated (draft04.py:227)
            if matched != 1:
                emit(self._error(
                    f"{name} must be valid exactly by one definition"
                    f" ({matched} matches found)",
                    value, name, _defn, "oneOf",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_not(self, fn, definition, base_uri):
        sub_definition = definition["not"]
        if sub_definition is True:
            def check(value, name, emit, scope, _defn=definition):
                emit(self._error(f"{name} must not be there", value, name, _defn, "not"))
                return value
        elif sub_definition is False:
            return
        elif not sub_definition:
            # annotation-only subschema matches everything => always invalid
            def check(value, name, emit, scope, _defn=definition):
                emit(self._error(
                    f"{name} must NOT match a disallowed definition", value, name, _defn, "not",
                ))
                return value
        else:
            sub = self.compile_node(sub_definition, base_uri)

            def check(value, name, emit, scope, _defn=definition):
                if _passes(sub, value, name):
                    emit(self._error(
                        f"{name} must NOT match a disallowed definition",
                        value, name, _defn, "not",
                    ))
                return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_if(self, fn, definition, base_uri):
        if_fn = self.compile_node(definition["if"], base_uri)
        then_fn = self.compile_node(definition["then"], base_uri) if "then" in definition else None
        else_fn = self.compile_node(definition["else"], base_uri) if "else" in definition else None

        def check(value, name, emit, scope):
            if _passes(if_fn, value, name):
                if then_fn is not None:
                    then_fn(value, name, emit)
            elif else_fn is not None:
                else_fn(value, name, emit)
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    # -- array keywords ----------------------------------------------------

    def _kw_min_items(self, fn, definition, base_uri):
        bound = definition["minItems"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("minItems must be a number")

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, (list, tuple)) and len(value) < bound:
                emit(self._error(
                    f"{name} must contain at least {bound} items", value, name, _defn, "minItems",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_max_items(self, fn, definition, base_uri):
        bound = definition["maxItems"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("maxItems must be a number")

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, (list, tuple)) and len(value) > bound:
                emit(self._error(
                    f"{name} must contain less than or equal to {bound} items",
                    value, name, _defn, "maxItems",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_unique_items(self, fn, definition, base_uri):
        if not definition["uniqueItems"]:
            return

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, (list, tuple)):
                if len(value) > len({_freeze(item) for item in value}):
                    emit(self._error(
                        f"{name} must contain unique items", value, name, _defn, "uniqueItems",
                    ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_items(self, fn, definition, base_uri):
        items_definition = definition["items"]
        if items_definition is True:
            return

        if items_definition is False:
            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, (list, tuple)) and value:
                    emit(self._error(f"{name} must not be there", value, name, _defn, "items"))
                return value

            fn.steps.append(check)
            fn.n_rules += 1
            return

        if isinstance(items_definition, list):
            slots = []
            for idx, item_definition in enumerate(items_definition):
                item_fn = self.compile_node(item_definition, base_uri)
                default = (
                    item_definition["default"]
                    if self.use_default
                    and isinstance(item_definition, dict)
                    and "default" in item_definition
                    else _MISSING
                )
                slots.append((idx, item_fn, default))

            extra = definition.get("additionalItems", _MISSING)
            n_fixed = len(items_definition)
            extra_fn = None
            if extra is not _MISSING and extra is not False:
                extra_fn = self.compile_node(extra, base_uri)

            def check(value, name, emit, scope, _defn=definition):
                if not isinstance(value, (list, tuple)):
                    return value
                original_len = len(value)
                for idx, item_fn, default in slots:
                    if original_len > idx:
                        item_fn(value[idx], f"{name}[{idx}]", emit)
                    elif default is not _MISSING:
                        value.append(copy.deepcopy(default))
                if extra is False:
                    if original_len > n_fixed:
                        emit(self._error(
                            f"{name} must contain only specified items",
                            value, name, _defn, "items",
                        ))
                elif extra_fn is not None and extra_fn.n_rules:
                    for position in range(n_fixed, len(value)):
                        extra_fn(value[position], f"{name}[{position}]", emit)
                return value

            fn.steps.append(check)
            fn.n_rules += 1
            return

        if items_definition:
            element_fn = self.compile_node(items_definition, base_uri)
            if element_fn.n_rules == 0:
                return

            def check(value, name, emit, scope):
                if isinstance(value, (list, tuple)):
                    for position, element in enumerate(value):
                        element_fn(element, f"{name}[{position}]", emit)
                return value

            fn.steps.append(check)
            fn.n_rules += 1

    def _kw_contains(self, fn, definition, base_uri):
        contains_definition = definition["contains"]
        if contains_definition is False:
            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, (list, tuple)):
                    emit(self._error(f"{name} is always invalid", value, name, _defn, "contains"))
                return value
        elif contains_definition is True:
            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, (list, tuple)) and not value:
                    emit(self._error(f"{name} must not be empty", value, name, _defn, "contains"))
                return value
        else:
            sub = self.compile_node(contains_definition, base_uri)

            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, (list, tuple)):
                    if not any(_passes(sub, element, name) for element in value):
                        emit(self._error(
                            f"{name} must contain one of contains definition",
                            value, name, _defn, "contains",
                        ))
                return value

        fn.steps.append(check)
        fn.n_rules += 1

    # -- object keywords ---------------------------------------------------

    def _kw_min_properties(self, fn, definition, base_uri):
        bound = definition["minProperties"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("minProperties must be a number")

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, dict) and len(value) < bound:
                emit(self._error(
                    f"{name} must contain at least {bound} properties",
                    value, name, _defn, "minProperties",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_max_properties(self, fn, definition, base_uri):
        bound = definition["maxProperties"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("maxProperties must be a number")

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, dict) and len(value) > bound:
                emit(self._error(
                    f"{name} must contain less than or equal to {bound} properties",
                    value, name, _defn, "maxProperties",
                ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_required(self, fn, definition, base_uri):
        required = definition["required"]
        if not isinstance(required, (list, tuple)):
            raise SchemaDefinitionError("required must be an array")
        if len(required) != len(set(required)):
            raise SchemaDefinitionError("required must contain unique elements")
        if not definition.get("additionalProperties", True):
            # Keys that can never appear make 'required' unsatisfiable —
            # reject at compile time (draft04.py:515-524).
            patterns = list(definition.get("patternProperties", {}))
            impossible = [
                key
                for key in required
                if key not in definition.get("properties", {})
                and not any(re.search(p, key) for p in patterns)
            ]
            if impossible:
                raise SchemaDefinitionError(
                    "data: items {} are required but not allowed".format(impossible)
                )
        required_set = set(required)

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, dict):
                missing = required_set - value.keys()
                if missing:
                    emit(self._error(
                        f"{name} must contain " + str(sorted(missing)) + " properties",
                        value, name, _defn, "required",
                    ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_dependencies(self, fn, definition, base_uri):
        compiled = []
        for key, requirement in definition["dependencies"].items():
            if requirement == [] or requirement is True:
                continue
            if requirement is False:
                compiled.append((key, "forbidden", None))
            elif isinstance(requirement, list):
                compiled.append((key, "keys", list(requirement)))
            else:
                compiled.append((key, "schema", self.compile_node(requirement, base_uri)))
        if not compiled:
            return

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, dict):
                for key, kind, payload in compiled:
                    if key not in value:
                        continue
                    if kind == "forbidden":
                        emit(self._error(
                            f"{key} in {name} must not be there", value, name, _defn, "dependencies",
                        ))
                    elif kind == "keys":
                        for needed in payload:
                            if needed not in value:
                                emit(self._error(
                                    f"{name} missing dependency {needed} for {key}",
                                    value, name, _defn, "dependencies",
                                ))
                    else:
                        payload(value, name, emit)
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_properties(self, fn, definition, base_uri):
        compiled = []
        for key, prop_definition in definition["properties"].items():
            if not isinstance(prop_definition, (dict, bool)):
                clean = re.sub(r"[^a-zA-Z0-9]", "", key)
                raise SchemaDefinitionError("data[{}] must be object".format(clean))
            prop_fn = self.compile_node(prop_definition, base_uri)
            default = (
                prop_definition["default"]
                if self.use_default
                and isinstance(prop_definition, dict)
                and "default" in prop_definition
                else _MISSING
            )
            compiled.append((key, prop_fn, default))

        def check(value, name, emit, scope):
            if isinstance(value, dict):
                remaining = _scope_keys(scope, value)
                for key, prop_fn, default in compiled:
                    if key in remaining:
                        remaining.discard(key)
                        prop_fn(value[key], f"{name}.{key}", emit)
                    elif default is not _MISSING:
                        value[key] = copy.deepcopy(default)
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_pattern_properties(self, fn, definition, base_uri):
        table = definition["patternProperties"]
        compiled = [
            (re.compile(pattern), self.compile_node(sub, base_uri))
            for pattern, sub in table.items()
        ]

        def check(value, name, emit, scope):
            if isinstance(value, dict):
                remaining = _scope_keys(scope, value)
                if not compiled:
                    return value
                for key, item in list(value.items()):
                    for matcher, sub_fn in compiled:
                        if matcher.search(key):
                            remaining.discard(key)
                            sub_fn(item, f"{name}.{key}", emit)
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_additional_properties(self, fn, definition, base_uri):
        add_definition = definition["additionalProperties"]
        declared = list(definition.get("properties", {}).keys())

        if add_definition is True or add_definition == {}:
            def check(value, name, emit, scope):
                if isinstance(value, dict):
                    _scope_keys(scope, value)  # keys-set creation point parity
                return value
        elif add_definition:
            sub_fn = self.compile_node(add_definition, base_uri)

            def check(value, name, emit, scope):
                if isinstance(value, dict):
                    remaining = _scope_keys(scope, value)
                    for key in [k for k in value if k in remaining]:
                        if key not in declared:
                            sub_fn(value.get(key), f"{name}.{key}", emit)
                return value
        else:
            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, dict):
                    remaining = _scope_keys(scope, value)
                    if remaining:
                        # sorted for executor determinism (reference prints
                        # raw set repr, draft04.py:631)
                        shown = "{" + ", ".join(repr(k) for k in sorted(remaining)) + "}"
                        emit(self._error(
                            f"{name} must not contain {shown} properties",
                            value, name, _defn, "additionalProperties",
                        ))
                return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_property_names(self, fn, definition, base_uri):
        names_definition = definition.get("propertyNames", {})
        if names_definition is True:
            return
        if names_definition is False:
            def check(value, name, emit, scope, _defn=definition):
                # divergence: is-dict guard added (reference crashes on
                # non-objects here, draft06.py:117-120)
                if isinstance(value, dict) and value:
                    emit(self._error(f"{name} must not be there", value, name, _defn, "propertyNames"))
                return value
        else:
            sub = self.compile_node(names_definition, base_uri)

            def check(value, name, emit, scope, _defn=definition):
                if isinstance(value, dict) and len(value) != 0:
                    if not all(_passes(sub, key, name) for key in value):
                        emit(self._error(
                            f"{name} must be named by propertyName definition",
                            value, name, _defn, "propertyNames",
                        ))
                return value

        fn.steps.append(check)
        fn.n_rules += 1

    # -- content keywords --------------------------------------------------

    def _kw_content_encoding(self, fn, definition, base_uri):
        if definition["contentEncoding"] != "base64":
            return

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, str):
                try:
                    value = base64.b64decode(value)
                except Exception:
                    emit(self._error(
                        f"{name} must be encoded by base64", value, name, _defn, None,
                    ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1

    def _kw_content_media_type(self, fn, definition, base_uri):
        if definition["contentMediaType"] != "application/json":
            return

        def check(value, name, emit, scope, _defn=definition):
            if isinstance(value, bytes):
                try:
                    value = value.decode("utf-8")
                except Exception:
                    emit(self._error(
                        f"{name} must encoded by utf8", value, name, _defn, None,
                    ))
            if isinstance(value, str):
                try:
                    value = json.loads(value)
                except Exception:
                    emit(self._error(
                        f"{name} must be valid JSON", value, name, _defn, None,
                    ))
            return value

        fn.steps.append(check)
        fn.n_rules += 1


_MISSING = object()


def _method_name(keyword: str) -> str:
    out = []
    for ch in keyword:
        if ch.isupper():
            out.append("_")
            out.append(ch.lower())
        else:
            out.append(ch)
    return "".join(out)


class RowValidator:
    """Driver-compiled validator: ``validator(data)`` raises on the first
    violation (fast-fail) or a collection (fast_fail=False), returning the
    possibly-transformed data, exactly like the reference's compiled
    function.  ``collect(data)`` is the engine-facing API: returns the list
    of violations without raising — the natural vectorized mode."""

    # Closure dispatch costs up to ~8 Python frames per data-nesting level
    # for combinator-heavy recursive schemas (the reference's flat generated
    # code costs ~2); raise the limit during validation so 2000-level
    # documents (FHIR-scale and beyond) still validate.  CPython >=3.11
    # keeps interpreter frames off the C stack, so 20k Python frames is
    # safe; genuinely unbounded data still raises RecursionError, which the
    # Spark engine maps to a "too deeply nested" violation (jsoncol.py).
    _RECURSION_HEADROOM = 20000

    def __init__(self, node_fn, fast_fail: bool):
        self._fn = node_fn
        self._fast_fail = fast_fail

    def __call__(self, data):
        import sys

        previous = sys.getrecursionlimit()
        sys.setrecursionlimit(max(previous, self._RECURSION_HEADROOM))
        try:
            if self._fast_fail:
                return self._fn(data, "data", _RAISE)
            sink = _Collect()
            result = self._fn(data, "data", sink)
            if sink.errors:
                raise ValidationErrors(sink.errors)
            return result
        finally:
            sys.setrecursionlimit(previous)

    def collect(self, data):
        """Validate and return all violations (never raises for data errors)."""
        import sys

        previous = sys.getrecursionlimit()
        sys.setrecursionlimit(max(previous, self._RECURSION_HEADROOM))
        try:
            sink = _Collect()
            self._fn(data, "data", sink)
            return sink.errors
        finally:
            sys.setrecursionlimit(previous)

    def violation_rows(self, data):
        """Violations as plain dicts — one element per engine violation row."""
        return [e.as_row() for e in self.collect(data)]


def _pick_dialect(definition) -> str:
    if isinstance(definition, dict):
        version = definition.get("$schema", "")
        if "draft-04" in version:
            return "draft04"
        if "draft-06" in version:
            return "draft06"
        if "draft-07" in version:
            return "draft07"
    return "draft2019"


def compile_row_validator(
    definition,
    handlers: dict | None = None,
    formats: dict | None = None,
    use_default: bool = True,
    use_formats: bool = True,
    detailed_exceptions: bool = True,
    fast_fail: bool = True,
) -> RowValidator:
    """Compile a schema definition into a :class:`RowValidator` (API parity
    with the reference's ``compile``, ``__init__.py:169-290``)."""
    dialect = _pick_dialect(definition)
    store = SchemaStore(definition, handlers=handlers)
    compiler = _Compiler(
        store,
        dialect,
        {
            "formats": formats,
            "use_default": use_default,
            "use_formats": use_formats,
            "detailed_exceptions": detailed_exceptions,
        },
    )
    root_fn = compiler.compile_root()
    return RowValidator(root_fn, fast_fail)


def _as_list(value):
    return value if isinstance(value, list) else [value]
