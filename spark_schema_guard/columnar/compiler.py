"""Columnar plan compiler: JSON-Schema definition → ordered list of
vectorized rule predicates (Spark Column expressions).

The Spark analog of the reference's code generator (``generator.py``): one
driver-side compile turns the schema into declarative Column expressions that
Catalyst optimizes and whole-stage codegen evaluates JVM-side — no per-row
Python in the hot path.  Evaluation-order parity: rules are emitted in the
reference's keyword-registration order (``draft04.py:42-68`` + draft-06/07
extensions), properties in schema order, so the first element of the
``violations`` array equals the reference's fast-fail error.

Static-type constant folding (the optimization the reference cannot do, and
Catalyst cannot either because it doesn't know rule semantics):

* ``type: string`` on a StringType column emits *no rule* (always true);
* ``type: integer`` on a LongType column likewise; on a DoubleType column it
  emits the draft-06 integral-float runtime check only;
* a rule whose guard type can never occur for the column (``minLength`` on a
  numeric column) is dropped — the reference would no-op it per row.

NULL convention: a NULL cell means the property is *absent* (JSON has
missing-vs-null; flat columns do not).  Per-value rules are therefore gated
on ``IS NOT NULL`` and only ``required`` fires on NULL — matching the
reference, where subschemas of absent keys are never evaluated.

Python-regex parity: ``pattern``/``format`` default to JVM ``rlike`` with the
``$``→``\\Z``→``\\z`` end-anchor translation (fast path); ``regex_engine=
"python"`` switches to an Arrow-batched pandas UDF running the same
precompiled Python regex bank as the reference for byte-exact semantics.
"""

from __future__ import annotations


import math
import re

import pandas as pd
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import SchemaDefinitionError
from ..formats import jvm_pattern
from ..ref_resolver import SchemaStore
from ..rowcheck.compiler import (
    _UNESCAPED_DOLLAR, _Compiler as _RowCompiler, _pick_dialect,
    schema_value_repr,
)
from . import typemap
from .plan import Rule, ValidationPlan

_ISO_TS = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_ISO_DATE = "yyyy-MM-dd"


@dataclass
class _Site:
    """One value location: a column, struct field, map value, or array
    element reached via HOF lambda."""

    expr: Column | None  # None only for the root row object
    dtype: T.DataType
    sname: str  # static dotted name for plan display
    name_col: Column  # runtime name expression (handles dynamic indices)
    base_uri: str = ""
    # Columns and struct fields follow NULL-means-absent; array elements and
    # map values are always "present" — their NULL is a JSON null value.
    null_is_value: bool = False
    # For struct sites parsed out of a JSON string column: the JSON TEXT of
    # this object (root = the raw column; nested = get_json_object slice).
    # Lets object keywords see the TRUE runtime key set via
    # json_object_keys instead of only the schema-declared struct fields.
    json_expr: Column | None = None
    # Pre-materialized map<string,variant> view of json_expr (a helper
    # column, so the parse happens once per row — from_json is
    # CodegenFallback and would re-evaluate per inline copy).
    variant_expr: Column | None = None
    # Pre-materialized json_object_keys(json_expr) (same reasoning: the
    # JSON expressions re-parse per inline occurrence, and several object
    # keywords consult the key set).
    keys_expr: Column | None = None
    # Owning compiler, for registering helper columns: nested JSON-backed
    # sites materialize their variant-map/key-set parses as plan aux
    # columns instead of inlining a re-parse per consulting rule.  Only
    # row-level sites carry json_expr, so HOF-lambda element sites (whose
    # exprs are lambda variables, invalid as top-level columns) can never
    # trigger a registration.
    compiler: "object | None" = None

    def present(self) -> Column:
        if self.expr is None or self.null_is_value:
            return F.lit(True)
        if self.keys_expr is not None:
            # JSON-backed object site: presence = the text parsed as a
            # JSON object.  Equivalent to the typed-struct parse being
            # non-null for every row the caller doesn't already override
            # with its malformed-JSON check, and it frees Catalyst to
            # prune the struct parse when all rules compile against the
            # variant view (scalar-only schemas → one parse per row).
            return self.keys_expr.isNotNull()
        return self.expr.isNotNull()

    def object_variant_map(self) -> Column:
        """map<string,variant> view of this JSON object's entries
        (try_parse_json + "$" cast — the native variant parser measures
        ~16x cheaper than from_json(map<string,variant>))."""
        if self.variant_expr is None:
            vm = F.try_variant_get(F.try_parse_json(self.json_expr),
                                   "$", "map<string,variant>")
            if self.compiler is not None:
                vm = self.compiler._materialize("vmap", vm)
            self.variant_expr = vm
        return self.variant_expr

    def child(self, expr, dtype, suffix_static, name_col=None,
              json_expr=None) -> "_Site":
        return _Site(
            expr=expr,
            dtype=dtype,
            sname=self.sname + suffix_static,
            name_col=name_col if name_col is not None
            else F.concat(self.name_col, F.lit(suffix_static)),
            base_uri=self.base_uri,
            json_expr=json_expr,
            compiler=self.compiler,
        )

    def object_keys(self) -> Column | None:
        """Runtime key array of this object, when the true key set is
        knowable (JSON-backed struct sites); None for plain structs."""
        if self.keys_expr is None:
            if self.variant_expr is not None:
                # piggyback on the already-materialized variant parse
                self.keys_expr = F.map_keys(self.variant_expr)
            elif self.json_expr is not None:
                k = F.json_object_keys(self.json_expr)
                if self.compiler is not None:
                    k = self.compiler._materialize("keys", k)
                self.keys_expr = k
        return self.keys_expr


def _json_path(key: str) -> str:
    """get_json_object path for a static key."""
    if re.fullmatch(r"[A-Za-z0-9_]+", key):
        return f"$.{key}"
    return "$['" + key.replace("'", "\\'") + "']"


class _NestedViolation:
    """Marker in the rule-id slot of a variant-rule triple: the violation
    struct (name/rule/message) comes pre-built from a nested value's own
    first-failing rule instead of the enclosing entry's name/message."""

    __slots__ = ("struct",)

    def __init__(self, struct: Column):
        self.struct = struct


class PlanUnsupported(SchemaDefinitionError):
    """A keyword/type combination the columnar compiler cannot express;
    callers may fall back to the row-validator pandas-UDF path."""


class _PlanCompiler:
    def __init__(self, store: SchemaStore, dialect: str, options: dict):
        self.store = store
        self.dialect = dialect
        order, formats = _RowCompiler._DIALECTS[dialect]
        self.keyword_order = order
        self.format_table = formats
        self.integral_float_is_int = dialect != "draft04"
        self.regex_engine = options.get("regex_engine", "jvm")
        self.use_formats = options.get("use_formats", True)
        self.use_default = options.get("use_default", True)
        self.custom_formats = options.get("formats") or {}
        # exact JSON value typing for declared fields / undeclared value
        # schemas via VariantType; False = legacy coercing struct parse
        # (faster, documented string-coercion caveat)
        self.exact_json_types = options.get("exact_json_types", True)
        self.defaults: list[tuple[str, object]] = []  # top-level column defaults
        self._ref_stack: list[tuple[str, str]] = []
        # helper columns (name, expr) the plan must project before rule
        # evaluation — nested JSON parses materialized once per row
        # instead of once per consulting rule (from_json/get_json_object
        # are CodegenFallback: every inline copy re-parses the text)
        self.aux_cols: list[tuple[str, Column]] = []
        self._aux_memo: dict = {}

    def _materialize(self, hint: str, col: Column) -> Column:
        # memoized on the expression fingerprint: combinator branches
        # re-request the same typed projection of the same variant —
        # they must share one helper column, not stack duplicates
        key = (hint, str(col))
        cached = self._aux_memo.get(key)
        if cached is not None:
            return F.col(cached)
        name = f"__aux{len(self.aux_cols)}_{hint}__"
        self.aux_cols.append((name, col))
        self._aux_memo[key] = name
        return F.col(name)

    # ------------------------------------------------------------------
    def compile_root(self, definition, df_schema: T.StructType) -> list[Rule]:
        site = _Site(
            expr=None,
            dtype=df_schema,
            sname="data",
            name_col=F.lit("data"),
            base_uri=self.store.root_uri(),
        )
        return self.compile_value(definition, site)

    def compile_value(self, definition, site: _Site) -> list[Rule]:
        if definition is True or definition == {}:
            return []
        if definition is False:
            return [Rule(None, site.sname, site.name_col,
                         F.concat(site.name_col, F.lit(" must not be there")),
                         site.present())]
        if not isinstance(definition, dict):
            raise SchemaDefinitionError("definition must be an object")

        if "$ref" in definition:
            target, doc_uri, canonical = self.store.resolve(definition["$ref"], site.base_uri)
            key = (canonical, site.sname)
            if key in self._ref_stack:
                # same schema at the same static site: recursion that does
                # not descend the (finite) Spark type — terminate as pass
                return []
            self._ref_stack.append(key)
            try:
                # same site, re-based to the target document — $ref is
                # transparent, so every value-semantics field (explicit
                # null handling, JSON text/variant/key views) carries over
                sub_site = _Site(site.expr, site.dtype, site.sname,
                                 site.name_col, doc_uri,
                                 null_is_value=site.null_is_value,
                                 json_expr=site.json_expr,
                                 variant_expr=site.variant_expr,
                                 keys_expr=site.keys_expr,
                                 compiler=site.compiler)
                return self.compile_value(target, sub_site)
            finally:
                self._ref_stack.pop()

        rules: list[Rule] = []
        for keyword in self.keyword_order:
            if keyword in definition:
                handler = getattr(self, "_kw_" + _snake(keyword), None)
                if handler is None:
                    continue
                rules.extend(handler(definition, site) or [])
        return rules

    def _pass_expr(self, definition, site: _Site) -> Column:
        """Whole-subschema success as one boolean Column (combinator probe)."""
        rules = self.compile_value(definition, site)
        ok = F.lit(True)
        for rule in rules:
            ok = ok & ~_null_false(rule.fail)
        return ok

    # -- helpers -----------------------------------------------------------

    def _rule(self, site, rule_id, message, fail) -> Rule:
        if isinstance(message, str):
            message = F.concat(site.name_col, F.lit(" " + message))
        value_col = site.expr.cast("string") if site.expr is not None else None
        return Rule(rule_id, site.sname, site.name_col, message,
                    site.present() & _null_false(fail), value_col=value_col)

    def _string_expr(self, site: _Site) -> Column | None:
        """The value as its JSON string form, or None if never a string."""
        if typemap.is_temporal(site.dtype):
            pattern = _ISO_DATE if isinstance(site.dtype, T.DateType) else _ISO_TS
            return F.date_format(site.expr, pattern)
        if isinstance(site.dtype, (T.StringType, T.CharType, T.VarcharType)):
            return site.expr
        return None

    def _regex_match(self, expr: Column, pattern: str, *, anchored: bool) -> Column:
        """True where the string matches.  anchored=True uses ``.match``
        semantics (formats), else ``.search`` (pattern keyword)."""
        if self.regex_engine == "python":
            compiled = re.compile(pattern)
            if anchored:
                @F.pandas_udf(T.BooleanType())
                def matcher(s: pd.Series) -> pd.Series:
                    return s.map(lambda v: v is not None and bool(compiled.match(v)))
            else:
                @F.pandas_udf(T.BooleanType())
                def matcher(s: pd.Series) -> pd.Series:
                    return s.map(lambda v: v is not None and bool(compiled.search(v)))

            return matcher(expr)
        java = jvm_pattern(pattern)
        if anchored and not java.startswith("^"):
            java = "^(?:" + java + ")"
        return expr.rlike(java)

    # -- type --------------------------------------------------------------

    def _kw_type(self, definition, site):
        declared = definition["type"]
        types = declared if isinstance(declared, list) else [declared]
        for t in types:
            if t not in ("null", "boolean", "number", "integer", "string", "array", "object"):
                raise SchemaDefinitionError("Unknown type")
        static = typemap.json_types_of(site.dtype)
        if any(t in types for t in static):
            # statically satisfied for non-null values; a JSON null value
            # (array element / map value) still fails unless null allowed
            if site.null_is_value and "null" not in types:
                return [self._rule(site, "type", "must be " + " or ".join(types),
                                   site.expr.isNull())]
            return []  # constant-fold away
        if "integer" in types and typemap.is_fractional(site.dtype) and self.integral_float_is_int:
            expr = site.expr
            # modulo, not floor(): floor on a double returns LONG, which
            # overflows (-> NULL/ANSI error) for magnitudes past 2^63 —
            # 1e308 IS integral (float.is_integer() in the reference)
            is_integral = (expr % F.lit(1.0)) == F.lit(0.0)
            if isinstance(site.dtype, (T.FloatType, T.DoubleType)):
                inf = float("inf")
                is_integral = (
                    ~F.isnan(expr) & (F.abs(expr) != F.lit(inf)) & is_integral
                )
            fail = ~is_integral
            if site.null_is_value and "null" not in types:
                fail = fail | expr.isNull()
            return [self._rule(site, "type",
                               "must be " + " or ".join(types), fail)]
        if site.null_is_value and "null" in types:
            # only the JSON null value satisfies the declared types; when
            # the raw JSON text is available, use it — the typed parse
            # maps non-coercible values to NULL, which would otherwise be
            # indistinguishable from a true JSON null
            if site.json_expr is not None:
                return [self._rule(site, "type", "must be " + " or ".join(types),
                                   site.json_expr.isNotNull())]
            return [self._rule(site, "type", "must be " + " or ".join(types),
                               site.expr.isNotNull())]
        # statically impossible: every present value violates.  One
        # exception: a JSON-backed site whose struct inference fell back
        # to string (recursive $ref — no finite static type) may hold a
        # real object/array at runtime; a constant-fail would be silently
        # wrong, so refuse the plan instead.
        if (site.json_expr is not None
                and isinstance(site.dtype, (T.StringType,))
                and ("object" in types or "array" in types)):
            raise PlanUnsupported(
                "recursive $ref object/array schemas have no finite static "
                "type for the columnar engine; use engine='python'")
        return [self._rule(site, "type", "must be " + " or ".join(types), F.lit(True))]

    # -- enum / const ------------------------------------------------------

    def _kw_enum(self, definition, site):
        enum = definition["enum"]
        if not isinstance(enum, (list, tuple)):
            raise SchemaDefinitionError("enum must be an array")
        message = f"must be one of {schema_value_repr(enum)}"
        compatible = [v for v in enum if _value_fits(v, site.dtype)]
        null_passes = site.null_is_value and any(v is None for v in enum)
        if not compatible and not null_passes:
            return [self._rule(site, "enum", message, F.lit(True))]
        if not compatible:
            # only the null member can match (e.g. enum [null] on a
            # string site): pass exactly on explicit JSON null
            return [self._rule(site, "enum", message, site.expr.isNotNull())]
        expr = site.expr
        string_expr = self._string_expr(site)
        if string_expr is not None:
            expr = string_expr
            compatible = [v for v in compatible if isinstance(v, str)]
        ok = F.lit(False)
        for v in compatible:
            ok = ok | expr.eqNullSafe(_literal(v, site.dtype))
        if site.null_is_value and any(v is None for v in enum):
            ok = ok | site.expr.isNull()
        return [self._rule(site, "enum", message, ~ok)]

    def _kw_const(self, definition, site):
        const = definition["const"]
        message = f"must be same as const definition: {schema_value_repr(const)}"
        if const is None and site.null_is_value:
            return [self._rule(site, "const", message, site.expr.isNotNull())]
        if not _value_fits(const, site.dtype):
            return [self._rule(site, "const", message, F.lit(True))]
        expr = self._string_expr(site)
        expr = expr if expr is not None else site.expr
        return [self._rule(site, "const", message, ~expr.eqNullSafe(_literal(const, site.dtype)))]

    # -- numbers -----------------------------------------------------------

    def _numeric_bound(self, definition, site, keyword, op, message_tpl):
        bound = definition[keyword]
        if not isinstance(bound, (int, float, Decimal)):
            if keyword in ("exclusiveMinimum", "exclusiveMaximum"):
                raise SchemaDefinitionError(
                    f"{keyword} must be an integer, a float or a decimal")
            raise SchemaDefinitionError(f"{keyword} must be a number")
        if not typemap.is_numeric(site.dtype):
            return []
        lit_bound = F.lit(int(bound) if isinstance(bound, bool) else bound)
        fail = op(site.expr, lit_bound)
        return [self._rule(site, keyword, message_tpl.format(bound), fail)]

    def _kw_minimum(self, definition, site):
        # exclusiveMinimum here is the draft-04 boolean modifier, but the
        # reference treats any truthy value as "exclusive" (draft04.py:339)
        if bool(definition.get("exclusiveMinimum", False)):
            return self._numeric_bound(
                definition, site, "minimum", lambda c, b: c <= b,
                "must be bigger than {}")
        return self._numeric_bound(
            definition, site, "minimum", lambda c, b: c < b,
            "must be bigger than or equal to {}")

    def _kw_maximum(self, definition, site):
        if bool(definition.get("exclusiveMaximum", False)):
            return self._numeric_bound(
                definition, site, "maximum", lambda c, b: c >= b,
                "must be smaller than {}")
        return self._numeric_bound(
            definition, site, "maximum", lambda c, b: c > b,
            "must be smaller than or equal to {}")

    def _kw_exclusive_minimum(self, definition, site):
        return self._numeric_bound(
            definition, site, "exclusiveMinimum", lambda c, b: c <= b,
            "must be bigger than {}")

    def _kw_exclusive_maximum(self, definition, site):
        return self._numeric_bound(
            definition, site, "exclusiveMaximum", lambda c, b: c >= b,
            "must be smaller than {}")

    def _kw_multiple_of(self, definition, site):
        divisor = definition["multipleOf"]
        if not isinstance(divisor, (int, float, Decimal)):
            raise SchemaDefinitionError("multipleOf must be a number")
        if not typemap.is_numeric(site.dtype):
            return []
        expr = site.expr
        if typemap.is_integral(site.dtype) and isinstance(divisor, int):
            # exact long modulo — documented deliberate divergence from
            # the reference's float true-division past 2^53 on TYPED
            # integer columns (tests/test_divergences.py)
            fail = (expr % F.lit(divisor)) != F.lit(0)
        elif isinstance(divisor, (int, bool)) and not isinstance(divisor, float):
            # fractional value, int divisor: mirror the reference's
            # float true-division — invalid iff the double quotient is
            # non-integral, so any |q| >= 2^52 is integral and valid
            # (draft04.py:366)
            q = expr / F.lit(float(divisor))
            fail = (q % F.lit(1.0)) != F.lit(0.0)
        else:
            # Float divisor: double→decimal cast goes through the
            # shortest decimal repr (BigDecimal.valueOf), the JVM analog
            # of the reference's Decimal(repr(x)) trick
            # (draft04.py:361-366).  try_cast, with a double-fmod
            # fallback: magnitudes past Decimal(38,18) (~1e20) would
            # raise under ANSI.
            dec = T.DecimalType(38, 18)
            fail = F.coalesce(
                (expr.try_cast(dec) % F.lit(divisor).cast(dec))
                != F.lit(0).cast(dec),
                (expr % F.lit(float(divisor))) != F.lit(0.0))
        rules = [self._rule(site, "multipleOf", f"must be multiple of {divisor}", fail)]
        if typemap.is_fractional(site.dtype) and not isinstance(site.dtype, T.DecimalType):
            inf = float("inf")
            rules.append(Rule(
                "multipleOf", site.sname, site.name_col, F.lit("inifinity reached"),
                site.present() & _null_false((expr / F.lit(divisor)) == F.lit(inf)),
            ))
        return rules

    # -- strings -----------------------------------------------------------

    def _kw_min_length(self, definition, site):
        bound = definition["minLength"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("minLength must be a number")
        expr = self._string_expr(site)
        if expr is None:
            return []
        return [self._rule(
            site, "minLength",
            f"must be longer than or equal to {bound} characters",
            F.length(expr) < F.lit(bound))]

    def _kw_max_length(self, definition, site):
        bound = definition["maxLength"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("maxLength must be a number")
        expr = self._string_expr(site)
        if expr is None:
            return []
        return [self._rule(
            site, "maxLength",
            f"must be shorter than or equal to {bound} characters",
            F.length(expr) > F.lit(bound))]

    def _kw_pattern(self, definition, site):
        pattern = definition["pattern"]
        expr = self._string_expr(site)
        if expr is None:
            return []
        fixed = _UNESCAPED_DOLLAR.sub(r"\\Z", pattern)
        match = self._regex_match(expr, fixed, anchored=False)
        return [self._rule(site, "pattern", f"must match pattern {pattern}", ~match)]

    def _kw_format(self, definition, site):
        if not self.use_formats:
            return []
        format_name = definition["format"]
        expr = self._string_expr(site)
        if expr is None:
            return []
        if format_name in self.custom_formats:
            custom = self.custom_formats[format_name]
            if isinstance(custom, str):
                match = self._regex_match(expr, custom, anchored=True)
            else:
                @F.pandas_udf(T.BooleanType())
                def matcher(s: pd.Series) -> pd.Series:
                    return s.map(lambda v: v is not None and bool(custom(v)))

                match = matcher(expr)
            return [self._rule(site, "format", f"must be {format_name}", ~match)]
        if format_name in self.format_table:
            if typemap.is_temporal(site.dtype) and format_name in ("date-time", "date"):
                return []  # a real timestamp/date always renders validly
            match = self._regex_match(expr, self.format_table[format_name], anchored=True)
            return [self._rule(site, "format", f"must be {format_name}", ~match)]
        if format_name == "regex":
            @F.pandas_udf(T.BooleanType())
            def compiles(s: pd.Series) -> pd.Series:
                def try_compile(v):
                    if v is None:
                        return True
                    try:
                        re.compile(v)
                        return True
                    except Exception:
                        return False
                return s.map(try_compile)

            return [self._rule(site, "format", "must be a valid regex", ~compiles(expr))]
        return []

    # -- combinators -------------------------------------------------------

    def _kw_all_of(self, definition, site):
        rules = []
        for sub in definition["allOf"]:
            rules.extend(self.compile_value(sub, site))
        return rules

    def _kw_any_of(self, definition, site):
        passes = [self._pass_expr(sub, site) for sub in definition["anyOf"]]
        ok = F.lit(False)
        for p in passes:
            ok = ok | p
        return [self._rule(site, "anyOf", "cannot be validated by any definition", ~ok)]

    def _kw_one_of(self, definition, site):
        passes = [self._pass_expr(sub, site) for sub in definition["oneOf"]]
        count = F.lit(0)
        for p in passes:
            count = count + p.cast("int")
        message = F.concat(
            site.name_col,
            F.lit(" must be valid exactly by one definition ("),
            count.cast("string"),
            F.lit(" matches found)"),
        )
        return [Rule("oneOf", site.sname, site.name_col, message,
                     site.present() & (count != F.lit(1)))]

    def _kw_not(self, definition, site):
        sub = definition["not"]
        if sub is True:
            return [self._rule(site, "not", "must not be there", F.lit(True))]
        if sub is False:
            return []
        return [self._rule(site, "not", "must NOT match a disallowed definition",
                           self._pass_expr(sub, site))]

    def _kw_if(self, definition, site):
        condition = self._pass_expr(definition["if"], site)
        rules = []
        if "then" in definition:
            for rule in self.compile_value(definition["then"], site):
                rules.append(rule.gated(condition))
        if "else" in definition:
            for rule in self.compile_value(definition["else"], site):
                rules.append(rule.gated(~condition))
        return rules

    # -- arrays ------------------------------------------------------------

    def _array_guard(self, site):
        return isinstance(site.dtype, T.ArrayType)

    def _kw_min_items(self, definition, site):
        bound = definition["minItems"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("minItems must be a number")
        if not self._array_guard(site):
            return []
        return [self._rule(site, "minItems", f"must contain at least {bound} items",
                           F.size(site.expr) < F.lit(bound))]

    def _kw_max_items(self, definition, site):
        bound = definition["maxItems"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("maxItems must be a number")
        if not self._array_guard(site):
            return []
        return [self._rule(site, "maxItems",
                           f"must contain less than or equal to {bound} items",
                           F.size(site.expr) > F.lit(bound))]

    def _kw_unique_items(self, definition, site):
        if not definition["uniqueItems"] or not self._array_guard(site):
            return []
        # Typed arrays are homogeneous, so the reference's freeze
        # canonicalization (bool→str etc., draft04.py:412-419) is a no-op
        # and array_distinct is exact.
        return [self._rule(site, "uniqueItems", "must contain unique items",
                           F.size(F.array_distinct(site.expr)) < F.size(site.expr))]

    def _kw_items(self, definition, site):
        items_definition = definition["items"]
        if not self._array_guard(site) or items_definition is True:
            return []
        element_type = site.dtype.elementType
        rules = []

        if items_definition is False:
            return [self._rule(site, "items", "must not be there",
                               F.size(site.expr) > F.lit(0))]

        if isinstance(items_definition, list):
            for idx, item_definition in enumerate(items_definition):
                element_site = _Site(
                    F.try_element_at(site.expr, F.lit(idx + 1)), element_type,
                    site.sname + f"[{idx}]",
                    F.concat(site.name_col, F.lit(f"[{idx}]")),
                    site.base_uri, null_is_value=True)
                for rule in self.compile_value(item_definition, element_site):
                    rules.append(rule.gated(
                        site.present() & (F.size(site.expr) > F.lit(idx))))
            n_fixed = len(items_definition)
            extra = definition.get("additionalItems")
            if extra is False:
                rules.append(self._rule(
                    site, "items", "must contain only specified items",
                    F.size(site.expr) > F.lit(n_fixed)))
            elif isinstance(extra, (dict, bool)) and extra is not True:
                fail_idx = self._first_failing_index(
                    site, extra, element_type, start=n_fixed)
                if fail_idx is not None:
                    rules.append(fail_idx)
            return rules

        fail_rule = self._first_failing_index(site, items_definition, element_type, start=0)
        return [fail_rule] if fail_rule is not None else []

    def _violation_struct(self, rules) -> Column | None:
        """First-failing-rule violation struct for a compiled rule list
        (null when all pass) — carries the exact inner rule id, name and
        message, so nested violations match the reference byte-for-byte."""
        if not rules:
            return None
        branches = [
            F.when(rule.fail, rule.dynamic) if rule.dynamic is not None
            else F.when(rule.fail, F.struct(
                rule.name_col.alias("name"),
                F.lit(rule.rule).alias("rule"),
                rule.message.alias("message"),
            ))
            for rule in rules
        ]
        return F.coalesce(*branches) if len(branches) > 1 else branches[0]

    def _first_failing_index(self, site, element_definition, element_type, start):
        """One rule firing when any element from ``start`` violates the
        element schema; name/rule/message come from the first failing
        element's first failing inner rule (``data.col[i] must be ...``)."""

        def element_violation(x, i):
            idx = (i + F.lit(start)).cast("string")
            name_col = F.concat(site.name_col, F.lit("["), idx, F.lit("]"))
            s = _Site(x, element_type, site.sname + "[*]", name_col,
                      site.base_uri, null_is_value=True)
            return self._violation_struct(self.compile_value(element_definition, s))

        if element_violation(F.lit(None).cast(element_type), F.lit(0)) is None:
            return None
        tail = F.slice(site.expr, start + 1,
                       F.greatest(F.size(site.expr) - F.lit(start), F.lit(0)))
        failing = F.filter(F.transform(tail, element_violation),
                           lambda y: y.isNotNull())
        first = F.try_element_at(failing, F.lit(1))
        return Rule("items", site.sname + "[*]",
                    first.getField("name"), first.getField("message"),
                    site.present() & _null_false(F.size(failing) > F.lit(0)),
                    dynamic=first)

    def _pass_expr_for_expr(self, definition, site: _Site) -> Column:
        rules = self.compile_value(definition, site)
        ok = F.lit(True)
        for rule in rules:
            ok = ok & ~_null_false(rule.fail)
        return ok

    def _kw_contains(self, definition, site):
        contains_definition = definition["contains"]
        if not self._array_guard(site):
            return []
        if contains_definition is False:
            return [self._rule(site, "contains", "is always invalid", F.lit(True))]
        if contains_definition is True:
            return [self._rule(site, "contains", "must not be empty",
                               F.size(site.expr) == F.lit(0))]
        element_type = site.dtype.elementType

        def element_pass(x):
            s = _Site(x, element_type, site.sname + "[x]", F.lit(""),
                      site.base_uri, null_is_value=True)
            return self._pass_expr_for_expr(contains_definition, s)

        return [self._rule(site, "contains", "must contain one of contains definition",
                           ~F.exists(site.expr, element_pass))]

    # -- objects -----------------------------------------------------------

    def _field_sites(self, site: _Site) -> dict[str, _Site]:
        """Child site per statically-known field (root columns or struct)."""
        if site.expr is None:
            return {
                f.name: site.child(F.col(f.name), f.dataType, "." + f.name)
                for f in site.dtype.fields
            }
        if isinstance(site.dtype, T.StructType):
            return {
                f.name: site.child(
                    site.expr.getField(f.name), f.dataType, "." + f.name,
                    json_expr=(
                        F.get_json_object(site.json_expr, _json_path(f.name))
                        if site.json_expr is not None
                        and isinstance(f.dataType, T.StructType) else None))
                for f in site.dtype.fields
            }
        return {}

    def _is_object_site(self, site) -> bool:
        return site.expr is None or isinstance(site.dtype, (T.StructType, T.MapType))

    def _object_len(self, site) -> Column | None:
        if isinstance(site.dtype, T.MapType):
            return F.size(site.expr)
        keys = site.object_keys()
        if keys is not None:
            # true runtime key count (sees undeclared keys and counts
            # explicit nulls as present, like the reference)
            return F.size(keys)
        fields = self._field_sites(site)
        if not fields:
            return None
        count = F.lit(0)
        for child in fields.values():
            count = count + child.present().cast("int")
        return count

    def _kw_min_properties(self, definition, site):
        bound = definition["minProperties"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("minProperties must be a number")
        if not self._is_object_site(site):
            return []
        length = self._object_len(site)
        if length is None:
            return []
        return [self._rule(site, "minProperties",
                           f"must contain at least {bound} properties",
                           length < F.lit(bound))]

    def _kw_max_properties(self, definition, site):
        bound = definition["maxProperties"]
        if not isinstance(bound, (int, float)):
            raise SchemaDefinitionError("maxProperties must be a number")
        if not self._is_object_site(site):
            return []
        length = self._object_len(site)
        if length is None:
            return []
        return [self._rule(site, "maxProperties",
                           f"must contain less than or equal to {bound} properties",
                           length > F.lit(bound))]

    def _kw_required(self, definition, site):
        required = definition["required"]
        if not isinstance(required, (list, tuple)):
            raise SchemaDefinitionError("required must be an array")
        if len(required) != len(set(required)):
            raise SchemaDefinitionError("required must contain unique elements")
        if not definition.get("additionalProperties", True):
            patterns = list(definition.get("patternProperties", {}))
            impossible = [
                key for key in required
                if key not in definition.get("properties", {})
                and not any(re.search(p, key) for p in patterns)
            ]
            if impossible:
                raise SchemaDefinitionError(
                    "data: items {} are required but not allowed".format(impossible))
        if not self._is_object_site(site):
            return []
        keys = site.object_keys()
        if isinstance(site.dtype, T.MapType):
            missing_flags = [
                (key, ~F.map_contains_key(site.expr, F.lit(key))) for key in required
            ]
        elif keys is not None:
            # JSON-backed: true key presence — an explicit null value
            # satisfies required (reference semantics), unlike the
            # struct-field NULL-means-absent approximation
            missing_flags = [
                (key, ~_null_false(F.array_contains(keys, F.lit(key))))
                for key in required
            ]
        else:
            fields = self._field_sites(site)
            missing_flags = []
            for key in required:
                if key in fields:
                    missing_flags.append((key, ~fields[key].present()))
                else:
                    missing_flags.append((key, F.lit(True)))
        any_missing = F.lit(False)
        for _, flag in missing_flags:
            any_missing = any_missing | flag
        # message lists ONLY the missing keys, sorted (draft04.py:525-528)
        quoted = F.array_sort(F.filter(
            F.array(*[F.when(flag, F.lit(f"'{key}'")) for key, flag in missing_flags]),
            lambda x: x.isNotNull(),
        ))
        message = F.concat(
            site.name_col, F.lit(" must contain ["),
            F.concat_ws(", ", quoted), F.lit("] properties"),
        )
        return [Rule("required", site.sname, site.name_col, message,
                     site.present() & _null_false(any_missing))]

    def _kw_dependencies(self, definition, site):
        if not self._is_object_site(site):
            return []
        rules = []
        for key, requirement in definition["dependencies"].items():
            if requirement == [] or requirement is True:
                continue
            key_present = self._presence_of(site, key)
            if key_present is None:
                continue
            if requirement is False:
                rules.append(Rule(
                    "dependencies", site.sname, site.name_col,
                    F.concat(F.lit(f"{key} in "), site.name_col, F.lit(" must not be there")),
                    site.present() & _null_false(key_present)))
            elif isinstance(requirement, list):
                for needed in requirement:
                    needed_present = self._presence_of(site, needed)
                    absent = F.lit(True) if needed_present is None else ~needed_present
                    rules.append(Rule(
                        "dependencies", site.sname, site.name_col,
                        F.concat(site.name_col,
                                 F.lit(f" missing dependency {needed} for {key}")),
                        site.present() & _null_false(key_present & absent)))
            else:
                for rule in self.compile_value(requirement, site):
                    rules.append(rule.gated(key_present))
        return rules

    def _presence_of(self, site, key) -> Column | None:
        if isinstance(site.dtype, T.MapType):
            return F.map_contains_key(site.expr, F.lit(key))
        keys = site.object_keys()
        if keys is not None:
            return _null_false(F.array_contains(keys, F.lit(key)))
        fields = self._field_sites(site)
        if key in fields:
            return fields[key].present()
        return F.lit(False)

    def _kw_properties(self, definition, site):
        rules = []
        fields = self._field_sites(site)
        is_map = isinstance(site.dtype, T.MapType)
        keys = site.object_keys()
        for key, prop_definition in definition["properties"].items():
            if not isinstance(prop_definition, (dict, bool)):
                clean = re.sub(r"[^a-zA-Z0-9]", "", key)
                raise SchemaDefinitionError("data[{}] must be object".format(clean))
            if keys is not None and not is_map:
                # JSON-backed struct: gate value rules on TRUE key
                # presence, and treat a present-but-NULL field as an
                # explicit JSON null (null_is_value), mirroring the map
                # branch — so {"k": null} fails `type`, not `required`.
                # Scalar prop schemas validate the VARIANT value (exact
                # JSON type — the typed struct parse silently coerces
                # numbers/booleans into string fields); nested schemas
                # fall back to the parsed-struct compile.
                if key in fields:
                    base = fields[key]
                    gate = site.present() & _null_false(
                        F.array_contains(keys, F.lit(key)))
                    try:
                        if not self.exact_json_types:
                            raise PlanUnsupported("coerce mode")
                        aux = site.object_variant_map()
                        # materialize the per-key variant AND its type tag
                        # once per row: variant_get/schema_of_variant are
                        # CodegenFallback, and every keyword rule of this
                        # property would otherwise re-run the map lookup +
                        # type recovery (A/B: ~25% off the events_json
                        # exact-mode bench query)
                        vcol = self._materialize(
                            "vkey", F.try_element_at(aux, F.lit(key)))
                        sovcol = self._materialize(
                            "sov", F.schema_of_variant(vcol))
                        triples = self._variant_entry_rules(
                            prop_definition, base.name_col, vcol,
                            sov_col=sovcol)
                        for rule_id, message, fail in triples:
                            if isinstance(rule_id, _NestedViolation):
                                rules.append(Rule(
                                    None, base.sname,
                                    rule_id.struct.getField("name"),
                                    rule_id.struct.getField("message"),
                                    _null_false(gate) & _null_false(fail),
                                    dynamic=rule_id.struct))
                            else:
                                rules.append(Rule(
                                    rule_id, base.sname, base.name_col,
                                    message,
                                    _null_false(gate) & _null_false(fail)))
                    except PlanUnsupported:
                        child = _Site(base.expr, base.dtype, base.sname,
                                      base.name_col, base.base_uri,
                                      null_is_value=True,
                                      json_expr=(base.json_expr
                                                 if base.json_expr is not None
                                                 else self._materialize(
                                                     "jtxt",
                                                     F.get_json_object(
                                                         site.json_expr,
                                                         _json_path(key)))),
                                      compiler=self)
                        for rule in self.compile_value(prop_definition, child):
                            rules.append(rule.gated(gate))
                if (
                    self.use_default
                    and isinstance(prop_definition, dict)
                    and "default" in prop_definition
                    and site.expr is None
                ):
                    self.defaults.append((key, prop_definition["default"]))
                continue
            if is_map:
                child = _Site(F.try_element_at(site.expr, F.lit(key)),
                              site.dtype.valueType, site.sname + "." + key,
                              F.concat(site.name_col, F.lit("." + key)),
                              site.base_uri, null_is_value=True)
                for rule in self.compile_value(prop_definition, child):
                    # only applies when the key is present in the map
                    rules.append(rule.gated(
                        site.present()
                        & F.map_contains_key(site.expr, F.lit(key))))
            elif key in fields:
                rules.extend(self.compile_value(prop_definition, fields[key]))
            # key can never exist in this static type -> no rules
            if (
                self.use_default
                and isinstance(prop_definition, dict)
                and "default" in prop_definition
                and site.expr is None
            ):
                self.defaults.append((key, prop_definition["default"]))
        return rules

    def _map_entry_rule(self, site, key_filter, value_definition, rule_label):
        """First violating (key, value) entry of a map column, with the
        inner rule id/name/message surfaced verbatim."""
        value_type = site.dtype.valueType

        dummy = _Site(F.lit(None).cast(value_type), value_type,
                      site.sname + ".<k>", F.lit(""), site.base_uri,
                      null_is_value=True)
        if not self.compile_value(value_definition, dummy):
            return None

        def entry_violation(e):
            k = e.getField("key")
            name_col = F.concat(site.name_col, F.lit("."), k)
            s = _Site(e.getField("value"), value_type, site.sname + ".<k>",
                      name_col, site.base_uri, null_is_value=True)
            inner = self._violation_struct(self.compile_value(value_definition, s))
            return F.when(key_filter(k), inner)

        failing = F.filter(F.transform(F.map_entries(site.expr), entry_violation),
                           lambda y: y.isNotNull())
        first = F.try_element_at(failing, F.lit(1))
        return Rule(rule_label, site.sname + ".<" + rule_label + ">",
                    first.getField("name"), first.getField("message"),
                    site.present() & _null_false(F.size(failing) > F.lit(0)),
                    dynamic=first)

    # -- variant value rules (open-key JSON value schemas) -----------------
    #
    # Undeclared keys in a JSON column have no static type, so their value
    # schemas are evaluated over Spark 4 VariantType: the raw text parses
    # once as map<string,variant>, `schema_of_variant` recovers the exact
    # JSON type per value, and `try_variant_get` projects typed views.
    # Scalar keywords only — nested object/array/combinator value schemas
    # raise PlanUnsupported (engine="python" is the exact path there).

    _VARIANT_SUPPORTED = {
        "type", "enum", "const", "minimum", "maximum", "exclusiveMinimum",
        "exclusiveMaximum", "multipleOf", "minLength", "maxLength",
        "pattern", "format",
        # combinators compose from scalar-subset branches (each branch
        # recursively compiled to triples; non-scalar branches raise
        # PlanUnsupported like any other hard keyword)
        "allOf", "anyOf", "oneOf", "not", "if",
        # nested containers: the variant casts to array<variant> /
        # map<string,variant>, element and member schemas recurse with
        # per-element names carried via _NestedViolation structs
        # (uniqueItems stays hard: the reference's freeze canon uses
        # Python cross-type equality, 1 == 1.0 == True, which variant
        # equality cannot reproduce)
        "minItems", "maxItems", "items", "contains",
        "minProperties", "maxProperties", "required", "dependencies",
        "properties", "patternProperties", "additionalProperties",
        "propertyNames",
    }
    _VARIANT_ANNOTATIONS = {
        "title", "description", "default", "examples", "$comment",
        "$schema", "$id", "id", "definitions",
        # consumed by the "if" handler at its keyword position
        "then", "else",
        # consumed by the "items" handler at its keyword position
        "additionalItems",
    }

    def _variant_member_match(self, v, m):
        """Predicate: VARIANT value ``v`` equals the compile-time enum /
        const member ``m`` under the reference's type-strict deep equality
        (draft04.py:120-155 _enum_value_matches): bool is identity, numbers
        compare across int/float but never bool, dicts need the exact key
        set with recursively-matching values, lists need exact length with
        element-wise matches.  The member is a literal, so the whole
        comparison unrolls to a static Column tree — no runtime deep
        compare needed."""
        sov = F.schema_of_variant(v)
        if m is None:
            return F.is_variant_null(v)
        if isinstance(m, bool):
            return ((sov == F.lit("BOOLEAN"))
                    & (F.try_variant_get(v, "$", "boolean") == F.lit(m)))
        if isinstance(m, (int, float)):
            is_num = ((sov == F.lit("BIGINT")) | (sov == F.lit("DOUBLE"))
                      | sov.startswith("DECIMAL"))
            is_bigint = sov == F.lit("BIGINT")
            num = F.try_variant_get(v, "$", "double")
            if (isinstance(m, int) or float(m).is_integer()) \
                    and -2 ** 63 <= int(m) <= 2 ** 63 - 1:
                # integral member: Python compares exactly, so the double
                # view must not decide — BIGINT values match as longs;
                # DOUBLE values match iff integral, inside long range
                # (the cast would clamp, not null, on overflow) and
                # exactly equal after the cast
                mi = int(m)
                lng = F.try_variant_get(v, "$", "long")
                dbl = (is_num & ~is_bigint
                       & ((num % F.lit(1.0)) == F.lit(0.0))
                       & (num >= F.lit(float(-2 ** 63)))
                       & (num < F.lit(float(2 ** 63)))
                       & (num.cast("long") == F.lit(mi)))
                return (is_bigint & (lng == F.lit(mi))) | dbl
            # non-integral member: an integral-valued double (incl. the
            # rounded view of any BIGINT) can never equal it
            return is_num & (num == F.lit(float(m)))
        if isinstance(m, str):
            return ((sov == F.lit("STRING"))
                    & (F.try_variant_get(v, "$", "string") == F.lit(m)))
        if isinstance(m, dict):
            is_obj = sov.startswith("OBJECT")
            obj = F.try_variant_get(v, "$", "map<string,variant>")
            ok = is_obj & (F.size(obj) == F.lit(len(m)))
            for k, item in m.items():
                ok = ok & F.map_contains_key(obj, F.lit(k)) \
                    & self._variant_member_match(
                        F.try_element_at(obj, F.lit(k)), item)
            return ok
        if isinstance(m, (list, tuple)):
            is_arr = sov.startswith("ARRAY")
            arr = F.try_variant_get(v, "$", "array<variant>")
            ok = is_arr & (F.size(arr) == F.lit(len(m)))
            for i, item in enumerate(m):
                ok = ok & self._variant_member_match(
                    F.try_element_at(arr, F.lit(i + 1)), item)
            return ok
        raise SchemaDefinitionError(
            f"enum/const member of unsupported type: {type(m).__name__}")

    def _variant_entry_rules(self, definition, name_col, v, *, sov_col=None):
        """(rule_id, message Column, fail Column) triples validating one
        VARIANT value against a scalar-subset schema, in dialect keyword
        order with reference-parity messages.  ``sov_col`` lets callers
        with a materialized ``schema_of_variant(v)`` helper column share
        it across all of this value's rules (only valid when ``v`` is a
        plain column, never a HOF lambda variable)."""
        if definition is True or definition == {}:
            return []
        if definition is False:
            return [(None, F.concat(name_col, F.lit(" must not be there")),
                     F.lit(True))]
        if not isinstance(definition, dict):
            raise SchemaDefinitionError("definition must be an object")
        hard = [k for k in definition if k not in self._VARIANT_SUPPORTED
                and k not in self._VARIANT_ANNOTATIONS]
        if hard:
            raise PlanUnsupported(
                f"open-key value schema uses {sorted(hard)} — only scalar "
                "keywords are expressible over dynamically-typed undeclared "
                "keys; use engine='python'")

        sov = sov_col if sov_col is not None else F.schema_of_variant(v)
        is_num = ((sov == F.lit("BIGINT")) | (sov == F.lit("DOUBLE"))
                  | sov.startswith("DECIMAL"))
        # the reference inherits Python's bool-is-int for the NUMERIC
        # keywords (True counts as 1 for minimum/maximum/multipleOf)
        # while `type` and `enum` stay bool-strict — mirror exactly
        is_numlike = is_num | (sov == F.lit("BOOLEAN"))
        # (A/B note: materializing these typed projections as helper
        # columns measured SLOWER than inline copies — the extra
        # projection evaluates for every row while inline copies sit
        # behind their type guards; only vkey + sov pay off.)
        num = F.try_variant_get(v, "$", "double")
        # BIGINT-typed values also project exactly as longs: the double
        # view rounds magnitudes past 2^53, silently moving them across
        # bounds / onto enum members (the reference compares Python ints
        # exactly) — numeric keywords branch on the variant type
        is_bigint = sov == F.lit("BIGINT")
        lng = F.try_variant_get(v, "$", "long")
        is_str = sov == F.lit("STRING")
        s = F.try_variant_get(v, "$", "string")
        # nested containers: NULL when the value is not an array/object
        is_arr = sov.startswith("ARRAY")
        arr = F.try_variant_get(v, "$", "array<variant>")
        is_obj = sov.startswith("OBJECT")
        obj = F.try_variant_get(v, "$", "map<string,variant>")
        okeys = F.map_keys(obj)

        def nested_value(sub, child_name, child_v, gate):
            """One triple whose violation struct is the child value's own
            first-failing rule (name/rule/message all from the child)."""
            triples = self._variant_entry_rules(sub, child_name, child_v)
            if not triples:
                return
            struct = self._variant_violation(triples, child_name)
            out.append((_NestedViolation(struct), F.lit(None),
                        _null_false(gate) & struct.isNotNull()))

        def first_failing_elems(sub, start):
            """First array element from ``start`` violating the element
            schema (name ``data...[i]``)."""
            if not self._variant_entry_rules(sub, name_col, v):
                return

            def elem_viol(x, i):
                idx = (i + F.lit(start)).cast("string")
                ename = F.concat(name_col, F.lit("["), idx, F.lit("]"))
                triples = self._variant_entry_rules(sub, ename, x)
                return self._variant_violation(triples, ename)

            tail = F.slice(arr, start + 1,
                           F.greatest(F.size(arr) - F.lit(start), F.lit(0)))
            failing = F.filter(F.transform(tail, elem_viol),
                               lambda y: y.isNotNull())
            first = F.try_element_at(failing, F.lit(1))
            out.append((_NestedViolation(first), F.lit(None),
                        is_arr & _null_false(F.size(failing) > F.lit(0))))

        def first_failing_entry(key_filter, sub, rule_label):
            """First (key, value) entry passing ``key_filter`` whose value
            violates ``sub`` (name ``data...key``) — the nested analog of
            _json_entry_rule."""
            if not self._variant_entry_rules(sub, name_col, v):
                return

            def entry_violation(e):
                k = e.getField("key")
                ename = F.concat(name_col, F.lit("."), k)
                triples = self._variant_entry_rules(sub, ename,
                                                    e.getField("value"))
                inner = self._variant_violation(triples, ename)
                return F.when(key_filter(k), inner)

            failing = F.filter(F.transform(F.map_entries(obj),
                                           entry_violation),
                               lambda y: y.isNotNull())
            first = F.try_element_at(failing, F.lit(1))
            out.append((_NestedViolation(first), F.lit(None),
                        is_obj & _null_false(F.size(failing) > F.lit(0))))

        def type_pass(t):
            if t == "null":
                return F.is_variant_null(v)
            if t == "boolean":
                return sov == F.lit("BOOLEAN")
            if t == "string":
                return is_str
            if t == "integer":
                if self.integral_float_is_int:
                    # modulo, not floor(): floor(double) -> LONG overflows
                    # past 2^63 (1e308 is integral in the reference)
                    return is_num & ((num % F.lit(1.0)) == F.lit(0.0))
                return (sov == F.lit("BIGINT")) | sov.rlike(r"^DECIMAL\(\d+,0\)$")
            if t == "number":
                return is_num
            if t == "array":
                return sov.startswith("ARRAY")
            if t == "object":
                return sov.startswith("OBJECT")
            raise SchemaDefinitionError("Unknown type")

        def member_pass(m):
            # full type-strict deep equality, containers included — the
            # member is a compile-time literal so the comparison unrolls
            # statically (see _variant_member_match)
            return self._variant_member_match(v, m)

        def msg(text):
            return F.concat(name_col, F.lit(" " + text))

        _BOUND_OPS = {
            # fail-op, integer-edge transform (for an integer value v:
            # v < b ⟺ v < ceil(b); v ≤ b ⟺ v ≤ floor(b);
            # v > b ⟺ v > floor(b); v ≥ b ⟺ v ≥ ceil(b))
            "lt": (lambda c, x: c < x, math.ceil),
            "le": (lambda c, x: c <= x, math.floor),
            "gt": (lambda c, x: c > x, math.floor),
            "ge": (lambda c, x: c >= x, math.ceil),
        }

        def bound(keyword, kind, template):
            b = definition[keyword]
            if not isinstance(b, (int, float, Decimal)):
                raise SchemaDefinitionError(f"{keyword} must be a number")
            op, edge = _BOUND_OPS[kind]
            lit_b = F.lit(int(b) if isinstance(b, bool) else b)
            dbl_fail = is_numlike & ~is_bigint & op(num, lit_b)
            # exact long-side comparison for BIGINT values — the double
            # view rounds 2^53+ magnitudes across the bound
            try:
                bi = int(edge(b))
            except (OverflowError, ValueError):  # infinite bound
                bi = None
            if bi is not None and -2 ** 63 <= bi <= 2 ** 63 - 1:
                big_fail = is_bigint & op(lng, F.lit(bi))
            else:
                # bound beyond long range: every long sits on one side
                high = b > 0
                const = high if kind in ("lt", "le") else not high
                big_fail = is_bigint & F.lit(const)
            return (keyword, msg(template.format(b)), dbl_fail | big_fail)

        out = []
        for keyword in self.keyword_order:
            if keyword not in definition:
                continue
            if keyword == "type":
                declared = definition["type"]
                types = declared if isinstance(declared, list) else [declared]
                ok = F.lit(False)
                for t in types:
                    ok = ok | type_pass(t)
                out.append(("type", msg("must be " + " or ".join(types)), ~ok))
            elif keyword == "enum":
                enum = definition["enum"]
                if not isinstance(enum, (list, tuple)):
                    raise SchemaDefinitionError("enum must be an array")
                ok = F.lit(False)
                for m in enum:
                    ok = ok | member_pass(m)
                out.append(("enum",
                            msg(f"must be one of {schema_value_repr(enum)}"),
                            ~ok))
            elif keyword == "const":
                const = definition["const"]
                out.append((
                    "const",
                    msg("must be same as const definition: "
                        f"{schema_value_repr(const)}"),
                    ~member_pass(const)))
            elif keyword == "minimum":
                # exclusiveMinimum as the draft-04 truthy modifier — the
                # same consult _kw_minimum does (reference draft04.py:339,
                # inherited by later dialects)
                if bool(definition.get("exclusiveMinimum", False)):
                    out.append(bound("minimum", "le",
                                     "must be bigger than {}"))
                else:
                    out.append(bound("minimum", "lt",
                                     "must be bigger than or equal to {}"))
            elif keyword == "maximum":
                if bool(definition.get("exclusiveMaximum", False)):
                    out.append(bound("maximum", "ge",
                                     "must be smaller than {}"))
                else:
                    out.append(bound("maximum", "gt",
                                     "must be smaller than or equal to {}"))
            elif keyword == "exclusiveMinimum":
                out.append(bound("exclusiveMinimum", "le",
                                 "must be bigger than {}"))
            elif keyword == "exclusiveMaximum":
                out.append(bound("exclusiveMaximum", "ge",
                                 "must be smaller than {}"))
            elif keyword == "multipleOf":
                divisor = definition["multipleOf"]
                if not isinstance(divisor, (int, float, Decimal)):
                    raise SchemaDefinitionError("multipleOf must be a number")
                # deliberately the DOUBLE view for every numeric variant,
                # including BIGINT, mirroring the reference exactly:
                # - int divisor: q = value / divisor via float TRUE
                #   DIVISION, invalid iff q is non-integral — so any
                #   |q| >= 2^52 is integral and VALID (draft04.py:366; a
                #   huge odd int IS "a multiple of 2" there); exact
                #   modulo would diverge.
                # - float divisor: Decimal(repr(value)) path -> decimal
                #   cast (try_cast + double-fmod fallback: magnitudes
                #   past Decimal(38,18) would raise under ANSI).
                if isinstance(divisor, (int, bool)) \
                        and not isinstance(divisor, float):
                    q = num / F.lit(float(divisor))
                    fail = is_numlike & ((q % F.lit(1.0)) != F.lit(0.0))
                else:
                    dec = T.DecimalType(38, 18)
                    fail = is_numlike & F.coalesce(
                        (num.try_cast(dec) % F.lit(divisor).cast(dec))
                        != F.lit(0).cast(dec),
                        (num % F.lit(float(divisor))) != F.lit(0.0))
                out.append(("multipleOf",
                            msg(f"must be multiple of {divisor}"), fail))
                out.append(("multipleOf", F.lit("inifinity reached"),
                            is_numlike & ((num / F.lit(divisor))
                                          == F.lit(float("inf")))))
            elif keyword == "minLength":
                b = definition["minLength"]
                out.append(("minLength",
                            msg(f"must be longer than or equal to {b} "
                                "characters"),
                            is_str & (F.length(s) < F.lit(b))))
            elif keyword == "maxLength":
                b = definition["maxLength"]
                out.append(("maxLength",
                            msg(f"must be shorter than or equal to {b} "
                                "characters"),
                            is_str & (F.length(s) > F.lit(b))))
            elif keyword == "pattern":
                pattern = definition["pattern"]
                fixed = _UNESCAPED_DOLLAR.sub(r"\\Z", pattern)
                match = self._regex_match(F.when(is_str, s), fixed,
                                          anchored=False)
                out.append(("pattern", msg(f"must match pattern {pattern}"),
                            is_str & ~_null_false(match)))
            elif keyword == "format":
                if not self.use_formats:
                    continue
                fmt = definition["format"]
                regex = None
                if fmt in self.custom_formats and \
                        isinstance(self.custom_formats[fmt], str):
                    regex = self.custom_formats[fmt]
                elif fmt in self.custom_formats:
                    raise PlanUnsupported(
                        f"callable custom format {fmt!r} over undeclared "
                        "keys; use engine='python'")
                elif fmt in self.format_table:
                    regex = self.format_table[fmt]
                if regex is not None:
                    match = self._regex_match(F.when(is_str, s), regex,
                                              anchored=True)
                    out.append(("format", msg(f"must be {fmt}"),
                                is_str & ~_null_false(match)))
            elif keyword == "allOf":
                # reference inlines allOf sub-blocks: inner keywords
                # surface with their own rules/messages (draft04.py:173)
                subs = definition["allOf"]
                if not isinstance(subs, (list, tuple)):
                    raise SchemaDefinitionError("allOf must be an array")
                for sub in subs:
                    out.extend(self._variant_entry_rules(sub, name_col, v,
                                                         sov_col=sov))
            elif keyword == "anyOf":
                subs = definition["anyOf"]
                if not isinstance(subs, (list, tuple)):
                    raise SchemaDefinitionError("anyOf must be an array")
                any_pass = F.lit(False)
                for sub in subs:
                    any_pass = any_pass | self._variant_branch_pass(
                        sub, name_col, v, sov_col=sov)
                out.append(("anyOf",
                            msg("cannot be validated by any definition"),
                            ~any_pass))
            elif keyword == "oneOf":
                subs = definition["oneOf"]
                if not isinstance(subs, (list, tuple)):
                    raise SchemaDefinitionError("oneOf must be an array")
                count = F.lit(0)
                for sub in subs:
                    count = count + self._variant_branch_pass(
                        sub, name_col, v, sov_col=sov).cast("int")
                out.append(("oneOf", F.concat(
                    name_col,
                    F.lit(" must be valid exactly by one definition ("),
                    count.cast("string"), F.lit(" matches found)")),
                    count != F.lit(1)))
            elif keyword == "not":
                sub = definition["not"]
                if sub is True:
                    out.append(("not", msg("must not be there"), F.lit(True)))
                elif sub is False:
                    pass
                elif isinstance(sub, dict) and not sub:
                    out.append(("not",
                                msg("must NOT match a disallowed definition"),
                                F.lit(True)))
                else:
                    out.append(("not",
                                msg("must NOT match a disallowed definition"),
                                self._variant_branch_pass(sub, name_col, v,
                                                          sov_col=sov)))
            elif keyword == "if":
                if_pass = self._variant_branch_pass(
                    definition["if"], name_col, v, sov_col=sov)
                for rule_id, message, fail in self._variant_entry_rules(
                        definition.get("then", True), name_col, v,
                        sov_col=sov):
                    out.append((rule_id, message,
                                _null_false(if_pass) & fail))
                for rule_id, message, fail in self._variant_entry_rules(
                        definition.get("else", True), name_col, v,
                        sov_col=sov):
                    out.append((rule_id, message,
                                ~_null_false(if_pass) & fail))
            elif keyword == "minItems":
                b = definition["minItems"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError("minItems must be a number")
                out.append(("minItems",
                            msg(f"must contain at least {b} items"),
                            is_arr & (F.size(arr) < F.lit(b))))
            elif keyword == "maxItems":
                b = definition["maxItems"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError("maxItems must be a number")
                out.append(("maxItems",
                            msg(f"must contain less than or equal to {b} "
                                "items"),
                            is_arr & (F.size(arr) > F.lit(b))))
            elif keyword == "items":
                items_definition = definition["items"]
                if items_definition is False:
                    out.append(("items", msg("must not be there"),
                                is_arr & (F.size(arr) > F.lit(0))))
                elif isinstance(items_definition, list):
                    for idx, idef in enumerate(items_definition):
                        nested_value(
                            idef, F.concat(name_col, F.lit(f"[{idx}]")),
                            F.try_element_at(arr, F.lit(idx + 1)),
                            is_arr & (F.size(arr) > F.lit(idx)))
                    n_fixed = len(items_definition)
                    extra = definition.get("additionalItems")
                    if extra is False:
                        out.append(("items",
                                    msg("must contain only specified items"),
                                    is_arr & (F.size(arr) > F.lit(n_fixed))))
                    elif isinstance(extra, (dict, bool)) \
                            and extra is not True:
                        first_failing_elems(extra, start=n_fixed)
                elif items_definition is not True:
                    first_failing_elems(items_definition, start=0)
            elif keyword == "contains":
                cd = definition["contains"]
                if cd is False:
                    out.append(("contains", msg("is always invalid"),
                                is_arr))
                elif cd is True:
                    out.append(("contains", msg("must not be empty"),
                                is_arr & (F.size(arr) == F.lit(0))))
                else:
                    def _contains_pass(sub):
                        # NOTE: HOF lambdas must be unary — PySpark
                        # inspects the signature, and a default arg makes
                        # it look like the (element, index) form
                        return lambda x: self._variant_branch_pass(
                            sub, name_col, x)

                    elem_pass = _contains_pass(cd)
                    out.append(("contains",
                                msg("must contain one of contains "
                                    "definition"),
                                is_arr & ~F.exists(arr, elem_pass)))
            elif keyword == "minProperties":
                b = definition["minProperties"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError(
                        "minProperties must be a number")
                out.append(("minProperties",
                            msg(f"must contain at least {b} properties"),
                            is_obj & (F.size(okeys) < F.lit(b))))
            elif keyword == "maxProperties":
                b = definition["maxProperties"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError(
                        "maxProperties must be a number")
                out.append(("maxProperties",
                            msg(f"must contain less than or equal to {b} "
                                "properties"),
                            is_obj & (F.size(okeys) > F.lit(b))))
            elif keyword == "required":
                required = definition["required"]
                if not isinstance(required, (list, tuple)):
                    raise SchemaDefinitionError("required must be an array")
                if len(required) != len(set(required)):
                    raise SchemaDefinitionError(
                        "required must contain unique elements")
                if not definition.get("additionalProperties", True):
                    patterns = list(definition.get("patternProperties", {}))
                    impossible = [
                        key for key in required
                        if key not in definition.get("properties", {})
                        and not any(re.search(p, key) for p in patterns)
                    ]
                    if impossible:
                        raise SchemaDefinitionError(
                            "data: items {} are required but not allowed"
                            .format(impossible))
                flags = [
                    (key,
                     ~_null_false(F.map_contains_key(obj, F.lit(key))))
                    for key in required
                ]
                any_missing = F.lit(False)
                for _, flag in flags:
                    any_missing = any_missing | flag
                # message lists ONLY the missing keys, sorted
                # (draft04.py:525-528), like the typed-path rule
                quoted = F.array_sort(F.filter(
                    F.array(*[F.when(flag, F.lit(f"'{key}'"))
                              for key, flag in flags]),
                    lambda x: x.isNotNull()))
                out.append(("required", F.concat(
                    name_col, F.lit(" must contain ["),
                    F.concat_ws(", ", quoted), F.lit("] properties")),
                    is_obj & any_missing))
            elif keyword == "properties":
                for key, sub in definition["properties"].items():
                    if not isinstance(sub, (dict, bool)):
                        clean = re.sub(r"[^a-zA-Z0-9]", "", key)
                        raise SchemaDefinitionError(
                            "data[{}] must be object".format(clean))
                    nested_value(
                        sub, F.concat(name_col, F.lit("." + key)),
                        F.try_element_at(obj, F.lit(key)),
                        is_obj & _null_false(
                            F.map_contains_key(obj, F.lit(key))))
            elif keyword == "dependencies":
                deps = definition["dependencies"]
                if not isinstance(deps, dict):
                    raise SchemaDefinitionError(
                        "dependencies must be an object")
                for key, req in deps.items():
                    present = is_obj & _null_false(
                        F.map_contains_key(obj, F.lit(key)))
                    if req == [] or req is True:
                        continue
                    if req is False:
                        out.append(("dependencies", F.concat(
                            F.lit(f"{key} in "), name_col,
                            F.lit(" must not be there")), present))
                    elif isinstance(req, (list, tuple)):
                        for needed in req:
                            out.append(("dependencies", F.concat(
                                name_col,
                                F.lit(f" missing dependency {needed} "
                                      f"for {key}")),
                                present & ~_null_false(
                                    F.map_contains_key(obj,
                                                       F.lit(needed)))))
                    else:
                        for rule_id, message, fail in \
                                self._variant_entry_rules(req, name_col, v):
                            out.append((rule_id, message,
                                        present & _null_false(fail)))
            elif keyword == "additionalProperties":
                add_def = definition["additionalProperties"]
                if add_def is True or add_def == {}:
                    continue
                declared = list(definition.get("properties", {}))
                java_patterns = [
                    jvm_pattern(_UNESCAPED_DOLLAR.sub(r"\\Z", p))
                    for p in definition.get("patternProperties", {})
                ]

                def _extra_filter(decl, pats):
                    # unary closure: see the HOF-lambda signature note
                    def is_extra(k):
                        cond = F.lit(True)
                        for key in decl:
                            cond = cond & (k != F.lit(key))
                        for j in pats:
                            cond = cond & ~k.rlike(j)
                        return cond
                    return is_extra

                is_extra = _extra_filter(declared, java_patterns)

                if add_def is False:
                    extras = F.filter(okeys, is_extra)
                    shown = F.concat(
                        F.lit("{"),
                        F.concat_ws(", ", F.transform(
                            F.array_sort(extras),
                            lambda k: F.concat(F.lit("'"), k, F.lit("'")))),
                        F.lit("}"))
                    out.append(("additionalProperties", F.concat(
                        name_col, F.lit(" must not contain "), shown,
                        F.lit(" properties")),
                        is_obj & _null_false(F.size(extras) > F.lit(0))))
                else:
                    first_failing_entry(is_extra, add_def,
                                        "additionalProperties")
            elif keyword == "patternProperties":
                for pattern, sub in definition["patternProperties"].items():
                    if sub is True or sub == {}:
                        continue
                    java = jvm_pattern(
                        _UNESCAPED_DOLLAR.sub(r"\\Z", pattern))

                    def _matcher(j):
                        return lambda k: k.rlike(j)

                    if sub is False:
                        matching = F.filter(okeys, _matcher(java))
                        first_k = F.try_element_at(F.array_sort(matching),
                                                   F.lit(1))
                        kname = F.concat(name_col, F.lit("."), first_k)
                        out.append((_NestedViolation(F.struct(
                            kname.alias("name"),
                            F.lit(None).cast("string").alias("rule"),
                            F.concat(kname, F.lit(" must not be there"))
                            .alias("message"))),
                            F.lit(None),
                            is_obj & _null_false(
                                F.size(matching) > F.lit(0))))
                    else:
                        first_failing_entry(_matcher(java), sub,
                                            "patternProperties")
            elif keyword == "propertyNames":
                nd = definition["propertyNames"]
                if nd is True or nd == {}:
                    continue
                if nd is False:
                    out.append(("propertyNames", msg("must not be there"),
                                is_obj & (F.size(okeys) > F.lit(0))))
                else:
                    def _name_checker(sub):
                        # unary closure: see the HOF-lambda signature note
                        def name_pass(k):
                            site = _Site(k, T.StringType(), "<name>",
                                         F.lit(""), self.store.root_uri())
                            return self._pass_expr_for_expr(sub, site)
                        return name_pass

                    name_pass = _name_checker(nd)
                    out.append(("propertyNames",
                                msg("must be named by propertyName "
                                    "definition"),
                                is_obj & ~_null_false(
                                    F.forall(okeys, name_pass))))
        return out

    def _variant_branch_pass(self, sub, name_col, v, *, sov_col=None):
        """True where a (scalar-subset) subschema accepts the VARIANT
        value — no triple of the branch fails."""
        ok = F.lit(True)
        for _, _, fail in self._variant_entry_rules(sub, name_col, v,
                                                    sov_col=sov_col):
            ok = ok & ~_null_false(fail)
        return ok

    def _variant_violation(self, triples, name_col):
        """First failing triple as a violation struct (null when none)."""
        expr = F.lit(None).cast(
            "struct<name:string,rule:string,message:string>")
        for rule_id, message, fail in reversed(triples):
            if isinstance(rule_id, _NestedViolation):
                expr = F.when(_null_false(fail),
                              rule_id.struct).otherwise(expr)
            else:
                expr = F.when(_null_false(fail), F.struct(
                    name_col.alias("name"),
                    F.lit(rule_id).alias("rule"),
                    message.alias("message"))).otherwise(expr)
        return expr

    def _json_entry_rule(self, site, key_filter, value_definition, rule_label):
        """First violating (key, value) entry of a JSON-backed object's
        RUNTIME entries (map<string,variant> view of the raw text)."""
        if not self.exact_json_types:
            raise PlanUnsupported(
                f"{rule_label} value schemas over undeclared keys need "
                "exact JSON typing; use json_types='exact' (default) or "
                "engine='python'")
        aux = site.object_variant_map()

        def entry_violation(e):
            k = e.getField("key")
            name_col = F.concat(site.name_col, F.lit("."), k)
            triples = self._variant_entry_rules(value_definition, name_col,
                                                e.getField("value"))
            inner = self._variant_violation(triples, name_col)
            return F.when(key_filter(k), inner)

        failing = F.filter(F.transform(F.map_entries(aux), entry_violation),
                           lambda y: y.isNotNull())
        first = F.try_element_at(failing, F.lit(1))
        return Rule(rule_label, site.sname + ".<" + rule_label + ">",
                    first.getField("name"), first.getField("message"),
                    site.present() & _null_false(F.size(failing) > F.lit(0)),
                    dynamic=first)

    def _kw_pattern_properties(self, definition, site):
        table = definition["patternProperties"]
        rules = []
        if isinstance(site.dtype, T.MapType):
            for pattern, sub in table.items():
                java = jvm_pattern(_UNESCAPED_DOLLAR.sub(r"\\Z", pattern))
                rule = self._map_entry_rule(
                    site, lambda k, _j=java: k.rlike(_j), sub, "patternProperties")
                if rule is not None:
                    rules.append(rule)
            return rules
        keys = site.object_keys()
        fields = self._field_sites(site)
        if keys is not None:
            # JSON-backed struct: declared fields matching a pattern are
            # validated statically (gated on true presence, null =
            # JSON null); UNDECLARED runtime keys are visible via
            # json_object_keys — fully supported for boolean sub-schemas,
            # PlanUnsupported for value schemas (their values have no
            # static type; the python engine is the exact path)
            for pattern, sub in table.items():
                matcher = re.compile(pattern)
                java = jvm_pattern(_UNESCAPED_DOLLAR.sub(r"\\Z", pattern))
                for key, base in fields.items():
                    if matcher.search(key) and sub is not False:
                        child = _Site(base.expr, base.dtype, base.sname,
                                      base.name_col, base.base_uri,
                                      null_is_value=True,
                                      json_expr=base.json_expr,
                                      compiler=self)
                        gate = site.present() & _null_false(
                            F.array_contains(keys, F.lit(key)))
                        for rule in self.compile_value(sub, child):
                            rules.append(rule.gated(gate))
                if sub is True or sub == {}:
                    continue
                if sub is False:
                    # NOTE: HOF lambdas must be unary — PySpark inspects
                    # the signature, and a default arg makes it look like
                    # the (element, index) form
                    def _matcher(j):
                        return lambda k: k.rlike(j)

                    matching = F.filter(keys, _matcher(java))
                    first = F.try_element_at(F.array_sort(matching), F.lit(1))
                    name = F.concat(site.name_col, F.lit("."), first)
                    # rule id None: a boolean-False schema violation has
                    # no keyword id in the reference's error objects
                    rules.append(Rule(
                        None, site.sname + ".<key>", name,
                        F.concat(name, F.lit(" must not be there")),
                        site.present() & _null_false(F.size(matching) > 0)))
                else:
                    # value schema over dynamically-typed UNDECLARED keys:
                    # variant view (declared matches were compiled
                    # statically above — exclude them to avoid double
                    # reporting)
                    decl = sorted(fields)

                    def matches_undeclared(k, _j=java, _d=decl):
                        cond = k.rlike(_j)
                        for d in _d:
                            cond = cond & (k != F.lit(d))
                        return cond

                    rules.append(self._json_entry_rule(
                        site, matches_undeclared, sub, "patternProperties"))
            return rules
        # struct/root: keys are static -> match at plan time
        for pattern, sub in table.items():
            matcher = re.compile(pattern)
            for key, child in fields.items():
                if matcher.search(key):
                    for rule in self.compile_value(sub, child):
                        rules.append(rule)
        return rules

    def _matched_static_keys(self, definition) -> set:
        keys = set(definition.get("properties", {}).keys())
        return keys

    def _kw_additional_properties(self, definition, site):
        add_definition = definition["additionalProperties"]
        if add_definition is True or add_definition == {}:
            return []
        declared = set(definition.get("properties", {}).keys())
        patterns = [re.compile(p) for p in definition.get("patternProperties", {})]

        if isinstance(site.dtype, T.MapType):
            java_patterns = [
                jvm_pattern(_UNESCAPED_DOLLAR.sub(r"\\Z", p))
                for p in definition.get("patternProperties", {})
            ]

            def is_extra(k):
                cond = F.lit(True)
                for key in declared:
                    cond = cond & (k != F.lit(key))
                for j in java_patterns:
                    cond = cond & ~k.rlike(j)
                return cond

            extras = F.filter(F.map_keys(site.expr), is_extra)
            if add_definition is False:
                shown = F.concat(
                    F.lit("{"),
                    F.concat_ws(", ", F.transform(
                        F.array_sort(extras),
                        lambda k: F.concat(F.lit("'"), k, F.lit("'")))),
                    F.lit("}"))
                message = F.concat(site.name_col, F.lit(" must not contain "),
                                   shown, F.lit(" properties"))
                return [Rule("additionalProperties", site.sname, site.name_col, message,
                             site.present() & _null_false(F.size(extras) > F.lit(0)))]
            rule = self._map_entry_rule(site, is_extra, add_definition,
                                        "additionalProperties")
            return [rule] if rule is not None else []

        keys = site.object_keys()
        if keys is not None:
            # JSON-backed struct: the TRUE runtime key set decides what
            # is "additional" — undeclared keys are no longer invisible
            java_patterns = [
                jvm_pattern(_UNESCAPED_DOLLAR.sub(r"\\Z", p))
                for p in definition.get("patternProperties", {})
            ]

            def is_extra(k):
                cond = F.lit(True)
                for key in declared:
                    cond = cond & (k != F.lit(key))
                for j in java_patterns:
                    cond = cond & ~k.rlike(j)
                return cond

            extras = F.filter(keys, is_extra)
            if add_definition is False:
                shown = F.concat(
                    F.lit("{"),
                    F.concat_ws(", ", F.transform(
                        F.array_sort(extras),
                        lambda k: F.concat(F.lit("'"), k, F.lit("'")))),
                    F.lit("}"))
                message = F.concat(site.name_col, F.lit(" must not contain "),
                                   shown, F.lit(" properties"))
                return [Rule("additionalProperties", site.sname, site.name_col,
                             message,
                             site.present() & _null_false(F.size(extras) > F.lit(0)))]
            # value schema over undeclared keys: evaluated on the
            # map<string,variant> view of the raw text (scalar keyword
            # subset; _variant_entry_rules raises PlanUnsupported beyond)
            return [self._json_entry_rule(site, is_extra, add_definition,
                                          "additionalProperties")]

        fields = self._field_sites(site)
        extra_sites = {
            key: child for key, child in fields.items()
            if key not in declared and not any(p.search(key) for p in patterns)
        }
        if add_definition is False:
            if not extra_sites:
                return []
            present_names = F.array_sort(F.filter(
                F.array(*[F.when(child.present(), F.lit(f"'{key}'"))
                          for key, child in extra_sites.items()]),
                lambda x: x.isNotNull()))
            shown = F.concat(F.lit("{"), F.concat_ws(", ", present_names), F.lit("}"))
            message = F.concat(site.name_col, F.lit(" must not contain "),
                               shown, F.lit(" properties"))
            any_extra = F.lit(False)
            for child in extra_sites.values():
                any_extra = any_extra | child.present()
            return [Rule("additionalProperties", site.sname, site.name_col, message,
                         site.present() & _null_false(any_extra))]
        rules = []
        for child in extra_sites.values():
            rules.extend(self.compile_value(add_definition, child))
        return rules

    def _kw_property_names(self, definition, site):
        names_definition = definition.get("propertyNames", {})
        if names_definition is True:
            return []
        if isinstance(site.dtype, T.MapType):
            if names_definition is False:
                return [self._rule(site, "propertyNames", "must not be there",
                                   F.size(site.expr) > F.lit(0))]

            def name_pass(k):
                s = _Site(k, T.StringType(), site.sname + ".<name>", F.lit(""),
                          site.base_uri)
                return self._pass_expr_for_expr(names_definition, s)

            return [self._rule(site, "propertyNames",
                               "must be named by propertyName definition",
                               ~F.forall(F.map_keys(site.expr), name_pass))]
        keys = site.object_keys()
        if keys is not None:
            # JSON-backed struct: validate every RUNTIME key name
            if names_definition is False:
                return [self._rule(site, "propertyNames", "must not be there",
                                   F.size(keys) > F.lit(0))]

            def name_pass(k):
                s = _Site(k, T.StringType(), site.sname + ".<name>", F.lit(""),
                          site.base_uri)
                return self._pass_expr_for_expr(names_definition, s)

            return [self._rule(site, "propertyNames",
                               "must be named by propertyName definition",
                               ~F.forall(keys, name_pass))]
        fields = self._field_sites(site)
        if not fields:
            return []
        if names_definition is False:
            any_present = F.lit(False)
            for child in fields.values():
                any_present = any_present | child.present()
            return [self._rule(site, "propertyNames", "must not be there", any_present)]
        # static keys: validate names at plan time with the row validator
        from ..rowcheck import compile_row_validator

        name_validator = compile_row_validator(names_definition)
        bad = [key for key in fields if name_validator.collect(key)]
        if not bad:
            return []
        any_bad_present = F.lit(False)
        for key in bad:
            any_bad_present = any_bad_present | fields[key].present()
        return [self._rule(site, "propertyNames",
                           "must be named by propertyName definition", any_bad_present)]

    # -- content -----------------------------------------------------------

    def _kw_content_encoding(self, definition, site):
        if definition["contentEncoding"] != "base64":
            return []
        expr = self._string_expr(site)
        if expr is None:
            return []
        decoded = F.try_to_binary(expr, F.lit("base64"))
        return [Rule(None, site.sname, site.name_col,
                     F.concat(site.name_col, F.lit(" must be encoded by base64")),
                     site.present() & _null_false(decoded.isNull()))]

    def _kw_content_media_type(self, definition, site):
        if definition["contentMediaType"] != "application/json":
            return []
        if isinstance(site.dtype, T.BinaryType):
            expr = site.expr.cast("string")
        else:
            expr = self._string_expr(site)
        if expr is None:
            return []
        parsed = F.get_json_object(expr, "$")
        literal_ok = expr.rlike(r"^\s*(-?\d+(\.\d+)?([eE][+-]?\d+)?|true|false|null|\".*\")\s*$")
        return [Rule(None, site.sname, site.name_col,
                     F.concat(site.name_col, F.lit(" must be valid JSON")),
                     site.present() & _null_false(parsed.isNull() & ~literal_ok))]


def _null_false(col: Column) -> Column:
    return F.coalesce(col, F.lit(False))


def _snake(keyword: str) -> str:
    out = []
    for ch in keyword:
        if ch.isupper():
            out.append("_")
            out.append(ch.lower())
        else:
            out.append(ch)
    return "".join(out)


def _value_fits(value, dtype: T.DataType) -> bool:
    """Can this enum/const value ever equal a value of the static type,
    under the reference's type-strict matcher?"""
    if isinstance(value, bool):
        return isinstance(dtype, T.BooleanType)
    if isinstance(value, (int, float)):
        return typemap.is_numeric(dtype)
    if isinstance(value, str):
        return typemap.is_stringlike(dtype)
    if value is None:
        return False  # NULL means absent; an absent key is never validated
    if isinstance(value, (list, tuple)):
        return isinstance(dtype, T.ArrayType) and all(
            _value_fits(v, dtype.elementType) for v in value)
    if isinstance(value, dict):
        return isinstance(dtype, (T.StructType, T.MapType))
    return False


def _literal(value, dtype: T.DataType):
    if isinstance(value, (list, tuple)):
        elem = dtype.elementType if isinstance(dtype, T.ArrayType) else None
        return F.array(*[_literal(v, elem) for v in value])
    return F.lit(value)


def compile_plan_for_column(
    definition,
    column: str,
    dtype: T.DataType,
    *,
    regex_engine: str = "jvm",
    use_formats: bool = True,
    use_default: bool = True,
    formats: dict | None = None,
    handlers: dict | None = None,
    json_source_col: str | None = None,
    variant_source_col: str | None = None,
    keys_source_col: str | None = None,
    exact_json_types: bool = True,
) -> ValidationPlan:
    """Compile a schema whose root is one (struct/map-typed) column rather
    than the whole row — used for ``from_json``-parsed JSON columns.

    ``json_source_col`` names the RAW JSON string column the struct was
    parsed from; when given, object keywords see the true runtime key
    set (``json_object_keys``) so open-key semantics
    (additionalProperties: false, propertyNames, min/maxProperties,
    required-with-explicit-null) match the reference instead of only the
    schema-declared struct fields."""
    from ..rowcheck import compile_row_validator

    row_validator = compile_row_validator(
        definition, handlers=handlers, formats=formats,
        use_default=use_default, use_formats=use_formats, fast_fail=False,
    )
    dialect = _pick_dialect(definition)
    store = SchemaStore(definition, handlers=handlers)
    compiler = _PlanCompiler(store, dialect, {
        "regex_engine": regex_engine,
        "use_formats": use_formats,
        "use_default": use_default,
        "formats": formats,
        "exact_json_types": exact_json_types,
    })
    site = _Site(F.col(column), dtype, "data", F.lit("data"),
                 compiler.store.root_uri(),
                 json_expr=(F.col(json_source_col)
                            if json_source_col else None),
                 variant_expr=(F.col(variant_source_col)
                               if variant_source_col else None),
                 keys_expr=(F.col(keys_source_col)
                            if keys_source_col else None),
                 compiler=compiler)
    rules = compiler.compile_value(definition, site)
    return ValidationPlan(
        rules=rules, defaults=[], schema_definition=definition,
        df_schema=None, row_validator=row_validator, regex_engine=regex_engine,
        aux_cols=compiler.aux_cols,
        options={
            "column_root": column,
            "column_dtype": dtype.json(),
            "json_source_col": json_source_col,
            "variant_source_col": variant_source_col,
            "keys_source_col": keys_source_col,
            "exact_json_types": exact_json_types,
            "regex_engine": regex_engine,
            "use_formats": use_formats,
            "use_default": use_default,
            "formats": formats,
            "handlers": handlers,
        },
    )


def compile_plan(
    definition,
    df_schema: T.StructType,
    *,
    regex_engine: str = "jvm",
    use_formats: bool = True,
    use_default: bool = True,
    detailed_exceptions: bool = True,
    include_value: bool = False,
    formats: dict | None = None,
    handlers: dict | None = None,
) -> ValidationPlan:
    """Compile a JSON-Schema definition against a DataFrame schema into a
    :class:`ValidationPlan` of vectorized rules.

    The definition is first compiled by the row-level compiler, which
    raises every ``SchemaDefinitionError`` the reference would raise at
    compile time, and supplies the row validator used for dynamic (JSON
    string) columns.
    """
    from ..rowcheck import compile_row_validator

    row_validator = compile_row_validator(
        definition, handlers=handlers, formats=formats,
        use_default=use_default, use_formats=use_formats, fast_fail=False,
    )
    dialect = _pick_dialect(definition)
    store = SchemaStore(definition, handlers=handlers)
    compiler = _PlanCompiler(store, dialect, {
        "regex_engine": regex_engine,
        "use_formats": use_formats,
        "use_default": use_default,
        "formats": formats,
    })
    rules = compiler.compile_root(definition, df_schema)
    return ValidationPlan(
        rules=rules,
        aux_cols=compiler.aux_cols,
        defaults=compiler.defaults,
        schema_definition=definition,
        df_schema=df_schema,
        row_validator=row_validator,
        regex_engine=regex_engine,
        detailed=detailed_exceptions,
        include_value=include_value,
        options={
            "regex_engine": regex_engine,
            "use_formats": use_formats,
            "use_default": use_default,
            "detailed_exceptions": detailed_exceptions,
            "include_value": include_value,
            "formats": formats,
            "handlers": handlers,
        },
    )
