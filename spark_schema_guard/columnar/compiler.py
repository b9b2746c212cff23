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
    ref_numeric, schema_value_repr,
)
from . import typemap
from .plan import Rule, ValidationPlan
from .varsql import (_NestedSQL, _PackEntries, _PackSingle,
                     _VariantSQLMixin, _Views)
from .varsql import sqlstr as _sqlstr

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
    # COLUMN NAME of variant_expr when it is a named (helper) column —
    # the anchor the SQL-text rule world (varsql) hangs off.
    variant_name: str | None = None
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
                vm, self.variant_name = self.compiler._materialize2(
                    "vmap", vm)
            self.variant_expr = vm
        return self.variant_expr

    def object_variant_map_sql(self) -> str:
        """The variant-map view as SQL text (a quoted helper-column
        name) — the anchor for the text-mode rule compiler."""
        self.object_variant_map()
        if self.variant_name is None:
            # variant view exists but is unnamed: pin it to a helper
            self.variant_expr, self.variant_name = \
                self.compiler._materialize2("vmap", self.variant_expr)
        return f"`{self.variant_name}`"

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


class PlanUnsupported(SchemaDefinitionError):
    """A keyword/type combination the columnar compiler cannot express;
    callers may fall back to the row-validator pandas-UDF path."""


class PlanTooLarge(PlanUnsupported):
    """The compiled plan would exceed the expression-size budget —
    recursion-unrolled combinator-heavy schemas (e.g. the draft
    metaschemas, ~10 self-refs per level) produce multi-MB expression
    trees that Catalyst analyzes in minutes.  The python engine's
    compiled-closure validator is the right tool there; raise
    ``plan_text_budget`` / ``ref_unroll_budget`` to force the columnar
    attempt anyway."""


class _PlanCompiler(_VariantSQLMixin):
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
        # recursive $ref over JSON/variant values: per-path unroll depth
        # (each canonical ref may repeat this many times along one
        # compile path — the reference compiles recursion to recursive
        # FUNCTIONS, generator.py:192-217; expressions must unroll).
        # Data nested deeper than the bound is handled per
        # on_depth_exceeded: "error" raises at evaluation time (never a
        # silently wrong verdict), "violation" emits a distinguishable
        # violation row (documented divergence, mirrors the python
        # engine's RecursionError sentinel).
        self.ref_unroll_depth = int(options.get("ref_unroll_depth", 3))
        self.on_depth_exceeded = options.get("on_depth_exceeded", "error")
        if self.on_depth_exceeded not in ("error", "violation"):
            raise SchemaDefinitionError(
                f"on_depth_exceeded must be 'error' or 'violation', got "
                f"{self.on_depth_exceeded!r}")
        # uniqueItems freeze canonicalization recursion bound (containers
        # nested deeper raise at evaluation time).  The canon tree has a
        # 2-way branch per level (array + object), so cost is ~2^depth
        # PER uniqueItems site (~60KB of SQL text at depth 5, built once
        # as a memoized template) — 5 covers the reference's own deepest
        # uniqueItems suite cases with headroom; raise per-call for
        # deeper-container corpora.
        self.canon_depth = int(options.get("canon_depth", 5))
        # runaway guards for recursive-$ref unrolling: expansion count
        # and generated-SQL size; exceeding either raises PlanUnsupported
        # AT COMPILE TIME (engine="auto" falls back to the python engine)
        # instead of stalling the driver on an intractable plan
        # defaults calibrated on measured spends: FHIR-like recursive
        # schemas cost 0.03-1.1M chars at depths 3-5 (compile in ms, run
        # JVM-only); the draft-04 metaschema costs 3.9M at depth 1 and
        # ~2 min of Catalyst analysis — the python engine is the right
        # tool there, so the default budget draws the line between them
        self._vref_budget = int(options.get("ref_unroll_budget", 4000))
        self._vsql_char_budget = int(
            options.get("plan_text_budget", 2_000_000))
        # packed recursion (SCALE.md jsoncol): re-encountered recursive
        # $refs compile as ONE shared child body per level applied over
        # a tagged kid array — text linear in unroll depth instead of
        # exponential in the per-level site count.  False restores the
        # classic full inline unroll (differential escape hatch).
        self.pack_recursion = bool(options.get("pack_recursion", True))
        self._vsql_chars = 0
        self._vsql_n = 0
        self._vref_stack: list[str] = []
        self._v_base_uri: str | None = None
        self.defaults: list[tuple[str, object]] = []  # top-level column defaults
        self._ref_stack: list[tuple[str, str]] = []
        # helper columns (name, expr) the plan must project before rule
        # evaluation — nested JSON parses materialized once per row
        # instead of once per consulting rule (from_json/get_json_object
        # are CodegenFallback: every inline copy re-parses the text)
        self.aux_cols: list[tuple[str, Column]] = []
        self._aux_memo: dict = {}

    def _materialize(self, hint: str, col: Column) -> Column:
        return self._materialize2(hint, col)[0]

    def _materialize2(self, hint: str, col: Column) -> tuple[Column, str]:
        # memoized on the expression fingerprint: combinator branches
        # re-request the same typed projection of the same variant —
        # they must share one helper column, not stack duplicates.
        # Returns (column, name): the NAME anchors the SQL-text rule
        # world (varsql) to the materialized helper.
        key = (hint, str(col))
        cached = self._aux_memo.get(key)
        if cached is not None:
            return F.col(cached), cached
        name = f"__aux{len(self.aux_cols)}_{hint}__"
        self.aux_cols.append((name, col))
        self._aux_memo[key] = name
        return F.col(name), name

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
                                 variant_name=site.variant_name,
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
        # compare what the reference's generated code compares (Decimal
        # bounds re-parse as int/float literals); message keeps str(bound)
        cmp = ref_numeric(bound)
        lit_bound = F.lit(int(cmp) if isinstance(cmp, bool) else cmp)
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
        msg_divisor, divisor = divisor, ref_numeric(divisor)
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
        rules = [self._rule(site, "multipleOf",
                            f"must be multiple of {msg_divisor}", fail)]
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
        if isinstance(site.dtype, T.ArrayType) \
                and isinstance(site.dtype.elementType, T.VariantType):
            # variant-typed arrays: the reference's freeze canon
            # (cross-type 1 == 1.0, bool -> "True"/"False" collision,
            # draft04.py:412-421) via canonical strings
            canons = F.transform(
                site.expr, lambda x: self._variant_canon(x, self.canon_depth))
            return [self._rule(
                site, "uniqueItems", "must contain unique items",
                F.size(F.array_distinct(canons)) < F.size(site.expr))]
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
        # message lists ONLY the missing keys, sorted (draft04.py:525-528:
        # str(sorted(missing)) — sort the RAW names, then repr-quote).
        # Sorted at COMPILE time and assembled with concat_ws (which skips
        # NULLs), not filter+array_sort lambdas: one HOF in the output
        # projection is CodegenFallback and drops the whole stage out of
        # whole-stage codegen (pinned by test_plan_shape.py).
        message = F.concat(
            site.name_col, F.lit(" must contain ["),
            F.concat_ws(", ", *[F.when(flag, F.lit(repr(key)))
                                for key, flag in
                                sorted(missing_flags, key=lambda kf: kf[0])]),
            F.lit("] properties"),
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
                        aux_sql = site.object_variant_map_sql()
                        # materialize the per-key variant AND its type tag
                        # once per row: variant_get/schema_of_variant are
                        # CodegenFallback, and every keyword rule of this
                        # property would otherwise re-run the map lookup +
                        # type recovery (A/B: ~25% off the events_json
                        # exact-mode bench query)
                        vcol, vname = self._materialize2(
                            "vkey", F.expr(
                                f"try_element_at({aux_sql}, "
                                f"{_sqlstr(key)})"))
                        _, sovname = self._materialize2(
                            "sov", F.schema_of_variant(vcol))
                        # rule bodies compile as SQL TEXT (varsql): one
                        # py4j round-trip per finished rule instead of
                        # one per expression node — the difference
                        # between 270s and <5s on recursion-unrolled
                        # schemas like the draft metaschemas
                        views = _Views(f"`{vname}`",
                                       sov_sql=f"`{sovname}`")
                        saved_base = self._v_base_uri
                        self._v_base_uri = base.base_uri
                        try:
                            triples = self._vpack_compile_top(
                                prop_definition, _sqlstr(base.sname),
                                views,
                                _PackSingle(f"`{vname}`",
                                            _sqlstr(base.sname)))
                        finally:
                            self._v_base_uri = saved_base
                        for rule_id, message, fail in triples:
                            if isinstance(rule_id, _NestedSQL):
                                struct = F.expr(rule_id.struct_sql)
                                rules.append(Rule(
                                    None, base.sname,
                                    struct.getField("name"),
                                    struct.getField("message"),
                                    _null_false(gate)
                                    & _null_false(F.expr(fail)),
                                    dynamic=struct))
                            else:
                                rules.append(Rule(
                                    rule_id, base.sname, base.name_col,
                                    F.expr(message),
                                    _null_false(gate)
                                    & _null_false(F.expr(fail))))
                    except PlanTooLarge:
                        # too-large is a final verdict for the columnar
                        # engine (the struct fallback would re-raise a
                        # misleading secondary error); engine="auto"
                        # routes it to the python engine
                        raise
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
    # Keywords the variant rule world (varsql text compiler) expresses;
    # anything else raises PlanUnsupported (engine="python" is the exact
    # path there).

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
        # per-element names carried via _NestedSQL structs; uniqueItems
        # reproduces the reference's freeze canon (cross-type 1 == 1.0,
        # bool -> "True"/"False" string collision) via canonical strings
        "minItems", "maxItems", "items", "contains", "uniqueItems",
        # recursion: depth-bounded unroll, handled before this table
        "$ref",
        "minProperties", "maxProperties", "required", "dependencies",
        "properties", "patternProperties", "additionalProperties",
        "propertyNames",
        # content keywords gate on the TRUE runtime string-ness of the
        # value (the typed-string fallback would coerce scalars to text
        # and wrongly fail them)
        "contentEncoding", "contentMediaType",
    }
    _VARIANT_ANNOTATIONS = {
        "title", "description", "default", "examples", "$comment",
        "$schema", "$id", "id", "definitions",
        # consumed by the "if" handler at its keyword position
        "then", "else",
        # consumed by the "items" handler at its keyword position
        "additionalItems",
    }



    def _variant_canon(self, v, depth: int):
        """Column-mode twin of varsql._variant_canon_tpl, kept ONLY for
        uniqueItems over TYPED variant-array sites (``array<variant>``
        columns/map values a user supplies directly): their value
        expressions may be HOF lambda variables with pyspark-generated
        names, which the text world cannot reference.  The JSON-column
        path uses the text template (one expr parse instead of ~1k py4j
        calls per use).

        The reference's uniqueItems freeze canonicalization
        (draft04.py:412-421) as a canonical STRING of a VARIANT value:
        two values render equal iff the reference's ``fn`` makes them
        equal set members —

        * bool -> ``str(var)`` ("True"/"False"), deliberately COLLIDING
          with the equal strings;
        * numbers compare cross-type (1 == 1.0 == 1.00): integral values
          render their exact integer digits (long for |v| < 2^63,
          decimal(38,0) beyond, double repr past 1e38 where every JSON
          number is a double anyway), non-integral ones their double
          repr;
        * strings are length-prefixed (collision-proof against the
          container separators);
        * dict -> frozenset ⇒ sorted key=canon entries; list -> tuple ⇒
          ordered element canons.

        Containers nested past ``depth`` raise at evaluation time
        (loud, never a silently wrong verdict)."""
        sov = F.schema_of_variant(v)
        is_num = ((sov == F.lit("BIGINT")) | (sov == F.lit("DOUBLE"))
                  | sov.startswith("DECIMAL"))
        num = F.try_variant_get(v, "$", "double")
        lng = F.try_variant_get(v, "$", "long")
        s = F.try_variant_get(v, "$", "string")
        b = F.try_variant_get(v, "$", "boolean")
        inf = float("inf")
        integral = (~F.isnan(num) & (F.abs(num) != F.lit(inf))
                    & ((num % F.lit(1.0)) == F.lit(0.0)))
        exact_digits = F.coalesce(
            F.when(sov == F.lit("BIGINT"), lng.cast("string")),
            F.when(F.abs(num) < F.lit(float(2 ** 63)),
                   num.cast("long").cast("string")),
            num.try_cast(T.DecimalType(38, 0)).cast("string"),
            num.cast("string"))
        num_canon = F.concat(
            F.lit("n:"),
            F.when(_null_false(integral), exact_digits)
            .otherwise(num.cast("string")))
        str_canon = F.concat(F.lit("s:"), F.length(s).cast("string"),
                             F.lit(":"), s)
        bool_canon = F.when(b, F.lit("s:4:True")).otherwise(F.lit("s:5:False"))
        canon = (
            F.when(F.is_variant_null(v), F.lit("z"))
            .when(sov == F.lit("BOOLEAN"), bool_canon)
            .when(sov == F.lit("STRING"), str_canon)
            .when(is_num, num_canon))
        if depth <= 0:
            deep = F.raise_error(F.lit(
                "uniqueItems value nests deeper than the canonicalization "
                f"bound ({self.canon_depth}); raise canon_depth or use "
                "engine='python'"))
            return canon.otherwise(deep.cast("string"))
        arr = F.try_variant_get(v, "$", "array<variant>")
        arr_canon = F.concat(
            F.lit("a:["),
            F.concat_ws("\x1f", F.transform(
                arr, lambda x: self._variant_canon(x, depth - 1))),
            F.lit("]"))
        obj = F.try_variant_get(v, "$", "map<string,variant>")
        entries = F.transform(
            F.map_entries(obj),
            lambda e: F.concat(
                F.lit("k:"), F.length(e.getField("key")).cast("string"),
                F.lit(":"), e.getField("key"), F.lit("="),
                self._variant_canon(e.getField("value"), depth - 1)))
        obj_canon = F.concat(
            F.lit("o:{"), F.concat_ws("\x1f", F.array_sort(entries)),
            F.lit("}"))
        return (canon
                .when(sov.startswith("ARRAY"), arr_canon)
                .when(sov.startswith("OBJECT"), obj_canon)
                .otherwise(F.concat(F.lit("?"), sov)))


    def _json_entry_rule(self, site, key_filter_sql, value_definition,
                         rule_label):
        """First violating (key, value) entry of a JSON-backed object's
        RUNTIME entries (map<string,variant> view of the raw text).
        ``key_filter_sql``: callable key_sql_text -> boolean SQL text.
        Rule bodies compile as SQL text (varsql) — the site's name is
        static for JSON-backed struct sites, so ``site.sname`` is its
        exact runtime spelling."""
        if not self.exact_json_types:
            raise PlanUnsupported(
                f"{rule_label} value schemas over undeclared keys need "
                "exact JSON typing; use json_types='exact' (default) or "
                "engine='python'")
        aux_sql = site.object_variant_map_sql()
        e = self._vsql_var("e")
        y = self._vsql_var("y")
        se = self._vsql_var("e")
        name_sql = f"concat({_sqlstr(site.sname)}, '.', {e}.key)"
        saved_base = self._v_base_uri
        self._v_base_uri = site.base_uri
        try:
            triples = self._vpack_compile_top(
                value_definition, name_sql, _Views(f"{e}.value"),
                _PackEntries(
                    f"map_entries({aux_sql})", se,
                    key_filter_sql(f"{se}.key"), f"{se}.value",
                    f"concat({_sqlstr(site.sname)}, '.', {se}.key)",
                    f"{e}.key"))
        finally:
            self._v_base_uri = saved_base
        viol = self._violation_sql(triples, name_sql)
        entry = f"CASE WHEN {key_filter_sql(e + '.key')} THEN {viol} END"
        failing = (f"filter(transform(map_entries({aux_sql}), "
                   f"{e} -> {entry}), {y} -> {y} IS NOT NULL)")
        first = F.expr(f"try_element_at({failing}, 1)")
        return Rule(rule_label, site.sname + ".<" + rule_label + ">",
                    first.getField("name"), first.getField("message"),
                    site.present()
                    & _null_false(F.expr(f"size({failing}) > 0")),
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

                    def matches_undeclared(k_sql, _j=java, _d=decl):
                        conds = [f"rlike({k_sql}, {_sqlstr(_j)})"]
                        for d in _d:
                            conds.append(f"{k_sql} != {_sqlstr(d)}")
                        return "(" + " AND ".join(conds) + ")"

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
            # subset; _entry_triples_sql raises PlanUnsupported beyond)
            def is_extra_sql(k_sql, _d=sorted(declared), _p=java_patterns):
                conds = ["true"]
                for key in _d:
                    conds.append(f"{k_sql} != {_sqlstr(key)}")
                for j in _p:
                    conds.append(f"NOT rlike({k_sql}, {_sqlstr(j)})")
                return "(" + " AND ".join(conds) + ")"

            return [self._json_entry_rule(site, is_extra_sql,
                                          add_definition,
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
        # reference parity: base64.b64decode WITHOUT validate discards
        # non-alphabet chars, then requires mod-4 padding on what
        # remains; try_to_binary alone is laxer (accepts 'abc')
        filtered = F.regexp_replace(expr, "[^A-Za-z0-9+/=]", "")
        decoded = F.try_to_binary(filtered, F.lit("base64"))
        fail = (F.length(filtered) % 4 != 0) | decoded.isNull()
        return [Rule(None, site.sname, site.name_col,
                     F.concat(site.name_col, F.lit(" must be encoded by base64")),
                     site.present() & _null_false(fail))]

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
    ref_unroll_depth: int = 3,
    on_depth_exceeded: str = "error",
    canon_depth: int = 5,
    ref_unroll_budget: int = 4000,
    plan_text_budget: int = 2_000_000,
    pack_recursion: bool = True,
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
        "ref_unroll_depth": ref_unroll_depth,
        "on_depth_exceeded": on_depth_exceeded,
        "canon_depth": canon_depth,
        "ref_unroll_budget": ref_unroll_budget,
        "plan_text_budget": plan_text_budget,
        "pack_recursion": pack_recursion,
    })
    site = _Site(F.col(column), dtype, "data", F.lit("data"),
                 compiler.store.root_uri(),
                 json_expr=(F.col(json_source_col)
                            if json_source_col else None),
                 variant_expr=(F.col(variant_source_col)
                               if variant_source_col else None),
                 variant_name=variant_source_col,
                 keys_expr=(F.col(keys_source_col)
                            if keys_source_col else None),
                 compiler=compiler)
    rules = compiler.compile_value(definition, site)
    compiler._vpack_flush()
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
            "ref_unroll_depth": ref_unroll_depth,
            "on_depth_exceeded": on_depth_exceeded,
            "canon_depth": canon_depth,
            "ref_unroll_budget": ref_unroll_budget,
            "plan_text_budget": plan_text_budget,
            "pack_recursion": pack_recursion,
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
    compiler._vpack_flush()
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
