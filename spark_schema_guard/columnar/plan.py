"""ValidationPlan: the compiled, reusable artifact of the columnar compiler.

``plan.apply(df)`` appends two columns:

* ``violations: array<struct<name,rule,message>>`` — every failed rule in
  plan order (the reference's ``fast_fail=False`` error list,
  generator.py:148-152); empty array = valid row;
* ``verdict: boolean`` — ``size(violations) == 0``.

The first array element equals the reference's fast-fail error (rule
registration order is preserved by the compiler).  All expressions are
standard Column operations: Catalyst folds the constant parts, prunes
unused columns, and whole-stage codegen evaluates the rest JVM-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One vectorized validation rule.

    ``fail`` is a boolean Column that is True exactly where the rule is
    violated (never null — compiler wraps in coalesce).
    """

    rule: str | None  # keyword id ('type', 'minimum', ...) or None
    site: str  # static dotted path for plan display
    name_col: Column  # runtime name (may embed dynamic indices/keys)
    message: Column
    fail: Column
    # pre-built violation struct whose rule id varies per row (nested
    # element/map-entry violations surface their inner rule verbatim)
    dynamic: Column | None = None
    # offending value as a string (reference error objects carry .value)
    value_col: Column | None = None

    def gated(self, condition: Column) -> "Rule":
        """The same rule, active only where ``condition`` holds (if/then,
        positional items length guards...)."""
        return Rule(self.rule, self.site, self.name_col, self.message,
                    F.coalesce(condition, F.lit(False)) & self.fail,
                    self.dynamic, self.value_col)

    def as_struct(self, lean: bool = False, include_value: bool = False) -> Column:
        if include_value and not lean:
            value = (self.value_col if self.value_col is not None
                     else F.lit(None).cast("string"))
            if self.dynamic is not None:
                return F.when(self.fail, F.struct(
                    self.dynamic.getField("name").alias("name"),
                    self.dynamic.getField("rule").alias("rule"),
                    self.dynamic.getField("message").alias("message"),
                    value.alias("value")))
            return F.when(self.fail, F.struct(
                self.name_col.alias("name"),
                F.lit(self.rule).alias("rule"),
                self.message.alias("message"),
                value.alias("value")))
        if lean:
            # detailed_exceptions=False analog (generator.py:277-282):
            # rule id only, no name/message construction work per row
            rule = (self.dynamic.getField("rule") if self.dynamic is not None
                    else F.lit(self.rule))
            return F.when(self.fail, F.struct(
                F.lit(None).cast("string").alias("name"),
                rule.alias("rule"),
                F.lit(None).cast("string").alias("message"),
            ))
        if self.dynamic is not None:
            return F.when(self.fail, self.dynamic)
        return F.when(
            self.fail,
            F.struct(
                self.name_col.alias("name"),
                F.lit(self.rule).alias("rule"),
                self.message.alias("message"),
            ),
        )


class ValidationPlan:
    def __init__(self, rules, defaults, schema_definition, df_schema,
                 row_validator, regex_engine="jvm", detailed=True,
                 include_value=False, options=None, aux_cols=None):
        self.rules = rules
        # helper columns (name, expr) projected before rule evaluation and
        # dropped after — nested JSON parses materialized once per row
        # (the parse expressions are CodegenFallback; inline copies would
        # re-parse the text per consulting rule).  Ordered: later entries
        # may reference earlier ones.
        self.aux_cols = aux_cols or []
        self.defaults = defaults
        self.schema_definition = schema_definition
        self.df_schema = df_schema
        self.row_validator = row_validator
        self.regex_engine = regex_engine
        self.detailed = detailed
        self.include_value = include_value
        self.options = options or {}

    # -- evaluation --------------------------------------------------------

    def violations_column(self) -> Column:
        tail = (",value:string" if self.include_value and self.detailed
                else "")
        empty = F.array().cast(
            f"array<struct<name:string,rule:string,message:string{tail}>>")
        if not self.rules:
            return empty
        # concat of per-rule conditional singleton arrays, NOT
        # filter(array(...), lambda): higher-order functions are
        # CodegenFallback, and one in the output projection drops the
        # whole stage out of whole-stage codegen — A/B measured ~35%
        # off the events_json bench query by keeping this codegen-able
        parts = [
            F.when(rule.fail, F.array(rule.as_struct(
                lean=not self.detailed, include_value=self.include_value)))
            .otherwise(empty)
            for rule in self.rules]
        if len(parts) == 1:
            return parts[0]
        return F.concat(*parts)

    def with_aux(self, df: DataFrame) -> DataFrame:
        """Project the plan's helper columns (in registration order — later
        entries may reference earlier ones)."""
        out = df
        for name, col in self.aux_cols:
            out = out.withColumn(name, col)
        return out

    def drop_aux(self, df: DataFrame) -> DataFrame:
        return df.drop(*[name for name, _ in self.aux_cols]) if self.aux_cols else df

    def apply(self, df: DataFrame, violations_col: str = "violations",
              verdict_col: str = "verdict") -> DataFrame:
        out = self.with_aux(df).withColumn(violations_col, self.violations_column())
        out = self.drop_aux(out)
        return out.withColumn(verdict_col, F.size(F.col(violations_col)) == F.lit(0))

    def verdicts(self, df: DataFrame) -> DataFrame:
        """Lean projection: every input row -> verdict + first violation
        (the fast-fail view derived from the full evaluation)."""
        applied = self.apply(df)
        return applied.select(
            *[F.col(f.name) for f in df.schema.fields],
            F.col("verdict"),
            F.try_element_at(F.col("violations"), F.lit(1)).alias("first_violation"),
        )

    def violation_rows(self, df: DataFrame, keys: list[str] | None = None) -> DataFrame:
        """Exploded violations: one output row per (input row, failed rule)."""
        key_cols = [F.col(k) for k in (keys or [f.name for f in df.schema.fields])]
        applied = self.apply(df)
        exploded = applied.where(~F.col("verdict")).select(
            *key_cols, F.explode(F.col("violations")).alias("violation"))
        return exploded.select(
            *key_cols,
            F.col("violation.name").alias("name"),
            F.col("violation.rule").alias("rule"),
            F.col("violation.message").alias("message"),
        )

    def with_defaults(self, df: DataFrame) -> DataFrame:
        """Output projection with schema defaults applied to absent
        (NULL / missing) top-level columns.  Never mutates validated input
        columns in place — the reference's use_default data transformation
        (draft04.py:560-561) re-expressed as a projection."""
        out = df
        existing = {f.name for f in df.schema.fields}
        for column, default in self.defaults:
            if column in existing:
                out = out.withColumn(column, F.coalesce(F.col(column), F.lit(default)))
            else:
                out = out.withColumn(column, F.lit(default))
        return out

    # -- introspection -----------------------------------------------------

    def describe(self) -> list[dict]:
        return [{"rule": r.rule, "site": r.site} for r in self.rules]

    def explain(self) -> str:
        lines = [f"ValidationPlan ({len(self.rules)} rules, regex_engine={self.regex_engine})"]
        for i, r in enumerate(self.rules):
            lines.append(f"  [{i}] {r.site}: {r.rule}")
        if self.defaults:
            lines.append(f"  defaults: {self.defaults}")
        return "\n".join(lines)

    # -- persistence (compile_to_code analog, __init__.py:294-341) ---------

    def to_spec(self) -> dict:
        """The plan as a JSON-able spec: everything needed to rebuild it
        bit-identically on another driver (the reference serializes its
        generated source + regexes, generator.py:98-119; our plan is a
        pure function of schema + table schema + options, so the spec *is*
        the artifact).  Custom format/handler callables are not
        serializable — like the reference, re-supply them at load time."""
        opts = dict(self.options)
        if opts.get("formats"):
            opts["formats"] = sorted(opts["formats"])  # names only, as a marker
        if opts.get("handlers"):
            opts["handlers"] = sorted(opts["handlers"])
        return {
            "format": "spark-schema-guard/plan-spec@1",
            "definition": self.schema_definition,
            "df_schema": self.df_schema.jsonValue() if self.df_schema else None,
            "options": opts,
        }

    def save(self, path: str) -> None:
        import json

        with open(path, "w") as fh:
            json.dump(self.to_spec(), fh, indent=1)


def load_plan(path_or_spec, df_schema=None, *, formats=None, handlers=None):
    """Rebuild a :class:`ValidationPlan` from a spec produced by
    :meth:`ValidationPlan.save` — the load half of ``compile_to_code``
    parity (tests/test_compile_to_code.py:9-30 in the reference).  Pass
    ``df_schema`` to retarget the plan at a different table layout;
    ``formats``/``handlers`` re-bind custom callables the spec can only
    name."""
    import json

    from pyspark.sql import types as T

    if isinstance(path_or_spec, str):
        with open(path_or_spec) as fh:
            spec = json.load(fh)
    else:
        spec = path_or_spec
    if spec.get("format") != "spark-schema-guard/plan-spec@1":
        raise ValueError(f"not a plan spec: {spec.get('format')!r}")
    opts = dict(spec.get("options") or {})
    named_formats = opts.pop("formats", None)
    named_handlers = opts.pop("handlers", None)
    # the spec records custom callables by NAME only — the supplied dicts
    # must cover every recorded name, or the rebuilt plan would silently
    # diverge from the saved one
    if named_formats:
        missing = sorted(set(named_formats) - set(formats or {}))
        if missing:
            raise ValueError(
                f"plan spec names custom formats {sorted(named_formats)}; "
                f"formats= is missing {missing}")
    if named_handlers:
        missing = sorted(set(named_handlers) - set(handlers or {}))
        if missing:
            raise ValueError(
                f"plan spec names custom handlers {sorted(named_handlers)}; "
                f"handlers= is missing {missing}")
    column_root = opts.pop("column_root", None)
    column_dtype = opts.pop("column_dtype", None)
    if column_root is not None:
        from .compiler import compile_plan_for_column

        return compile_plan_for_column(
            spec["definition"], column_root,
            T._parse_datatype_json_string(column_dtype),
            formats=formats, handlers=handlers, **opts)
    if df_schema is None and spec.get("df_schema"):
        df_schema = T.StructType.fromJson(spec["df_schema"])

    from .compiler import compile_plan

    return compile_plan(spec["definition"], df_schema,
                        formats=formats, handlers=handlers, **opts)
