"""Validation of dynamic JSON string columns (e.g. ``events.props``).

Two engines:

* ``engine="python"`` (exact): the driver-compiled closure validator is
  captured in an Arrow-batched pandas UDF — compile once, ship once per
  task, evaluate per batch.  Full reference semantics incl.
  additionalProperties over open keys, type-strict enum, dynamic types.
  This is the only per-row-Python path in the engine, reserved for data
  whose structure is genuinely dynamic (the reference's whole workload).

* ``engine="columnar"`` (fast): ``from_json`` parses into a struct derived
  from the schema, then the columnar plan compiler takes over — all JVM.
  Limits (documented): only declared properties are visible (open-key
  keywords like additionalProperties can't see undeclared keys), and JSON
  type mismatches surface as parse-nulls.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .rowcheck import compile_row_validator

VIOLATION_TYPE = T.ArrayType(T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("rule", T.StringType()),
    T.StructField("message", T.StringType()),
]))


def json_violations_udf(definition, *, formats=None, use_formats=True,
                        use_default=True):
    """Build a pandas UDF: JSON string -> violations array."""
    validator = compile_row_validator(
        definition, formats=formats, use_formats=use_formats,
        use_default=use_default, fast_fail=False, detailed_exceptions=True,
    )
    @F.pandas_udf(VIOLATION_TYPE)
    def check(series: pd.Series) -> pd.Series:
        def one(value):
            if value is None:
                return []
            try:
                data = json.loads(value)
            except Exception:
                return [{"name": "data", "rule": None,
                         "message": "data must be valid JSON"}]
            try:
                return [e.as_row() for e in validator.collect(data)]
            except RecursionError:
                return [{"name": "data", "rule": None,
                         "message": "data is too deeply nested"}]

        return series.map(one)

    return check


def validate_json_column(
    df: DataFrame,
    column: str,
    definition: dict,
    *,
    engine: str = "python",
    violations_col: str = "violations",
    verdict_col: str = "verdict",
    formats=None,
) -> DataFrame:
    """Append violations + verdict for a JSON string column."""
    if engine == "python":
        udf = json_violations_udf(definition, formats=formats)
        out = df.withColumn(violations_col, udf(F.col(column)))
        return out.withColumn(verdict_col, F.size(F.col(violations_col)) == 0)

    if engine == "columnar":
        from .columnar import spark_struct_for
        from .columnar.compiler import compile_plan_for_column

        struct_type = spark_struct_for(definition)
        # PERMISSIVE from_json yields an all-null struct for malformed input;
        # route the raw text into a corrupt-record field to detect it
        corrupt = "_corrupt_record"
        parse_type = T.StructType(
            list(struct_type.fields) + [T.StructField(corrupt, T.StringType())])
        parsed = F.from_json(F.col(column), parse_type,
                             {"columnNameOfCorruptRecord": corrupt})
        tmp = "__parsed__"
        out = df.withColumn(tmp, parsed)
        # plan compiled against the schema-declared fields only, so the
        # corrupt-record helper field is invisible to object keywords
        plan = compile_plan_for_column(definition, tmp, struct_type)
        malformed = F.when(
            F.col(column).isNotNull()
            & (F.col(tmp).isNull() | F.col(tmp).getField(corrupt).isNotNull()),
            F.array(F.struct(
                F.lit("data").alias("name"),
                F.lit(None).cast("string").alias("rule"),
                F.lit("data must be valid JSON").alias("message"),
            )),
        )
        out = out.withColumn(
            violations_col,
            F.coalesce(malformed, plan.violations_column()),
        ).drop(tmp)
        return out.withColumn(verdict_col, F.size(F.col(violations_col)) == 0)

    raise ValueError(f"unknown engine {engine!r}")
