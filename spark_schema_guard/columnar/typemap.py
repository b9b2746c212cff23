"""Static Spark type ↔ JSON-Schema type mapping.

The key semantic shift vs the reference (SURVEY.md §1.3): Spark data carries
a static schema, so `type` keywords largely resolve at plan-build time —
a `string` rule on a StringType column is a constant-true the plan never
evaluates (predicate elimination Catalyst can't do because it doesn't know
rule semantics), while a `string` rule on a LongType column is a
constant-fail for every present value.
"""

from __future__ import annotations

from pyspark.sql import types as T

# JSON type(s) a Spark column can *statically* hold (never 'null' — a NULL
# cell means the property is absent, see plan.py docstring).
_ATOMIC = {
    T.StringType: ("string",),
    T.CharType: ("string",),
    T.VarcharType: ("string",),
    T.BooleanType: ("boolean",),
    T.ByteType: ("integer", "number"),
    T.ShortType: ("integer", "number"),
    T.IntegerType: ("integer", "number"),
    T.LongType: ("integer", "number"),
    T.FloatType: ("number",),
    T.DoubleType: ("number",),
    T.DecimalType: ("number",),
    # timestamps/dates surface as their ISO string form (JSON has no
    # temporal type); format checks evaluate against that representation
    T.TimestampType: ("string",),
    T.TimestampNTZType: ("string",),
    T.DateType: ("string",),
    # binary surfaces as string for content* keywords
    T.BinaryType: ("string",),
    T.ArrayType: ("array",),
    T.MapType: ("object",),
    T.StructType: ("object",),
    T.NullType: (),
}


def json_types_of(dtype: T.DataType) -> tuple[str, ...]:
    for cls, names in _ATOMIC.items():
        if isinstance(dtype, cls):
            return names
    return ()


def is_integral(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


def is_fractional(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType))


def is_numeric(dtype: T.DataType) -> bool:
    return is_integral(dtype) or is_fractional(dtype)


def is_stringlike(dtype: T.DataType) -> bool:
    return isinstance(
        dtype,
        (T.StringType, T.CharType, T.VarcharType, T.TimestampType,
         T.TimestampNTZType, T.DateType),
    )


def is_temporal(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType))


def spark_struct_for(definition: dict) -> T.StructType:
    """Derive a Spark StructType from an object-typed JSON schema — used to
    ``from_json``-parse JSON string columns into typed structs so the whole
    rule plan stays JVM-side, and by the synthetic data generator."""
    fields = []
    for key, sub in definition.get("properties", {}).items():
        fields.append(T.StructField(key, spark_type_for(sub), nullable=True))
    return T.StructType(fields)


def spark_type_for(definition) -> T.DataType:
    if not isinstance(definition, dict):
        return T.StringType()
    declared = definition.get("type")
    if isinstance(declared, list):
        non_null = [t for t in declared if t != "null"]
        declared = non_null[0] if non_null else "null"
    if declared == "object" or "properties" in definition:
        return spark_struct_for(definition)
    if declared == "array":
        items = definition.get("items")
        element = spark_type_for(items if isinstance(items, dict) else {})
        return T.ArrayType(element, containsNull=True)
    return {
        "string": T.StringType(),
        "integer": T.LongType(),
        "number": T.DoubleType(),
        "boolean": T.BooleanType(),
        "null": T.NullType(),
    }.get(declared, T.StringType())
