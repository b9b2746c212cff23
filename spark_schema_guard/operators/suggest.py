"""Constraint suggestion — mine a validation schema FROM the data.

The reference direction is schema → validator
(/root/reference/fastjsonschema/__init__.py:212 `compile`); production
tables usually start from the other end: terabytes of rows and no
written contract.  This operator profiles a table into the constraint
vocabulary the engine already validates (the Deequ
ConstraintSuggestion idea re-expressed over this engine's keyword set):
``required`` (null-free columns), ``minimum``/``maximum`` (numeric
bounds), ``minLength``/``maxLength`` (string lengths), ``enum``
(low-cardinality string columns).  ``suggested_schema`` turns the
profile into a plain JSON-schema dict that feeds straight back into
``ssg.compile`` / ``ssg.compile_plan`` — mine on a trusted snapshot,
then validate every future batch against the mined contract.

Scale shape (10^12-row argument):

* ``distinct="approx"`` (default): ONE full-table aggregation computes
  count / nulls / min / max / lengths for every column plus
  HyperLogLog++ distinct sketches (``approx_count_distinct`` — merges
  map-side; the shuffle is a few hundred bytes per partition).  The
  single wide row is collected (bounded: one row) and enum-eligible
  string columns get a SECOND bounded pass: melt only the eligible
  columns, DISTINCT (map-side combining; result ≤ |eligible| × distinct
  values, known small), one tiny groupBy.  Two scans total, no
  per-column jobs, no unbounded collect.
* ``distinct="exact"``: same two-pass plan with ``count_distinct``
  (Catalyst expands the aggregate — one duplicated pass per distinct
  column).  This is the ORACLE mode for small-SF differential checks;
  the sketch mode is the 100-TB mode.

The driver round-trip between the two jobs is deliberate and bounded
(one row) — the same broadcast-threshold-style adaptivity
``connected_components`` uses: which columns deserve an enum pass is a
plan-level decision, not a per-row one.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

#: profile output schema — stable for oracles and for suggested_schema().
#: This is also the set constraint_drift REQUIRES; the profile carries two
#: more columns (min_int/max_int — exact long bounds for integral columns,
#: NULL otherwise) that suggested_schema prefers when present: the double
#: view rounds past 2^53, and a rounded-UP minimum would break the mined
#: contract's closure guarantee on huge ids.
_OUT_COLS = ("column", "spark_type", "n_rows", "n_nulls", "n_distinct",
             "min_num", "max_num", "min_len", "max_len", "enum_vals",
             "required")


def suggest_constraints(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    enum_max: int = 16,
    enum_sep: str = ",",
    distinct: str = "approx",
    distinct_rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column:

    ``(column, spark_type, n_rows, n_nulls, n_distinct, min_num,
    max_num, min_len, max_len, enum_vals, required)``

    * ``min_num``/``max_num``: double view of numeric columns (NULL
      otherwise);
    * ``min_len``/``max_len``: character lengths of string columns;
    * ``enum_vals``: ``enum_sep``-joined SORTED distinct values of a
      string column whose non-null distinct count is in
      ``[1, enum_max]`` — NULL for every other column;
    * ``required``: the column has rows and zero NULLs (NULL means
      absent under this engine's row-object convention, so a null-free
      column is evidence for ``required``).

    ``distinct="exact"`` swaps the HLL++ sketch for ``count_distinct``
    (oracle parity; enum eligibility is then exact too).  Values
    containing ``enum_sep`` or a newline never produce an enum
    suggestion (the joined rendering would be ambiguous) — such a
    column reports ``enum_vals`` NULL.
    """
    if distinct not in ("approx", "exact"):
        raise ValueError("distinct must be 'approx' or 'exact'")
    if enum_max < 1:
        raise ValueError("enum_max must be >= 1")
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = list(columns or fields)
    for c in columns:
        if c not in fields:
            raise ValueError(f"no such column: {c}")

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        if distinct == "exact":
            aggs.append(F.count_distinct(col).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(col, distinct_rsd)
                        .alias(f"{c}__nd"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(col.cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(col.cast("double")).alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
        if isinstance(fields[c], _INTEGRAL):
            # exact long bounds: the double view rounds past 2^53
            aggs.append(F.min(col).cast("long").alias(f"{c}__imin"))
            aggs.append(F.max(col).cast("long").alias(f"{c}__imax"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"{c}__imin"))
            aggs.append(F.lit(None).cast("long").alias(f"{c}__imax"))
        if isinstance(fields[c], T.StringType):
            aggs.append(F.min(F.length(col)).cast("int").alias(f"{c}__lmin"))
            aggs.append(F.max(F.length(col)).cast("int").alias(f"{c}__lmax"))
            # a value embedding the separator (or a newline) makes the
            # joined enum rendering ambiguous — poisons eligibility
            bad = F.max((col.contains(enum_sep) | col.contains("\n"))
                        .cast("int"))
            aggs.append(F.coalesce(bad, F.lit(0)).alias(f"{c}__sep"))
        else:
            aggs.append(F.lit(None).cast("int").alias(f"{c}__lmin"))
            aggs.append(F.lit(None).cast("int").alias(f"{c}__lmax"))
            aggs.append(F.lit(1).alias(f"{c}__sep"))

    stats = df.agg(*aggs).collect()[0]  # bounded: exactly one row

    eligible = [c for c in columns
                if isinstance(fields[c], T.StringType)
                and 1 <= stats[f"{c}__nd"] <= enum_max
                and stats[f"{c}__sep"] == 0]
    enum_vals: dict[str, str] = {}
    if eligible:
        melted = df.select(F.expr(
            "stack({n}, {args}) as (column, val)".format(
                n=len(eligible),
                args=", ".join(f"'{c}', `{c}`" for c in eligible)))
        ).where(F.col("val").isNotNull()).distinct()
        per_col = (melted.groupBy("column")
                   .agg(F.array_join(F.sort_array(F.collect_set("val")),
                                     enum_sep).alias("vals"),
                        F.count(F.lit(1)).alias("nd"))
                   .collect())
        for r in per_col:
            # approx sketch may have under-counted: re-check the bar on
            # the exact distinct row count of this bounded pass
            if r["nd"] <= enum_max:
                enum_vals[r["column"]] = r["vals"]

    spark = df.sparkSession
    rows = []
    for c in columns:
        n_rows = stats["__rows"]
        n_nulls = stats[f"{c}__nulls"] or 0
        rows.append((
            c, fields[c].simpleString(), n_rows, n_nulls,
            int(stats[f"{c}__nd"]),
            stats[f"{c}__min"], stats[f"{c}__max"],
            stats[f"{c}__imin"], stats[f"{c}__imax"],
            stats[f"{c}__lmin"], stats[f"{c}__lmax"],
            enum_vals.get(c),
            bool(n_rows > 0 and n_nulls == 0),
        ))
    schema = T.StructType([
        T.StructField("column", T.StringType()),
        T.StructField("spark_type", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_nulls", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("min_num", T.DoubleType()),
        T.StructField("max_num", T.DoubleType()),
        T.StructField("min_int", T.LongType()),
        T.StructField("max_int", T.LongType()),
        T.StructField("min_len", T.IntegerType()),
        T.StructField("max_len", T.IntegerType()),
        T.StructField("enum_vals", T.StringType()),
        T.StructField("required", T.BooleanType()),
    ])
    return spark.createDataFrame(rows, schema)


def suggested_schema(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    enum_max: int = 16,
    enum_sep: str = ",",
    distinct: str = "approx",
    distinct_rsd: float = 0.05,
    profile: DataFrame | None = None,
) -> dict:
    """Mine ``df`` (or reuse a ``suggest_constraints`` ``profile``) into
    a JSON-schema dict the engine compiles directly::

        schema = suggested_schema(trusted_snapshot)
        plan = ssg.compile_plan(schema, next_batch.schema)
        plan.verdicts(next_batch)

    Per column: the Spark type maps to its JSON type (integral →
    ``integer``, float/decimal → ``number``, boolean → ``boolean``,
    string → ``string``; other types get no type keyword), numeric
    columns gain observed ``minimum``/``maximum`` (exact ints for
    integral columns), string columns gain ``minLength``/``maxLength``
    and — when eligible — ``enum``.  Null-free columns with data are
    ``required``.  The mined contract is CLOSED over the snapshot: every
    profiled row satisfies it by construction (pinned by test).
    """
    if profile is None:
        profile = suggest_constraints(df, columns, enum_max=enum_max,
                                      enum_sep=enum_sep, distinct=distinct,
                                      distinct_rsd=distinct_rsd)
    fields = {f.name: f.dataType for f in df.schema.fields}
    properties: dict[str, dict] = {}
    required: list[str] = []
    for r in profile.collect():
        c = r["column"]
        dtype = fields.get(c)
        prop: dict = {}
        if isinstance(dtype, _INTEGRAL):
            prop["type"] = "integer"
            # exact long bounds when the profile carries them (the double
            # view rounds past 2^53 — a rounded-up minimum would exclude
            # the true min and break closure); caller-built profiles
            # without min_int fall back to the double view
            exact = "min_int" in r.__fields__ and r["min_int"] is not None
            if exact:
                prop["minimum"] = int(r["min_int"])
                prop["maximum"] = int(r["max_int"])
            elif r["min_num"] is not None:
                prop["minimum"] = int(r["min_num"])
                prop["maximum"] = int(r["max_num"])
        elif isinstance(dtype, _NUMERIC):
            prop["type"] = "number"
            if r["min_num"] is not None:
                prop["minimum"] = r["min_num"]
                prop["maximum"] = r["max_num"]
        elif isinstance(dtype, T.BooleanType):
            prop["type"] = "boolean"
        elif isinstance(dtype, T.StringType):
            prop["type"] = "string"
            if r["min_len"] is not None:
                prop["minLength"] = int(r["min_len"])
                prop["maxLength"] = int(r["max_len"])
            if r["enum_vals"] is not None:
                prop["enum"] = r["enum_vals"].split(enum_sep)
        properties[c] = prop
        if r["required"]:
            required.append(c)
    schema: dict = {"type": "object", "properties": properties}
    if required:
        schema["required"] = sorted(required)
    return schema


def constraint_drift(
    profile_a: DataFrame,
    profile_b: DataFrame,
    *,
    enum_sep: str = ",",
) -> DataFrame:
    """Contract diff between two ``suggest_constraints`` profiles (an
    old trusted snapshot vs a new batch): one row per
    ``(column, finding)`` with ``breaking`` = TRUE when data satisfying
    the NEW profile can violate a schema mined from the OLD one.

    Findings (emitted only when they hold):

    * ``column_added`` / ``column_removed`` (removal breaks iff the old
      column was required) — presence changes suppress all others;
    * ``type_changed`` (``detail`` = ``old->new``; suppresses the
      value-level findings below);
    * ``became_nullable`` (breaking) / ``became_required``;
    * ``min_widened`` / ``max_widened`` (new data exceeds old bounds —
      breaking) and ``min_narrowed`` / ``max_narrowed``, with the two
      numbers in ``old_num`` / ``new_num``; same for string lengths as
      ``minlen_*`` / ``maxlen_*``.  Bounds diffing uses the profile's
      double view — integer drift smaller than a double ULP past 2^53
      is not flagged (drift is a signal; the mined CONTRACT itself uses
      the exact ``min_int``/``max_int``);
    * ``enum_values_added`` (breaking; ``detail`` = the new values,
      sorted, ``enum_sep``-joined) / ``enum_values_removed`` /
      ``enum_dropped`` (cardinality exploded past the bar — breaking) /
      ``enum_gained``.

    Profiles are one row per COLUMN, so the diff is driver-scale — and
    it is ONE projection (per joined row, an array of conditional
    finding structs, exploded once), not a union of 17 filtered
    sub-frames.  Two reasons: a caller may pass a LAZY profile (read
    from parquet, or hand-built over the table) and a 17-branch union
    would evaluate that subtree 17 times; and even over the local
    relations :func:`suggest_constraints` returns, the single plan
    halves wall time (measured 6.1s -> 2.9s on the bench leg, the
    remainder being the four eager table scans inside the two profile
    calls).
    """
    need = set(_OUT_COLS)
    for side, p in (("a", profile_a), ("b", profile_b)):
        missing = need - set(p.columns)
        if missing:
            raise ValueError(
                f"profile_{side} lacks suggest_constraints columns: "
                f"{sorted(missing)}")
    a = profile_a.select([F.col(c).alias(f"a_{c}") for c in _OUT_COLS])
    b = profile_b.select([F.col(c).alias(f"b_{c}") for c in _OUT_COLS])
    j = a.join(b, a["a_column"] == b["b_column"], "full_outer").select(
        F.coalesce(a["a_column"], b["b_column"]).alias("column"),
        "*").drop("a_column", "b_column")

    both = F.col("a_spark_type").isNotNull() & F.col("b_spark_type").isNotNull()
    same_type = F.col("a_spark_type") == F.col("b_spark_type")
    no_num = F.lit(None).cast("double")
    no_det = F.lit(None).cast("string")

    def finding(cond, name, breaking, old_num=None, new_num=None,
                detail=None):
        # a conditional struct, not a filtered sub-frame: all findings
        # ride ONE array in ONE projection so `j` evaluates once
        return F.when(cond, F.struct(
            F.lit(name).alias("finding"),
            (breaking if isinstance(breaking, Column)
             else F.lit(breaking)).cast("boolean").alias("breaking"),
            (old_num if old_num is not None else no_num)
            .cast("double").alias("old_num"),
            (new_num if new_num is not None else no_num)
            .cast("double").alias("new_num"),
            (detail if detail is not None else no_det)
            .cast("string").alias("detail")))

    an, bn = F.col("a_min_num"), F.col("b_min_num")
    ax, bx = F.col("a_max_num"), F.col("b_max_num")
    aln, bln = F.col("a_min_len").cast("double"), F.col("b_min_len").cast("double")
    alx, blx = F.col("a_max_len").cast("double"), F.col("b_max_len").cast("double")
    ae, be = F.col("a_enum_vals"), F.col("b_enum_vals")
    sep_pat = re.escape(enum_sep)  # split() takes a regex; sep is literal
    a_set, b_set = F.split(ae, sep_pat, -1), F.split(be, sep_pat, -1)
    added = F.array_join(F.array_sort(F.array_except(b_set, a_set)), enum_sep)
    removed = F.array_join(F.array_sort(F.array_except(a_set, b_set)), enum_sep)

    parts = [
        finding(F.col("a_spark_type").isNull(), "column_added", False),
        finding(F.col("b_spark_type").isNull(), "column_removed",
                F.coalesce(F.col("a_required"), F.lit(False))),
        finding(both & ~same_type, "type_changed", True,
                detail=F.concat(F.col("a_spark_type"), F.lit("->"),
                                F.col("b_spark_type"))),
    ]
    live = both & same_type  # value-level findings only on stable typing
    parts += [
        finding(live & F.col("a_required") & ~F.col("b_required"),
                "became_nullable", True),
        finding(live & ~F.col("a_required") & F.col("b_required"),
                "became_required", False),
        finding(live & (bn < an), "min_widened", True, an, bn),
        finding(live & (bn > an), "min_narrowed", False, an, bn),
        finding(live & (bx > ax), "max_widened", True, ax, bx),
        finding(live & (bx < ax), "max_narrowed", False, ax, bx),
        finding(live & (bln < aln), "minlen_widened", True, aln, bln),
        finding(live & (bln > aln), "minlen_narrowed", False, aln, bln),
        finding(live & (blx > alx), "maxlen_widened", True, alx, blx),
        finding(live & (blx < alx), "maxlen_narrowed", False, alx, blx),
        finding(live & ae.isNotNull() & be.isNotNull() & (added != ""),
                "enum_values_added", True, detail=added),
        finding(live & ae.isNotNull() & be.isNotNull() & (removed != ""),
                "enum_values_removed", False, detail=removed),
        finding(live & ae.isNotNull() & be.isNull(), "enum_dropped", True),
        finding(live & ae.isNull() & be.isNotNull(), "enum_gained", False),
    ]
    # explode keeps NULL array elements as NULL rows — the where() is the
    # per-finding filter, applied after j evaluated exactly once
    return (
        j.select("column", F.explode(F.array(*parts)).alias("__f"))
        .where(F.col("__f").isNotNull())
        .select("column", "__f.finding", "__f.breaking",
                "__f.old_num", "__f.new_num", "__f.detail"))
