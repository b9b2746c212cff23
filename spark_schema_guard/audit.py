"""Checkpointed, resumable validation runs with a per-unit audit table
(SURVEY.md §2.7, north-rule requirement).

Unit of work = input file (``_metadata.file_path`` when the source
exposes it, ``input_file_name()`` as fallback — an empty unit raises
rather than silently collapsing all rows into one resumable ''):
stable across retries and cluster sizes, unlike partition ids.  A run:

1. anti-joins the input's file list against the audit table's completed
   units (resume = skip everything already validated);
2. validates the remaining files, aggregating per-file metrics (rows,
   valid, violations, per-rule counts) in the same pass as the verdicts;
3. appends per-file metric rows + lineage (run id, schema hash, wall time)
   to the audit table.

Every location (input, audit, violations) is a table reference
(``io.py``): a parquet path locally, or a catalog identifier such as
``iceberg.prod.audit`` on a cluster — catalog refs go through the V2
``writeTo(...).append()`` API, so on Iceberg each audit append is one
atomic snapshot commit and resume-after-crash sees only whole units.

Crash mid-run ⇒ files whose metrics were not appended are re-validated on
the next run; completed files are never recomputed.  Violation-row output
is partitioned by the same unit so re-runs overwrite per-unit
(idempotent).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_schema_guard.io import append_table, read_table, try_read_table

AUDIT_COLUMNS = [
    "run_id", "unit", "schema_hash", "rows", "valid_rows", "violation_count",
    "rule_counts", "started_at", "finished_at", "wall_ms",
]


def schema_hash(definition) -> str:
    return hashlib.sha256(
        json.dumps(definition, sort_keys=True).encode()).hexdigest()[:16]


def _completed_units(spark: SparkSession, audit_path: str, s_hash: str):
    audit = try_read_table(spark, audit_path)
    if audit is None:
        return None
    return audit.where(F.col("schema_hash") == s_hash).select("unit").distinct()


class AuditedRun:
    """One resumable validation pass of a plan over a file-backed input."""

    def __init__(self, spark: SparkSession, plan, input_path: str,
                 audit_path: str, run_id: str | None = None):
        self.spark = spark
        self.plan = plan
        self.input_path = input_path
        self.audit_path = audit_path
        self.run_id = run_id or f"run-{int(time.time())}"
        self.s_hash = schema_hash(plan.schema_definition)

    def pending_input(self) -> DataFrame:
        # Unit = underlying data file.  Prefer the source's hidden
        # metadata column (``_metadata.file_path`` — defined for file
        # sources and Iceberg/DSv2 scans); ``input_file_name()`` is only
        # the fallback, because DSv2 scans commonly return '' from it.
        # An EMPTY unit fails LOUDLY at evaluation time: if '' ever
        # reached the audit table, the next resume's anti-join would
        # silently skip ALL new data — the exact inversion of the
        # crash-consistency contract.
        src = read_table(self.spark, self.input_path)
        try:
            src.select(F.col("_metadata.file_path"))
            raw_unit = F.col("_metadata.file_path")
        except Exception:
            raw_unit = F.input_file_name()
        df = src.withColumn(
            "__unit",
            F.when(F.length(raw_unit) > 0, raw_unit).otherwise(
                F.raise_error(F.lit(
                    "audit unit is empty: this source exposes neither "
                    "_metadata.file_path nor input_file_name(); resume "
                    "would silently skip data — pass a file-backed input "
                    "or a catalog table with file metadata"))))
        done = _completed_units(self.spark, self.audit_path, self.s_hash)
        if done is not None:
            df = df.join(
                F.broadcast(done.withColumnRenamed("unit", "__unit")),
                "__unit", "left_anti")
        return df

    def run(self, violations_path: str | None = None) -> dict:
        """Validate all pending units; append audit metrics; return summary."""
        started = time.time()
        pending = self.pending_input()
        applied = self.plan.apply(pending)

        per_unit = (
            applied.groupBy(F.col("__unit").alias("unit"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("verdict").cast("long")).alias("valid_rows"),
                F.sum(F.size("violations")).alias("violation_count"),
            )
        )
        # per-rule counts: explode only invalid rows, two-level agg
        rule_counts = (
            applied.where(~F.col("verdict"))
            .select(F.col("__unit").alias("unit"), F.explode("violations").alias("v"))
            .groupBy("unit", F.coalesce(F.col("v.rule"), F.lit("<none>")).alias("rule"))
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("unit")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("rule", "n"))).alias("rule_counts"))
        )
        finished_rows = (
            per_unit
            .join(rule_counts, "unit", "left")
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("schema_hash", F.lit(self.s_hash))
            .withColumn("started_at", F.lit(int(started)))
            .withColumn("finished_at", F.unix_timestamp())
            .withColumn("wall_ms",
                        (F.unix_timestamp() - F.lit(int(started))) * 1000)
        )

        if violations_path:
            violation_rows = (
                applied.where(~F.col("verdict"))
                .select("__unit", "violations", *[c for c in pending.columns
                                                  if c != "__unit"]))
            append_table(violation_rows, violations_path)

        append_table(finished_rows.select(*AUDIT_COLUMNS), self.audit_path)

        audit = read_table(self.spark, self.audit_path)
        mine = audit.where(F.col("run_id") == self.run_id)
        agg = mine.agg(F.count(F.lit(1)).alias("units"),
                       F.sum("rows").alias("rows"),
                       F.sum("valid_rows").alias("valid_rows")).collect()[0]
        return {
            "run_id": self.run_id,
            "units_validated": agg["units"],
            "rows": agg["rows"] or 0,
            "valid_rows": agg["valid_rows"] or 0,
        }
