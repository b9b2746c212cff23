"""Deterministic sampling / data mixing for training-data pipelines.

Both modes are reproducible functions of the data (no RNG state), so the
same inputs give the same sample on any cluster size, any engine — which
is what makes them oracle-checkable and re-runnable:

* ``mode="hash"`` (the 10^12-row path): keep a row iff
  ``md5(id) < threshold(stratum)``.  Shuffle-free — a pure filter over
  the scan; the sampled fraction concentrates around the target with
  binomial error O(1/sqrt(n_s)).
* ``mode="exact"``: rank rows within each stratum by ``md5(id)`` and
  keep the first ``ceil(fraction * n_s)``.  Exact counts, at the cost of
  one shuffle on the stratum key (AQE handles hot-stratum skew; the sort
  is per-stratum, not global).

The md5-of-id ordering is engine-portable (DuckDB computes the identical
selection), unlike Spark's ``sample``/``sampleBy`` whose RNG streams are
partition-layout dependent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5 yields 32 lowercase-hex chars; the first 15 (60 bits) compared
# LEXICOGRAPHICALLY equal numeric comparison (fixed width, [0-9a-f] is
# ASCII-ordered) — portable to any engine with md5 + substring
_HASH_SPACE = 16 ** 15


def _hash_key(col):
    return F.substring(F.md5(col.cast("string")), 1, 15)


def _threshold_hex(fraction: float) -> str:
    if fraction >= 1.0:
        return "g"  # every hex char sorts below 'g' -> keep all
    return format(int(fraction * _HASH_SPACE), "015x")


def downsample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic hash-threshold sample of ~``fraction`` of rows.
    Pure filter — no shuffle, no RNG, stable under re-runs and
    repartitioning.

    NULL ids hash to NULL and cannot be subsampled deterministically;
    they are kept when ``fraction == 1.0`` ("keep all" means all) and
    dropped otherwise — pre-filter or fill ids if that matters.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = F.lit(_threshold_hex(fraction))
    keep = _hash_key(F.col(id_col)) < threshold
    return df.where(keep | (F.col(id_col).isNull() & (threshold == F.lit("g"))))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    *,
    mode: str = "hash",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of 'en', 30% of 'de', drop the rest).

    ``fractions`` maps stratum value -> fraction; unlisted strata get
    ``default_fraction``.
    """
    for frac in fractions.values():
        if not 0.0 <= frac <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    strata = F.col(strata_col)

    if mode == "hash":
        threshold = F.lit(_threshold_hex(default_fraction))
        for value, frac in sorted(fractions.items()):
            threshold = F.when(strata.eqNullSafe(F.lit(value)),
                               F.lit(_threshold_hex(frac))).otherwise(threshold)
        # NULL ids hash to NULL: keep them whenever their stratum's
        # effective fraction is 1.0 (threshold 'g' = keep-all), drop
        # otherwise — a NULL key cannot be fractionally subsampled.
        keep = _hash_key(F.col(id_col)) < threshold
        return df.where(keep | (F.col(id_col).isNull()
                                & (threshold == F.lit("g"))))

    if mode == "exact":
        counts = {r["s"]: r["n"] for r in
                  df.groupBy(strata.alias("s"))
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        quota = F.lit(None).cast("long")
        for value, n_s in counts.items():
            frac = fractions.get(value, default_fraction)
            quota = F.when(strata.eqNullSafe(F.lit(value)),
                           F.lit(int(math.ceil(frac * n_s)))).otherwise(quota)
        w = Window.partitionBy(strata).orderBy(
            _hash_key(F.col(id_col)).asc(), F.col(id_col).asc())
        return (
            df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= quota)
            .drop("__rk")
        )

    raise ValueError(f"unknown mode {mode!r}")
