"""Referential-integrity checks — the table-scale flavor of the
reference's ``$ref``/``dependencies`` keywords (SURVEY.md §2.7).

``orphan_rows`` is a LEFT ANTI join: fact rows whose foreign key has no
match in the dimension.  Join-strategy selection for scale:

* dimension small (the common case for closed-world code lists like
  languages) → ``F.broadcast(dim)``: no shuffle of the 10^12-row fact side
  at all, the anti-join runs map-side;
* dimension large → sort-merge anti join; AQE re-plans to broadcast at
  runtime if the dimension turns out under the threshold, and splits
  skewed fact partitions (hot FK values) via skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str | None = None,
    *,
    broadcast_dim: bool | None = None,
    null_is_violation: bool = False,
) -> DataFrame:
    """Fact rows whose ``fk`` does not resolve in ``dim.pk``.

    NULL fks are absent properties under the engine's convention and pass
    by default (``required`` owns missing-ness); flip ``null_is_violation``
    to count them.
    """
    pk = pk or fk
    keys = dim.select(F.col(pk).alias(fk)).dropDuplicates([fk])
    if broadcast_dim is None:
        broadcast_dim = True  # dims are small in the validation workload
    if broadcast_dim:
        keys = F.broadcast(keys)
    candidates = fact if null_is_violation else fact.where(F.col(fk).isNotNull())
    return candidates.join(keys, on=fk, how="left_anti")


def referential_report(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str | None = None,
    **kwargs,
) -> DataFrame:
    """One-row summary of an FK check: fact rows, orphan rows, orphan keys."""
    orphans = orphan_rows(fact, dim, fk, pk, **kwargs)
    counts = orphans.agg(
        F.count(F.lit(1)).alias("orphan_rows"),
        F.approx_count_distinct(fk).alias("orphan_keys"),
    )
    total = fact.agg(F.count(F.lit(1)).alias("fact_rows"))
    return total.crossJoin(counts)
