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


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: dict | None = None,
    *,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: append ``split_col``
    naming the split whose cumulative md5-threshold range contains
    ``md5(id || '#split')``.  Ranges follow ``weights``' item order
    (first entry owns the lowest hash range); weights must sum to 1.
    The same row lands in the same split on any cluster size, any
    engine, any day.

    The hash is SALTED with ``'#split'`` so it is independent of
    ``downsample``/``stratified_sample``'s unsalted key: sharing that
    key would make the two perfectly correlated — after
    ``downsample(0.5)`` every survivor has an unsalted hash < 0.5 and
    would land entirely inside the first split's range, leaving val and
    test EMPTY.  With the salt, a downsampled corpus preserves its
    split proportions (binomially).

    NULL ids cannot be assigned deterministically: their split is NULL
    (filter or fill upstream).  Pure projection — zero shuffle, zero
    state; the 10^12-row cost is the md5 itself.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must be non-empty")
    for name, wt in weights.items():
        if not isinstance(name, str) or not 0.0 <= wt <= 1.0:
            raise ValueError("weights maps split name -> fraction in [0,1]")
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    key = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#split"))),
        1, 15)
    expr = F.lit(None).cast("string")
    cum = 0.0
    # build the CASE from the LAST range backwards so the first entry
    # ends up the outermost (lowest-threshold) branch
    edges = []
    for name, wt in weights.items():
        cum += wt
        edges.append((name, _threshold_hex(min(cum, 1.0))))
    edges[-1] = (edges[-1][0], "g")  # top range closed despite rounding
    for name, hex_edge in reversed(edges):
        expr = F.when(key < F.lit(hex_edge), F.lit(name)).otherwise(expr)
    return df.withColumn(
        split_col, F.when(F.col(id_col).isNull(),
                          F.lit(None).cast("string")).otherwise(expr))


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    total_docs: int,
    *,
    tau: float = 0.5,
    bucket_hex: int = 2,
) -> DataFrame:
    """Temperature-scaled source mixing: select ~``total_docs`` rows
    with per-source quotas proportional to ``n_s ** tau`` — the
    multilingual-LM sampling scheme (XLM-R, Conneau et al. 2019 §3.1;
    mT5) that upweights low-resource sources as ``tau`` drops below 1
    (``tau=1`` is proportional sampling, ``tau=0`` equal shares).

    Quota math (driver-side, one bounded count per source):
    ``q_s = min(n_s, ceil(total_docs * n_s**tau / Σ_t n_t**tau))`` —
    the ceil keeps every non-empty source represented; the cap means a
    small source that cannot fill its boosted share UNDER-fills the
    total rather than silently re-weighting the rest (re-normalize and
    re-run with a larger budget if exact totals matter).  Selection
    within a source is the engine-portable ``(md5(id), id)`` prefix —
    the same deterministic order every sampler here uses — via
    :func:`take_token_budget` with unit weights, which keeps the
    two-stage bucket-prefix shape (no full per-source sort at scale).

    NULL ids and NULL sources cannot be ordered/bucketed
    deterministically and are excluded (the module-wide NULL policy).
    The per-source count collect is bounded by the source vocabulary
    (a plan-scale quantity, same adaptivity contract as
    ``stratified_sample(mode="exact")``).
    """
    if total_docs < 0:
        raise ValueError("total_docs must be >= 0")
    if tau < 0:
        raise ValueError("tau must be >= 0 (1 = proportional, 0 = equal)")
    counts = {r["s"]: r["n"] for r in
              df.where(F.col(source_col).isNotNull())
              .groupBy(F.col(source_col).alias("s"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    if not counts:
        return df.where(F.lit(False))
    # sum in sorted-source order so an SQL oracle can reproduce the
    # float sum exactly (list_sum over an ORDER BY source list)
    denom = 0.0
    for s in sorted(counts):
        denom += counts[s] ** tau
    quotas = {s: min(n, math.ceil(total_docs * (n ** tau) / denom))
              for s, n in counts.items()}
    out = take_token_budget(
        df.withColumn("__one", F.lit(1)), id_col, "__one",
        strata_col=source_col, budgets=quotas, default_budget=0,
        bucket_hex=bucket_hex)
    return out.drop("__one")


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    target_id_col: str,
    target_text_col: str,
    *,
    n: int = 2,
    buckets: int = 8192,
    smoothing: float = 1.0,
    scale: int = 10 ** 6,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each raw document by how target-like its n-gram distribution
    is — the sum over its gram occurrences of
    ``ln(p_target(bucket) / p_raw(bucket))`` with add-``smoothing``
    probability estimates over ``buckets`` hashed gram buckets.  High
    scores mark documents to keep when curating toward a target domain;
    feed ``logw`` to a threshold filter or a top-budget selection.

    Engine-portable exactness (no float accumulation order anywhere):
    a gram's bucket is its first 8 md5 hex chars as an integer mod
    ``buckets``; the per-bucket log-ratio λ is computed ONCE driver-side
    and fixed-pointed as ``floor(λ * scale)`` (floor, not round — an
    SQL oracle's ``floor`` reproduces it bit-for-bit because ``ln`` is
    the same libm call in both engines), and each document's score is
    an INTEGER sum of those λs.  Returns ``(id, n_grams, weight_int,
    logw = weight_int / scale)``.

    NULL ids are excluded from gram counting and scored 0 (they cannot
    join back); NULL/blank texts and docs shorter than ``n`` tokens
    have no grams and score ``n_grams=0, weight_int=0, logw=0.0`` — the
    neutral score.  Driver state: ONE bounded per-bucket count collect
    (<= 2 x ``buckets`` rows — both legs' aggregates union into a
    single job, a plan-scale quantity like ``temperature_mix``'s source
    vocabulary).

    Scale shape: grams via the lead()-window stack (the measured ~10x
    win over transform-HOFs, SCALE.md); bucket counts are map-side-
    combining groupBys whose shuffle is bounded by ``buckets`` keys per
    task; the λ table is a ``buckets``-row LocalTableScan broadcast
    into the gram join (never a shuffle); the per-doc rollup is one
    groupBy(id) — the repetition_features family shape.
    """
    from .textstats import word_ngram_stack

    if n < 1:
        raise ValueError("n must be >= 1")
    if not 1 <= buckets <= 1_000_000:
        raise ValueError("buckets must be in [1, 1e6]")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (zero counts are hashed "
                         "buckets' normal state)")
    if scale < 1:
        raise ValueError("scale must be a positive integer")

    (ct, _), (cr, _) = _gram_bucket_counts_multi(
        [(target, target_id_col, target_text_col), (df, id_col, text_col)],
        n, buckets)
    ldf = df.sparkSession.createDataFrame(
        _log_ratio_rows(ct, cr, buckets, float(smoothing), scale),
        "b long, lam long")

    stack = word_ngram_stack(
        df.where(F.col(id_col).isNotNull()).select(F.col(id_col),
                                                   F.col(text_col)),
        id_col, text_col, (n,)).withColumn("__b", _gram_bucket(buckets))
    scored = (stack.join(F.broadcast(ldf), stack["__b"] == ldf["b"])
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("__ng"),
                   F.sum("lam").alias("__w")))
    return df.select(F.col(id_col)).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("__ng", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("__w", F.lit(0)).cast("long").alias("weight_int"),
        (F.coalesce("__w", F.lit(0)) / F.lit(float(scale))).alias("logw"),
    )


def _gram_bucket(buckets: int, hash_fn: str = "md5") -> Column:
    """Bucket of the ``gram`` column: first 8 md5 hex chars as an
    integer mod ``buckets`` — engine-portable (any SQL oracle reproduces
    it digit-by-digit).  ``hash_fn="xxhash64"`` is the cheaper 10^12-row
    knob (same determinism across cluster sizes and re-runs, just not
    reproducible by a SQL oracle), mirroring the dedup family's dual
    hash modes."""
    if hash_fn == "md5":
        return (F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
                .cast("long") % buckets)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64("gram"), F.lit(buckets)).cast("long")
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def _gram_bucket_counts_multi(frames, n: int, buckets: int,
                              hash_fn: str = "md5", *,
                              with_doc_counts: bool = False) -> list:
    """Hashed-``n``-gram bucket counts for SEVERAL ``(frame, id_col,
    text_col)`` legs collected in ONE Spark job (a union of the per-leg
    aggregates — the scans run concurrently and the driver pays one
    round trip instead of one per leg).  Returns one ``(bucket_counts,
    n_docs)`` pair per leg; ``n_docs`` (the leg's non-NULL-id row count,
    riding along as pseudo-bucket -1) is populated only when
    ``with_doc_counts`` — the collect stays <= legs x (buckets + 1)
    rows, a plan-scale quantity."""
    from functools import reduce

    from .textstats import word_ngram_stack

    parts = []
    for y, (frame, idc, tc) in enumerate(frames):
        base = frame.where(F.col(idc).isNotNull())
        stack = word_ngram_stack(base.select(F.col(idc), F.col(tc)),
                                 idc, tc, (n,))
        parts.append(
            stack.withColumn("__b", _gram_bucket(buckets, hash_fn))
            .groupBy("__b").agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(y).alias("__y"), F.col("__b").cast("long"), "c"))
        if with_doc_counts:
            parts.append(
                base.agg(F.count(F.lit(1)).alias("c"))
                .select(F.lit(y).alias("__y"),
                        F.lit(-1).cast("long").alias("__b"), "c"))
    rows = reduce(lambda a, b: a.unionByName(b), parts).collect()
    out = [({}, 0) for _ in frames]
    for r in rows:
        counts, nd = out[r["__y"]]
        if r["__b"] == -1:
            out[r["__y"]] = (counts, r["c"])
        else:
            counts[r["__b"]] = r["c"]
    return out


def _log_ratio_rows(ca: dict, cb: dict, buckets: int, a: float,
                    scale: int) -> list:
    """Fixed-point per-bucket add-``a``-smoothed log-probability ratios:
    ``floor(scale * (ln p_a(bucket) - ln p_b(bucket)))`` (floor, not
    round — an SQL oracle's floor reproduces it bit-for-bit because
    ``ln`` is the same libm call in both engines)."""
    a_tot, b_tot = sum(ca.values()), sum(cb.values())
    rows = []
    for b in range(buckets):
        val = (math.log((ca.get(b, 0) + a) / (a_tot + a * buckets))
               - math.log((cb.get(b, 0) + a) / (b_tot + a * buckets)))
        rows.append((b, int(math.floor(val * scale))))
    return rows


def nb_classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    positive: DataFrame,
    pos_id_col: str,
    pos_text_col: str,
    negative: DataFrame,
    neg_id_col: str,
    neg_text_col: str,
    *,
    n: int = 1,
    buckets: int = 8192,
    smoothing: float = 1.0,
    scale: int = 10 ** 6,
    hash_fn: str = "md5",
) -> DataFrame:
    """fastText-style quality-classifier gate as a multinomial Naive
    Bayes linear model over hashed word-``n``-gram buckets — the
    curation stage CCNet ("high-quality = looks like Wikipedia"),
    LLaMA-1 ("pages referenced by Wikipedia") and FineWeb-edu run
    between crawl hygiene and dedup.  Training IS the closed-form count
    pass: per-bucket weights are the smoothed log-likelihood ratios
    ``lam_b = ln p(b|positive) - ln p(b|negative)`` estimated from the
    labeled ``positive`` / ``negative`` example frames, plus a
    document-count prior ``ln((n_pos + a) / (n_neg + a))`` — no
    iterative optimizer, so the whole model is reproducible by the
    DuckDB oracle (fixed-point ``floor(val * scale)`` integers, exactly
    like :func:`importance_weights`, which is this model's
    prior-free two-corpus special case).

    Returns ``(id, n_grams, logit_int, logit, keep)`` where
    ``logit_int = prior_int + Σ_gram lam_int(bucket(gram))`` and
    ``keep = logit_int > 0`` (P(positive) > 0.5 under NB).  Docs with
    no grams (blank/short/NULL text) score the prior alone; NULL ids
    score the prior with ``n_grams = 0`` (their grams cannot join back
    and are excluded from counting).

    Scale shape: identical to :func:`importance_weights` — training is
    ONE bounded driver collect over the LABELED frames only (typically
    tiny next to the corpus; bucket counts and doc counts for both legs
    ride a single unioned-aggregate job), then a ``buckets``-row
    LocalTableScan broadcast into the corpus gram stream and one
    groupBy(id) rollup.  The corpus itself is scanned once.
    ``hash_fn="xxhash64"`` swaps the md5 bucket hash for the cheaper
    xxhash64 at 10^12 rows (still deterministic across cluster sizes;
    md5 is the SQL-oracle-reproducible mode, the dedup family's dual
    convention).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if not 1 <= buckets <= 1_000_000:
        raise ValueError("buckets must be in [1, 1e6]")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (zero counts are hashed "
                         "buckets' normal state)")
    if scale < 1:
        raise ValueError("scale must be a positive integer")
    from .textstats import word_ngram_stack

    # training is ONE Spark job: both labeled legs' bucket counts AND
    # their doc counts ride a single unioned-aggregate collect
    (cp, n_pos), (cn, n_neg) = _gram_bucket_counts_multi(
        [(positive, pos_id_col, pos_text_col),
         (negative, neg_id_col, neg_text_col)],
        n, buckets, hash_fn, with_doc_counts=True)
    a = float(smoothing)
    prior_int = int(math.floor(
        (math.log(n_pos + a) - math.log(n_neg + a)) * scale))
    ldf = df.sparkSession.createDataFrame(
        _log_ratio_rows(cp, cn, buckets, a, scale), "b long, lam long")

    stack = word_ngram_stack(
        df.where(F.col(id_col).isNotNull()).select(F.col(id_col),
                                                   F.col(text_col)),
        id_col, text_col, (n,)).withColumn("__b",
                                           _gram_bucket(buckets, hash_fn))
    scored = (stack.join(F.broadcast(ldf), stack["__b"] == ldf["b"])
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("__ng"),
                   F.sum("lam").alias("__w")))
    logit_int = (F.coalesce("__w", F.lit(0)) + F.lit(prior_int)).cast("long")
    return df.select(F.col(id_col)).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("__ng", F.lit(0)).cast("long").alias("n_grams"),
        logit_int.alias("logit_int"),
        (logit_int / F.lit(float(scale))).alias("logit"),
        (logit_int > 0).alias("keep"),
    )


def cap_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    cap: int,
    *,
    bucket_hex: int = 2,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum in the engine-portable
    ``(md5(id), id)`` order — the per-domain document cap of a crawl
    curation pipeline (bound how much any one host contributes to the
    corpus, the standard hot-domain defense alongside the salted
    uniqueness check).

    A semantic wrapper over :func:`take_token_budget` with unit
    weights: with every row costing 1 token and every stratum budgeted
    ``cap``, "keep while the running total of preceding kept rows is
    below budget" is exactly "keep the first ``cap`` rows per stratum".
    That inherits the two-stage bucket-prefix shape: per-stratum bucket
    counts -> driver boundary lookup -> row-level window ONLY over each
    stratum's boundary bucket, so a hot domain with 20% of the corpus
    never funnels through one sort — the exact skew this cap exists to
    contain.  Raise ``bucket_hex`` as corpus/cap grow so the boundary
    slice stays small.

    NULL ids are excluded (cannot be ordered deterministically); a NULL
    stratum is its own capped group (unlike :func:`temperature_mix`,
    which must EXCLUDE null sources because they have no quota weight —
    a cap needs none).  The DuckDB oracle replays the selection with a
    per-stratum ``row_number`` window over the same md5-prefix order.
    """
    if cap < 0:
        raise ValueError("cap must be >= 0")
    out = take_token_budget(
        df.withColumn("__one", F.lit(1)), id_col, "__one",
        strata_col=strata_col, budgets={}, default_budget=int(cap),
        bucket_hex=bucket_hex)
    return out.drop("__one")


def take_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int | None = None,
    *,
    strata_col: str | None = None,
    budgets: dict | None = None,
    default_budget: int = 0,
    bucket_hex: int = 2,
) -> DataFrame:
    """Deterministic token-budget selection — the "mix to N tokens per
    language/domain" step of a training-data pipeline.

    Rows are ordered by ``(md5(id), id)`` within each stratum (the same
    engine-portable order as ``stratified_sample(mode="exact")``) and
    kept while the running token total of the PRECEDING kept rows is
    below the stratum's budget: keep iff ``cum - tokens < budget`` with
    ``cum`` the inclusive running sum.  The selection therefore always
    takes at least one document of a non-empty stratum with a positive
    budget, and overshoots by less than one document's tokens.  Same
    inputs -> same selection on any cluster size or engine.

    Call with either a global ``budget`` or ``strata_col`` +
    ``budgets`` (stratum value -> budget; unlisted strata get
    ``default_budget``, so the default mix DROPS unlisted strata).

    NULL ids and NULL token counts cannot be ordered/budgeted
    deterministically and are excluded (mirror of ``downsample``'s NULL
    policy).  Negative token counts are likewise EXCLUDED, not raised
    on — a filter cannot raise; validate token counts upstream if a
    negative sentinel must be loud.

    Scale shape (the 10^12-row argument): a naive per-stratum window
    cumsum sorts EVERY stratum end-to-end.  Instead the md5 key's first
    ``bucket_hex`` hex chars split each stratum into ``16**bucket_hex``
    uniform buckets; one ``groupBy(stratum, bucket)`` computes bucket
    token sums (map-side combine, driver sees strata x buckets rows),
    the driver finds each stratum's BOUNDARY bucket by running total,
    and the exact row-level cumsum window runs ONLY over boundary-bucket
    rows — ~1/16**bucket_hex of the corpus; everything before the
    boundary is kept by a pure bucket-prefix filter, everything after is
    dropped the same way.  Raise ``bucket_hex`` (e.g. 4 -> 65,536
    buckets) as the corpus grows so the boundary slice stays small.
    """
    if (budget is None) == (budgets is None):
        raise ValueError("pass exactly one of budget= or budgets=")
    if budgets is not None and strata_col is None:
        raise ValueError("budgets= requires strata_col=")
    if not 1 <= bucket_hex <= 8:
        raise ValueError("bucket_hex must be in [1, 8]")
    for b in ([budget] if budget is not None else
              [default_budget, *budgets.values()]):
        if b is None or b < 0:
            raise ValueError("budgets must be non-negative integers")

    stratum = (F.col(strata_col) if strata_col is not None
               else F.lit(0)).alias("__stratum")
    key = _hash_key(F.col(id_col))
    data = (df.withColumn("__stratum", stratum)
              .withColumn("__key", key)
              .withColumn("__bkt", F.substring(key, 1, bucket_hex))
              .where(F.col(id_col).isNotNull()
                     & F.col(token_col).isNotNull()
                     & (F.col(token_col) >= 0)))

    sums = (data.groupBy("__stratum", "__bkt")
            .agg(F.sum(F.col(token_col).cast("long")).alias("__tok"))
            .collect())
    per_stratum: dict = {}
    for r in sums:
        per_stratum.setdefault(r["__stratum"], []).append(
            (r["__bkt"], r["__tok"]))

    def budget_of(s):
        if budget is not None:
            return int(budget)
        return int(budgets.get(s, default_budget))

    # (stratum, boundary_bucket, tokens_before_boundary, budget); a
    # stratum whose total never reaches its budget has no boundary row
    # -> every bucket passes the prefix filter
    boundary_rows = []
    for s, buckets in per_stratum.items():
        b = budget_of(s)
        if b == 0:
            boundary_rows.append((s, "", 0, 0))  # "" sorts before any bkt
            continue
        cum = 0
        boundary = None
        for bkt, tok in sorted(buckets):
            if cum + tok >= b:
                boundary = (s, bkt, cum, b)
                break
            cum += tok
        if boundary is not None:
            boundary_rows.append(boundary)

    if not boundary_rows:
        return data.drop("__stratum", "__key", "__bkt")

    spark = df.sparkSession
    # the boundary frame's stratum type must MATCH the data's (int/date/
    # decimal strata crash createDataFrame against a hardcoded 'string')
    stype = data.schema["__stratum"].dataType.simpleString()
    bdf = spark.createDataFrame(
        boundary_rows,
        f"__stratum {stype}, __bb string, __base long, __budget long")
    joined = data.join(F.broadcast(bdf), data["__stratum"].eqNullSafe(
        bdf["__stratum"]), "left").drop(bdf["__stratum"])

    aux = ["__stratum", "__key", "__bkt", "__bb", "__base", "__budget"]
    # no boundary row for this stratum -> total < budget -> keep all
    before = joined.where(F.col("__bb").isNull()
                          | (F.col("__bkt") < F.col("__bb"))).drop(*aux)
    w = (Window.partitionBy("__stratum")
         .orderBy(F.col("__key").asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    at = (joined.where(F.col("__bkt") == F.col("__bb"))
          .withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
          .where(F.col("__base") + F.col("__cum") - F.col(token_col)
                 < F.col("__budget"))
          .drop("__cum", *aux))
    return before.unionByName(at)
