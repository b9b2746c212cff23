"""Domain-blocklist URL filtering — the crawl-hygiene gate every public
web-corpus pipeline runs first (C4 and RefinedWeb both filter against
URL blocklists such as the UT1 list; see Raffel et al. 2020 §2.2,
Penedo et al. 2023 §3.1): a page is dropped when its host equals a
blocked domain OR sits under one (``ads.tracker.example`` is blocked by
``tracker.example``).

Scale shape: the host's domain suffixes are enumerated with
``explode(sequence(...))`` + ``substring_index(host, '.', -k)`` — no
array materialization, no HOF lambdas, pure codegen — multiplying the
stream by the label count (hosts average ~3-4 labels; ``max_labels``
bounds pathological ones). Each suffix probes the blocklist with a
map-side broadcast hash join (UT1-sized lists — a few million short
strings — broadcast comfortably); only matched suffixes shuffle into
the per-doc ``min(domain)`` rollup. With ``broadcast=False`` the probe
becomes a shuffle join on the suffix — near-unique keys except for
popular registered domains, which AQE skew-splitting handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urlnorm import url_host


def blocked_urls(df: DataFrame, id_col: str, url_col: str,
                 blocklist: DataFrame, *, domain_col: str = "domain",
                 broadcast: bool = True, max_labels: int = 10) -> DataFrame:
    """Per-row blocklist verdicts: one output row per input row with
    ``matched_domain`` (the lexicographically smallest blocked domain
    the host equals or sits under — deterministic when several match;
    NULL when none) and ``blocked``.

    Blocklist domains are matched case-insensitively; entries deeper
    than ``max_labels`` labels can never match (raise the bound for
    exotic lists). IP-literal hosts (``[::1]``) only match exact
    blocklist entries — they have no domain hierarchy.
    """
    if max_labels < 1:
        raise ValueError(f"max_labels must be >= 1, got {max_labels}")
    host = url_host(F.col(url_col))
    n_labels = F.size(F.split(host, r"[.]"))
    cand = (
        df.select(F.col(id_col), host.alias("__host"),
                  F.least(n_labels, F.lit(max_labels)).alias("__n"))
          .where(F.col("__host") != "")
          .select(F.col(id_col),
                  F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__k"),
                  F.col("__host"))
          # substring_index(h, '.', -k) = the last k labels = each parent
          # domain of the host, host itself included — suffix enumeration
          # without building an array
          .select(F.col(id_col),
                  F.expr("substring_index(__host, '.', -__k)")
                   .alias("__cand"))
    )
    bl = blocklist.select(F.lower(F.col(domain_col)).alias("__cand")).distinct()
    if broadcast:
        bl = F.broadcast(bl)
    hits = cand.join(bl, "__cand").groupBy(id_col).agg(
        F.min("__cand").alias("matched_domain"))
    return df.join(hits, id_col, "left").withColumn(
        "blocked", F.col("matched_domain").isNotNull())


# generic spam/adult tokens of the kind public crawl pipelines match in
# URLs (C4 §2.2 "bad words" filtering, RefinedWeb URL scoring); plain
# lowercase alpha, regex-metacharacter-free, substring semantics —
# callers curating a serious gate pass their own list
DEFAULT_URL_BLOCKWORDS = ("casino", "poker", "porn", "torrent",
                          "viagra", "warez", "xxx")


def url_features(df: DataFrame, id_col: str, url_col: str, *,
                 blocked_words=DEFAULT_URL_BLOCKWORDS) -> DataFrame:
    """Per-URL quality features — the RefinedWeb-style URL scoring gate
    that complements the domain blocklist: ``host``, ``path_depth``
    (non-empty path segments), ``n_query_params``, ``digit_frac``
    (digit share of path+query — id-mill pages score high), ``url_len``,
    ``n_blocked_words`` (SUBSTRING occurrences of ``blocked_words`` in
    the lowercased URL — the C4 matching rule, with its known
    false-positive caveat), and ``url_ok`` (no blocked word).  NULL
    urls yield NULL features ("unknown").

    Scale shape: pure Column regexp projection fused into the scan —
    zero shuffle, whole-stage codegen; one alternation scan for the
    word list regardless of its size.  Patterns live in the
    Java-RE2-common dialect so a SQL oracle runs the same text."""
    from .urlnorm import _PATH, _QUERY

    u = F.col(url_col)
    path = F.regexp_extract(u, _PATH, 1)
    query = F.regexp_extract(u, _QUERY, 1)
    pq = F.concat(path, query)
    digits = F.length(F.regexp_replace(pq, "[^0-9]", ""))
    # two-arm when with NO otherwise: a NULL url must stay NULL, not
    # fall into the empty-path 0.0 arm
    digit_frac = F.round(
        F.when(F.length(pq) > 0, digits / F.length(pq))
        .when(pq.isNotNull(), F.lit(0.0)), 4)
    if blocked_words:
        n_blocked = F.regexp_count(
            F.lower(u), F.lit("|".join(sorted(blocked_words))))
    else:
        n_blocked = F.when(u.isNotNull(), F.lit(0))
    return df.select(
        F.col(id_col),
        url_host(u).alias("host"),
        F.regexp_count(path, F.lit("/[^/]")).cast("int").alias("path_depth"),
        F.regexp_count(query, F.lit("[?&][^&?]")).cast("int")
         .alias("n_query_params"),
        digit_frac.alias("digit_frac"),
        F.length(u).cast("int").alias("url_len"),
        n_blocked.cast("int").alias("n_blocked_words"),
        (n_blocked == 0).alias("url_ok"))


def filter_blocked(df: DataFrame, id_col: str, url_col: str,
                   blocklist: DataFrame, *, domain_col: str = "domain",
                   broadcast: bool = True, max_labels: int = 10) -> DataFrame:
    """The corpus minus blocked rows (original columns, unchanged)."""
    out = blocked_urls(df, id_col, url_col, blocklist,
                       domain_col=domain_col, broadcast=broadcast,
                       max_labels=max_labels)
    return out.where(~F.col("blocked")).drop("matched_domain", "blocked")


__all__ = ["blocked_urls", "filter_blocked", "url_features",
           "DEFAULT_URL_BLOCKWORDS"]
