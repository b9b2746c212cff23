"""Unit tests for domain-blocklist URL filtering (operators/urlfilter.py):
suffix vs exact matching, case handling, userinfo/port/IPv6 hosts,
deterministic matched_domain, max_labels bound, and the JVM-only plan.
"""

import pytest
from pyspark.sql import functions as F

from spark_schema_guard.operators.urlfilter import blocked_urls, filter_blocked


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        (1, "https://ads.tracker.example/x"),     # suffix match
        (2, "https://TRACKER.example/y"),         # host case-folded
        (3, "https://ok.example/z"),              # no match
        (4, "https://user:pw@sub.bad.org:8443/a"),  # userinfo+port stripped
        (5, "not a url"),                          # non-URL -> never blocked
        (6, "https://[::1]:8080/ipv6"),            # IP literal exact match
        (7, "https://racker.example/t"),           # NOT a label suffix
        (8, None),                                 # NULL url -> never blocked
    ], "id long, url string")


@pytest.fixture(scope="module")
def blocklist(spark):
    return spark.createDataFrame(
        [("tracker.example",), ("BAD.org",), ("[::1]",)], "domain string")


def test_verdicts(corpus, blocklist):
    out = {r["id"]: (r["blocked"], r["matched_domain"])
           for r in blocked_urls(corpus, "id", "url", blocklist).collect()}
    assert out == {
        1: (True, "tracker.example"),
        2: (True, "tracker.example"),
        3: (False, None),
        4: (True, "bad.org"),
        5: (False, None),
        6: (True, "[::1]"),
        7: (False, None),   # 'racker.example' must not match 'tracker.example'
        8: (False, None),
    }


def test_filter_keeps_original_columns(corpus, blocklist):
    kept = filter_blocked(corpus, "id", "url", blocklist)
    assert kept.columns == ["id", "url"]
    assert {r["id"] for r in kept.collect()} == {3, 5, 7, 8}


def test_matched_domain_is_min_of_overlapping_entries(spark):
    df = spark.createDataFrame([(1, "https://a.b.c.example/")],
                               "id long, url string")
    bl = spark.createDataFrame([("c.example",), ("b.c.example",)],
                               "domain string")
    row = blocked_urls(df, "id", "url", bl).first()
    assert row["matched_domain"] == "b.c.example"  # lexicographic min


def test_max_labels_bounds_suffix_enumeration(spark):
    df = spark.createDataFrame([(1, "https://a.b.c.d.tail.example/")],
                               "id long, url string")
    bl = spark.createDataFrame([("tail.example",)], "domain string")
    # with only 2 candidate suffixes ('example', 'tail.example' is the
    # 2-label suffix) the entry still matches; with 1 it cannot
    assert blocked_urls(df, "id", "url", bl,
                        max_labels=2).first()["blocked"] is True
    assert blocked_urls(df, "id", "url", bl,
                        max_labels=1).first()["blocked"] is False
    with pytest.raises(ValueError):
        blocked_urls(df, "id", "url", bl, max_labels=0)


def test_broadcast_false_same_answer(corpus, blocklist):
    b = {r["id"]: r["blocked"]
         for r in blocked_urls(corpus, "id", "url", blocklist).collect()}
    s = {r["id"]: r["blocked"]
         for r in blocked_urls(corpus, "id", "url", blocklist,
                               broadcast=False).collect()}
    assert b == s


def test_plan_is_jvm_only_with_broadcast_probe(corpus, blocklist):
    out = blocked_urls(corpus, "id", "url", blocklist)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_url_features_hand_computed(spark):
    from spark_schema_guard.operators import url_features

    df = spark.createDataFrame(
        [(1, "https://user@Ex.com:8080/a/b/c123?x=1&y=2#frag"),
         (2, "https://clean.org/"),
         (3, "https://bad.net/casino/xxx"),
         (4, "not a url"),
         (5, None),
         (6, "https://h.io")],
        "id long, url string")
    out = {r["id"]: r.asDict()
           for r in url_features(df, "id", "url").collect()}
    r1 = out[1]
    assert r1["host"] == "ex.com"
    assert r1["path_depth"] == 3 and r1["n_query_params"] == 2
    # path+query = '/a/b/c123' + '?x=1&y=2' (fragment excluded): 5
    # digits over 17 chars
    assert r1["digit_frac"] == round(5 / 17, 4)
    assert r1["n_blocked_words"] == 0 and r1["url_ok"] is True
    assert out[2]["path_depth"] == 0 and out[2]["n_query_params"] == 0
    assert out[2]["digit_frac"] == 0.0 and out[2]["url_ok"] is True
    assert out[3]["n_blocked_words"] == 2 and out[3]["url_ok"] is False
    assert out[4]["host"] == "" and out[4]["path_depth"] == 0
    assert all(out[5][k] is None for k in
               ("host", "path_depth", "n_query_params", "digit_frac",
                "url_len", "n_blocked_words", "url_ok"))
    assert out[6]["path_depth"] == 0 and out[6]["digit_frac"] == 0.0
    # empty word list -> everything ok, counts 0
    empty = {r["id"]: r for r in url_features(
        df, "id", "url", blocked_words=()).collect()}
    assert empty[3]["n_blocked_words"] == 0 and empty[3]["url_ok"] is True
    assert empty[5]["url_ok"] is None
