"""Table-level operators: stats, uniqueness, referential, drift, dedup,
similarity, text analysis — correctness at test scale (oracle-style checks
computed in plain Python on collected data)."""

import math

import pytest
from pyspark.sql import functions as F

from spark_schema_guard.operators import (
    chi_square_drift, column_profile, duplicate_keys, ks_drift, null_fractions,
    orphan_rows, referential_report, uniqueness_report,
)
from spark_schema_guard.operators.dedup import (
    embedding_near_dups, exact_duplicates, minhash_candidates,
    ngram_jaccard_pairs, simhash_near_dups,
)
from spark_schema_guard.operators.similarity import cosine_topk, cosine_topk_lsh
from spark_schema_guard.operators.textstats import (
    fingerprint, language_guess, quality_features,
)


def test_column_profile(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = {r["column"]: r for r in
            column_profile(df, ["doc_id", "lang", "n_chars"],
                           exact_distinct=True).collect()}
    n = df.count()
    assert prof["doc_id"]["count"] == n
    assert prof["doc_id"]["distinct"] == n
    assert prof["doc_id"]["nulls"] == 0
    langs = {r["lang"] for r in df.select("lang").distinct().collect()}
    assert prof["lang"]["distinct"] == len(langs)
    assert prof["n_chars"]["mean"] == pytest.approx(
        df.agg(F.avg("n_chars")).collect()[0][0])


def test_null_fractions(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (None, None)], "x int, y string")
    out = {r["column"]: r["null_frac"] for r in null_fractions(df).collect()}
    assert out["x"] == pytest.approx(1 / 3)
    assert out["y"] == pytest.approx(2 / 3)


def test_duplicate_keys_salted_equals_plain(spark):
    rows = [(i % 7,) for i in range(100)] + [(99,)]
    df = spark.createDataFrame(rows, "k int").repartition(8)
    salted = {(r["k"], r["dup_count"]) for r in duplicate_keys(df, "k").collect()}
    plain = {(r["k"], r["dup_count"])
             for r in duplicate_keys(df, "k", salted=False).collect()}
    assert salted == plain
    assert all(c > 1 for _, c in salted)
    report = uniqueness_report(df, "k").collect()[0]
    assert report["total_rows"] == 101
    assert report["distinct_keys"] == 8
    assert report["surplus_rows"] == 101 - 8


def test_orphan_rows(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orphans = orphan_rows(orders, customer, "o_custkey", "c_custkey")
    custkeys = {r["c_custkey"] for r in customer.collect()}
    expected = orders.where(~F.col("o_custkey").isin(list(custkeys))
                            & F.col("o_custkey").isNotNull()).count()
    assert orphans.count() == expected
    report = referential_report(orders, customer, "o_custkey", "c_custkey").collect()[0]
    assert report["orphan_rows"] == expected
    assert report["fact_rows"] == orders.count()


def test_chi_square_manual(spark):
    # 2x2 contingency: buckets A/B over values x/y with known counts
    rows = ([("A", "x")] * 30 + [("A", "y")] * 10
            + [("B", "x")] * 20 + [("B", "y")] * 40)
    df = spark.createDataFrame(rows, "bucket string, v string")
    out = chi_square_drift(df, "v", "bucket").collect()[0]
    # manual Pearson: totals row A=40,B=60; col x=50,y=50; N=100
    expected = 0.0
    for (b, v), o in {("A", "x"): 30, ("A", "y"): 10,
                      ("B", "x"): 20, ("B", "y"): 40}.items():
        e = (40 if b == "A" else 60) * 50 / 100
        expected += (o - e) ** 2 / e
    assert out["statistic"] == pytest.approx(expected)
    assert out["dof"] == 1


def test_chi_square_by_unit_manual_and_missing_cells(spark):
    """Per-unit GoF vs the pooled distribution, incl. a unit that never
    saw one of the values (the algebraic missing-cell fold)."""
    from spark_schema_guard.operators import chi_square_by_unit

    rows = ([("u1", "x")] * 30 + [("u1", "y")] * 10
            + [("u2", "x")] * 20 + [("u2", "y")] * 40
            + [("u3", "x")] * 25)  # u3 never sees "y"
    df = spark.createDataFrame(rows, "unit string, v string")
    got = {r["unit"]: r for r in
           chi_square_by_unit(df, "v", "unit").collect()}
    # pooled: x=75, y=50, N=125
    p = {"x": 75 / 125, "y": 50 / 125}
    obs = {"u1": {"x": 30, "y": 10}, "u2": {"x": 20, "y": 40},
           "u3": {"x": 25, "y": 0}}
    for unit, o in obs.items():
        n = sum(o.values())
        expected = sum((o[v] - n * p[v]) ** 2 / (n * p[v]) for v in p)
        assert got[unit]["statistic"] == pytest.approx(expected), unit
        assert got[unit]["n_rows"] == n
        assert got[unit]["dof"] == 1


def test_chi_square_by_unit_file_default(spark, tmp_path):
    """Default unit = input_file_name(): one verdict row per parquet
    file, findable by path."""
    from spark_schema_guard.operators import chi_square_by_unit

    a = spark.createDataFrame([("en",)] * 100 + [("de",)] * 100, "lang string")
    b = spark.createDataFrame([("en",)] * 95 + [("de",)] * 5, "lang string")
    a.coalesce(1).write.parquet(str(tmp_path / "t"), mode="overwrite")
    b.coalesce(1).write.mode("append").parquet(str(tmp_path / "t"))
    df = spark.read.parquet(str(tmp_path / "t"))
    out = chi_square_by_unit(df, "lang").collect()
    assert len(out) == 2
    assert all(r["unit"].startswith("file:") for r in out)
    assert {r["n_rows"] for r in out} == {200, 100}
    # with unequal unit sizes the small skewed file drifts harder from
    # the pooled mix (en 195/300): 39.56 vs 19.78
    by_n = {r["n_rows"]: r["statistic"] for r in out}
    assert by_n[100] == pytest.approx(39.56, abs=0.01)
    assert by_n[200] == pytest.approx(19.78, abs=0.01)
    assert all(r["dof"] == 1 for r in out)


def test_psi_by_unit_manual(spark):
    """PSI against the pooled mix, incl. a never-seen value clamped to
    eps."""
    import math

    from spark_schema_guard.operators import psi_by_unit

    rows = ([("u1", "x")] * 60 + [("u1", "y")] * 40
            + [("u2", "x")] * 90 + [("u2", "y")] * 9 + [("u2", "z")] * 1)
    df = spark.createDataFrame(rows, "unit string, v string")
    got = {r["unit"]: r for r in psi_by_unit(df, "v", "unit").collect()}
    pool = {"x": 150 / 200, "y": 49 / 200, "z": 1 / 200}
    obs = {"u1": {"x": 60, "y": 40, "z": 0}, "u2": {"x": 90, "y": 9, "z": 1}}
    for unit, o in obs.items():
        n = sum(o.values())
        psi = sum((max(o[v] / n, 1e-6) - max(pool[v], 1e-6))
                  * math.log(max(o[v] / n, 1e-6) / max(pool[v], 1e-6))
                  for v in pool)
        assert got[unit]["psi"] == pytest.approx(psi), unit
        assert got[unit]["n_rows"] == n


def test_ks_by_unit_manual(spark):
    """Per-unit binned KS vs the pooled CDF on an explicit grid; the
    shifted unit's statistic is the known CDF gap."""
    from spark_schema_guard.operators import ks_by_unit

    rows = ([("u1", float(i % 10)) for i in range(100)]         # uniform 0-9
            + [("u2", float(i % 10) + 5.0) for i in range(100)])  # shifted +5
    df = spark.createDataFrame(rows, "unit string, v double")
    grid = [2.5, 5.0, 7.5, 10.0, 12.5]
    got = {r["unit"]: r for r in
           ks_by_unit(df, "v", "unit", grid=grid).collect()}
    # manual: bucket = #grid points <= v; cdf per unit and pooled
    from collections import Counter

    def cdf(vals):
        c = Counter(sum(1 for q in grid if q <= v) for v in vals)
        out, acc = {}, 0
        for b in range(len(grid) + 1):
            acc += c.get(b, 0)
            out[b] = acc / len(vals)
        return out

    u1 = [float(i % 10) for i in range(100)]
    u2 = [float(i % 10) + 5.0 for i in range(100)]
    pool = cdf(u1 + u2)
    for unit, vals in (("u1", u1), ("u2", u2)):
        expected = max(abs(cdf(vals)[b] - pool[b]) for b in pool)
        assert got[unit]["statistic"] == pytest.approx(expected), unit
        assert got[unit]["n_rows"] == 100


def test_ks_exact_and_grid(spark):
    left = [(float(i), True) for i in range(1000)]
    right = [(float(i) + 300.0, False) for i in range(1000)]
    df = spark.createDataFrame(left + right, "v double, g boolean")
    exact = ks_drift(df, "v", "g", mode="exact").collect()[0]
    grid = ks_drift(df, "v", "g", mode="grid", grid_size=128).collect()[0]
    assert exact["statistic"] == pytest.approx(0.3, abs=0.01)
    assert grid["statistic"] == pytest.approx(0.3, abs=0.05)
    # nearly-identical distributions (even vs odd values interleave, CDF
    # step gap is exactly 1/50 per group)
    same = spark.createDataFrame(
        [(float(i % 100), i % 2 == 0) for i in range(2000)], "v double, g boolean")
    assert ks_drift(same, "v", "g", mode="exact").collect()[0]["statistic"] <= 0.02 + 1e-9


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "aaa")],
        "doc_id int, text string")
    groups = exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 3, 5]


NEAR_DUP_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (3, "completely different text about spark schema validation engines"),
    (4, "another unrelated document mentioning parquet shuffle partitions"),
    (5, "the quick brown fox jumps over the lazy dog again and again today"),
]


def test_minhash_candidates(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "doc_id int, text string")
    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_candidates(df, "doc_id", "text",
                                         num_hashes=16, bands=8).collect()}
    assert (1, 5) in pairs  # identical
    assert (1, 2) in pairs or (2, 5) in pairs  # near-dup
    assert (3, 4) not in pairs


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "doc_id int, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df, "doc_id", "text",
                                          threshold=0.5).collect()}
    assert pairs[(1, 5)] == pytest.approx(1.0)
    assert (1, 2) in pairs
    assert all(j <= 1.0 for j in pairs.values())


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "doc_id int, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dups(df, "doc_id", "text",
                                        bits=32, max_hamming=4).collect()}
    assert pairs[(1, 5)] == 0
    assert (3, 4) not in pairs


def test_embedding_near_dups_and_topk(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = df.limit(50)
    local = {r["vec_id"]: r["embedding"] for r in sample.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    queries = [(qid, local[qid]) for qid in sorted(local)[:3]]
    got = cosine_topk(sample, "vec_id", "embedding", queries, k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for qid, vec in queries:
        sims = sorted(((cos(vec, v), -i) for i, v in local.items() if i != qid),
                      reverse=True)
        expected_top = [-x[1] for x in sims[:3]]
        mine = [nid for _, nid, _ in sorted(by_query[qid])]
        assert mine == expected_top

    # LSH path: candidates are a pruned subset scored identically — each
    # returned cosine must match the exact computation, ranks contiguous.
    # (Recall guarantees need closer-than-random data; structural checks
    # only here.)
    lsh = cosine_topk_lsh(sample, "vec_id", "embedding", queries, k=3,
                          n_planes=4, multiprobe=2).collect()
    assert lsh, "LSH returned no candidates at all"
    for r in lsh:
        expected_cos = cos(dict(queries)[r["query_id"]], local[r["neighbor_id"]])
        assert r["cosine"] == pytest.approx(expected_cos, abs=1e-6)
        assert 1 <= r["rank"] <= 3


def test_embedding_near_dups_blocked(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(80)
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(df, "vec_id", "embedding", threshold=0.8,
                                 exact=True).collect()}
    blocked = {(r["id_a"], r["id_b"]) for r in
               embedding_near_dups(df, "vec_id", "embedding", threshold=0.8,
                                   block_bits=2).collect()}
    assert blocked <= exact  # blocking only prunes
    import pytest as _pytest
    with _pytest.raises(ValueError):
        embedding_near_dups(df, "vec_id", "embedding", block_bits=0)


def test_textstats(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is here to see the end of it"),
         (2, "der hund ist nicht der beste und die katze"),
         (3, ""),
         (4, "12345 67890 !!!")],
        "doc_id int, text string")
    q = {r["doc_id"]: r for r in quality_features(df, "doc_id", "text").collect()}
    assert q[1]["n_tokens"] == 13
    assert q[3]["n_tokens"] == 0
    assert q[1]["quality_score"] > q[4]["quality_score"]
    langs = {r["doc_id"]: r["lang_guess"]
             for r in language_guess(df, "doc_id", "text").collect()}
    assert langs[1] == "en"
    assert langs[2] == "de"
    fps = {r["doc_id"]: r["fingerprint"]
           for r in fingerprint(df, "doc_id", "text").collect()}
    assert len(set(fps.values())) == 4


def test_connected_components(spark):
    from spark_schema_guard.operators.dedup import connected_components

    # two components {1,2,3} and {5,6}; reversed/duplicate edges collapse
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6), (3, 2)], "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_connected_components_long_path(spark):
    from spark_schema_guard.operators.dedup import connected_components

    # a 41-node path: pure neighbor propagation needs 40 rounds; the
    # pointer-jumping (id<->label) edges must converge far faster
    # (driver_max_edges=0 pins the DISTRIBUTED loop, not the shortcut)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long")
    comp = connected_components(edges, max_iter=10,
                                driver_max_edges=0).collect()
    assert len(comp) == 41
    assert {r["component"] for r in comp} == {0}


def test_duplicate_clusters_resolution(spark):
    from spark_schema_guard.operators.dedup import duplicate_clusters

    df = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 6, 9]], "doc_id long")
    edges = spark.createDataFrame([(2, 1), (2, 3), (5, 6)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in duplicate_clusters(df, "doc_id", edges).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_canonical"]
    assert rows[2]["cluster_id"] == 1 and not rows[2]["is_canonical"]
    assert rows[3]["cluster_id"] == 1 and not rows[3]["is_canonical"]
    assert rows[5]["cluster_id"] == 5 and rows[5]["is_canonical"]
    assert rows[6]["cluster_id"] == 5 and not rows[6]["is_canonical"]
    # a row without any edge is its own (canonical) singleton cluster
    assert rows[9]["cluster_id"] == 9 and rows[9]["is_canonical"]
    kept = [r for r in rows.values() if r["is_canonical"]]
    assert sorted(r["doc_id"] for r in kept) == [1, 5, 9]


def test_duplicate_clusters_end_to_end_exact(spark):
    """Full dedup pipeline: exact-dup groups -> edges -> clusters."""
    from spark_schema_guard.operators.dedup import (
        duplicate_clusters, exact_duplicates)

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        "doc_id long, text string")
    groups = exact_duplicates(df, "doc_id", "text")
    edges = groups.select(
        F.element_at("doc_ids", 1).alias("id_a"),
        F.explode(F.slice("doc_ids", 2, 1000000)).alias("id_b"))
    out = duplicate_clusters(df, "doc_id", edges)
    canon = sorted(r["doc_id"] for r in out.collect() if r["is_canonical"])
    assert canon == [1, 2, 5]


def test_normalize_url(spark):
    from spark_schema_guard.operators import normalize_url

    cases = [
        # (raw, expected canonical)
        ("HTTPS://Example.COM/A/b?Q=1#frag", "https://example.com/A/b?Q=1"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com:80/x", "https://example.com:80/x"),
        ("https://host", "https://host/"),
        ("https://host?q=2", "https://host/?q=2"),
        ("https://host#only-frag", "https://host/"),
        ("https://host/p?a=1&B=2", "https://host/p?a=1&B=2"),  # query kept
        ("wss://Host:443/s", "wss://host/s"),
        ("not a url at all", "not a url at all"),              # passthrough
        ("ftp://Host:21/f", "ftp://host:21/f"),                # unknown default
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = {r["url"]: r["norm"] for r in
           df.select("url", normalize_url("url").alias("norm")).collect()}
    for raw, want in cases:
        assert got[raw] == want, f"{raw!r}: got {got[raw]!r}, want {want!r}"
    # pure projection: no exchange, no Python
    plan = df.select(normalize_url("url"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_duplicate_urls_normalized(spark):
    from spark_schema_guard.operators import duplicate_urls_normalized

    rows = [("https://a.com/x",), ("HTTPS://A.com:443/x#f",),
            ("https://a.com/y",), ("https://b.com/",), ("https://b.com",)]
    df = spark.createDataFrame(rows, "url string")
    got = {r["norm_url"]: r["dup_count"]
           for r in duplicate_urls_normalized(df).collect()}
    assert got == {"https://a.com/x": 2, "https://b.com/": 2}


def test_heavy_hitters(spark):
    from spark_schema_guard.operators import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1 + [(None,)],
        "v string")
    top = heavy_hitters(df, "v", k=3).collect()
    assert [(r["rank"], r["value"], r["n_rows"]) for r in top] == [
        (1, "a", 5), (2, "b", 3), (3, "c", 3)]  # tie b/c broken by value asc
    assert top[0]["share"] == pytest.approx(5 / 12)
    capped = heavy_hitters(df, "v", k=10, min_share=0.25).collect()
    assert [r["value"] for r in capped] == ["a", "b", "c"]


def test_domain_skew(spark, sf_dir):
    from spark_schema_guard.operators import domain_skew
    from spark_schema_guard.webgen import web_pages

    web = web_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    top = domain_skew(web, "url", k=3).collect()
    # webgen plants uid%5==0 on hot.example.com -> ~20% share, rank 1
    assert top[0]["value"] == "hot.example.com"
    assert top[0]["share"] == pytest.approx(0.2, abs=0.02)
    assert top[0]["rank"] == 1
    for r in top[1:]:
        assert r["n_rows"] <= top[0]["n_rows"]


def test_downsample_deterministic_and_unbiased(spark, sf_dir):
    from spark_schema_guard.operators import downsample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    s1 = downsample(docs, "doc_id", 0.4)
    s2 = downsample(docs.repartition(7), "doc_id", 0.4)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # partition-layout independent
    assert abs(len(ids1) / n - 0.4) < 0.1
    assert downsample(docs, "doc_id", 1.0).count() == n
    assert downsample(docs, "doc_id", 0.0).count() == 0


def test_stratified_sample_modes(spark, sf_dir):
    from spark_schema_guard.operators import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {r["lang"]: r["n"] for r in
                docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    fr = {"en": 1.0, "de": 0.5}

    hashed = stratified_sample(docs, "lang", fr, "doc_id", mode="hash")
    got = {r["lang"]: r["n"] for r in
           hashed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("en") == per_lang["en"]          # fraction 1.0 keeps all
    assert "fr" not in got and "es" not in got      # default 0.0 drops
    assert abs(got.get("de", 0) / per_lang["de"] - 0.5) < 0.2

    import math
    exact = stratified_sample(docs, "lang", fr, "doc_id", mode="exact")
    gote = {r["lang"]: r["n"] for r in
            exact.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert gote["en"] == per_lang["en"]
    assert gote["de"] == math.ceil(0.5 * per_lang["de"])  # exact quota
    # exact mode is also layout-deterministic
    again = stratified_sample(docs.repartition(5), "lang", fr, "doc_id",
                              mode="exact")
    assert sorted(r["doc_id"] for r in exact.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_connected_components_nonconvergence_raises(spark):
    from spark_schema_guard.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long")
    # driver_max_edges=0 forces the iterative path (the adaptive driver
    # union-find shortcut always converges)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, driver_max_edges=0).collect()
    # partial refinement accepted when explicitly requested
    partial = connected_components(edges, max_iter=1, strict=False,
                                   driver_max_edges=0).collect()
    assert len(partial) == 41
    # an empty edge list converges trivially (NULL change-sum = 0)
    empty = edges.sparkSession.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_connected_components_adaptive_paths_agree(spark):
    from spark_schema_guard.operators.dedup import connected_components

    # mixed shapes: clique, path, singletons-with-self-loops filtered
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 13),
         (20, 21), (5, 5), (None, 7)],
        "id_a long, id_b long")
    driver = {(r["id"], r["component"])
              for r in connected_components(edges).collect()}
    dist = {(r["id"], r["component"])
            for r in connected_components(
                edges, driver_max_edges=0,
                contract_max_edges=0).collect()}
    assert driver == dist
    # contraction finish (the default distributed strategy): forced to
    # trigger by contracting from round 1 with a roomy cap, and forced
    # NOT to fit with a cap of 1 — all three ways must agree exactly
    contracted = {(r["id"], r["component"])
                  for r in connected_components(
                      edges, driver_max_edges=0,
                      contract_after_rounds=0).collect()}
    assert contracted == driver
    tiny_cap = {(r["id"], r["component"])
                for r in connected_components(
                    edges, driver_max_edges=0, contract_after_rounds=0,
                    contract_max_edges=1).collect()}
    assert tiny_cap == driver
    assert (3, 1) in driver and (13, 10) in driver and (21, 20) in driver
    # threshold boundary: exactly at the limit still uses one collect
    small = connected_components(edges, driver_max_edges=7).collect()
    assert {(r["id"], r["component"]) for r in small} == driver
    # a 60-node path needs many propagation rounds without contraction;
    # with the default finish it must resolve exactly well under that
    path = spark.createDataFrame([(i, i + 1) for i in range(60)],
                                 "id_a long, id_b long")
    got = {(r["id"], r["component"])
           for r in connected_components(path, driver_max_edges=0,
                                         max_iter=6).collect()}
    assert got == {(i, 0) for i in range(61)}


def test_ivf_topk_recall_and_determinism(spark, sf_dir):
    """IVF ANN: cells partition the corpus (every vector lands in one
    cell), recall@k vs brute force is well above the random-candidate
    floor at nprobe/n_centroids, and results are deterministic."""
    from spark_schema_guard.operators.similarity import (
        cosine_topk, cosine_topk_ivf, ivf_centroids)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvecs = {r["vec_id"]: r["embedding"]
             for r in emb.where(F.col("vec_id") < 3).collect()}
    queries = [(qid, qvecs[qid]) for qid in sorted(qvecs)]

    cents = ivf_centroids(emb, "vec_id", "embedding", 16)
    assert len(cents) == 16 and len({c for c, _ in cents}) == 16

    brute = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, "vec_id", "embedding",
                                  queries, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in cosine_topk_ivf(emb, "vec_id", "embedding", queries,
                                    k=5, n_centroids=16, nprobe=4).collect()}
    recall = len(brute & ivf) / len(brute)
    # probing 4/16 cells scans ~25% of the corpus; near-neighbors
    # concentrate in the query's own cells, so recall must beat the
    # random-scan floor (embeddings here are RANDOM vectors — the worst
    # case for IVF, whose cells assume cluster structure — so the floor
    # is the honest bound; measured 0.47-0.73 across the sf dirs)
    assert recall >= 0.3, recall
    again = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk_ivf(emb, "vec_id", "embedding", queries,
                                      k=5, n_centroids=16, nprobe=4).collect()}
    assert again == ivf
    # nprobe = n_centroids degenerates to exact brute-force
    full = {(r["query_id"], r["neighbor_id"])
            for r in cosine_topk_ivf(emb, "vec_id", "embedding", queries,
                                     k=5, n_centroids=16,
                                     nprobe=16).collect()}
    assert full == brute


def test_repetition_features_hand_computed(spark):
    from spark_schema_guard.operators.textstats import repetition_features

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x"), (3, ""), (4, "u v w u v")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict()
            for r in repetition_features(df, "doc_id", "text").collect()}
    # doc 1 bigrams: [ab, ba, ab, ba] -> top 2/4, dup 1 - 2/4
    assert rows[1]["top2gram_frac"] == 0.5
    assert rows[1]["dup2gram_frac"] == 0.5
    # doc 1 trigrams: [aba, bab, aba] -> top 2/3, dup 1 - 2/3
    assert rows[1]["top3gram_frac"] == round(2 / 3, 4)
    assert rows[1]["dup3gram_frac"] == round(1 - 2 / 3, 4)
    # doc 4 bigrams: [uv, vw, wu, uv] -> top 2/4, dup 1 - 3/4
    assert rows[4]["top2gram_frac"] == 0.5
    assert rows[4]["dup2gram_frac"] == 0.25
    # too short / blank docs report zeros, not nulls
    for d in (2, 3):
        assert rows[d]["top2gram_frac"] == 0.0
        assert rows[d]["dup3gram_frac"] == 0.0
    assert rows[1]["n_tokens"] == 5 and rows[3]["n_tokens"] == 0
    # unigrams work (n=1 has no lead column); bad ns raise
    uni = {r["doc_id"]: r.asDict()
           for r in repetition_features(df, "doc_id", "text",
                                        ns=(1,)).collect()}
    assert uni[1]["top1gram_frac"] == 0.6    # "a" 3 of 5
    assert uni[1]["dup1gram_frac"] == 0.6    # 1 - 2/5
    with pytest.raises(ValueError):
        repetition_features(df, "doc_id", "text", ns=())
    with pytest.raises(ValueError):
        repetition_features(df, "doc_id", "text", ns=(0, 2))


def test_repetition_features_python_oracle(spark, sf_dir):
    from collections import Counter

    from spark_schema_guard.operators.textstats import repetition_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    got = {r["doc_id"]: r.asDict()
           for r in repetition_features(docs, "doc_id", "text").collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = row["text"].strip().lower().split()
        for n in (2, 3):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            top = max(c.values()) / len(grams) if grams else 0.0
            dup = 1 - len(c) / len(grams) if grams else 0.0
            # Spark rounds half-up; Python round() is half-even
            assert got[row["doc_id"]][f"top{n}gram_frac"] == \
                pytest.approx(top, abs=5.1e-5)
            assert got[row["doc_id"]][f"dup{n}gram_frac"] == \
                pytest.approx(dup, abs=5.1e-5)


def test_ngram_decontaminate(spark):
    from spark_schema_guard.operators import ngram_decontaminate

    bench = spark.createDataFrame(
        [(1, "p q r s t u v w x y")], ["bid", "text"])
    docs = spark.createDataFrame(
        [(1, "zz p q r s t u v w x yy"),   # shares two 8-grams
         (2, "none of these words overlap the benchmark corpus at all ok"),
         (3, "p q r s t u v")],            # 7 tokens: too short for n=8
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in ngram_decontaminate(
               docs, "doc_id", "text", bench, "text", n=8).collect()}
    assert out[1] == {"doc_id": 1, "n_matched_ngrams": 2,
                      "contaminated": True}
    assert out[2]["n_matched_ngrams"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_matched_ngrams"] == 0 and not out[3]["contaminated"]
    # case-insensitive on both sides
    up = spark.createDataFrame([(9, "P Q R S T U V W X y")], ["bid", "text"])
    out_up = ngram_decontaminate(
        docs, "doc_id", "text", up, "text", n=8).collect()
    assert {r["doc_id"] for r in out_up if r["contaminated"]} == {1}
    with pytest.raises(ValueError):
        ngram_decontaminate(docs, "doc_id", "text", bench, "text", n=0)


def test_embedding_decontaminate(spark):
    """Hand-computed + numpy-differential: clones of bench vectors are
    flagged, orthogonal vectors stay clean, malformed / zero-norm
    embeddings get NULL (unknown) verdicts, and counts match a brute
    cosine recompute."""
    import numpy as np

    from spark_schema_guard.operators import embedding_decontaminate

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
         (2, None)],  # unscorable bench rows are dropped, not fatal
        "bid long, embedding array<double>")
    docs = spark.createDataFrame(
        [(10, [2.0, 0.0, 0.0]),     # parallel to bench 0 -> 1 match
         (11, [1.0, 1.0, 0.0]),     # cos .707 to both -> 2 at thr .5
         (12, [0.0, 0.0, 5.0]),     # orthogonal -> clean
         (13, None),                # NULL -> unknown
         (14, [1.0]),               # ragged -> unknown
         (15, [0.0, 0.0, 0.0]),     # zero norm -> unknown
         (16, [float("nan"), 1.0, 1.0])],  # NaN -> unknown
        "doc_id long, embedding array<double>")
    out = {r["doc_id"]: r.asDict() for r in embedding_decontaminate(
        docs, "doc_id", "embedding", bench, "embedding",
        threshold=0.5).collect()}
    assert out[10] == {"doc_id": 10, "n_bench_matches": 1,
                       "contaminated": True}
    assert out[11]["n_bench_matches"] == 2 and out[11]["contaminated"]
    assert out[12] == {"doc_id": 12, "n_bench_matches": 0,
                       "contaminated": False}
    for bad in (13, 14, 15, 16):
        assert out[bad]["n_bench_matches"] is None, bad
        assert out[bad]["contaminated"] is None, bad

    # numpy differential on random vectors, threshold away from ties
    rng = np.random.RandomState(7)
    B = rng.randn(20, 8)
    M = rng.randn(100, 8)
    bdf = spark.createDataFrame(
        [(i, [float(x) for x in B[i]]) for i in range(len(B))],
        "bid long, embedding array<double>")
    mdf = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(len(M))],
        "doc_id long, embedding array<double>")
    got = {r["doc_id"]: r["n_bench_matches"] for r in embedding_decontaminate(
        mdf, "doc_id", "embedding", bdf, "embedding",
        threshold=0.6).collect()}
    S = (M @ B.T) / np.outer(np.linalg.norm(M, axis=1),
                             np.linalg.norm(B, axis=1))
    for i in range(len(M)):
        assert got[i] == int((S[i] >= 0.6).sum()), i

    with pytest.raises(ValueError, match="max_bench"):
        embedding_decontaminate(mdf, "doc_id", "embedding", bdf,
                                "embedding", max_bench=5)
    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0, 0.0])],
        "bid long, embedding array<double>")
    with pytest.raises(ValueError, match="dimension"):
        embedding_decontaminate(mdf, "doc_id", "embedding", ragged,
                                "embedding")
    empty = spark.createDataFrame(
        [(0, None)], "bid long, embedding array<double>")
    with pytest.raises(ValueError, match="well-formed"):
        embedding_decontaminate(mdf, "doc_id", "embedding", empty,
                                "embedding")


def test_chunk_by_sentences(spark):
    """Hand-computed sentence packing: whole sentences only, chunk by
    starting token offset, overflow stays with its start chunk."""
    from spark_schema_guard.operators.textstats import chunk_by_sentences

    docs = spark.createDataFrame(
        [(1, "one two three. four five! six seven eight nine? ten"),
         (2, "a b c d e f g h"),     # no terminators: one sentence
         (3, None),
         (4, "   "),
         (5, "ends with period. ")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["chunk_id"]): r.asDict() for r in
           chunk_by_sentences(docs, "doc_id", "text",
                              chunk_tokens=4).collect()}
    # doc 1 sentences: [3 tok][2 tok][4 tok][1 tok] at starts 0,3,5,9
    # -> chunks 0,0,1,2
    assert out[(1, 0)]["n_sentences"] == 2
    assert out[(1, 0)]["n_chunk_tokens"] == 5  # overflow by one sentence
    assert out[(1, 0)]["chunk_text"] == "one two three. four five!"
    assert out[(1, 1)]["chunk_text"] == "six seven eight nine?"
    assert out[(1, 2)]["chunk_text"] == "ten"
    # one long sentence never splits
    assert out[(2, 0)]["n_sentences"] == 1
    assert out[(2, 0)]["n_chunk_tokens"] == 8
    # NULL / blank docs produce no chunks
    assert not any(k[0] in (3, 4) for k in out)
    # trailing terminator yields no phantom empty sentence
    assert out[(5, 0)]["n_sentences"] == 1
    assert out[(5, 0)]["chunk_text"] == "ends with period."
    with pytest.raises(ValueError):
        chunk_by_sentences(docs, "doc_id", "text", chunk_tokens=0)


def test_domain_report_hand_computed(spark):
    from spark_schema_guard.operators import domain_report
    from spark_schema_guard.operators.textstats import quality_features

    rows = [
        (1, "https://a.com/x", "the cat and the dog is here to see it", "en"),
        (2, "https://a.com/x", "zz", "en"),            # dup url, low q
        (3, "https://A.com/y", "der hund und die katze ist nicht da", "de"),
        (4, "https://b.org/1", "all of the words and the rest", "en"),
        (5, "not a url", "whatever text", "en"),       # host '' bucket
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, "
                                     "text string, lang string")
    out = {r["host"]: r.asDict()
           for r in domain_report(df, "url", "text", "lang").collect()}
    a = out["a.com"]
    assert a["n_pages"] == 3 and a["n_urls"] == 2  # case-folded host
    assert a["n_langs"] == 2
    assert a["top_lang"] == "en"  # 2 en vs 1 de
    assert out["b.org"]["n_pages"] == 1
    assert out[""]["n_pages"] == 1  # non-URL strings group under ''
    # exact-integer quality sum equals the per-doc recompute
    q = {r["doc_id"]: r["quality_score"] for r in quality_features(
        df, "doc_id", "text").collect()}
    assert a["quality_sum_e4"] == sum(
        round(q[i] * 10000) for i in (1, 2, 3))
    assert a["n_low_quality"] == sum(1 for i in (1, 2, 3) if q[i] < 0.5)
    assert a["n_tokens"] == 10 + 1 + 8
    # no lang column -> host stats only
    cols = domain_report(df, "url", "text").columns
    assert "top_lang" not in cols and "n_langs" not in cols


def test_language_consistency(spark):
    """Hand-computed span votes: a bilingual doc flags mixed, a
    monolingual doc doesn't, markerless/NULL text is unknown (NULL)."""
    from spark_schema_guard.operators.textstats import language_consistency

    en = "the cat and the dog is happy to see the end"      # 10 tokens
    de = "der hund und die katze ist nicht froh und nass"   # 10 tokens
    docs = spark.createDataFrame(
        [(1, en + " " + de),     # half en, half de -> mixed
         (2, en + " " + en),     # all en
         (3, "xxxx yyyy zzzz"),  # no markers anywhere -> unknown
         (4, None),
         (5, en)],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in language_consistency(
        docs, "doc_id", "text", n_chunks=2).collect()}
    assert out[1]["langs"] == "de,en" and out[1]["mixed"] is True
    assert out[1]["n_span_langs"] == 2
    assert out[2] == {"doc_id": 2, "langs": "en", "n_span_langs": 1,
                      "mixed": False, "dominant_lang": "en"}
    for unk in (3, 4):
        assert out[unk]["langs"] is None and out[unk]["mixed"] is None, unk
        assert out[unk]["dominant_lang"] is None, unk
    assert out[5]["mixed"] is False and out[5]["dominant_lang"] == "en"
    # dominant: en wins 2 spans vs de 2 spans in a 4-chunk alternating
    # doc -> tie goes to the LAST lang code (the language_guess rule)
    alt = spark.createDataFrame(
        [(9, " ".join([en, de, en, de]))], "doc_id long, text string")
    r = language_consistency(alt, "doc_id", "text", n_chunks=4).collect()[0]
    assert r["mixed"] is True and r["dominant_lang"] == "en"
    with pytest.raises(ValueError):
        language_consistency(docs, "doc_id", "text", n_chunks=0)


def test_encoding_features_and_fix(spark):
    """Hand-computed mojibake/control/NBSP signals and the chained
    literal-replace repair; NULL text -> NULL counts and NULL fix."""
    from spark_schema_guard.operators.textstats import (MOJIBAKE_TABLE,
                                                        encoding_features,
                                                        fix_encoding)

    moji = "cafÃ© â€œquoteâ€™"
    # 'caf' + mojibake e-acute + space + mojibake left dquote + 'quote'
    # + mojibake right squote
    dirty = spark.createDataFrame(
        [(1, moji),
         (2, "bad\u0007ctl\u007f and\u00a0nbsp\ufffd"),
         (3, "perfectly clean ascii"),
         (4, None),
         (5, "\u00c2\u00a0lead")],  # Â+NBSP pair
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in encoding_features(dirty, "doc_id", "text").collect()}
    assert out[1]["n_mojibake"] == 3 and not out[1]["enc_clean"]
    assert out[1]["n_control"] == 0 and out[1]["n_nbsp"] == 0
    assert out[2] == {"doc_id": 2, "n_mojibake": 0, "n_replacement": 1,
                      "n_control": 2, "n_nbsp": 1, "enc_clean": False}
    assert out[3] == {"doc_id": 3, "n_mojibake": 0, "n_replacement": 0,
                      "n_control": 0, "n_nbsp": 0, "enc_clean": True}
    assert all(v is None for k, v in out[4].items() if k != "doc_id")
    assert out[5]["n_mojibake"] == 1  # the Â+NBSP pair counts as mojibake

    fx = {r["doc_id"]: r["fixed_text"]
          for r in fix_encoding(dirty, "doc_id", "text").collect()}
    assert fx[1] == "café “quote’"
    assert fx[2] == "badctl and nbsp"
    assert fx[3] == "perfectly clean ascii"
    assert fx[4] is None
    assert fx[5] == " lead"
    # tab / newline / CR are NOT stripped as controls
    keepws = spark.createDataFrame([(1, "a\tb\nc\rd")],
                                   "doc_id long, text string")
    assert fix_encoding(keepws, "doc_id", "text").collect()[0][
        "fixed_text"] == "a\tb\nc\rd"
    # every table entry round-trips to its intended character
    table_doc = spark.createDataFrame(
        [(i, k) for i, k in enumerate(sorted(MOJIBAKE_TABLE))],
        "doc_id long, text string")
    got = {r["doc_id"]: r["fixed_text"]
           for r in fix_encoding(table_doc, "doc_id", "text").collect()}
    for i, k in enumerate(sorted(MOJIBAKE_TABLE)):
        assert got[i] == MOJIBAKE_TABLE[k], repr(k)


def _naive_bpe(word_counts: dict, n_merges: int):
    """Textbook BPE with a FULL pair recount every round — the slow
    oracle the incremental trainer must match merge-for-merge.  Also
    returns each word's final segmentation for the encode test."""
    words = {w: [*w, "</w>"] for w in word_counts}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        best_n = max(counts.values())
        left, right = min(p for p, n in counts.items() if n == best_n)
        merges.append({"rank": rank, "left": left, "right": right,
                       "n": best_n})
        for w, syms in words.items():
            out = [syms[0]]
            for s in syms[1:]:
                if out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            words[w] = out
    return merges, words


def test_train_bpe_matches_naive_reference(spark):
    """Incremental inverted-index trainer ≡ full-recount textbook BPE on
    a randomized corpus; encode replays training exactly."""
    import random

    from spark_schema_guard.operators import train_bpe
    from spark_schema_guard.operators.bpe import (bpe_encode_word,
                                                  bpe_word_counts)

    rng = random.Random(11)
    vocab = ["the", "then", "than", "that", "aaa", "aaaa", "ab", "ba",
             "abab", "bb", "x", "xyz", "low", "lower", "lowest", "news"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 30))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    wc = {r["word"]: r["n"]
          for r in bpe_word_counts(df, "doc_id", "text").collect()}
    # python-side recount of the word table
    expect_wc = {}
    for _, t in docs:
        for w in t.lower().split():
            expect_wc[w] = expect_wc.get(w, 0) + 1
    assert wc == expect_wc

    for k in (1, 5, 25):
        got = train_bpe(df, "doc_id", "text", n_merges=k)
        want, final_words = _naive_bpe(expect_wc, k)
        assert got == want, k
        if k == 25:
            for w, syms in final_words.items():
                assert bpe_encode_word(w, got) == syms, w


def test_bpe_encode_counts_and_caps(spark):
    from spark_schema_guard.operators import (bpe_encode_counts,
                                              bpe_merges_frame, train_bpe)
    from spark_schema_guard.operators.bpe import (bpe_encode_word,
                                                  bpe_word_counts)

    df = spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "Aa  BB"), (3, None), (4, "   "),
         (5, "cc")],
        "doc_id long, text string")
    merges = train_bpe(df, "doc_id", "text", n_merges=4)
    out = {r["doc_id"]: r.asDict() for r in bpe_encode_counts(
        df, "doc_id", "text", merges).collect()}
    assert out[3] == {"doc_id": 3, "n_words": 0, "n_bpe_tokens": 0}
    assert out[4] == {"doc_id": 4, "n_words": 0, "n_bpe_tokens": 0}
    assert out[2]["n_words"] == 2  # lowercased: aa + bb
    for did, text in [(1, "aa aa aa bb"), (2, "aa bb"), (5, "cc")]:
        expect = sum(len(bpe_encode_word(w, merges))
                     for w in text.lower().split())
        assert out[did]["n_bpe_tokens"] == expect, did

    # merges frame shape + deterministic word-count caps
    mf = bpe_merges_frame(spark, merges)
    assert [f.name for f in mf.schema.fields] == ["rank", "left",
                                                  "right", "n"]
    assert mf.count() == len(merges)
    top = bpe_word_counts(df, "doc_id", "text", max_words=2).collect()
    assert [(r["word"], r["n"]) for r in top] == [("aa", 4), ("bb", 2)]
    only = bpe_word_counts(df, "doc_id", "text", min_count=2).collect()
    assert {r["word"] for r in only} == {"aa", "bb"}

    with pytest.raises(ValueError):
        train_bpe(df, "doc_id", "text", n_merges=0)
    # more requested merges than pairs exist: returns short, no error
    tiny = spark.createDataFrame([(1, "q")], "doc_id long, text string")
    short = train_bpe(tiny, "doc_id", "text", n_merges=50)
    assert 0 < len(short) < 50


def test_ngram_decontaminate_self_corpus(spark, sf_dir):
    """Every benchmark doc with >= n tokens must flag itself; docs sharing
    no n-gram with the bench slice stay clean (plain-Python oracle)."""
    from spark_schema_guard.operators import ngram_decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = {r["doc_id"]: r for r in ngram_decontaminate(
        docs, "doc_id", "text", bench, "text", n=4).collect()}

    bench_rows = bench.select("doc_id", "text").collect()
    bench_grams = set()
    for r in bench_rows:
        toks = r["text"].strip().lower().split()
        bench_grams |= {" ".join(toks[i:i + 4])
                        for i in range(len(toks) - 3)}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].strip().lower().split()
        mine = {" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)}
        expect = len(mine & bench_grams)
        assert out[r["doc_id"]]["n_matched_ngrams"] == expect
        assert out[r["doc_id"]]["contaminated"] is (expect > 0)


def test_pii_features_hand_computed(spark):
    from spark_schema_guard.operators.textstats import pii_features

    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@ex-ample.co.uk or b@x.io, from 10.0.0.1"),
         (2, "clean prose with an at sign @ but no address"),
         (3, "call +44 123 45678 twice: +44 123 45678"),
         (4, None),
         (5, "")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict()
            for r in pii_features(df, "doc_id", "text").collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_ipv4"] == 1
    assert rows[1]["n_phone"] == 0 and rows[1]["pii_free"] is False
    assert rows[2] == {"doc_id": 2, "n_email": 0, "n_ipv4": 0,
                       "n_phone": 0, "pii_free": True}
    assert rows[3]["n_phone"] == 2 and rows[3]["pii_free"] is False
    # NULL text: counts NULL (unknown), never a false "pii_free" claim
    assert rows[4]["n_email"] is None and rows[4]["pii_free"] is None
    assert rows[5]["pii_free"] is True

    red = {r["doc_id"]: r["redacted"]
           for r in pii_features(df, "doc_id", "text",
                                 redact=True).collect()}
    assert red[1] == "mail me at <EMAIL> or <EMAIL>, from <IPV4>"
    assert red[2] == "clean prose with an at sign @ but no address"
    assert red[3] == "call <PHONE> twice: <PHONE>"

    # custom bank replaces the default one entirely
    custom = {r["doc_id"]: r.asDict()
              for r in pii_features(df, "doc_id", "text",
                                    patterns={"ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"}).collect()}
    assert set(custom[1]) == {"doc_id", "n_ssn", "pii_free"}
    assert custom[1]["n_ssn"] == 0 and custom[1]["pii_free"] is True


def test_chunk_documents_hand_computed(spark):
    from spark_schema_guard.operators.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"),   # 10 tokens
         (2, "x y"),                    # shorter than one chunk
         (3, ""), (4, "   "), (5, None)],
        ["doc_id", "text"])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = sorted((r["doc_id"], r["chunk_id"], r["n_chunk_tokens"],
                   r["chunk_text"]) for r in out.collect())
    # stride 3: starts 0,3,6,9 -> ceil(max(10-1,1)/3) = 3 chunks
    assert rows == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),
        (1, 2, 4, "g h i j"),
        (2, 0, 2, "x y"),
    ]
    # overlap=0 partitions exactly; every token appears once
    flat = " ".join(r["chunk_text"] for r in
                    chunk_documents(df.where("doc_id = 1"), "doc_id",
                                    "text", chunk_tokens=3)
                    .orderBy("chunk_id").collect())
    assert flat == "a b c d e f g h i j"
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_take_token_budget_matches_reference_loop(spark):
    import hashlib

    from spark_schema_guard.operators import take_token_budget

    rows = [(i, ["en", "de", "fr", None][i % 4], (i * 7) % 13)
            for i in range(80)]
    # NULL id / NULL tokens are excluded; a zero-token doc is "free"
    rows += [(None, "en", 5), (1000, "en", None), (1001, "zz", 0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, tokens long")
    budgets = {"en": 60, "de": 10 ** 9, "fr": 0}

    def expect():
        per = {}
        for i, lang, tok in rows:
            if i is None or tok is None:
                continue
            key = hashlib.md5(str(i).encode()).hexdigest()[:15]
            per.setdefault(lang, []).append((key, i, tok))
        keep = set()
        for lang, docs in per.items():
            b, cum = budgets.get(lang, 25), 0
            for _, i, tok in sorted(docs):
                if cum < b:  # == cum_inclusive - tok < b
                    keep.add(i)
                cum += tok
        return keep

    want = expect()
    assert want  # the scenario actually selects something
    # bucket_hex must not change the answer: coarse buckets exercise the
    # boundary-window branch, fine buckets make most buckets full-keep
    for bh in (1, 2, 3):
        out = take_token_budget(df, "doc_id", "tokens", strata_col="lang",
                                budgets=budgets, default_budget=25,
                                bucket_hex=bh)
        assert out.columns == df.columns
        assert {r["doc_id"] for r in out.collect()} == want, bh

    # keep-all stratum really keeps all: de rows all present
    de = {i for i, lang, tok in rows
          if lang == "de" and i is not None and tok is not None}
    assert de <= want
    # budget-0 stratum drops everything, incl. zero-token docs
    assert all(lang != "fr" for i, lang, tok in rows if i in want)

    # global (stratum-free) budget against the same loop
    flat = [(i, "x", t) for i, _, t in rows]
    got = {r["doc_id"] for r in take_token_budget(
        spark.createDataFrame(flat, "doc_id long, lang string, tokens long"),
        "doc_id", "tokens", 100).collect()}
    per = sorted((hashlib.md5(str(i).encode()).hexdigest()[:15], i, t)
                 for i, _, t in flat if i is not None and t is not None)
    cum, keep = 0, set()
    for _, i, t in per:
        if cum < 100:
            keep.add(i)
        cum += t
    assert got == keep

    with pytest.raises(ValueError):
        take_token_budget(df, "doc_id", "tokens")  # neither form
    with pytest.raises(ValueError):
        take_token_budget(df, "doc_id", "tokens", 10, budgets={"en": 1},
                          strata_col="lang")  # both forms
    with pytest.raises(ValueError):
        take_token_budget(df, "doc_id", "tokens", budgets={"en": -1},
                          strata_col="lang")
    with pytest.raises(ValueError):
        take_token_budget(df, "doc_id", "tokens", 10, bucket_hex=0)


def test_dedup_lines_matches_reference_loop(spark):
    from spark_schema_guard.operators.dedup import dedup_lines

    docs = [
        (1, "the same long boilerplate line here\nunique alpha\nshort"),
        (2, "unique beta\nthe same long boilerplate line here\nshort"),
        (3, "the same long boilerplate line here\n"
            "the same long boilerplate line here\nunique gamma"),
        (4, ""),          # one empty line, always kept
        (5, None),        # NULL text stays NULL
        (6, "short\nshort\nshort"),  # below min_len: never deduped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    min_len = 10

    def expect():
        seen, out = set(), {}
        for i, text in sorted(docs):  # (id, pos) order == doc order here
            if text is None:
                out[i] = (None, 0, 0)
                continue
            lines = text.split("\n")
            kept = []
            for ln in lines:
                if len(ln) >= min_len:
                    if ln in seen:
                        continue
                    seen.add(ln)
                kept.append(ln)
            out[i] = ("\n".join(kept), len(lines), len(kept))
        return out

    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
           for r in dedup_lines(df, "doc_id", "text",
                                min_len=min_len).collect()}
    want = expect()
    assert got == want
    # the boilerplate survives exactly once, in doc 1 (first occurrence)
    assert got[1][0].startswith("the same long boilerplate")
    assert "boilerplate" not in got[2][0] and "boilerplate" not in got[3][0]
    # a doc can lose a line to ITSELF (doc 3's second copy)
    assert got[3] == ("unique gamma", 3, 1)
    assert got[4] == ("", 1, 1) and got[5] == (None, 0, 0)
    assert got[6] == ("short\nshort\nshort", 3, 3)
    with pytest.raises(ValueError):
        dedup_lines(df, "doc_id", "text", min_len=0)

    # NULL-id rows bypass dedup entirely: their text is untouched, they
    # never claim a first-occurrence slot (doc 2 keeps the shared line),
    # and multiple NULL-id rows stay separate rows
    ndf = spark.createDataFrame(
        [(None, "the same long boilerplate line here\nnull doc unique"),
         (None, "second null doc"),
         (2, "the same long boilerplate line here\ndoc two unique line")],
        "doc_id long, text string")
    nrows = dedup_lines(ndf, "doc_id", "text", min_len=10).collect()
    ngot = sorted(((r["doc_id"], r["text"], r["n_lines"], r["n_kept"])
                   for r in nrows), key=str)
    assert ngot == sorted([
        (None, "the same long boilerplate line here\nnull doc unique", 2, 2),
        (None, "second null doc", 1, 1),
        (2, "the same long boilerplate line here\ndoc two unique line",
         2, 2),
    ], key=str)


def test_strip_boilerplate_hand_computed(spark):
    from spark_schema_guard.operators.dedup import strip_boilerplate

    footer = "(c) example.com"
    docs = [
        # example.com: 3 docs, footer in all 3 (df=3 >= 0.5*3), "Home" in
        # 2 of 3 (df=2 >= 1.5) -> both boilerplate; unique lines survive
        (1, "example.com", f"Home\nalpha body\n{footer}"),
        (2, "example.com", f"Home\nbeta body\n{footer}"),
        (3, "example.com", f"gamma body\n{footer}"),
        # other.net: 2 docs, no line repeats across BOTH docs except
        # "Home" (df=2 >= 0.5*2 AND >= min_docs=2) — group-scoped: the
        # example.com footer appearing once here is NOT boilerplate
        (4, "other.net", f"Home\ndelta body\n{footer}"),
        (5, "other.net", "Home\nepsilon body"),
        # repeated INSIDE one doc only: df counts distinct docs -> kept
        (6, "solo.org", "twice\ntwice\nsolo body"),
        (7, "solo.org", "unrelated"),
        (8, "example.com", None),     # NULL text stays NULL
        (None, "example.com", "null id passes through\nuntouched"),
        (9, None, "null group passes through"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, dom string, text string")
    got = {}
    for r in strip_boilerplate(df, "doc_id", "text", "dom",
                               min_docs=2, min_frac=0.5).collect():
        got[(r["doc_id"], r["dom"])] = (r["text"], r["n_lines"], r["n_kept"])
    assert got[(1, "example.com")] == ("alpha body", 3, 1)
    assert got[(2, "example.com")] == ("beta body", 3, 1)
    assert got[(3, "example.com")] == ("gamma body", 2, 1)
    assert got[(4, "other.net")] == (f"delta body\n{footer}", 3, 2)
    assert got[(5, "other.net")] == ("epsilon body", 2, 1)
    assert got[(6, "solo.org")] == ("twice\ntwice\nsolo body", 3, 3)
    assert got[(7, "solo.org")] == ("unrelated", 1, 1)
    assert got[(8, "example.com")] == (None, 0, 0)
    assert got[(None, "example.com")] == \
        ("null id passes through\nuntouched", 2, 2)
    assert got[(9, None)] == ("null group passes through", 1, 1)
    assert len(got) == len(docs)

    # min_frac=1.0: the NULL-text doc 8 still counts toward example.com's
    # group size (4 docs), so the footer's df=3 no longer clears the bar
    # and every line is kept
    tight = {r["doc_id"]: r["n_kept"]
             for r in strip_boilerplate(df, "doc_id", "text", "dom",
                                        min_docs=2, min_frac=1.0).collect()
             if r["dom"] == "example.com" and r["doc_id"] is not None}
    # 4 example.com docs (incl. the NULL-text one) -> nothing reaches
    # df == 4, so every line is kept
    assert tight == {1: 3, 2: 3, 3: 2, 8: 0}

    with pytest.raises(ValueError):
        strip_boilerplate(df, "doc_id", "text", "dom", min_docs=0)
    with pytest.raises(ValueError):
        strip_boilerplate(df, "doc_id", "text", "dom", min_frac=0.0)


def test_cluster_representatives_and_keep_canonical(spark):
    from spark_schema_guard.operators.dedup import (cluster_representatives,
                                                    keep_canonical)

    members = spark.createDataFrame(
        [
            (1, 100, 10.0),   # cluster 100: 3 -> max score
            (2, 100, 30.0),
            (3, 100, 20.0),
            (4, 200, 5.0),    # cluster 200: tie on score -> min id wins
            (5, 200, 5.0),
            (6, 300, None),   # cluster 300: NULL score loses to scored
            (7, 300, 1.0),
            (8, 400, None),   # all-NULL cluster -> lowest id
            (9, 400, None),
            (None, 500, 9.0),     # NULL id: ignored
            (10, None, 9.0),      # NULL cluster: ignored
        ],
        "id long, cluster_id long, score double")
    reps = {r["cluster_id"]: (r["rep_id"], r["n_members"])
            for r in cluster_representatives(
                members, "id", "cluster_id", score_col="score").collect()}
    assert reps == {100: (2, 3), 200: (4, 2), 300: (7, 2), 400: (8, 2)}

    # score_col=None degrades to keep-lowest-id
    noscore = {r["cluster_id"]: r["rep_id"]
               for r in cluster_representatives(
                   members, "id", "cluster_id").collect()}
    assert noscore == {100: 1, 200: 4, 300: 6, 400: 8}

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 13)], "id long, text string")
    kept = sorted(r["id"] for r in keep_canonical(
        corpus, members, "id", score_col="score").collect())
    # losers 1,3 (cluster 100), 5 (200), 6 (300), 9 (400) are dropped;
    # 10 (NULL cluster), 11, 12 (never clustered) pass through
    assert kept == [2, 4, 7, 8, 10, 11, 12]


def test_suggest_constraints_hand_computed(spark):
    from spark_schema_guard.operators.suggest import suggest_constraints

    df = spark.createDataFrame(
        [
            (1, 2.5, "x", "a,b", "only"),
            (2, -1.0, "y", "c", "only"),
            (None, 7.25, "x", "c", "only"),
            (4, None, None, "c", "only"),
        ],
        "id long, score double, tag string, sep string, solo string")
    got = {r["column"]: r for r in
           suggest_constraints(df, distinct="exact").collect()}
    assert set(got) == {"id", "score", "tag", "sep", "solo"}

    r = got["id"]
    assert (r["spark_type"], r["n_rows"], r["n_nulls"], r["n_distinct"]) \
        == ("bigint", 4, 1, 3)
    assert (r["min_num"], r["max_num"]) == (1.0, 4.0)
    assert r["min_len"] is None and r["enum_vals"] is None
    assert r["required"] is False

    r = got["score"]
    assert (r["min_num"], r["max_num"]) == (-1.0, 7.25)
    assert r["required"] is False and r["enum_vals"] is None

    r = got["tag"]
    assert (r["n_nulls"], r["n_distinct"]) == (1, 2)
    assert (r["min_len"], r["max_len"]) == (1, 1)
    assert r["enum_vals"] == "x,y" and r["required"] is False

    # a value embedding the separator poisons enum eligibility
    r = got["sep"]
    assert r["n_distinct"] == 2 and r["enum_vals"] is None
    assert r["required"] is True

    r = got["solo"]
    assert r["enum_vals"] == "only" and r["required"] is True

    # enum_max bar: tag has 2 distinct -> ineligible at enum_max=1
    tight = {r["column"]: r["enum_vals"] for r in
             suggest_constraints(df, ["tag", "solo"], enum_max=1,
                                 distinct="exact").collect()}
    assert tight == {"tag": None, "solo": "only"}

    # approx mode agrees on tiny data (HLL exact at these cardinalities)
    approx = {(r["column"], r["n_distinct"], r["enum_vals"], r["required"])
              for r in suggest_constraints(df).collect()}
    exact = {(r["column"], r["n_distinct"], r["enum_vals"], r["required"])
             for r in suggest_constraints(df, distinct="exact").collect()}
    assert approx == exact

    # empty input: no rows -> nothing is required, no enums
    empty = {r["column"]: r for r in suggest_constraints(
        spark.createDataFrame([], "id long, tag string"),
        distinct="exact").collect()}
    assert empty["id"]["required"] is False
    assert empty["tag"]["enum_vals"] is None
    assert empty["id"]["n_rows"] == 0

    with pytest.raises(ValueError):
        suggest_constraints(df, ["nope"])
    with pytest.raises(ValueError):
        suggest_constraints(df, distinct="bogus")
    with pytest.raises(ValueError):
        suggest_constraints(df, enum_max=0)


def test_suggested_schema_roundtrip(spark):
    import spark_schema_guard as ssg
    from spark_schema_guard.operators.suggest import suggested_schema

    snapshot = spark.createDataFrame(
        [(i, f"doc number {i:03d}", ["en", "de"][i % 2]) for i in range(20)],
        "doc_id long, text string, lang string")
    mined = suggested_schema(snapshot, distinct="exact")
    assert mined["required"] == ["doc_id", "lang", "text"]
    assert mined["properties"]["lang"]["enum"] == ["de", "en"]
    assert mined["properties"]["doc_id"] == {
        "type": "integer", "minimum": 0, "maximum": 19}
    assert mined["properties"]["text"]["minLength"] == 14

    # the mined contract is CLOSED over the snapshot it was mined from
    plan = ssg.compile_plan(mined, snapshot.schema)
    assert plan.apply(snapshot).where(~F.col("verdict")).count() == 0

    # and it catches drift in a later batch, through BOTH engines
    batch = spark.createDataFrame(
        [(25, "doc number 025", "en"),      # id past mined maximum
         (3, "short", "de"),                # below mined minLength
         (4, "doc number 004", "fr"),       # lang outside mined enum
         (None, "doc number 005", "en")],   # missing required doc_id
        "doc_id long, text string, lang string")
    rules = sorted((r["name"], r["rule"]) for r in
                   plan.violation_rows(batch, keys=["text"]).collect())
    assert rules == [("data", "required"), ("data.doc_id", "maximum"),
                     ("data.lang", "enum"), ("data.text", "minLength")]

    validator = ssg.compile(mined)
    assert validator({"doc_id": 7, "text": "doc number 007", "lang": "de"}) \
        == {"doc_id": 7, "text": "doc number 007", "lang": "de"}
    bad = validator.collect({"doc_id": 25, "text": "doc number 025",
                             "lang": "en"})
    assert [v.rule for v in bad] == ["maximum"]


def test_verify_jaccard_hand_computed(spark):
    from spark_schema_guard.operators.dedup import verify_jaccard

    docs = spark.createDataFrame(
        [(1, "abc"),        # k=2 shingles {ab, bc}
         (2, "abd"),        # {ab, bd}            -> J(1,2) = 1/3
         (3, "abc"),        # {ab, bc}            -> J(1,3) = 1
         (4, "xy"),         # {xy}                -> J(1,4) = 0
         (5, "aabab"),      # {aa, ab, ba} dup 'ab' counted once
         (6, None)],        # unshingleable
        "id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in verify_jaccard(docs, "id", "text", pairs,
                                   shingle_k=2).collect()}
    assert got[(1, 2)] == pytest.approx(1 / 3)
    assert got[(1, 3)] == 1.0
    assert got[(1, 4)] == 0.0
    # {ab,bc} vs {aa,ab,ba}: inter {ab} = 1, union = 4
    assert got[(1, 5)] == pytest.approx(0.25)
    assert (1, 6) not in got and len(got) == 4  # NULL text pair drops

    kept = verify_jaccard(docs, "id", "text", pairs, shingle_k=2,
                          min_jaccard=0.3).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in kept) == [(1, 2), (1, 3)]


def test_minhash_jaccard_estimate_hand_computed(spark):
    from spark_schema_guard.operators.dedup import (minhash_jaccard_estimate,
                                                    minhash_signatures)

    sigs = spark.createDataFrame(
        [(1, 10, 20, 30, 40),
         (2, 10, 20, 31, 41),    # agrees on 2 of 4 with doc 1
         (3, 10, 20, 30, 40)],   # agrees on 4 of 4 with doc 1
        "id long, sig_0 long, sig_1 long, sig_2 long, sig_3 long")
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 9)],
                                  "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard_est"]
           for r in minhash_jaccard_estimate(sigs, pairs).collect()}
    assert got == {(1, 2): 0.5, (1, 3): 1.0}  # unsigned doc 9 drops

    with pytest.raises(ValueError):
        minhash_jaccard_estimate(sigs.select("id"), pairs)

    # identical docs estimate 1.0 through the real signature pipeline
    docs = spark.createDataFrame(
        [(1, "the same text body"), (2, "the same text body")],
        "id long, text string")
    real = minhash_signatures(docs, "id", "text", num_hashes=4, shingle_k=4)
    est = minhash_jaccard_estimate(
        real, spark.createDataFrame([(1, 2)], "id_a long, id_b long"))
    assert est.collect()[0]["jaccard_est"] == 1.0


def test_constraint_drift_hand_computed(spark):
    from spark_schema_guard.operators.suggest import (constraint_drift,
                                                      suggest_constraints)

    old = spark.createDataFrame(
        [(1, 10.0, "x", "aaa", "k", 5),
         (2, 20.0, "y", "bb", "k", 6)],
        "id long, score double, tag string, txt string, gone string, "
        "retyped long")
    new = spark.createDataFrame(
        [(0, 15.0, "x", "c", "5", 1.0, None),
         (3, 18.0, "z", "dddd", "6", 2.0, "fresh")],
        "id long, score double, tag string, txt string, retyped string, "
        "extra double, maybe string")
    a = suggest_constraints(old, distinct="exact")
    b = suggest_constraints(new, distinct="exact")
    got = {(r["finding"], r["column"]):
           (r["breaking"], r["old_num"], r["new_num"], r["detail"])
           for r in constraint_drift(a, b).collect()}

    assert got[("column_removed", "gone")] == (True, None, None, None)
    assert got[("column_added", "extra")] == (False, None, None, None)
    assert got[("column_added", "maybe")] == (False, None, None, None)
    assert got[("type_changed", "retyped")] == \
        (True, None, None, "bigint->string")
    # id: [1,2] -> [0,3] widened both ends (breaking)
    assert got[("min_widened", "id")] == (True, 1.0, 0.0, None)
    assert got[("max_widened", "id")] == (True, 2.0, 3.0, None)
    # score: [10,20] -> [15,18] narrowed both ends (non-breaking)
    assert got[("min_narrowed", "score")] == (False, 10.0, 15.0, None)
    assert got[("max_narrowed", "score")] == (False, 20.0, 18.0, None)
    # txt lengths: [2,3] -> [1,4] widened both ends
    assert got[("minlen_widened", "txt")] == (True, 2.0, 1.0, None)
    assert got[("maxlen_widened", "txt")] == (True, 3.0, 4.0, None)
    # tag enum {x,y} -> {x,z}
    assert got[("enum_values_added", "tag")] == (True, None, None, "z")
    assert got[("enum_values_removed", "tag")] == (False, None, None, "y")
    # txt is low-cardinality on both sides too: {aaa,bb} -> {c,dddd}
    assert got[("enum_values_added", "txt")] == (True, None, None, "c,dddd")
    assert got[("enum_values_removed", "txt")] == \
        (False, None, None, "aaa,bb")
    # no spurious findings beyond the asserted set
    assert len(got) == 14

    # nullability transitions + enum_dropped/enum_gained
    a2 = suggest_constraints(
        spark.createDataFrame([("u", "p"), ("v", None)],
                              "req string, opt string"),
        distinct="exact")
    b2 = suggest_constraints(
        spark.createDataFrame([("u", "p"), (None, "q")],
                              "req string, opt string"),
        enum_max=1, distinct="exact")
    got2 = {(r["finding"], r["column"]): r["breaking"]
            for r in constraint_drift(a2, b2).collect()}
    assert got2[("became_nullable", "req")] is True
    assert got2[("became_required", "opt")] is False
    # req enum {u,v} -> {u} (b2 still eligible: 1 distinct <= enum_max=1)
    assert got2[("enum_values_removed", "req")] is False
    # opt: eligible {p} -> 2 distinct past enum_max=1 -> dropped
    assert got2[("enum_dropped", "opt")] is True

    with pytest.raises(ValueError):
        constraint_drift(a, b.drop("enum_vals"))


def test_token_vocabulary_hand_computed(spark):
    from spark_schema_guard.operators.textstats import token_vocabulary

    df = spark.createDataFrame(
        [(1, "The cat and the dog and THE bird"),
         (2, "a cat, a plan"),
         (3, ""), (4, None), (5, "zebra")],
        "doc_id long, text string")
    rows = token_vocabulary(df, "doc_id", "text", k=3).collect()
    got = [(r["rank"], r["token"], r["n_occurrences"], r["n_docs"])
           for r in rows]
    # the: 3x in doc1; and: 2x in doc1; a: 2x in doc2; "and" < "a"? no:
    # ties broken token ASC -> ("a", 2) before ("and", 2)
    assert got == [(1, "the", 3, 1), (2, "a", 2, 1), (3, "and", 2, 1)]
    shares = {r["token"]: r["share"] for r in rows}
    # 13 non-empty tokens total ("cat," counts as its own token)
    assert shares["the"] == pytest.approx(3 / 13)

    # min_count prunes singletons; case preserved with lowercase=False
    vs = {r["token"]: r["n_occurrences"]
          for r in token_vocabulary(df, "doc_id", "text", k=50,
                                    lowercase=False).collect()}
    assert vs["The"] == 1 and vs["THE"] == 1 and vs["the"] == 1
    only2 = {r["token"] for r in
             token_vocabulary(df, "doc_id", "text", k=50,
                              min_count=2).collect()}
    assert only2 == {"the", "a", "and"}
    with pytest.raises(ValueError):
        token_vocabulary(df, "doc_id", "text", k=0)


def test_assign_splits_deterministic_and_complete(spark):
    import hashlib

    from spark_schema_guard.operators import assign_splits

    df = spark.createDataFrame([(i,) for i in range(2000)] + [(None,)],
                               "doc_id long")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["doc_id"]: r["split"]
           for r in assign_splits(df, "doc_id", weights).collect()}
    assert out[None] is None
    counts = {}
    for i in range(2000):
        counts[out[i]] = counts.get(out[i], 0) + 1
    # every non-null row assigned; proportions near the weights
    assert set(counts) == set(weights)
    assert 0.75 < counts["train"] / 2000 < 0.85
    # the assignment is the documented pure function of md5(id#split)
    for i in (0, 7, 1999):
        key = hashlib.md5(f"{i}#split".encode()).hexdigest()[:15]
        frac = int(key, 16) / 16 ** 15
        want = "train" if frac < 0.8 else ("val" if frac < 0.9 else "test")
        assert out[i] == want, i
    # repartitioning must not move anybody (no RNG anywhere)
    out2 = {r["doc_id"]: r["split"]
            for r in assign_splits(df.repartition(13), "doc_id",
                                   weights).collect()}
    assert out == out2
    # the salt decorrelates from downsample's unsalted hash: a halved
    # corpus still contains ALL THREE splits in ~the same proportions
    # (an unsalted key would put every survivor in 'train')
    from spark_schema_guard.operators import downsample
    kept = {r["doc_id"] for r in downsample(df, "doc_id", 0.5).collect()}
    kept_counts = {}
    for i in kept:
        kept_counts[out[i]] = kept_counts.get(out[i], 0) + 1
    assert set(kept_counts) == set(weights)
    assert 0.7 < kept_counts["train"] / len(kept) < 0.9
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"a": 0.5})
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {})


def test_take_token_budget_randomized_vs_loop(spark):
    """Seeded randomized differential: random token distributions,
    budgets, stratum counts and bucket_hex vs the straightforward
    driver loop — boundary placement must be exact everywhere."""
    import hashlib
    import random

    from spark_schema_guard.operators import take_token_budget

    rng = random.Random(20260818)
    for trial in range(6):
        n = rng.randrange(50, 300)
        langs = [f"s{j}" for j in range(rng.randrange(1, 5))] + [None]
        rows = [(i, rng.choice(langs), rng.randrange(0, 40))
                for i in range(n)]
        budgets = {s: rng.randrange(0, 800)
                   for s in langs[:-1] if rng.random() < 0.8}
        default = rng.randrange(0, 300)
        df = spark.createDataFrame(rows, "i long, s string, t long")
        got = {r["i"] for r in take_token_budget(
            df, "i", "t", strata_col="s", budgets=budgets,
            default_budget=default,
            bucket_hex=rng.choice((1, 2, 3))).collect()}
        per = {}
        for i, s, t in rows:
            per.setdefault(s, []).append(
                (hashlib.md5(str(i).encode()).hexdigest()[:15], i, t))
        want = set()
        for s, docs in per.items():
            b, cum = budgets.get(s, default), 0
            for _, i, t in sorted(docs):
                if cum < b:
                    want.add(i)
                cum += t
        assert got == want, trial


def test_incremental_candidates_matches_self_join(spark):
    """Banding a batch against a frozen index must find exactly the
    cross-slice pairs the symmetric self-join (minhash_candidates over the
    union) finds — the incremental path is a restriction, not a new
    algorithm."""
    from spark_schema_guard.operators.dedup import (incremental_candidates,
                                                    minhash_band_index)

    rows = [(i, t) for i, t in enumerate(
        [t for _, t in NEAR_DUP_DOCS] * 3)]  # 15 docs, heavy dup structure
    df = spark.createDataFrame(rows, "doc_id int, text string")
    corpus = df.where("doc_id < 8")
    batch = df.where("doc_id >= 8")
    kw = dict(num_hashes=16, bands=8)
    index = minhash_band_index(corpus, "doc_id", "text", **kw)
    inc = {(r["doc_id"], r["corpus_id"], r["shared_bands"])
           for r in incremental_candidates(batch, index, "doc_id", "text",
                                           **kw).collect()}
    full = {(max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]),
             r["shared_bands"])
            for r in minhash_candidates(df, "doc_id", "text", **kw).collect()
            if (r["id_a"] < 8) != (r["id_b"] < 8)}
    assert inc == full and inc  # non-trivial and identical


def test_dedup_against_index_keep_and_null_policy(spark):
    """Survivors = batch docs with no strong index match; NULL-text and
    NULL-id rows pass through (a NULL text has no shingle set, so it can
    never be anyone's near-duplicate — in EITHER hash mode)."""
    from spark_schema_guard.operators.dedup import (dedup_against_index,
                                                    minhash_band_index,
                                                    minhash_signatures)

    corpus = spark.createDataFrame(NEAR_DUP_DOCS, "doc_id int, text string")
    batch = spark.createDataFrame(
        [(10, NEAR_DUP_DOCS[0][1]),          # exact dup of corpus doc 1
         (11, "a brand new never seen sentence about watermarks"),
         (12, None),                          # NULL text -> kept
         (None, NEAR_DUP_DOCS[2][1])],        # NULL id -> never bands
        "doc_id int, text string")
    for hash_fn in ("xxhash64", "md5"):
        kw = dict(num_hashes=16, bands=8, hash_fn=hash_fn)
        index = minhash_band_index(corpus, "doc_id", "text", **kw)
        kept = dedup_against_index(batch, index, "doc_id", "text",
                                   min_shared_bands=2, **kw)
        got = {r["doc_id"] for r in kept.collect()}
        assert got == {11, 12, None}, hash_fn
        # NULL text yields NO signature row at all (mode-independent)
        sigs = minhash_signatures(batch.where("doc_id = 12"), "doc_id",
                                  "text", num_hashes=16, hash_fn=hash_fn)
        assert sigs.count() == 0, hash_fn


def test_extraction_check_verdicts(spark):
    """Every verdict branch on hand-built rows; the plan stays a pure
    JVM projection (no Python eval nodes) — extraction is the north
    rule's byte-identity invariant and must be free at scale."""
    from spark_schema_guard.operators.extraction import (
        extraction_check, extraction_report, extracted_text, html_is_utf8)

    rows = [
        (1, b"<html><body><p>hi there</p></body></html>", "hi there"),
        (2, b"<p>one</p>", "two"),                       # mismatch
        (3, None, "orphan text"),                        # missing_html
        (4, b"\xff\xfe\xfdbroken", "broken"),            # undecodable
        (5, b"<p>no extract ran</p>", None),             # missing_text
        (6, b"", ""),                                    # empty html == ''
    ]
    df = spark.createDataFrame(rows, "doc_id int, html binary, text string")
    got = {r["doc_id"]: r["extraction_verdict"]
           for r in extraction_check(df).collect()}
    assert got == {1: "match", 2: "mismatch", 3: "missing_html",
                   4: "undecodable", 5: "missing_text", 6: "match"}

    rep = {r["extraction_verdict"]: (r["n_rows"], r["min_id"], r["max_id"])
           for r in extraction_report(df, id_col="doc_id").collect()}
    assert rep["match"] == (2, 1, 6)
    assert rep["undecodable"] == (1, 4, 4)

    ext = {r["doc_id"]: r["e"] for r in df.select(
        "doc_id", extracted_text("html").alias("e")).collect()}
    assert ext[1] == "hi there" and ext[4] is None and ext[3] is None
    valid = {r["doc_id"]: r["v"] for r in df.select(
        "doc_id", html_is_utf8("html").alias("v")).collect()}
    assert valid == {1: True, 2: True, 3: None, 4: False, 5: True, 6: True}

    plan = extraction_check(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_extraction_custom_extractor_and_no_tags_in_testdata(spark, sf_dir):
    """Caller-supplied extractor Column wins; and the oracle's
    strip(wrap(text)) == text equivalence premise holds on the shipped
    corpora: no document text contains a '<'."""
    from spark_schema_guard.operators.extraction import extraction_check

    df = spark.createDataFrame(
        [(1, b"NOISEhello", "hello")], "doc_id int, html binary, text string")
    checked = extraction_check(
        df, extract=lambda s: F.regexp_replace(s, "^NOISE", ""))
    assert checked.collect()[0]["extraction_verdict"] == "match"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.where(F.col("text").contains("<")).count() == 0


def test_gopher_rules(spark):
    from spark_schema_guard.operators.textstats import gopher_rules

    good = " ".join(["the cat and dog have fun with all of that stuff"] * 6)
    symbols = "### ### ... " + "w " * 60
    bullets = "\n".join(["- item one", "- item two", "* item three",
                         "• item four"])
    ellipsis = "this line ends...\nanother one…\nplain line"
    df = spark.createDataFrame(
        [(1, good), (2, "short text only"), (3, symbols),
         (4, bullets), (5, ""), (6, ellipsis), (7, None)],
        "doc_id int, text string")
    g = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}

    # NULL text -> NULL signals and a NULL keep (module NULL policy)
    assert g[7]["n_tokens"] is None and g[7]["mean_word_len"] is None
    assert g[7]["r_tokens"] is None and g[7]["keep"] is None

    # 66 tokens, mean 222/66 chars, 6 distinct Gopher stopwords -> keep
    assert g[1]["n_tokens"] == 66 and g[1]["n_stop_hits"] == 6
    assert abs(g[1]["mean_word_len"] - round(222 / 66, 4)) < 1e-9
    assert g[1]["keep"] is True
    # too short
    assert g[2]["r_tokens"] is False and g[2]["keep"] is False
    # 7 symbol hits (six '#', one '...') / 63 tokens > 0.1
    assert g[3]["r_symbol"] is False
    assert abs(g[3]["symbol_ratio"] - round(7 / 63, 4)) < 1e-9
    # every line bullet-started -> fraction 1.0 > 0.9
    assert g[4]["bullet_frac"] == 1.0 and g[4]["r_bullet"] is False
    # blank text: zero tokens, zero ratios, rejected
    assert g[5]["n_tokens"] == 0 and g[5]["alpha_frac"] == 0.0
    assert g[5]["keep"] is False
    # 2 of 3 lines end with an ellipsis -> fraction > 0.3
    assert abs(g[6]["ellipsis_frac"] - round(2 / 3, 4)) < 1e-9
    assert g[6]["r_ellipsis"] is False
    # thresholds are honored
    loose = {r["doc_id"]: r for r in gopher_rules(
        df, "doc_id", "text", min_tokens=1, min_stop_hits=0,
        max_bullet_frac=1.0, max_ellipsis_frac=1.0,
        max_symbol_ratio=1.0, min_word_len=0.0, min_alpha_frac=0.0).collect()}
    assert loose[4]["keep"] is True and loose[6]["keep"] is True


def test_temperature_mix(spark, sf_dir):
    import math

    from spark_schema_guard.operators import temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    tau, total = 0.5, 200
    denom = 0.0
    for s in sorted(counts):
        denom += counts[s] ** tau
    expect = {s: min(n, math.ceil(total * (n ** tau) / denom))
              for s, n in counts.items()}

    out = temperature_mix(docs, "doc_id", "lang", total, tau=tau)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expect
    # temperature upweights low-resource langs vs proportional (tau=1)
    prop = {r["lang"]: r["n"] for r in
            temperature_mix(docs, "doc_id", "lang", total, tau=1.0)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    small = min(counts, key=counts.get)
    big = max(counts, key=counts.get)
    assert got[small] >= prop[small] and got[big] <= prop[big]
    # layout-deterministic selection
    again = temperature_mix(docs.repartition(7), "doc_id", "lang", total,
                            tau=tau)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())
    # NULL sources are excluded; zero budget selects nothing
    with_null = docs.unionByName(
        docs.limit(1).withColumn("lang", F.lit(None).cast("string")))
    assert temperature_mix(with_null, "doc_id", "lang", total,
                           tau=tau).where(F.col("lang").isNull()).count() == 0
    assert temperature_mix(docs, "doc_id", "lang", 0).count() == 0
    import pytest
    with pytest.raises(ValueError):
        temperature_mix(docs, "doc_id", "lang", -1)
    with pytest.raises(ValueError):
        temperature_mix(docs, "doc_id", "lang", 10, tau=-0.1)


def test_c4_rules(spark):
    from spark_schema_guard.operators.textstats import c4_rules

    good = "\n".join(["this line has five good words.",
                      'does it end with a quote?',
                      "yet another proper sentence right here!"])
    mixed = "\n".join(["this line has five good words.",
                       "too short.",                      # < 5 words
                       "no terminal punctuation on this line",
                       "enable javascript to view this page."])  # token drop
    lorem = "a fine sentence with words.\nsome Lorem Ipsum filler text."
    brace = "function f() { return 1; } is code.\nplain words end here."
    df = spark.createDataFrame(
        [(1, good), (2, mixed), (3, lorem), (4, brace), (5, None)],
        "doc_id int, text string")
    g = {r["doc_id"]: r for r in c4_rules(df, "doc_id", "text").collect()}

    assert g[1]["n_lines"] == 3 and g[1]["n_kept"] == 3
    assert g[1]["clean_text"] == good and g[1]["keep"] is True
    # only the first line of `mixed` survives -> below min_kept_lines
    assert g[2]["n_kept"] == 1
    assert g[2]["clean_text"] == "this line has five good words."
    assert g[2]["keep"] is False
    # page-level drops are case-insensitive and independent of line keeps
    assert g[3]["has_drop_phrase"] is True and g[3]["keep"] is False
    assert g[4]["has_drop_phrase"] is True and g[4]["keep"] is False
    # NULL text -> NULL signals, NULL keep
    assert g[5]["n_lines"] is None and g[5]["clean_text"] is None
    assert g[5]["has_drop_phrase"] is None and g[5]["keep"] is None
    # thresholds honored: loosen everything and doc 2 passes
    loose = {r["doc_id"]: r for r in c4_rules(
        df, "doc_id", "text", min_words_per_line=0, min_kept_lines=0,
        terminators=tuple(".!?\"'" + "eg"), line_drop_tokens=(),
        page_drop_phrases=()).collect()}
    assert loose[2]["keep"] is True and loose[2]["n_kept"] == 4
    with pytest.raises(ValueError):
        c4_rules(df, "doc_id", "text", min_words_per_line=-1)
    with pytest.raises(ValueError):
        c4_rules(df, "doc_id", "text", terminators=())


def test_cap_per_stratum(spark, sf_dir):
    from pyspark.sql import Window

    from spark_schema_guard.operators import cap_per_stratum

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cap = 5
    out = cap_per_stratum(docs, "doc_id", "lang", cap)
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {s: min(cap, n) for s, n in counts.items()}
    # the two-stage selection picks EXACTLY the naive window's rows
    w = Window.partitionBy("lang").orderBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), "doc_id")
    naive = (docs.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") <= cap))
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in naive.select("doc_id").collect())
    # layout-deterministic
    again = cap_per_stratum(docs.repartition(13), "doc_id", "lang", cap)
    assert sorted(r["doc_id"] for r in again.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # NULL stratum is its own capped group; NULL ids are excluded
    with_null = docs.limit(7).withColumn("lang", F.lit(None).cast("string"))
    assert cap_per_stratum(docs.unionByName(with_null), "doc_id", "lang",
                           cap).where(F.col("lang").isNull()).count() == cap
    assert cap_per_stratum(docs, "doc_id", "lang", 0).count() == 0
    with pytest.raises(ValueError):
        cap_per_stratum(docs, "doc_id", "lang", -1)


def test_dup_line_features(spark):
    from spark_schema_guard.operators.textstats import dup_line_features

    df = spark.createDataFrame(
        [(1, "aa\nbb\naa\naa\ncc"),   # 5 lines, 2 repeats of 'aa'
         (2, "xx\nyy\nzz"),           # no within-doc dups
         (3, ""),                      # one empty line, zero chars
         (4, None),
         (5, "p q\n\np q\n\nr s")],   # paragraph mode input
        "doc_id int, text string")
    g = {r["doc_id"]: r for r in
         dup_line_features(df, "doc_id", "text").collect()}
    assert g[1]["n_lines"] == 5
    assert abs(g[1]["dup_line_frac"] - 0.4) < 1e-9
    # 10 line chars total, 4 of them inside the two repeated 'aa' lines
    assert abs(g[1]["dup_line_char_frac"] - 0.4) < 1e-9
    assert g[2]["dup_line_frac"] == 0.0 and g[2]["dup_line_char_frac"] == 0.0
    # all-empty lines: 0/0 chars is defined as 0.0, not NULL
    assert g[3]["n_lines"] == 1 and g[3]["dup_line_char_frac"] == 0.0
    # NULL text -> NULL signals (module NULL policy)
    assert g[4]["n_lines"] is None and g[4]["dup_line_frac"] is None
    # doc 5 under LINE mode sees the blank separator lines as dups
    assert g[5]["n_lines"] == 5 and abs(g[5]["dup_line_frac"] - 0.4) < 1e-9
    # paragraph mode: split on blank lines instead
    p = {r["doc_id"]: r for r in
         dup_line_features(df, "doc_id", "text", sep=r"\n\n").collect()}
    assert p[5]["n_lines"] == 3
    assert abs(p[5]["dup_line_frac"] - round(1 / 3, 4)) < 1e-9


def test_importance_weights(spark):
    import hashlib

    from spark_schema_guard.operators import importance_weights

    raw = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "stock market prices rose sharply today"),
         (3, "the cat ate the fish"),
         (4, ""), (5, None)],
        "doc_id int, text string")
    tgt = spark.createDataFrame(
        [(10, "the cat and the cat sat"), (11, "a cat ate a mouse")],
        "tid int, ttext string")
    B, a, scale, n = 64, 1.0, 10 ** 6, 2
    out = {r["doc_id"]: r for r in importance_weights(
        raw, "doc_id", "text", tgt, "tid", "ttext",
        n=n, buckets=B).collect()}

    # exact replica of the documented arithmetic
    def grams(text):
        t = text.lower().strip().split()
        return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)] \
            if text and text.strip() else []

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    import math
    ct, cr = {}, {}
    for txt in ("the cat and the cat sat", "a cat ate a mouse"):
        for g in grams(txt):
            ct[bucket(g)] = ct.get(bucket(g), 0) + 1
    for txt in ("the cat sat on the mat",
                "stock market prices rose sharply today",
                "the cat ate the fish", ""):
        for g in grams(txt):
            cr[bucket(g)] = cr.get(bucket(g), 0) + 1
    T, R = sum(ct.values()), sum(cr.values())
    lam = {b: int(math.floor(
        (math.log((ct.get(b, 0) + a) / (T + a * B))
         - math.log((cr.get(b, 0) + a) / (R + a * B))) * scale))
        for b in range(B)}
    for doc_id, txt in ((1, "the cat sat on the mat"),
                        (2, "stock market prices rose sharply today"),
                        (3, "the cat ate the fish")):
        w = sum(lam[bucket(g)] for g in grams(txt))
        assert out[doc_id]["weight_int"] == w
        assert out[doc_id]["n_grams"] == len(grams(txt))
        assert abs(out[doc_id]["logw"] - w / scale) < 1e-12
    # cat-ish docs score above the off-domain doc
    assert out[1]["logw"] > out[2]["logw"]
    assert out[3]["logw"] > out[2]["logw"]
    # blank / NULL texts: the neutral score, not NULL
    assert out[4]["n_grams"] == 0 and out[4]["weight_int"] == 0
    assert out[5]["logw"] == 0.0
    # deterministic under repartitioning
    again = {r["doc_id"]: r["weight_int"] for r in importance_weights(
        raw.repartition(5), "doc_id", "text", tgt, "tid", "ttext",
        n=n, buckets=B).collect()}
    assert again == {k: v["weight_int"] for k, v in out.items()}
    import pytest
    for kw in ({"n": 0}, {"buckets": 0}, {"smoothing": 0.0}, {"scale": 0}):
        with pytest.raises(ValueError):
            importance_weights(raw, "doc_id", "text", tgt, "tid", "ttext",
                               **kw)


def test_nb_classifier_scores(spark):
    """The NB quality gate reproduces its documented closed-form
    arithmetic exactly: smoothed per-bucket log-likelihood-ratio
    integers plus the doc-count prior, keep = logit_int > 0."""
    import hashlib
    import math

    from spark_schema_guard.operators import nb_classifier_scores

    corpus = spark.createDataFrame(
        [(1, "good clean prose here"), (2, "buy spam pills now"),
         (3, ""), (4, None), (None, "good clean")],
        "doc_id int, text string")
    pos = spark.createDataFrame(
        [(10, "good clean prose"), (11, "clean careful words")],
        "pid int, ptext string")
    neg = spark.createDataFrame(
        [(20, "spam spam buy now buy pills")],
        "nid int, ntext string")
    B, a, scale = 64, 1.0, 10 ** 6
    rows = nb_classifier_scores(
        corpus, "doc_id", "text", pos, "pid", "ptext",
        neg, "nid", "ntext", n=1, buckets=B).collect()
    out = {r["doc_id"]: r for r in rows}

    def toks(text):
        return text.lower().strip().split() if text and text.strip() else []

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    cp, cn = {}, {}
    for txt in ("good clean prose", "clean careful words"):
        for t in toks(txt):
            cp[bucket(t)] = cp.get(bucket(t), 0) + 1
    for t in toks("spam spam buy now buy pills"):
        cn[bucket(t)] = cn.get(bucket(t), 0) + 1
    P, N = sum(cp.values()), sum(cn.values())
    lam = {b: int(math.floor(
        (math.log((cp.get(b, 0) + a) / (P + a * B))
         - math.log((cn.get(b, 0) + a) / (N + a * B))) * scale))
        for b in range(B)}
    prior = int(math.floor((math.log(2 + a) - math.log(1 + a)) * scale))
    for doc_id, txt in ((1, "good clean prose here"),
                        (2, "buy spam pills now")):
        expect = prior + sum(lam[bucket(t)] for t in toks(txt))
        assert out[doc_id]["logit_int"] == expect
        assert out[doc_id]["n_grams"] == len(toks(txt))
        assert out[doc_id]["keep"] == (expect > 0)
        assert abs(out[doc_id]["logit"] - expect / scale) < 1e-12
    # the positive-looking doc scores above the spammy one
    assert out[1]["logit_int"] > out[2]["logit_int"]
    assert out[1]["keep"] and not out[2]["keep"]
    # blank text scores the prior alone; NULL id rows survive with the
    # prior (their grams are excluded from counting)
    assert out[3]["n_grams"] == 0 and out[3]["logit_int"] == prior
    assert out[None]["n_grams"] == 0 and out[None]["logit_int"] == prior
    import pytest
    for kw in ({"n": 0}, {"buckets": 0}, {"smoothing": 0.0}, {"scale": 0}):
        with pytest.raises(ValueError):
            nb_classifier_scores(corpus, "doc_id", "text", pos, "pid",
                                 "ptext", neg, "nid", "ntext", **kw)


def test_dup_span_features(spark):
    """Cross-doc duplicated 4-gram spans: counts, interval-union token
    coverage (overlapping spans merge), within-doc repeats, and the
    blank/NULL contracts."""
    from spark_schema_guard.operators.dedup import dup_span_features

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e x"), (3, "z z z z"),
         (4, ""), (5, None), (6, "q r s"),
         (7, "p p p p p p p p")],
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in dup_span_features(
        docs, "doc_id", "text", n=4, min_count=2).collect()}

    # docs 1/2 share "a b c d" and "b c d e" (pos 0,1): union covers
    # 4 + min(4, 1) = 5 of 6 tokens
    for d in (1, 2):
        assert out[d]["n_tokens"] == 6 and out[d]["n_grams"] == 3
        assert out[d]["n_dup_grams"] == 2
        assert out[d]["dup_tokens"] == 5
        assert out[d]["dup_gram_frac"] == round(2 / 3, 4)
        assert out[d]["dup_token_frac"] == round(5 / 6, 4)
    # doc 7's single repeated gram counts within-doc: all 5 occurrences
    # are duplicated, coverage is the whole doc
    assert out[7]["n_dup_grams"] == 5 and out[7]["dup_tokens"] == 8
    assert out[7]["dup_gram_frac"] == 1.0
    assert out[7]["dup_token_frac"] == 1.0
    # unique gram -> no dups
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_token_frac"] == 0.0
    # blank: zero tokens, zero grams, 0.0 fractions
    assert out[4]["n_tokens"] == 0 and out[4]["n_grams"] == 0
    assert out[4]["dup_gram_frac"] == 0.0
    # NULL text: NULL tokens/fractions, zero dup counts
    assert out[5]["n_tokens"] is None
    assert out[5]["dup_gram_frac"] is None and out[5]["n_dup_grams"] == 0
    # shorter than n: zero grams, defined 0.0 fractions
    assert out[6]["n_tokens"] == 3 and out[6]["n_grams"] == 0
    assert out[6]["dup_gram_frac"] == 0.0
    # deterministic under repartitioning
    again = {r["doc_id"]: (r["n_dup_grams"], r["dup_tokens"])
             for r in dup_span_features(docs.repartition(5), "doc_id",
                                        "text", n=4, min_count=2).collect()}
    assert again == {k: (v["n_dup_grams"], v["dup_tokens"])
                     for k, v in out.items()}
    import pytest
    with pytest.raises(ValueError):
        dup_span_features(docs, "doc_id", "text", n=0)
    with pytest.raises(ValueError):
        dup_span_features(docs, "doc_id", "text", min_count=1)


def test_numeric_outliers(spark):
    """Median/MAD robust z-scores: exact replication of the documented
    arithmetic, grouped stats, MAD=0 degenerate arm, NULL policy, and
    approx-mode agreement on a well-separated outlier."""
    import statistics

    from spark_schema_guard.operators import numeric_outliers

    rows = ([(i, "a", float(v)) for i, v in enumerate(
        [10, 11, 12, 13, 14, 1000])]
        + [(10 + i, "b", 5.0) for i in range(5)] + [(15, "b", 9.0)]
        + [(20, "a", None), (21, None, 3.0)])
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = {r["id"]: r for r in numeric_outliers(
        df, "id", "v", group_col="g", k=3.5, mode="exact").collect()}
    assert len(out) == len(rows)

    a_vals = [10, 11, 12, 13, 14, 1000]
    med = statistics.median(a_vals)
    mad = statistics.median([abs(x - med) for x in a_vals])
    for i, v in enumerate(a_vals):
        z = 0.6745 * (v - med) / mad
        assert out[i]["med"] == med and out[i]["mad"] == mad
        assert out[i]["robust_z"] == round(z, 6)
        assert out[i]["is_outlier"] == (abs(z) > 3.5)
    assert out[5]["is_outlier"] is True          # the planted 1000
    assert sum(bool(out[i]["is_outlier"]) for i in range(5)) == 0
    # group b: MAD = 0 (5 of 6 values identical) -> degenerate arm
    assert out[10]["mad"] == 0.0
    assert out[10]["robust_z"] is None and out[10]["is_outlier"] is False
    assert out[15]["is_outlier"] is True         # 9.0 != median 5.0
    # NULL value / NULL group: NULL stats, NULL verdict
    assert out[20]["is_outlier"] is None and out[20]["robust_z"] is None
    assert out[21]["is_outlier"] is None and out[21]["med"] is None
    # global (ungrouped) mode flags the same planted outlier
    g = {r["id"]: r for r in numeric_outliers(
        df.where(F.col("g") == "a"), "id", "v", k=3.5,
        mode="exact").collect()}
    assert g[5]["is_outlier"] is True and g[0]["is_outlier"] is False
    # approx mode agrees on the clear-cut verdicts
    ap = {r["id"]: r for r in numeric_outliers(
        df, "id", "v", group_col="g", k=3.5, mode="approx").collect()}
    assert ap[5]["is_outlier"] is True
    assert sum(bool(ap[i]["is_outlier"]) for i in range(5)) == 0
    import pytest
    with pytest.raises(ValueError):
        numeric_outliers(df, "id", "v", mode="bogus")
    with pytest.raises(ValueError):
        numeric_outliers(df, "id", "v", k=0.0)
