"""Physical-plan shape assertions: the jvm-mode plan must stay entirely
JVM-side (no Python evaluation nodes), read only needed columns, and the
python regex mode must be the only thing that introduces Arrow UDFs."""

from pyspark.sql import functions as F

import spark_schema_guard as ssg
from spark_schema_guard.webgen import WEB_PAGE_SCHEMA, web_pages


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_jvm_plan_has_no_python_nodes(spark, sf_dir):
    web = web_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, web.schema)
    text = _physical(plan.apply(web).select("url", "verdict"))
    assert "BatchEvalPython" not in text
    assert "ArrowEvalPython" not in text
    assert "RLIKE" in text or "rlike" in text


def test_python_regex_mode_uses_arrow(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(
        {"type": "object", "properties": {"source": {"pattern": "^src[0-9]+$"}}},
        docs.schema, regex_engine="python")
    text = _physical(plan.apply(docs).select("doc_id", "verdict"))
    assert "ArrowEvalPython" in text  # vectorized, never row-at-a-time
    assert "BatchEvalPython" not in text


def test_column_pruning_reaches_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = ssg.compile_plan(
        {"type": "object", "properties": {"lang": {"enum": ["en", "de"]}}},
        docs.schema)
    text = _physical(plan.apply(docs).select("doc_id", "verdict"))
    # scan must read only doc_id + lang, not text/source/n_chars
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in text


def test_partition_verdicts(spark, sf_dir):
    from spark_schema_guard.operators.stats import partition_verdicts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(4)
    plan = ssg.compile_plan(
        {"type": "object", "properties": {"lang": {"enum": ["en", "de"]}}},
        docs.schema)
    out = partition_verdicts(plan.apply(docs)).collect()
    assert sum(r["rows"] for r in out) == docs.count()
    assert all(r["valid_rows"] <= r["rows"] for r in out)


def test_regex_modes_agree_on_ascii(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = {"type": "object",
              "properties": {"source": {"pattern": "^src[0-9]+$"},
                             "text": {"format": "email"}}}
    jvm = ssg.compile_plan(schema, docs.schema, regex_engine="jvm")
    py = ssg.compile_plan(schema, docs.schema, regex_engine="python")
    a = {r["doc_id"]: r["verdict"] for r in jvm.apply(docs).select("doc_id", "verdict").collect()}
    b = {r["doc_id"]: r["verdict"] for r in py.apply(docs).select("doc_id", "verdict").collect()}
    assert a == b


def test_regex_mode_unicode_digit_divergence(spark):
    # Java \d is ASCII-only; Python \d matches Unicode digits.  jvm mode
    # is the fast path with that documented caveat; python mode matches
    # the reference exactly.
    df = spark.createDataFrame([("١٢٣",), ("123",)], "v string")
    schema = {"type": "object", "properties": {"v": {"pattern": r"^\d+$"}}}
    jvm = ssg.compile_plan(schema, df.schema, regex_engine="jvm")
    py = ssg.compile_plan(schema, df.schema, regex_engine="python")
    jvm_verdicts = {r["v"]: r["verdict"] for r in jvm.apply(df).collect()}
    py_verdicts = {r["v"]: r["verdict"] for r in py.apply(df).collect()}
    assert py_verdicts == {"١٢٣": True, "123": True}   # reference semantics
    assert jvm_verdicts["123"] is True
    assert jvm_verdicts["١٢٣"] is False                # documented caveat


def test_dollar_anchor_newline_parity(spark):
    # 'a$' must NOT match 'a\n' (the reference rewrites $ -> \Z); Java
    # rlike gets the equivalent \z rewrite
    df = spark.createDataFrame([("a",), ("a\n",), ("ba",)], "v string")
    schema = {"type": "object", "properties": {"v": {"pattern": "a$"}}}
    for engine in ("jvm", "python"):
        plan = ssg.compile_plan(schema, df.schema, regex_engine=engine)
        got = {r["v"]: r["verdict"] for r in plan.apply(df).collect()}
        assert got == {"a": True, "a\n": False, "ba": True}, engine


def test_validation_plan_has_no_shuffle(spark, sf_dir):
    # plan.apply is a pure projection: zero Exchange nodes before any
    # user-added aggregation (SCALE.md "zero shuffles" claim)
    web = web_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, web.schema)
    text = _physical(plan.apply(web))
    assert "Exchange" not in text


def test_jsoncol_parses_json_once(spark, sf_dir):
    # every rule reads the same MATERIALIZED parse: exactly ONE
    # parseJson (the native variant parser, codegen-able via
    # static_invoke) per plan, ZERO from_json (CodegenFallback) — never
    # one parse per rule
    from spark_schema_guard.jsoncol import validate_json_column

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = validate_json_column(
        events, "props",
        {"type": "object", "required": ["k"],
         "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 80}}},
        engine="columnar")
    text = _physical(out)
    # scalar-only schema: every rule compiles against the variant view
    # and presence reads its key array, so Catalyst prunes the typed
    # struct parse — exactly ONE parse per row, and it is the native
    # variant parser, which stays inside whole-stage codegen
    assert text.count("parseJson") == 1
    assert text.count("from_json") == 0
    assert "Exchange" not in text


def test_nested_jsoncol_materializes_parses(spark):
    # nested object schemas register aux columns (text slice, variant
    # map, key array) so each is parsed once per row, never once per
    # consulting rule
    from spark_schema_guard.jsoncol import validate_json_column

    df = spark.createDataFrame([('{"k": 1, "o": {"x": 5}}',)], "props string")
    schema = {"type": "object",
              "properties": {"k": {"type": "integer"},
                             "o": {"type": "object", "required": ["x"],
                                   "properties": {"x": {"type": "integer"}},
                                   "additionalProperties": {"type": "string"}}}}
    out = validate_json_column(df, "props", schema, engine="columnar")
    text = _physical(out)
    assert "BatchEvalPython" not in text and "Exchange" not in text
    # nested object value schemas recurse through the SAME variant
    # parse (array<variant>/map<string,variant> casts) — one parseJson
    # per row, no struct re-parse, no text slicing
    assert text.count("parseJson") == 1
    assert text.count("from_json") == 0
    assert text.count("get_json_object") == 0


def test_open_key_json_plan_stays_jvm(spark):
    # open-key keywords (runtime key set + variant value schemas) must
    # not introduce Python nodes or shuffles; the struct parse and the
    # variant map parse are the only from_json occurrences
    from spark_schema_guard.jsoncol import validate_json_column

    df = spark.createDataFrame([('{"k": 1, "King": "x"}',)], "props string")
    schema = {"type": "object", "required": ["k"],
              "properties": {"k": {"type": "integer"}},
              "additionalProperties": {"type": "string", "minLength": 2},
              "propertyNames": {"maxLength": 8}}
    out = validate_json_column(df, "props", schema, engine="columnar")
    text = _physical(out)
    assert "BatchEvalPython" not in text
    assert "ArrowEvalPython" not in text
    assert "Exchange" not in text
    # one shared native variant parse, struct parse pruned
    assert text.count("parseJson") == 1
    assert text.count("from_json") == 0


def test_per_unit_drift_windows_are_partitioned(spark, sf_dir):
    """chi_square_by_unit / psi_by_unit have NO window at all; ks_by_unit's
    per-unit cumulative window partitions by unit.  The one unpartitioned
    window (pooled CDF) runs over <= |grid| rows — assert it is the only
    one."""
    from spark_schema_guard.operators import (chi_square_by_unit, ks_by_unit,
                                              psi_by_unit)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    unit = F.col("doc_id") % 8
    for op in (chi_square_by_unit, psi_by_unit):
        text = _physical(op(docs, "lang", unit))
        assert "Window" not in text, op.__name__
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    text = _physical(ks_by_unit(events, "value", F.col("event_id") % 8,
                                grid=[10.0, 40.0, 80.0]))
    # the ONLY window is the per-unit cumulative one: the pooled CDF is a
    # broadcast triangular join now (an unpartitioned window would log
    # the WindowExec warning that masks real global-window regressions)
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", text)
    assert specs and all("unit" in s for s in specs), text[:2000]


def test_ann_rank_stage_is_two_stage(spark, sf_dir):
    """VERDICT-r02 #1: no ANN query may rank a query's full candidate
    set in one window partition.  The plan must prune per-partition
    first (MapInPandas running top-k) and only then window over the
    bounded k·P merge frame — so the single Window node sits ABOVE the
    prune in every ann plan."""
    from spark_schema_guard.operators.similarity import (
        cosine_topk, cosine_topk_ivf, cosine_topk_lsh)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(r["vec_id"], r["embedding"])
               for r in emb.where(F.col("vec_id") < 2).collect()]
    frames = {
        "brute": cosine_topk(emb, "vec_id", "embedding", queries, k=3),
        "lsh": cosine_topk_lsh(emb, "vec_id", "embedding", queries, k=3,
                               n_planes=3, multiprobe=0, max_bucket=10000),
        "ivf": cosine_topk_ivf(emb, "vec_id", "embedding", queries, k=3,
                               n_centroids=4, nprobe=2, max_bucket=10000),
    }
    for name, df in frames.items():
        lines = _physical(df).splitlines()
        # "Window [" is the rank exec node; WindowGroupLimit nodes are
        # Spark's own partial/final top-k pushdown (bounded, welcome)
        windows = [i for i, ln in enumerate(lines) if "Window [" in ln]
        prunes = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
        assert len(windows) == 1, (name, lines)
        assert prunes, (name, lines)
        # treeString prints parents above children: the window must be
        # an ancestor of the prune, i.e. rank only pruned rows
        assert windows[0] < prunes[0], (name, lines)
        assert not any("CartesianProduct" in ln for ln in lines), name


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The gram join must broadcast the (small) benchmark side — never a
    sort-merge shuffle of the full training corpus, never a cartesian
    product — and the whole pipeline stays JVM-side."""
    from spark_schema_guard.operators import ngram_decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = ngram_decontaminate(docs, "doc_id", "text", bench, "text", n=4)
    text = _physical(out)
    assert "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text
    # the corpus-side gram join must not shuffle-sort the big side: the
    # only SortMergeJoin allowed is the final per-doc left join back to
    # ids (AQE may plan either); the inner gram match must be broadcast
    gram_joins = [ln for ln in text.splitlines() if "Join Inner" in ln]
    assert all("BroadcastHashJoin" in ln for ln in gram_joins), gram_joins


def test_violations_projection_stays_in_wholestage_codegen(spark, sf_dir):
    """The violations array is a concat of per-rule conditional
    singleton arrays, NOT filter(array(...), lambda): one higher-order
    function in the output projection is CodegenFallback and drops the
    whole stage out of whole-stage codegen, silently evaluating every
    rule interpreted (A/B: ~1.5x on the headline query).  Pin: every
    Project in the executed validation plan carries the codegen star."""
    web = web_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    plan = ssg.compile_plan(WEB_PAGE_SCHEMA, web.schema)
    applied = plan.apply(web)
    agg = applied.agg(F.sum(F.col("verdict").cast("long")),
                      F.sum(F.size("violations")))
    agg.collect()
    # AQE prints "== Final Plan ==" (starred when codegen'd) followed by
    # "== Initial Plan ==" (never starred) — scan only the executed one
    text = _physical(agg).split("== Initial Plan ==")[0]
    for line in text.split("\n"):
        stripped = line.lstrip(" +-:*()0123456789")
        if stripped.startswith("Project ["):
            assert "*(" in line.split("Project")[0], (
                "un-codegen'd Project in the validation plan:\n" + line)


def test_dedup_lines_plan_shape(spark, sf_dir):
    """dedup_lines must be groupBy-shaped end to end: partial (map-side)
    aggregation before BOTH shuffles (winner selection and reassembly),
    no window over the corpus, no cartesian product, and the reassembly
    projection free of lambda higher-order functions."""
    from spark_schema_guard.operators.dedup import dedup_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    text = _physical(dedup_lines(docs, "doc_id", "text", min_len=10))
    assert "Window" not in text, text[:2000]
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    # both aggregations run partial_ merge combiners (map-side combine)
    assert text.count("partial_") >= 2, text[:2000]
    # no lambda HOF in the projection (lambdafunction prints in plans)
    assert "lambdafunction" not in text.lower(), text[:2000]


def test_topk_and_grid_cdf_plans_have_no_window(spark, sf_dir):
    """heavy_hitters / token_vocabulary rank their <= k rows via the
    broadcast triangular join (stats.rank_bounded) and
    ks_drift(mode="grid") finishes its <= B-bucket CDF on the driver —
    zero Window nodes, so the WindowExec "No Partition Defined" warning
    can only ever mean a REAL global window regressed in somewhere."""
    from spark_schema_guard.operators import heavy_hitters, ks_drift
    from spark_schema_guard.operators.textstats import token_vocabulary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plans = {
        "heavy_hitters": _physical(heavy_hitters(docs, "lang", k=3)),
        "token_vocabulary": _physical(
            token_vocabulary(docs, "doc_id", "text", k=10)),
        "ks_grid": _physical(ks_drift(
            docs.select(F.col("n_chars").cast("double").alias("v"),
                        (F.col("doc_id") % 2 == 0).alias("g")),
            "v", "g", mode="grid", grid_size=16)),
    }
    for name, text in plans.items():
        assert "Window" not in text, name


def test_bucketed_band_index_join_shuffles_batch_only(spark, sf_dir, tmp_path):
    """A band index persisted with write_band_index (catalog ref,
    bucketed by (band, bucket)) joins incremental batches WITHOUT an
    Exchange on the index side: the probe plan has strictly fewer
    band-key shuffles than the same join against a plain parquet copy,
    and the index scan reads bucketed.  This is the 10^12-row claim of
    SCALE.md's incremental-dedup section made checkable."""
    import re

    from spark_schema_guard.operators.dedup import (incremental_candidates,
                                                    minhash_band_index,
                                                    read_band_index,
                                                    write_band_index)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.length("text") >= 8)
    idx = minhash_band_index(docs.where("doc_id < 250"), "doc_id", "text",
                             num_hashes=4, bands=4)
    spark.sql("DROP TABLE IF EXISTS band_idx_plan_test")
    write_band_index(idx, "band_idx_plan_test", buckets=8)
    plain_path = str(tmp_path / "plain_idx")
    idx.write.parquet(plain_path)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        def band_exchanges(index_df):
            cand = incremental_candidates(docs.where("doc_id >= 250"),
                                          index_df, "doc_id", "text",
                                          num_hashes=4, bands=4)
            cand.collect()
            text = _physical(cand)
            return text, set(re.findall(
                r"Exchange hashpartitioning\((band#\d+), (bucket#\d+)", text))

        bucketed_plan, bucketed_ex = band_exchanges(
            read_band_index(spark, "band_idx_plan_test"))
        plain_plan, plain_ex = band_exchanges(
            spark.read.parquet(plain_path))
        assert "Bucketed: true" in bucketed_plan
        assert len(bucketed_ex) < len(plain_ex), (bucketed_ex, plain_ex)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS band_idx_plan_test")


def test_strip_boilerplate_plan_shape(spark, sf_dir):
    """strip_boilerplate must stay groupBy-shaped: document frequency and
    reassembly as partial-combining aggregates, no corpus window, no
    cartesian product, no Python nodes, no lambda HOFs."""
    from spark_schema_guard.operators.dedup import strip_boilerplate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "text")
    text = _physical(strip_boilerplate(docs, "doc_id", "text", "lang",
                                       min_docs=2, min_frac=0.3))
    assert "Window" not in text, text[:2000]
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert text.count("partial_") >= 2, text[:2000]
    assert "lambdafunction" not in text.lower(), text[:2000]


def test_cluster_representatives_plan_shape(spark, sf_dir):
    """Canonical selection must be ONE map-side-combining aggregate — no
    per-cluster window (the giant-near-clique single-partition trap)."""
    from spark_schema_guard.operators.dedup import cluster_representatives

    members = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"), (F.col("doc_id") % 50).alias("cluster_id"),
        F.col("n_chars").alias("score"))
    text = _physical(cluster_representatives(members, "doc_id", "cluster_id",
                                             score_col="score"))
    assert "Window" not in text, text[:2000]
    assert text.count("partial_") >= 1, text[:2000]
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_verify_jaccard_plan_shape(spark, sf_dir):
    """The verify stage's shingle reduction must combine map-side
    (DISTINCT + size aggregates) and never window or go cartesian; the
    candidate restriction must appear as joins, not a Python filter."""
    from spark_schema_guard.operators.dedup import verify_jaccard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    pairs = docs.select(F.col("doc_id").alias("id_a"),
                        (F.col("doc_id") + 1).alias("id_b")).limit(100)
    text = _physical(verify_jaccard(docs, "doc_id", "text", pairs))
    assert "Window" not in text, text[:2000]
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert text.count("partial_") >= 2, text[:2000]


def test_constraint_drift_single_plan_no_union(spark, sf_dir):
    """The contract diff must be ONE exploded projection over the joined
    profiles — no N-way union: a LAZY caller-supplied profile (here a
    plain aggregate over parquet) must scan its table exactly once."""
    from spark_schema_guard.operators import constraint_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def lazy_profile(side):
        # minimal hand-built profile satisfying the contract columns
        return docs.groupBy().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("text").isNull().cast("long")).alias("n_nulls"),
            F.approx_count_distinct("text").alias("n_distinct"),
            F.min(F.col("n_chars").cast("double") * side).alias("min_num"),
            F.max(F.col("n_chars").cast("double") * side).alias("max_num"),
            F.min(F.length("text")).cast("int").alias("min_len"),
            F.max(F.length("text")).cast("int").alias("max_len"),
        ).select(
            F.lit("text").alias("column"), F.lit("string").alias("spark_type"),
            "n_rows", "n_nulls", "n_distinct", "min_num", "max_num",
            "min_len", "max_len", F.lit(None).cast("string").alias("enum_vals"),
            F.lit(True).alias("required"))

    out = constraint_drift(lazy_profile(1), lazy_profile(2))
    text = _physical(out)
    assert "Union" not in text, text[:2000]
    # one parquet scan per profile side, never one per finding
    assert text.count("Scan parquet") <= 2, text[:3000]
    rows = out.collect()
    assert {r["finding"] for r in rows} >= {"max_widened"}


def test_suggest_json_kv_plan_shape(spark, sf_dir):
    """suggest_json_constraints' stats pass: one variant parse exploded
    to (key, value) rows feeding a groupBy(key) — all JVM, exactly one
    Exchange, and a PARTIAL aggregate below it (map-side combine is what
    absorbs the per-doc sentinel key and bounds the shuffle to
    #keys x tasks rows)."""
    from spark_schema_guard.operators.suggest import _json_kv_stream

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = events.select(F.concat(
        F.lit('{"k": '), (F.col("event_id") % 7).cast("string"),
        F.lit(', "s": "x"}')).alias("doc"))
    grouped = _json_kv_stream(df, "doc").groupBy("key").agg(
        F.count(F.lit(1)).alias("n"))
    text = _physical(grouped)
    assert "BatchEvalPython" not in text
    assert "ArrowEvalPython" not in text
    assert text.count("Exchange") == 1
    assert "partial_count" in text  # map-side combine before the shuffle
    # the parse must run ONCE per doc: the sentinel when-chain
    # references the map 4 times, and if CollapseProject ever re-inlines
    # the dedicated parse projection the walk quadruples (A/B-measured
    # 20.8s -> 7.5s on the 2M-doc bench leg)
    assert text.count("parseJson") == 1


def test_quality_gate_plans_are_pure_projection(spark, sf_dir):
    """gopher_rules / c4_rules are per-doc Column projections: zero
    Exchange, zero Window, no Python nodes — they ride the scan (their
    line/token lambdas cost codegen fallback, a documented trade, but
    never a shuffle)."""
    from spark_schema_guard.operators.textstats import c4_rules, gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    for frame in (gopher_rules(docs, "doc_id", "text"),
                  c4_rules(docs, "doc_id", "text")):
        text = _physical(frame)
        assert "Exchange" not in text, text[:2000]
        assert "Window" not in text
        assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_capped_selection_windows_only_boundary_bucket(spark, sf_dir):
    """temperature_mix / cap_per_stratum inherit take_token_budget's
    two-stage shape: ONE per-stratum cumsum window, fed through the
    broadcast boundary join and a __bkt = boundary filter (never the
    whole stratum), with the pre-boundary prefix kept by a pure filter
    union branch."""
    from spark_schema_guard.operators import cap_per_stratum, temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for frame in (temperature_mix(docs, "doc_id", "lang", 100, tau=0.5),
                  cap_per_stratum(docs, "doc_id", "lang", 7)):
        text = _physical(frame)
        assert text.count("Window") == 1, text[:2000]
        assert "BroadcastHashJoin" in text or "BroadcastNestedLoop" in text
        assert "__bb" in text  # the boundary filter feeds the window
        assert "Union" in text
        assert "CartesianProduct" not in text
        assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_importance_weights_broadcasts_lambda(spark, sf_dir):
    """The fixed-point λ table joins the gram stream as a broadcast
    LocalTableScan (never a shuffle or a cartesian product), and the
    whole scoring plan stays JVM-side."""
    from spark_schema_guard.operators import importance_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = importance_weights(docs, "doc_id", "text",
                             docs.where(F.col("doc_id") % 97 == 0),
                             "doc_id", "text", n=2, buckets=512)
    text = _physical(out)
    assert "BroadcastHashJoin" in text, text[:2000]
    # the λ table is a single local-relation node (LocalTableScan or
    # the RDD-backed local scan), one plan node regardless of buckets
    assert "LocalTableScan" in text or "Scan ExistingRDD" in text
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_dup_span_plan_stays_jvm_and_windows_per_doc(spark, sf_dir):
    """dup_span_features: the coverage window partitions by doc id (its
    sort is bounded by one document's dup grams — never a corpus-wide
    window), the gram-count reduction carries fixed-width md5 keys, and
    the whole plan is JVM-side."""
    from spark_schema_guard.operators.dedup import dup_span_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dup_span_features(docs, "doc_id", "text", n=4)
    text = _physical(out)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "CartesianProduct" not in text
    # every Window node is doc-partitioned (hashpartitioning on doc_id
    # feeds it), so no single-partition global sort exists in the plan
    import re

    for m in re.finditer(r"Window \[", text):
        seg = text[m.start():m.start() + 300]
        assert "windowspecdefinition(doc_id" in seg, seg


def test_nb_classifier_plan_broadcasts_lambda(spark, sf_dir):
    """The classifier's λ table is a broadcast local relation (the
    importance_weights shape): one LocalTableScan, a BroadcastHashJoin
    into the gram stream, zero Python nodes."""
    from spark_schema_guard.operators import nb_classifier_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = nb_classifier_scores(
        docs, "doc_id", "text",
        docs.where(F.col("doc_id") % 97 == 0), "doc_id", "text",
        docs.where(F.col("doc_id") % 89 == 0), "doc_id", "text",
        n=1, buckets=256)
    text = _physical(out)
    assert "BroadcastHashJoin" in text, text[:2000]
    assert "LocalTableScan" in text or "Scan ExistingRDD" in text
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_simhash_near_dups_filters_before_pair_dedup(spark, sf_dir):
    """The hamming cut must sit BELOW the pair-level dedup Exchange in
    the plan (filter inside the join stage, dropDuplicates only over
    surviving near-dups) — the 'dedup after the reduction stage' rule."""
    from spark_schema_guard.operators.dedup import simhash_near_dups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(F.col("doc_id") < 1000)
    out = simhash_near_dups(docs, "doc_id", "text", bits=32, max_hamming=3)
    text = _physical(out)
    # the aggregate implementing dropDuplicates consumes a hamming
    # column already computed+filtered upstream (Catalyst folds the cut
    # into the pair-join condition itself): every bit_count occurrence
    # must sit BELOW (deeper than) the dedup HashAggregate keyed on
    # (id_a, id_b) — toString is top-down, so all bit_count line
    # indices must be GREATER than the first dedup agg line, and the
    # dedup agg must aggregate the already-computed hamming column
    lines = text.splitlines()
    dedup_idx = next(i for i, ln in enumerate(lines)
                     if "HashAggregate" in ln and "id_a" in ln
                     and "id_b" in ln)
    assert "hamming" in lines[dedup_idx], lines[dedup_idx]
    bit_idxs = [i for i, ln in enumerate(lines) if "bit_count" in ln]
    assert bit_idxs and all(i > dedup_idx for i in bit_idxs), text[:3000]
