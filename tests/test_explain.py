"""Tests for explain_scan and LSH bucket caps — the plan-quality surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from soda_spark_spark.api import explain_scan
from soda_spark_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures


def test_explain_scan_prunes_columns(spark, tmp_path):
    src = str(tmp_path / "t")
    spark.createDataFrame([(1, "x", 2.0)], "a long, b string, c double").write.parquet(src)
    df = spark.read.parquet(src)
    plans = explain_scan(
        df,
        {"table_name": "t", "metrics": ["min", "max"], "excluded_columns": ["b", "c"]},
    )
    fused = plans["fused_agg"]
    assert "HashAggregate" in fused
    # column pruning reaches the parquet scan: only `a` is read
    assert "ReadSchema: struct<a:bigint>" in fused


def test_explain_scan_lists_group_passes(spark, tmp_path):
    src = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(src)
    df = spark.read.parquet(src)
    plans = explain_scan(df, {"table_name": "t", "metric_groups": ["duplicates"]})
    assert set(plans) == {"fused_agg", "group:a", "group:b"}
    assert "hashpartitioning" in plans["group:a"]
    # each group pass reads exactly its own column
    assert "ReadSchema: struct<a:bigint>" in plans["group:a"]
    assert "ReadSchema: struct<b:string>" in plans["group:b"]


def test_explain_scan_approx_mode_drops_group_pass(spark):
    df = spark.createDataFrame([(1,)], "a long")
    plans = explain_scan(
        df, {"table_name": "t", "metrics": ["distinct"], "approx_distinct": True}
    )
    assert set(plans) == {"fused_agg"}
    assert "approx_count_distinct" in plans["fused_agg"]


def test_lsh_bucket_cap_drops_hot_bucket(spark):
    # 6 identical docs share every band hash -> one hot bucket of size 6
    docs = spark.createDataFrame(
        [(i, "all the same words in every single document here") for i in range(6)]
        + [(10, "another completely different text body entirely okay")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=16)
    uncapped = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    capped = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4, max_bucket_size=5)
    assert uncapped.count() == 15  # all pairs of the 6 clones
    assert capped.count() == 0  # hot bucket dropped


def test_dedup_against_fingerprint_plan_is_anti_join_no_python(spark, tmp_path):
    """The incremental-dedup fast path must stay JVM-side: a hash anti-join
    on the md5 fingerprint, no Python UDF nodes anywhere."""
    from pyspark.sql import functions as F

    from soda_spark_spark.operators.dedup import dedup_against

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"body {i % 3}") for i in range(12)], "doc_id long, text string"
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    out = dedup_against(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
    )
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_corpus_stats_plan_stays_jvm_side(spark, tmp_path):
    from soda_spark_spark.operators.text import token_corpus_stats

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(8)], "doc_id long, text string"
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    out = token_corpus_stats(docs, "doc_id", "text")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the text column is the only one the scan needs besides the id
    assert "HashAggregate" in plan


def test_dedup_spans_plan_stays_jvm_side(spark, tmp_path):
    """The span-dedup pipeline (window hashing, dup-count aggregate,
    island merge, token rebuild) must be pure Catalyst — no Python
    nodes — and its gram stage must anti-join, not cartesian."""
    from soda_spark_spark.operators.dedup import dedup_spans

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "shared run of words here plus w%d" % i) for i in range(10)],
        "doc_id long, text string",
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    out = dedup_spans(docs, "doc_id", "text", window=3)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # gram stage: duplicated windows reach the docs via a semi-join
    assert "LeftSemi" in plan
    # strip stage (round-20 optimization): spans collapse to a per-doc
    # array joined LeftOuter — token-grain rows never shuffle, so the
    # old posexplode + LeftAnti + collect_list rebuild must be gone
    assert "LeftOuter" in plan
    assert "LeftAnti" not in plan
    assert "CartesianProduct" not in plan


def test_encoding_quality_plan_is_narrow(spark, tmp_path):
    from soda_spark_spark.operators.text import encoding_quality

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    out = encoding_quality(docs, "doc_id", "text")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # pure projection: no exchange, no python, no joins
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_classifier_score_plan_broadcasts_model(spark, tmp_path):
    from pyspark.sql import functions as F

    from soda_spark_spark.operators import lm

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"alpha beta w{i}", i % 2 == 0) for i in range(10)],
        "doc_id long, text string, good boolean",
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    model_path = str(tmp_path / "model")
    lm.quality_classifier_train(
        docs, "doc_id", "text", "good", buckets=64
    ).write.parquet(model_path)
    model = spark.read.parquet(model_path)
    out = lm.quality_classifier_score(docs, model, "doc_id", "text", buckets=64)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_eval_split_recipe_plan_broadcasts_heldout_grams(spark, tmp_path):
    """The eval-split decontamination membership join must be a semi-join
    against the (eval-set-bounded) gram set with no Python nodes — the
    held-out side is tiny next to train, so it broadcasts at any
    realistic eval fraction."""
    from soda_spark_spark.pipeline import eval_split_recipe

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"some body text for document {i} with words") for i in range(30)],
        "doc_id long, text string",
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    out = eval_split_recipe(docs, "doc_id", "text", n=4)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interval_join_plan_is_equi_join(spark, tmp_path):
    """The whole point of the range-bucket formulation: the physical
    plan must be a hash/sort-merge EQUI-join on the bucket key — never
    the BroadcastNestedLoop/Cartesian plan Spark produces for a naive
    BETWEEN range join."""
    from soda_spark_spark.operators.joins import interval_join

    pts_p = str(tmp_path / "pts")
    ivs_p = str(tmp_path / "ivs")
    spark.range(2000).select(
        F.col("id").alias("pid"), (F.col("id") * 3).alias("t")
    ).write.parquet(pts_p)
    spark.range(200).select(
        F.col("id").alias("iid"), (F.col("id") * 31).alias("s"),
        (F.col("id") * 31 + 60).alias("e"),
    ).write.parquet(ivs_p)
    pts = spark.read.parquet(pts_p)
    ivs = spark.read.parquet(ivs_p)
    out = interval_join(pts, ivs, point_col="t", start_col="s",
                        end_col="e", bucket_width=64)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    # and the naive formulation really is the bad plan we are avoiding
    naive = pts.join(
        ivs, (pts["t"] >= ivs["s"]) & (pts["t"] <= ivs["e"])
    )
    nplan = spark._sc._jvm.PythonSQLUtils.explainString(
        naive._jdf.queryExecution(), "formatted"
    )
    assert "NestedLoop" in nplan or "Cartesian" in nplan


def test_kmv_sketch_plan_has_no_global_sort(spark, tmp_path):
    """kmv_sketch's final window runs over <= n_buckets*k candidate
    rows; the corpus-sized sort happens only INSIDE salt buckets — the
    plan must show the two-level window, not one global Sort over the
    distinct hashes feeding a single-partition window."""
    from soda_spark_spark.operators.cardinality import kmv_sketch

    p = str(tmp_path / "keys")
    spark.range(50_000).select(F.col("id").alias("v")).write.parquet(p)
    df = spark.read.parquet(p)
    out = kmv_sketch(df, "v", k=16, n_buckets=64)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # two window operators (per-bucket partial + final over candidates)
    assert plan.count("Window") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

def test_semantic_layout_key_plan_is_pure_projection(spark, tmp_path):
    """semantic_layout_key's RETURNED frame must be a pure projection
    over the cluster assignment: no Sort, no Window, and no shuffle
    introduced by the key arithmetic — the 'orders topically-related
    docs adjacently with no global sort' claim is a plan property, not
    just a docstring. (kmeans_exact's Lloyd iterations run eagerly at
    call time; this pins the frame a caller hands to assign_shards.)"""
    from soda_spark_spark.operators.similarity import semantic_layout_key

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "delta epsilon zeta")
         for i in range(200)],
        "doc_id long, text string",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = semantic_layout_key(df, "doc_id", "text", dim=8, k=2, impl="catalyst")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    # no GLOBAL Sort exec node (the key is never order-materialized);
    # the only allowed Sorts are the window's per-partition ones, whose
    # formatted Arguments line carries global=false
    for m in re.finditer(r"\(\d+\) Sort\b[^(]*?Arguments: (.+)", plan):
        assert ", false," in m.group(1), m.group(0)
    # every window is the per-document argmin — partitioned by the doc id,
    # never an empty (global) partition spec
    n_specs = plan.count("windowspecdefinition(")
    assert n_specs >= 1
    assert n_specs == plan.count("windowspecdefinition(__id")


def test_document_extractors_plan_is_arrow_with_pruned_scan(spark, tmp_path):
    """The binary-document extractors (round 16) must be Arrow-batched
    MapInPandas over a TWO-COLUMN pruned parquet scan — per-payload
    Python decode is inherent to binary parsing, but the transfer must
    be Arrow and the scan must not read unrelated columns."""
    from soda_spark_spark.operators.office_text import docx_text

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, bytearray(b"PK"), "unrelated", 3.5)],
        "id long, payload binary, extra string, num double",
    ).write.parquet(src)
    df = spark.read.parquet(src)
    out = docx_text(df, "id", "payload")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python
    # column pruning reaches the scan: extra/num are not read
    assert "ReadSchema: struct<id:bigint,payload:binary>" in plan


def test_markdown_strip_plan_is_arrow_eval(spark, tmp_path):
    """strip_markdown_col is a Pandas UDF: ArrowEvalPython in the plan
    (vectorized transfer), never BatchEvalPython, and the scan prunes
    to the used columns."""
    from soda_spark_spark.operators.markdown_text import markdown_strip

    src = str(tmp_path / "md")
    spark.createDataFrame(
        [(1, "# t", "unused")], "id long, md string, extra string"
    ).write.parquet(src)
    df = spark.read.parquet(src).select("id", "md")
    out = markdown_strip(df, "md", "text")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<id:bigint,md:string>" in plan


def test_wikitext_strip_plan_is_arrow_eval(spark, tmp_path):
    """strip_wikitext_col follows the markdown contract: ArrowEvalPython
    (vectorized transfer), never BatchEvalPython, pruned scan."""
    from soda_spark_spark.operators.wikitext import wikitext_strip

    src = str(tmp_path / "wt")
    spark.createDataFrame(
        [(1, "'''b'''", "unused")], "id long, wt string, extra string"
    ).write.parquet(src)
    df = spark.read.parquet(src).select("id", "wt")
    out = wikitext_strip(df, "wt", "text")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<id:bigint,wt:string>" in plan


def test_code_family_plan_is_pure_jvm_with_pruned_scan(spark, tmp_path):
    """The whole code-corpus family must compile to built-in
    expressions: NO Python evaluator node of any kind in the plan, and
    the scan prunes to path+text."""
    from soda_spark_spark.operators.code_text import (
        code_langid,
        code_quality,
        license_detect,
        redact_secrets,
    )

    src = str(tmp_path / "code")
    spark.createDataFrame(
        [(1, "a.py", "x = 1", "unused")],
        "id long, path string, text string, extra string",
    ).write.parquet(src)
    df = spark.read.parquet(src).select("path", "text")
    out = redact_secrets(
        code_quality(
            license_detect(
                code_langid(df, path_col="path", text_col="text"),
                "text",
            ),
            "text",
        ),
        "text",
    )
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "ReadSchema: struct<path:string,text:string>" in plan


def test_email_strip_plan_is_pure_jvm(spark, tmp_path):
    """Reply-scaffolding cleanup is split/filter/join array
    expressions — no Python evaluator node, pruned scan."""
    from soda_spark_spark.operators.email_text import (
        email_features,
        email_strip_quotes,
    )

    src = str(tmp_path / "mail")
    spark.createDataFrame(
        [(1, "a\n> q\n-- \nsig", 9)],
        "id long, text string, extra long",
    ).write.parquet(src)
    df = spark.read.parquet(src).select("id", "text")
    out = email_features(email_strip_quotes(df, "text", "clean"), "text")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "ReadSchema: struct<id:bigint,text:string>" in plan


def test_stream_readers_plan_is_arrow_with_pruned_scan(spark, tmp_path):
    """wiki_dump / xml_rows / notebook / subtitle readers all ride
    Arrow mapInPandas over path+content (or id+payload) pruned scans,
    never row-at-a-time Python."""
    from soda_spark_spark.operators.notebook_text import notebook_cells
    from soda_spark_spark.operators.subtitles import subtitle_cues

    src = str(tmp_path / "pl")
    spark.createDataFrame(
        [(1, bytearray(b"{}"), "unrelated")],
        "id long, payload binary, extra string",
    ).write.parquet(src)
    df = spark.read.parquet(src)
    for op in (notebook_cells, subtitle_cues):
        out = op(df, "id", "payload")
        plan = spark._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
        assert "ReadSchema: struct<id:bigint,payload:binary>" in plan


def test_chat_family_plan_is_pure_jvm(spark, tmp_path):
    """flatten_conversations / conversation_pairs / dpo_pairs /
    validate_tool_calls are from_json + array-HOF expressions: zero
    Python eval nodes of either kind, and the scan prunes to the
    columns used (round-17 family contract)."""
    import json as _json

    from soda_spark_spark.operators.chat import (
        conversation_pairs,
        dpo_pairs,
        flatten_conversations,
        validate_tool_calls,
    )

    src = str(tmp_path / "conv")
    conv = _json.dumps([
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a"},
    ])
    spark.createDataFrame(
        [(1, conv, "p", "c", "r", "unused")],
        "id long, conv string, prompt string, chosen string,"
        " rejected string, extra string",
    ).write.parquet(src)
    df = spark.read.parquet(src)

    def plan_of(out):
        return spark._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )

    for out in (
        flatten_conversations(df.select("id", "conv"), "id", "conv"),
        conversation_pairs(df.select("id", "conv"), "id", "conv"),
        validate_tool_calls(df.select("id", "conv"), "id", "conv"),
    ):
        plan = plan_of(out)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "ReadSchema: struct<id:bigint,conv:string>" in plan

    gated = dpo_pairs(
        df.select("id", "prompt", "chosen", "rejected"),
        "prompt", "chosen", "rejected",
    )
    plan = plan_of(gated)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_html_markdown_plan_is_arrow_eval(spark, tmp_path):
    """markdown_col follows the html_text/markdown_strip contract:
    ArrowEvalPython (vectorized transfer), never BatchEvalPython,
    pruned two-column scan."""
    from soda_spark_spark.operators.html_markdown import html_markdown

    src = str(tmp_path / "hm")
    spark.createDataFrame(
        [(1, "<h1>t</h1>", "unused")],
        "id long, html string, extra string",
    ).write.parquet(src)
    out = html_markdown(spark.read.parquet(src), "id", "html")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<id:bigint,html:string>" in plan


def test_eml_extract_plan_is_arrow_map_with_pruned_scan(spark, tmp_path):
    """eml_extract rides the same MapInPandas channel as the pdf and
    office extractors, over a two-column pruned select."""
    from soda_spark_spark.operators.mime import eml_extract

    src = str(tmp_path / "eml")
    spark.createDataFrame(
        [(1, bytearray(b"From: u@example.com\n\nx\n"), "unused")],
        "id long, payload binary, extra string",
    ).write.parquet(src)
    out = eml_extract(spark.read.parquet(src), "id", "payload")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<id:bigint,payload:binary>" in plan
