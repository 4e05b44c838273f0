"""Round-13 features: domain_blocklist gate (+ curate step)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.text import domain_blocklist


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "ref: https://WWW.Spam.Example/x1 end"),          # exact block
        (2, "ref: http://cdn.ads.spam.example/y2 end"),       # subdomain
        (3, "ref: https://good.example.org/z3 end"),          # clean
        (4, "plain note without links"),                      # no host
        (5, "ref: https://notspam.example/w5 end"),           # NOT a suffix
        (6, "ref: https://tracker.example.com./t6 end"),      # trailing dot
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def blocklist(spark):
    # blocklist side canonicalizes too: case, www., trailing dot
    return spark.createDataFrame(
        [("Spam.Example",), ("www.tracker.example.com.",)], "host string"
    )


def test_domain_blocklist_subdomains(spark, corpus, blocklist):
    out = domain_blocklist(corpus, blocklist, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]
    # schema untouched
    assert out.columns == ["doc_id", "text"]


def test_domain_blocklist_exact_only(spark, corpus, blocklist):
    out = domain_blocklist(
        corpus, blocklist, "doc_id", include_subdomains=False
    )
    # the subdomain doc (2) survives without suffix expansion
    assert sorted(r.doc_id for r in out.collect()) == [2, 3, 4, 5]


def test_domain_blocklist_keep_missing_false(spark, corpus, blocklist):
    out = domain_blocklist(
        corpus, blocklist, "doc_id", keep_missing=False
    )
    assert sorted(r.doc_id for r in out.collect()) == [3, 5]


def test_domain_blocklist_url_col(spark, blocklist):
    df = spark.createDataFrame(
        [(1, "https://spam.example/a"), (2, "https://ok.example/b"),
         (3, None)],
        "doc_id long, url string",
    )
    out = domain_blocklist(df, blocklist, "doc_id", url_col="url")
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]


def test_domain_blocklist_host_col_resolution(spark, corpus):
    single = spark.createDataFrame([("spam.example",)], "h string")
    out = domain_blocklist(corpus, single, "doc_id")
    assert 1 not in {r.doc_id for r in out.collect()}
    two = spark.createDataFrame([("spam.example", 1)], "a string, b int")
    with pytest.raises(ValueError, match="host_col"):
        domain_blocklist(corpus, two, "doc_id")


def test_domain_blocklist_curate_step(spark, corpus, blocklist):
    from soda_spark_spark.pipeline import curate

    out, _ = curate(
        corpus, [{"kind": "domain_blocklist", "hosts": blocklist}]
    )
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]


def test_domain_blocklist_broadcasts_blocklist(spark, corpus, blocklist):
    out = domain_blocklist(corpus, blocklist, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
