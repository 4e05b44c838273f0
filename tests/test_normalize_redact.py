"""Tests for normalize_text and redact_pii."""

from __future__ import annotations

from soda_spark_spark.operators import text as TX


class TestNormalizeText:
    def test_basic(self, spark):
        df = spark.createDataFrame(
            [(1, "  Hello\tWorld \x07 FOO  \n bar "), (2, ""), (3, None)],
            ["id", "text"],
        )
        out = {r["id"]: r["text"] for r in
               TX.normalize_text(df, "text").collect()}
        assert out[1] == "hello world foo bar"
        assert out[2] == ""
        assert out[3] is None

    def test_flags_and_out_col(self, spark):
        df = spark.createDataFrame([(1, " A  B ")], ["id", "text"])
        r = TX.normalize_text(
            df, "text", lowercase=False, out_col="norm"
        ).collect()[0]
        assert r["text"] == " A  B "
        assert r["norm"] == "A B"

    def test_control_only(self, spark):
        df = spark.createDataFrame([(1, "a\x00b\x1fc\x7fd")], ["id", "text"])
        r = TX.normalize_text(df, "text", collapse_whitespace=False,
                              lowercase=False).collect()[0]
        assert r["text"] == "abcd"

    def test_newline_tab_survive_control_strip(self, spark):
        # \t (0x09) / \n (0x0A) / \r (0x0D) are whitespace, not stripped as
        # control chars — they fold into spaces via collapse_whitespace
        df = spark.createDataFrame([(1, "a\tb\nc\rd")], ["id", "text"])
        r = TX.normalize_text(df, "text", lowercase=False).collect()[0]
        assert r["text"] == "a b c d"


class TestRedactPII:
    def test_all_kinds(self, spark):
        t = ("mail bob.smith+x@ex-a.io from 192.168.0.1 call +1 (555) 123-4567 "
             "see https://u:p@host.example/x?y=1 end")
        df = spark.createDataFrame([(1, t)], ["id", "text"])
        r = TX.redact_pii(df, "text").collect()[0]["text"]
        assert "<EMAIL>" in r and "<IP>" in r and "<PHONE>" in r and "<URL>" in r
        assert "bob.smith" not in r
        assert "192.168" not in r
        assert "host.example" not in r
        assert r.endswith("end")

    def test_url_consumes_userinfo_email(self, spark):
        df = spark.createDataFrame(
            [(1, "go https://user@host.example/p now")], ["id", "text"]
        )
        r = TX.redact_pii(df, "text").collect()[0]["text"]
        assert r == "go <URL> now"

    def test_kind_subset(self, spark):
        df = spark.createDataFrame(
            [(1, "a@b.com at 10.0.0.1")], ["id", "text"]
        )
        r = TX.redact_pii(df, "text", kinds=["email"]).collect()[0]["text"]
        assert r == "<EMAIL> at 10.0.0.1"

    def test_unknown_kind_raises(self, spark):
        df = spark.createDataFrame([(1, "x")], ["id", "text"])
        try:
            TX.redact_pii(df, "text", kinds=["ssn"])
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_counts_consistent_with_pii_counts(self, spark):
        # redacting then counting finds zero PII: count-then-redact
        # pipelines see consistent hits
        t = "a@b.com 10.0.0.1 +1 5551234567 https://h.example/p"
        df = spark.createDataFrame([(1, t)], ["id", "text"])
        red = TX.redact_pii(df, "text")
        counts = TX.pii_counts(red, "id", "text").collect()[0]
        assert (counts["url_count"], counts["email_count"],
                counts["ipv4_count"], counts["phone_count"]) == (0, 0, 0, 0)

    def test_out_col(self, spark):
        df = spark.createDataFrame([(1, "a@b.com")], ["id", "text"])
        r = TX.redact_pii(df, "text", out_col="clean").collect()[0]
        assert r["text"] == "a@b.com" and r["clean"] == "<EMAIL>"
