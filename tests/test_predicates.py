"""Unit tests for format registry + missing/validity predicate builders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.functions.formats import FORMATS, parse_numeric
from soda_spark_spark.functions.predicates import missing_expr, validity_expr
from soda_spark_spark.plans.definition import ColumnConfig

FORMAT_CASES = [
    ("uuid", "a76824f0-50c0-11eb-8be8-88e9fe6293fd", True),
    ("uuid", "not-a-uuid", False),
    ("number_whole", "123", True),
    ("number_whole", "-45", True),
    ("number_whole", "1.5", False),
    ("number_decimal_point", "1234.56", True),
    ("number_decimal_point", "1234,56", False),
    ("number_decimal_comma", "1234,56", True),
    ("number_percentage", "28,42 %", True),
    ("number_percentage", "28.42%", True),
    ("number_percentage", "28 pct", False),
    ("number_money_usd", "$1,234.56", True),
    ("number_money_eur", "€1.234,56", True),
    ("email", "a.b+c@example.co", True),
    ("email", "not an email", False),
    ("date_us", "12/31/2021", True),
    ("date_eu", "31-12-2021", True),
    ("date_inverse", "2021-12-31", True),
    ("date_iso_8601", "2021-12-31T23:59:59Z", True),
    ("time_24h", "23:59", True),
    ("time_12h", "11:59 PM", True),
    ("ip_address", "192.168.0.255", True),
    ("ip_address", "999.1.1.1", False),
    ("phone_number", "+31 6 1234 5678", True),
    ("credit_card_number", "1234-5678-9012-3456", True),
]


@pytest.mark.parametrize(("fmt", "value", "matches"), FORMAT_CASES)
def test_format_regexes_java_semantics(spark, fmt, value, matches):
    """Formats run as Spark rlike (Java regex) — test them there, not in
    Python re (SURVEY.md §4 physical-execution note)."""
    df = spark.createDataFrame([(value,)], "v string")
    out = df.select(F.col("v").rlike(FORMATS[fmt]).alias("m")).first().m
    assert out is matches


@pytest.mark.parametrize(
    ("fmt", "value", "expected"),
    [
        ("number_percentage", "28,42 %", 28.42),
        ("number_percentage", "11.92%", 11.92),
        ("number_whole", "-45", -45.0),
        ("number_decimal_comma", "1234,56", 1234.56),
        ("number_money_usd", "$1,234.56", 1234.56),
        ("number_money_eur", "€1.234,56", 1234.56),
    ],
)
def test_parse_numeric(spark, fmt, value, expected):
    df = spark.createDataFrame([(value,)], "v string")
    out = df.select(parse_numeric(F.col("v"), fmt).alias("n")).first().n
    assert out == pytest.approx(expected)


def test_missing_values_config(spark):
    df = spark.createDataFrame(
        [("a",), ("N/A",), (None,), ("-",), ("b",)], "v string"
    )
    cfg = ColumnConfig(name="v", missing_values=["N/A", "-"])
    n = df.filter(missing_expr(F.col("v"), cfg)).count()
    assert n == 3  # null + two sentinel values


def test_missing_regex_config(spark):
    df = spark.createDataFrame([("x",), ("  ",), (None,)], "v string")
    cfg = ColumnConfig(name="v", missing_regex=r"^\s*$")
    assert df.filter(missing_expr(F.col("v"), cfg)).count() == 2


def test_validity_bounds_and_lengths(spark):
    df = spark.createDataFrame(
        [(5, "abc"), (15, "toolongvalue"), (-2, "xy")], "n int, s string"
    )
    ncfg = ColumnConfig(name="n", valid_min=0, valid_max=10)
    scfg = ColumnConfig(name="s", valid_min_length=3, valid_max_length=5)
    nvalid = validity_expr(F.col("n"), ncfg, is_text=False)
    svalid = validity_expr(F.col("s"), scfg, is_text=True)
    assert df.filter(nvalid).count() == 1  # only 5
    assert df.filter(svalid).count() == 1  # only "abc"


def test_validity_vacuous_none(spark):
    cfg = ColumnConfig(name="v")
    assert validity_expr(F.col("v"), cfg, is_text=True) is None
    assert validity_expr(F.col("v"), None, is_text=True) is None


def test_valid_values_and_regex_conjunction(spark):
    df = spark.createDataFrame([("aa",), ("ab",), ("ba",)], "v string")
    cfg = ColumnConfig(name="v", valid_values=["aa", "ab", "ba"], valid_regex="^a")
    assert df.filter(validity_expr(F.col("v"), cfg, is_text=True)).count() == 2


def test_new_format_registry_entries(spark):
    """Round-2 registry additions: GBP money, nosec times, IPv6."""
    from soda_spark_spark.functions.formats import FORMATS, parse_numeric
    from pyspark.sql import functions as F

    cases = {
        "number_money_gbp": (["£1,234.50", "£7"], ["$7", "£1,2"]),
        "time_24h_nosec": (["09:30", "23:59"], ["09:30:00", "9h30"]),
        "time_12h_nosec": (["9:30 pm", "11:05AM"], ["9:30:00 pm", "9:30"]),
        "ip_address_6": (
            ["2001:db8:85a3::8a2e:370:7334", "::1", "fe80::", "::ffff:192.0.2.1"],
            ["2001:db8:::1", "192.168.0.1", "g::1"],
        ),
    }
    for fmt, (good, bad) in cases.items():
        df = spark.createDataFrame([(v,) for v in good + bad], "v string")
        n = df.filter(F.col("v").rlike(FORMATS[fmt])).count()
        assert n == len(good), (fmt, n)
    # GBP parses to a number
    df = spark.createDataFrame([("£1,234.50",)], "v string")
    out = df.select(parse_numeric(F.col("v"), "number_money_gbp").alias("x")).first()
    assert out.x == 1234.5
