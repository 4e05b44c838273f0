"""Unit tests for the AST-whitelist test-expression evaluator."""

from __future__ import annotations

import pytest

from soda_spark_spark.operators.evaluator import (
    UnsafeExpressionError,
    referenced_names,
    safe_eval,
)

NS = {"row_count": 6, "missing_count": 0, "invalid_percentage": 0.0, "avg": 3.5}


@pytest.mark.parametrize(
    ("expr", "expected"),
    [
        ("row_count > 0", True),
        ("row_count == 6", True),
        ("invalid_percentage == 0", True),
        ("missing_count == 0 and row_count > 5", True),
        ("row_count > 10 or missing_count == 0", True),
        ("not (row_count < 0)", True),
        ("0 <= invalid_percentage <= 5", True),
        ("row_count + missing_count == 6", True),
        ("row_count / 2 == 3", True),
        ("row_count ** 2 == 36", True),
        ("-row_count == -6", True),
        ("abs(-5) == 5", True),
        ("min(row_count, 3) == 3", True),
        ("round(avg) == 4", True),
        ("row_count in (5, 6, 7)", True),
        ("avg > 100", False),
        ("row_count == 6 if avg > 1 else False", True),
    ],
)
def test_expressions(expr, expected):
    assert safe_eval(expr, NS) == expected


def test_unknown_name_exact_error_text():
    """Must match the reference error channel text verbatim
    (/root/reference/tests/test_scan.py:492)."""
    with pytest.raises(NameError) as exc:
        safe_eval("metric_name > 30", NS)
    assert str(exc.value) == "name 'metric_name' is not defined"


@pytest.mark.parametrize(
    "expr",
    [
        "__import__('os').system('true')",
        "open('/etc/passwd')",
        "row_count.__class__",
        "(lambda: 1)()",
        "[x for x in (1,2)]",
        "exec('1')",
        "f'{row_count}'",
    ],
)
def test_unsafe_expressions_rejected(expr):
    with pytest.raises((UnsafeExpressionError, NameError, SyntaxError)):
        safe_eval(expr, NS)


def test_referenced_names():
    assert referenced_names("row_count > 0 and foo < bar") == ["row_count", "foo", "bar"]
    assert referenced_names("abs(x) > 1") == ["x"]  # safe funcs excluded
