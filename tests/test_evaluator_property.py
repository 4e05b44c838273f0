"""Property test: safe_eval must agree with Python's bare eval on every
expression the test grammar can produce — the T1-T4 parity contract
(the reference evaluates test expressions with bare eval; evaluator.py:1-8).
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from soda_spark_spark.operators.evaluator import safe_eval

names = st.sampled_from(["row_count", "missing_count", "avg", "x", "y"])
numbers = st.one_of(
    st.integers(min_value=-100, max_value=100),
    st.floats(min_value=-100, max_value=100, allow_nan=False).map(
        lambda f: round(f, 3)
    ),
)


def atoms():
    return st.one_of(names, numbers.map(repr))


@st.composite
def expressions(draw, depth=0):
    if depth >= 3:
        return draw(atoms())
    kind = draw(st.integers(min_value=0, max_value=6))
    if kind == 0:
        return draw(atoms())
    a = draw(expressions(depth=depth + 1))  # type: ignore[call-arg]
    b = draw(expressions(depth=depth + 1))  # type: ignore[call-arg]
    if kind == 1:
        op = draw(st.sampled_from(["+", "-", "*"]))
        return f"({a} {op} {b})"
    if kind == 2:
        op = draw(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]))
        return f"({a} {op} {b})"
    if kind == 3:
        op = draw(st.sampled_from(["and", "or"]))
        return f"({a} {op} {b})"
    if kind == 4:
        return f"(not {a})"
    if kind == 5:
        fn = draw(st.sampled_from(["abs", "min", "max"]))
        return f"{fn}({a})" if fn == "abs" else f"{fn}({a}, {b})"
    return f"({a} if {b} else {a})"


@settings(max_examples=300, deadline=None)
@given(expr=expressions(), rc=numbers, mc=numbers, avg=numbers)
def test_safe_eval_matches_bare_eval(expr, rc, mc, avg):
    namespace = {"row_count": rc, "missing_count": mc, "avg": avg}
    try:
        expected = eval(expr, {"__builtins__": {"abs": abs, "min": min, "max": max}}, dict(namespace))  # noqa: S307
        expected_exc = None
    except Exception as exc:
        expected, expected_exc = None, exc
    try:
        got = safe_eval(expr, namespace)
        got_exc = None
    except Exception as exc:
        got, got_exc = None, exc
    if expected_exc is not None:
        assert got_exc is not None and type(got_exc) is type(expected_exc), (
            expr, expected_exc, got_exc
        )
        if isinstance(expected_exc, NameError):
            assert str(got_exc) == str(expected_exc)
    else:
        assert got_exc is None, (expr, got_exc)
        assert got == expected or (got != got and expected != expected), (
            expr, got, expected
        )
