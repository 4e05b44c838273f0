"""Safe test-expression evaluator (T1-T4).

The reference stack evaluates test expressions with bare Python ``eval`` over
a namespace of metric values (observable via the NameError text surfaced in
/root/reference/tests/test_scan.py:488-493). This engine reproduces the same
*semantics* — including the exact ``name 'x' is not defined`` error text —
through an AST-whitelist evaluator, never bare ``eval``.
"""

from __future__ import annotations

import ast
import operator
from typing import Any

_BIN_OPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
}
_CMP_OPS = {
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
    ast.In: lambda a, b: a in b,
    ast.NotIn: lambda a, b: a not in b,
    ast.Is: operator.is_,
    ast.IsNot: operator.is_not,
}
_UNARY_OPS = {
    ast.USub: operator.neg,
    ast.UAdd: operator.pos,
    ast.Not: operator.not_,
}
_SAFE_FUNCS = {"abs": abs, "min": min, "max": max, "round": round, "len": len}


class UnsafeExpressionError(ValueError):
    pass


def _eval_node(node: ast.AST, namespace: dict[str, Any]) -> Any:
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, namespace)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float, str, bool, type(None))):
            return node.value
        raise UnsafeExpressionError(f"literal {node.value!r} not allowed")
    if isinstance(node, ast.Name):
        if node.id in namespace:
            return namespace[node.id]
        if node.id in _SAFE_FUNCS:
            return _SAFE_FUNCS[node.id]
        # exact reference error text (tests/test_scan.py:492)
        raise NameError(f"name '{node.id}' is not defined")
    if isinstance(node, ast.BinOp) and type(node.op) in _BIN_OPS:
        return _BIN_OPS[type(node.op)](
            _eval_node(node.left, namespace), _eval_node(node.right, namespace)
        )
    if isinstance(node, ast.UnaryOp) and type(node.op) in _UNARY_OPS:
        return _UNARY_OPS[type(node.op)](_eval_node(node.operand, namespace))
    if isinstance(node, ast.BoolOp):
        # Lazy, like Python's and/or: stop at the first falsy (And) / truthy
        # (Or) operand so `values_count == 0 or avg > 1` never touches `avg`.
        if isinstance(node.op, ast.And):
            out: Any = True
            for child in node.values:
                out = _eval_node(child, namespace)
                if not out:
                    return out
            return out
        out = False
        for child in node.values:
            out = _eval_node(child, namespace)
            if out:
                return out
        return out
    if isinstance(node, ast.Compare):
        left = _eval_node(node.left, namespace)
        for op, comp in zip(node.ops, node.comparators):
            if type(op) not in _CMP_OPS:
                raise UnsafeExpressionError(f"operator {op!r} not allowed")
            right = _eval_node(comp, namespace)
            if not _CMP_OPS[type(op)](left, right):
                return False
            left = right
        return True
    if isinstance(node, ast.Call):
        func = node.func
        if not isinstance(func, ast.Name) or func.id not in _SAFE_FUNCS:
            raise UnsafeExpressionError("only abs/min/max/round/len calls allowed")
        args = [_eval_node(a, namespace) for a in node.args]
        if node.keywords:
            raise UnsafeExpressionError("keyword arguments not allowed")
        return _SAFE_FUNCS[func.id](*args)
    if isinstance(node, (ast.Tuple, ast.List)):
        return [_eval_node(e, namespace) for e in node.elts]
    if isinstance(node, ast.IfExp):
        return (
            _eval_node(node.body, namespace)
            if _eval_node(node.test, namespace)
            else _eval_node(node.orelse, namespace)
        )
    raise UnsafeExpressionError(f"expression node {type(node).__name__} not allowed")


def safe_eval(expression: str, namespace: dict[str, Any]) -> Any:
    """Evaluate a test expression over metric values.

    Raises NameError for unknown metric names (the reference's error channel)
    and UnsafeExpressionError for disallowed syntax.
    """
    tree = ast.parse(expression, mode="eval")
    return _eval_node(tree, namespace)


def referenced_names(expression: str) -> list[str]:
    """Metric names referenced by an expression, in first-appearance order."""
    tree = ast.parse(expression, mode="eval")
    seen: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in _SAFE_FUNCS:
            if node.id not in seen:
                seen.append(node.id)
    return seen
