"""Missingness / validity predicate builders (SURVEY.md §2.3, normative).

- ``miss(c)`` = ``c IS NULL``, extended by ``missing_values`` /
  ``missing_format`` / ``missing_regex`` when configured.
- ``valid(c)`` = conjunction of configured validity constraints; vacuously
  true when none configured (so valid_count == values_count by default,
  consistent with /root/reference/tests/test_scan.py:233).

All predicates are plain Catalyst ``Column`` expressions — they run inside
whole-stage codegen, never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .formats import format_pattern, is_numeric_format, parse_numeric


def missing_expr(col: Column, cfg) -> Column:
    """Build miss(c). `cfg` is a ColumnConfig or None."""
    pred = col.isNull()
    if cfg is not None:
        if cfg.missing_values:
            pred = pred | col.isin([v for v in cfg.missing_values])
        if cfg.missing_format:
            pred = pred | col.cast("string").rlike(format_pattern(cfg.missing_format))
        if cfg.missing_regex:
            pred = pred | col.cast("string").rlike(cfg.missing_regex)
    return pred


def validity_expr(col: Column, cfg, *, is_text: bool) -> Column | None:
    """Build valid(c) over non-missing values, or None when no validity
    constraints are configured (vacuous truth)."""
    if cfg is None:
        return None
    preds: list[Column] = []
    if cfg.valid_format:
        preds.append(col.cast("string").rlike(format_pattern(cfg.valid_format)))
    if cfg.valid_regex:
        preds.append(col.cast("string").rlike(cfg.valid_regex))
    if cfg.valid_values:
        preds.append(col.isin(list(cfg.valid_values)))
    if cfg.valid_min is not None or cfg.valid_max is not None:
        # numeric bounds; for text under a numeric format compare parsed value
        target = col
        if is_text and is_numeric_format(cfg.valid_format):
            target = parse_numeric(col, cfg.valid_format)
        if cfg.valid_min is not None:
            preds.append(target >= F.lit(cfg.valid_min))
        if cfg.valid_max is not None:
            preds.append(target <= F.lit(cfg.valid_max))
    if cfg.valid_min_length is not None:
        preds.append(F.length(col) >= F.lit(cfg.valid_min_length))
    if cfg.valid_max_length is not None:
        preds.append(F.length(col) <= F.lit(cfg.valid_max_length))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def numeric_value_expr(col: Column, cfg, *, is_text: bool, is_numeric: bool) -> Column | None:
    """num(c): the numeric expression metrics aggregate over, or None when the
    column has no numeric interpretation.

    - plain numeric column -> the column itself
    - text column with a numeric valid_format -> parsed double
      (e.g. "28,42 %" -> 28.42; /root/reference/tests/test_scan.py:164-169)
    """
    if is_numeric:
        return col
    if is_text and cfg is not None and is_numeric_format(cfg.valid_format):
        return parse_numeric(col, cfg.valid_format)
    return None
