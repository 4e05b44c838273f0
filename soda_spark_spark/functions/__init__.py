from .formats import FORMATS, NUMERIC_FORMATS, format_pattern, is_numeric_format, parse_numeric
from .predicates import missing_expr, numeric_value_expr, validity_expr

__all__ = [
    "FORMATS",
    "NUMERIC_FORMATS",
    "format_pattern",
    "is_numeric_format",
    "parse_numeric",
    "missing_expr",
    "validity_expr",
    "numeric_value_expr",
]
