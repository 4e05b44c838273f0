"""Named validity-format registry (Java-regex, executed by Spark `rlike`).

The reference exercises `uuid` and `number_percentage`
(/root/reference/tests/test_scan.py:51-58); the remaining named formats are
the soda-sql 2.x registry surface (SURVEY.md §2.2 V3). All patterns are
written and tested against Java regex semantics since they run inside
Catalyst (`rlike`), not a Python `re` engine.

Formats in NUMERIC_FORMATS additionally define how to parse the matched text
into a double so numeric metrics (min/max/avg/sum/variance/stddev) can be
computed over formatted text columns — e.g. `"28,42 %"` -> 28.42 under
`number_percentage` (/root/reference/tests/test_scan.py:164-169,304-317).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_D = r"[0-9]"

FORMATS: dict[str, str] = {
    "number_whole": rf"^[-+]?{_D}+$",
    "number_decimal_point": rf"^[-+]?{_D}+\.{_D}+$",
    "number_decimal_comma": rf"^[-+]?{_D}+,{_D}+$",
    "number_percentage": rf"^[-+]?{_D}+([.,]{_D}+)?\s*%\s*$",
    "number_money_usd": rf"^\$\s*{_D}{{1,3}}([,]{_D}{{3}})*(\.{_D}+)?$",
    "number_money_eur": rf"^€\s*{_D}{{1,3}}([.]{_D}{{3}})*(,{_D}+)?$",
    "date_us": rf"^{_D}{{1,2}}/{_D}{{1,2}}/{_D}{{4}}$",
    "date_eu": rf"^{_D}{{1,2}}-{_D}{{1,2}}-{_D}{{4}}$",
    "date_inverse": rf"^{_D}{{4}}-{_D}{{1,2}}-{_D}{{1,2}}$",
    "date_iso_8601": (
        rf"^{_D}{{4}}-{_D}{{2}}-{_D}{{2}}"
        rf"([T ]{_D}{{2}}:{_D}{{2}}(:{_D}{{2}}(\.{_D}+)?)?(Z|[-+]{_D}{{2}}:?{_D}{{2}})?)?$"
    ),
    "number_money_gbp": rf"^£\s*{_D}{{1,3}}([,]{_D}{{3}})*(\.{_D}+)?$",
    "time_24h": rf"^{_D}{{1,2}}:{_D}{{2}}(:{_D}{{2}})?$",
    "time_24h_nosec": rf"^{_D}{{1,2}}:{_D}{{2}}$",
    "time_12h": rf"^{_D}{{1,2}}:{_D}{{2}}(:{_D}{{2}})?\s*[aApP][mM]$",
    "time_12h_nosec": rf"^{_D}{{1,2}}:{_D}{{2}}\s*[aApP][mM]$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "email": r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
    "phone_number": r"^((\+[0-9]{1,3})|\(?[0-9]{2,4}\)?)[-. 0-9()]{4,}$",
    "ip_address": (
        r"^(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
        r"(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}$"
    ),
    "credit_card_number": r"^[0-9]{4}([- ]?[0-9]{4}){3}$",
    # full / compressed (::) IPv6, plus IPv4-mapped tails
    "ip_address_6": (
        r"^(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}"
        r"|([0-9a-fA-F]{1,4}:){1,7}:"
        r"|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}"
        r"|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}"
        r"|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}"
        r"|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}"
        r"|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}"
        r"|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})"
        r"|:((:[0-9a-fA-F]{1,4}){1,7}|:)"
        r"|::([fF]{4}(:0{1,4})?:)?((25[0-5]|(2[0-4]|1?[0-9])?[0-9])\.){3}"
        r"(25[0-5]|(2[0-4]|1?[0-9])?[0-9]))$"
    ),
}

# Formats whose values can be parsed to a number for numeric metrics.
NUMERIC_FORMATS = {
    "number_whole",
    "number_decimal_point",
    "number_decimal_comma",
    "number_percentage",
    "number_money_usd",
    "number_money_eur",
    "number_money_gbp",
}


def format_pattern(name: str) -> str:
    try:
        return FORMATS[name]
    except KeyError:
        raise ValueError(
            f"unknown valid_format {name!r}; known formats: {sorted(FORMATS)}"
        ) from None


def is_numeric_format(name: str | None) -> bool:
    return name is not None and name in NUMERIC_FORMATS


def parse_numeric(col: Column, fmt: str) -> Column:
    """Parse a text value matching a numeric format into a double.

    Normalization: strip currency/percent/space characters, convert a decimal
    comma to a point, drop thousands separators where unambiguous.
    """
    if fmt in ("number_whole", "number_decimal_point"):
        return col.cast("double")
    if fmt == "number_decimal_comma":
        return F.regexp_replace(col, ",", ".").cast("double")
    if fmt == "number_percentage":
        cleaned = F.regexp_replace(col, r"[%\s]", "")
        return F.regexp_replace(cleaned, ",", ".").cast("double")
    if fmt == "number_money_usd":
        return F.regexp_replace(col, r"[$,\s]", "").cast("double")
    if fmt == "number_money_gbp":
        return F.regexp_replace(col, r"[£,\s]", "").cast("double")
    if fmt == "number_money_eur":
        cleaned = F.regexp_replace(col, r"[€.\s]", "")
        return F.regexp_replace(cleaned, ",", ".").cast("double")
    raise ValueError(f"format {fmt!r} is not numeric-parseable")
