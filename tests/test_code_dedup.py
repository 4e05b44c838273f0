"""Comment stripping (`operators/code_dedup.py`) and repo license
propagation (`code_text.propagate_repo_license`): lexer contracts
(string-awareness, both families), the dedup-key composition, and
the broadcast-join plan shape."""

from __future__ import annotations

from soda_spark_spark.operators.code_dedup import (
    code_comment_strip,
    normalize_code,
    strip_code_comments,
)
from soda_spark_spark.operators.code_text import propagate_repo_license


def test_c_family_lexer():
    src = 'int x; // note\ny = "a // not comment";\n/* b\nc */z;'
    assert strip_code_comments(src, "c") == (
        'int x; \ny = "a // not comment";\n\n z;'
    )
    # token fusion guard: block comment becomes one space
    assert strip_code_comments("a/*x*/b", "c") == "a b"
    # escapes inside strings
    assert strip_code_comments(
        'e = "a\\"b // in"; // real', "c"
    ) == 'e = "a\\"b // in"; '
    # unterminated block comment drops to EOI, newlines survive
    assert strip_code_comments("/* open\nrest", "c") == "\n "


def test_hash_family_lexer():
    src = "x = 1  # c\ns = '# not'\n\"\"\"doc # keeps\"\"\"\n"
    assert strip_code_comments(src, "hash") == (
        "x = 1  \ns = '# not'\n\"\"\"doc # keeps\"\"\"\n"
    )
    # unknown family passes through unchanged — never guess a grammar
    assert strip_code_comments("# stays", None) == "# stays"
    assert strip_code_comments(None, "c") is None


def test_normalize_and_dedup_key_equivalence():
    a = "def f():   \n    return 1  # one\n\n"
    b = "def f():\n    return 1\n"
    assert normalize_code(strip_code_comments(a, "hash")) == (
        normalize_code(strip_code_comments(b, "hash"))
    )


def test_code_comment_strip_dataframe(spark):
    rows = [
        (1, "python", "x = 1  # c\n\ny = 2"),
        (2, "c", "a; // c\nb;"),
        (3, "fortran", "! stays\nx"),  # unknown family: unchanged
        (4, "python", None),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    got = {r.id: r.text_stripped
           for r in code_comment_strip(df, "text", "lang").collect()}
    assert got[1] == "x = 1\ny = 2"
    assert got[2] == "a;\nb;"
    assert got[3] == "! stays\nx"
    assert got[4] is None


def test_repo_license_propagation(spark):
    rows = [
        ("repoA/LICENSE", "MIT"),
        ("repoA/src/main.py", None),
        ("repoA/src/own.py", "Apache-2.0"),  # own header wins
        ("repoB/deep/f.go", None),  # no license file -> NULL
        ("repoC/COPYING", "GPL-3.0"),
        ("repoC/licence", "MIT"),  # disagreement: lexicographic min
        ("repoC/x.c", None),
    ]
    df = spark.createDataFrame(rows, "path string, license string")
    out = {r.path: r.effective_license
           for r in propagate_repo_license(df).collect()}
    assert out["repoA/src/main.py"] == "MIT"
    assert out["repoA/src/own.py"] == "Apache-2.0"
    assert out["repoB/deep/f.go"] is None
    assert out["repoC/x.c"] == "GPL-3.0"  # min('GPL-3.0','MIT')


def test_repo_license_plan_broadcasts(spark):
    df = spark.createDataFrame(
        [("r/LICENSE", "MIT"), ("r/a.py", None)],
        "path string, license string",
    )
    plan = propagate_repo_license(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Broadcast" in plan  # repo side broadcasts, files never shuffle
    assert "BatchEvalPython" not in plan