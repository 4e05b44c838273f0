"""SFT shaping (`operators/sft.py`): template rendering, the
mask/token alignment law, empty-segment safety, and the pure-JVM
plan contract."""

from __future__ import annotations

from soda_spark_spark.operators.sft import (
    CHAT_TEMPLATE_VERSION,
    render_chat,
    sft_token_mask,
)


def test_render_template_and_version(spark):
    df = spark.createDataFrame(
        [(1, "hi there", "hello back")], "id long, p string, r string"
    )
    row = render_chat(df, "p", "r").collect()[0]
    assert row.rendered == (
        "<|user|>\nhi there\n<|assistant|>\nhello back<|end|>"
    )
    assert row.template_version == CHAT_TEMPLATE_VERSION


def test_mask_alignment_law(spark):
    df = spark.createDataFrame(
        [(1, "a b", "x y z")], "id long, p string, r string"
    )
    row = sft_token_mask(df, "p", "r").collect()[0]
    assert row.tokens == [
        "<|user|>", "a", "b", "<|assistant|>", "x", "y", "z", "<|end|>",
    ]
    assert row.loss_mask == [0, 0, 0, 0, 1, 1, 1, 1]
    assert len(row.tokens) == len(row.loss_mask) == row.n_tokens
    assert row.n_loss_tokens == 4  # response span + end token


def test_empty_and_null_segments(spark):
    rows = [(1, "", "only answer"), (2, "only prompt", None)]
    df = spark.createDataFrame(rows, "id long, p string, r string")
    got = {r.id: r for r in sft_token_mask(df, "p", "r").collect()}
    # empty prompt: no prompt tokens, never ['']
    assert got[1].tokens == [
        "<|user|>", "<|assistant|>", "only", "answer", "<|end|>",
    ]
    assert got[1].loss_mask == [0, 0, 1, 1, 1]
    # null response: markers + end only; loss on the end token alone
    assert got[2].tokens[-2:] == ["<|assistant|>", "<|end|>"]
    assert got[2].n_loss_tokens == 1


def test_sft_plan_is_pure_jvm(spark):
    df = spark.createDataFrame(
        [(1, "p", "r")], "id long, p string, r string"
    )
    out = sft_token_mask(render_chat(df, "p", "r"), "p", "r")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan