"""Conversation shaping (`operators/chat.py`) and the HTML->Markdown
projection (`operators/html_markdown.py`): role normalization across
both key conventions, every structural law, DPO gate precedence, and
the per-rule markdown projection."""

from __future__ import annotations

import json

import pytest

from soda_spark_spark.operators.chat import (
    conversation_pairs,
    dpo_pairs,
    flatten_conversations,
)
from soda_spark_spark.operators.html_markdown import html_to_markdown


def _conv(*turns):
    return json.dumps(list(turns))


@pytest.fixture(scope="module")
def flat(spark):
    rows = [
        (1, _conv({"role": "system", "content": "s"},
                  {"role": "user", "content": "q1"},
                  {"role": "assistant", "content": "a1"})),
        (2, _conv({"from": "human", "value": "hi"},
                  {"from": "gpt", "value": "yo"})),
        (3, _conv({"role": "user", "content": "no reply"})),
        (4, _conv({"role": "user", "content": "u"},
                  {"role": "user", "content": "uu"},
                  {"role": "assistant", "content": "a"})),
        (5, _conv({"role": "narrator", "content": "x"},
                  {"role": "assistant", "content": "y"})),
        (6, "{broken"),
        (7, _conv({"role": "user", "content": "q"},
                  {"role": "assistant", "content": "   "})),
        (8, _conv({"role": "user", "content": "q"},
                  {"role": "system", "content": "late system"},
                  {"role": "assistant", "content": "a"})),
    ]
    df = spark.createDataFrame(rows, "id long, conv string")
    return {
        (r.id, r.turn_index): r
        for r in flatten_conversations(df, "id", "conv").collect()
    }


def test_flatten_valid_conversation(flat):
    r = flat[(1, 0)]
    assert r.role == "system" and r.valid and r.n_turns == 3
    assert flat[(1, 2)].role == "assistant"


def test_flatten_sharegpt_keys_normalize(flat):
    assert flat[(2, 0)].role == "user"
    assert flat[(2, 1)].role == "assistant"
    assert flat[(2, 0)].valid


def test_flatten_structural_failures(flat):
    assert not flat[(3, 0)].ends_with_assistant and not flat[(3, 0)].valid
    assert not flat[(4, 0)].alternates and not flat[(4, 0)].valid
    assert not flat[(5, 0)].roles_known and flat[(5, 0)].role == "unknown"
    assert flat[(7, 0)].has_empty_turn and not flat[(7, 0)].valid
    # a system turn anywhere but position 0 breaks starts_ok
    assert not flat[(8, 0)].starts_ok


def test_flatten_malformed_json_survives_as_one_row(flat):
    r = flat[(6, None)]
    assert r.parse_ok is False and r.role is None
    assert r.valid is None  # no structure to judge


def test_conversation_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, _conv({"role": "system", "content": "s"},
                      {"role": "user", "content": "q1"},
                      {"role": "assistant", "content": "a1"},
                      {"role": "user", "content": "q2"},
                      {"role": "assistant", "content": "a2"})),
            (2, "{broken"),
            (3, _conv({"role": "assistant", "content": "orphan"})),
        ],
        "id long, conv string",
    )
    got = [
        (r.id, r.pair_index, r.prompt, r.response)
        for r in conversation_pairs(df, "id", "conv")
        .orderBy("id", "pair_index").collect()
    ]
    assert got == [(1, 0, "q1", "a1"), (1, 1, "q2", "a2")]


def test_dpo_gate_precedence_and_render(spark):
    df = spark.createDataFrame(
        [
            (1, "p", "a good long answer", "short"),
            (2, "p", "same", "same"),
            (3, " ", "c", "r"),                       # blank prompt
            (4, "p", " ".join(["w"] * 99), "w"),      # ratio 99
            (5, "p", "", ""),                          # empty AND equal
        ],
        "id long, prompt string, chosen string, rejected string",
    )
    got = {r.id: r for r in dpo_pairs(df, "prompt", "chosen", "rejected").collect()}
    assert got[1].keep and got[1].drop_reason is None
    assert got[1].chosen_text == "<|user|>\np\n<|assistant|>\na good long answer<|end|>"
    assert got[1].template_version == "chatml-mini/1"
    assert got[2].drop_reason == "degenerate"
    assert got[3].drop_reason == "empty"
    assert got[4].drop_reason == "extreme_ratio"
    assert got[5].drop_reason == "empty"  # empty outranks degenerate
    assert got[2].chosen_text is None  # render is survivors-only


# --------------------------------------------------- html -> markdown


@pytest.mark.parametrize("html,md", [
    ("<h1>T</h1><p>body</p>", "# T\n\nbody"),
    ("<h3>deep</h3>", "### deep"),
    ("<p><strong>b</strong> <em>i</em> <code>c</code></p>",
     "**b** *i* `c`"),
    ('<a href="u">x</a>', "[x](u)"),
    ("<a>bare</a>", "bare"),
    ('<img src="s.png" alt="alt text">', "![alt text](s.png)"),
    ("<ul><li>a</li><li>b</li></ul>", "- a\n- b"),
    ("<ol><li>a</li><li>b</li></ol>", "1. a\n2. b"),
    ("<ul><li>a<ul><li>sub</li></ul></li></ul>", "- a\n  - sub"),
    ("<blockquote>q</blockquote>", "> q"),
    ("<blockquote><blockquote>qq</blockquote></blockquote>", "> > qq"),
    ("<pre>x = 1\n  y = 2</pre>", "```\nx = 1\n  y = 2\n```"),
    ("a<hr>b", "a\n\n---\n\nb"),
    ("<p>l1<br>l2</p>", "l1\nl2"),
    ("<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>",
     "| A | B |\n| --- | --- |\n| 1 | 2 |"),
    ("<table><tr><td>1<td>2</tr></table>", "| 1 | 2 |"),
    ("<script>x</script><p>vis</p>", "vis"),
    ("<p>a &amp; b</p>", "a & b"),
    ("", ""),
])
def test_markdown_rules(html, md):
    assert html_to_markdown(html) == md


def test_markdown_null_and_malformed():
    assert html_to_markdown(None) is None
    # round-18 recovery law: formatting left open at block end CLOSES
    # there instead of leaving a half-rendered marker
    assert html_to_markdown("<b>unclosed") == "**unclosed**"
    assert isinstance(html_to_markdown("<<<>>><td></td>"), str)


def test_markdown_pre_keeps_markup_as_text():
    assert html_to_markdown("<pre><b>not bold</b></pre>") == (
        "```\nnot bold\n```"
    )


def test_markdown_operator(spark):
    from soda_spark_spark.operators.html_markdown import html_markdown

    df = spark.createDataFrame(
        [(1, "<h1>t</h1>"), (2, None)], "doc_id long, html string"
    )
    got = {r.id: r.markdown for r in html_markdown(df, "doc_id", "html").collect()}
    assert got == {1: "# t", 2: None}


# ------------------------------------------------- tool-call traces


def test_validate_tool_calls_laws(spark):
    import json as _json

    from soda_spark_spark.operators.chat import validate_tool_calls

    def c(*turns):
        return _json.dumps(list(turns))

    call = lambda i, name="search", args="{}": {  # noqa: E731
        "id": i, "name": name, "arguments": args}
    rows = [
        (1, c({"role": "user", "content": "q"},
              {"role": "assistant", "tool_calls": [call("c1", args='{"q":"x"}')]},
              {"role": "tool", "tool_call_id": "c1", "content": "r"},
              {"role": "assistant", "content": "done"})),
        (2, c({"role": "assistant", "tool_calls": [call("c1", args="[1,2]")]},
              {"role": "tool", "tool_call_id": "c1", "content": "r"})),
        (3, c({"role": "assistant", "tool_calls": [call("c1")]},
              {"role": "assistant", "content": "gave up"})),
        (4, c({"role": "tool", "tool_call_id": "nope", "content": "r"})),
        (5, c({"role": "tool", "tool_call_id": "c1", "content": "r"},
              {"role": "assistant", "tool_calls": [call("c1")]})),
        (6, c({"role": "assistant", "tool_calls": [call("c1", name="hack")]},
              {"role": "tool", "tool_call_id": "c1", "content": "r"})),
        (7, "{nope"),
        (8, c({"role": "assistant", "tool_calls": [
                call("a"), call("b", name="fetch", args='{"u":"v"}')]},
              {"role": "tool", "tool_call_id": "a", "content": "r"},
              {"role": "tool", "tool_call_id": "b", "content": "r"})),
    ]
    df = spark.createDataFrame(rows, "id long, conv string")
    got = {r.id: r for r in validate_tool_calls(
        df, "id", "conv", allowed_tools=["search", "fetch"]).collect()}
    assert got[1].valid and got[1].n_calls == 1
    assert got[2].n_bad_args == 1 and not got[2].valid
    assert got[3].n_unanswered == 1
    assert got[4].n_orphan_results == 1 and got[4].n_calls == 0
    # a result BEFORE its call is an orphan AND leaves the call
    # unanswered — ordering is the law
    assert got[5].n_orphan_results == 1 and got[5].n_unanswered == 1
    assert got[6].n_unknown_tools == 1
    assert got[7].parse_ok is False and got[7].valid is None
    assert got[8].valid and got[8].n_calls == 2


def test_validate_tool_calls_without_registry(spark):
    import json as _json

    from soda_spark_spark.operators.chat import validate_tool_calls

    df = spark.createDataFrame(
        [(1, _json.dumps([
            {"role": "assistant",
             "tool_calls": [{"id": "x", "name": "anything",
                             "arguments": "{}"}]},
            {"role": "tool", "tool_call_id": "x", "content": "r"},
        ]))],
        "id long, conv string",
    )
    r = validate_tool_calls(df, "id", "conv").collect()[0]
    assert r.n_unknown_tools == 0 and r.valid


# --------------------------------------------- preference pair mining


def test_preference_pairs_from_scores(spark):
    from soda_spark_spark.operators.chat import preference_pairs_from_scores

    cand = spark.createDataFrame(
        [(1, "a", 0.1), (1, "b", 0.9), (1, "c", 0.5),
         (2, "x", 0.5), (2, "y", 0.5),   # all tied
         (3, "only", 0.7)],               # one candidate
        "pid long, response string, score double",
    )
    got = {r.pid: r for r in preference_pairs_from_scores(
        cand, "pid", "response", "score", min_margin=0.2).collect()}
    assert got[1].chosen == "b" and got[1].rejected == "a"
    assert got[1].margin == 0.8 and got[1].keep
    # ties break deterministically by response string
    assert got[2].chosen == "y" and got[2].rejected == "x"
    assert not got[2].keep and got[2].margin == 0.0
    # a single candidate carries no preference signal
    assert got[3].chosen == got[3].rejected == "only"
    assert not got[3].keep and got[3].n_candidates == 1


def test_preference_pairs_margin_gate(spark):
    from soda_spark_spark.operators.chat import preference_pairs_from_scores

    cand = spark.createDataFrame(
        [(1, "lo", 0.25), (1, "hi", 0.75)],
        "pid long, response string, score double",
    )
    below = preference_pairs_from_scores(
        cand, "pid", "response", "score", min_margin=0.75).collect()[0]
    at = preference_pairs_from_scores(
        cand, "pid", "response", "score", min_margin=0.5).collect()[0]
    assert not below.keep and at.keep  # margin 0.5: >= is the law


def test_empty_conversation_never_crashes(spark):
    # [] is a real record in the wild; under ANSI mode a bare
    # element_at would crash the job (round-17 self-review find) —
    # every chat operator must degrade to a verdict instead
    from soda_spark_spark.operators.chat import (
        conversation_valid,
        validate_tool_calls,
    )

    df = spark.createDataFrame([(1, "[]")], "id long, conv string")
    flat = flatten_conversations(df, "id", "conv").collect()
    assert len(flat) == 1 and flat[0].n_turns == 0
    assert flat[0].parse_ok and flat[0].valid is False
    assert conversation_pairs(df, "id", "conv").count() == 0
    tools = validate_tool_calls(df, "id", "conv").collect()[0]
    assert tools.valid and tools.n_calls == 0
    v = df.select(conversation_valid("conv").alias("v")).collect()[0]
    assert v.v is False


def test_markdown_unclosed_head_does_not_swallow_document():
    # the r13 crawl-recall hazard, applied to the markdown renderer:
    # an unclosed <head> must close at the first block content
    assert html_to_markdown(
        "<head><title>t</title><body><p>visible</p>"
    ) == "visible"
    assert html_to_markdown(
        "<head><meta charset=utf-8><h1>H</h1><p>x</p>"
    ) == "# H\n\nx"
    # a drop subtree inside the head still drops
    assert html_to_markdown(
        "<head><script>x</script><body><p>v</p>"
    ) == "v"
