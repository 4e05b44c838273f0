"""Conversation-tree shaping — ShareGPT/ChatML-style multi-turn
records into validated turns, (prompt, response) pairs, and
DPO preference pairs. Pure Spark built-in expressions throughout
(from_json / transform / filter / zip_with / posexplode — no UDF, no
shuffle except the explode's natural fan-out): conversational SFT
and preference data is the highest-leverage corpus a pipeline ships,
and its classic corruptions — role soup, broken alternation, empty
turns, prompt-identical preference pairs — are all STRUCTURAL, so
they gate cheaply before any model ever sees a token.

- `flatten_conversations(df, id_col, conv_col)` — `conv_col` is a
  JSON array of turn objects in EITHER convention: OpenAI-style
  `{role, content}` or ShareGPT-style `{from, value}` (mixed rows
  fine; per-turn `coalesce`). Roles normalize via the public synonym
  table (human/user -> user, gpt/assistant/bot -> assistant,
  system -> system, anything else -> unknown). One output row per
  turn (`turn_index`, `role`, `text`) with the per-conversation
  verdict repeated on each row: `parse_ok` (JSON parsed),
  `roles_known`, `starts_ok` (at most one system turn, and only at
  position 0; first non-system turn is a user turn), `alternates`
  (user/assistant strictly alternate after the optional system
  head), `ends_with_assistant`, `has_empty_turn`, and the combined
  `valid`. A malformed-JSON row survives as ONE row with null turn
  fields — filter or alert, never silently vanish.
- `conversation_pairs(df, id_col, conv_col)` — every assistant turn
  whose immediate predecessor is a user turn becomes one
  (`pair_index`, `prompt`, `response`) row; feeds `operators/sft.py`
  rendering/masking directly.
- `dpo_pairs(df, prompt_col, chosen_col, rejected_col)` — the
  preference-pair gate + render: `drop_reason` is the FIRST failing
  law of `empty` (either side blank), `degenerate` (chosen equals
  rejected exactly — zero preference signal), `extreme_ratio`
  (whitespace-token length ratio above `max_ratio`, the classic
  length-bias leak); survivors get both sides rendered with the
  pinned `operators/sft.py` chat template (same version tag, so the
  trainer asserts ONE template across SFT and DPO) plus token
  counts for budgeting.

Scale shape: everything is a projection inside whole-stage codegen;
the only row-count change is posexplode (turns per conversation,
bounded small). At 100 TB the cost is the scan itself.

Derived from the public ShareGPT/OpenAI chat-record conventions and
standard DPO data-prep practice (Rafailov et al. 2023, public); the
reference (src/sodaspark/scan.py:441) scans already-loaded frames —
conversation shaping is additive surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ROLE_SYNONYMS",
    "flatten_conversations",
    "conversation_pairs",
    "dpo_pairs",
    "validate_tool_calls",
    "preference_pairs_from_scores",
    "conversation_valid",
]

ROLE_SYNONYMS: dict[str, str] = {
    "user": "user", "human": "user",
    "assistant": "assistant", "gpt": "assistant", "bot": "assistant",
    "system": "system",
}

_TURNS_JSON_SCHEMA = (
    "array<struct<role:string,content:string,from:string,value:string>>"
)


def _norm_role(c: Column) -> Column:
    lowered = F.lower(F.coalesce(c, F.lit("")))
    expr = F.lit("unknown")
    for raw, norm in reversed(sorted(ROLE_SYNONYMS.items())):
        expr = F.when(lowered == raw, F.lit(norm)).otherwise(expr)
    return expr


def _parsed_turns(conv_col: str) -> Column:
    """JSON -> array<struct<role,text>> with both key conventions
    folded; null on malformed JSON (from_json's contract)."""
    parsed = F.from_json(F.col(conv_col), _TURNS_JSON_SCHEMA)
    return F.transform(
        parsed,
        lambda t: F.struct(
            _norm_role(F.coalesce(t["role"], t["from"])).alias("role"),
            F.coalesce(t["content"], t["value"]).alias("text"),
        ),
    )


def _conversation_flags(turns: Column) -> list[Column]:
    # ALL array accesses here use the null-safe F.get (0-based, NULL
    # on any out-of-bounds index): under ANSI mode `element_at` on an
    # empty conversation ([] is a real record in the wild) would
    # crash the job, and `&` cannot be trusted to guard it
    roles = F.transform(turns, lambda t: t["role"])
    n = F.size(roles)
    n_system = F.size(F.filter(roles, lambda r: r == "system"))
    # the dialogue = turns after the optional single leading system
    head_system = F.coalesce(
        F.get(roles, 0) == "system", F.lit(False)
    )
    dia = F.when(head_system, F.slice(roles, 2, F.greatest(n - 1, F.lit(0)))).otherwise(roles)
    dn = F.size(dia)
    roles_known = F.forall(roles, lambda r: r != "unknown")
    starts_ok = (
        (n_system == F.when(head_system, 1).otherwise(0))
        & (dn > 0)
        & F.coalesce(F.get(dia, 0) == "user", F.lit(False))
    )
    adjacent_differ = F.when(dn <= 1, F.lit(True)).otherwise(
        F.forall(
            F.zip_with(
                F.slice(dia, 1, dn - 1),
                F.slice(dia, 2, dn - 1),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    dialogue_roles_ok = F.forall(
        dia, lambda r: r.isin("user", "assistant")
    )
    alternates = dialogue_roles_ok & adjacent_differ
    ends_with_assistant = (dn > 0) & F.coalesce(
        F.get(dia, dn - 1) == "assistant", F.lit(False)
    )
    has_empty_turn = ~F.forall(
        turns,
        lambda t: t["text"].isNotNull() & (F.length(F.trim(t["text"])) > 0),
    )
    return [
        roles_known.alias("roles_known"),
        starts_ok.alias("starts_ok"),
        alternates.alias("alternates"),
        ends_with_assistant.alias("ends_with_assistant"),
        has_empty_turn.alias("has_empty_turn"),
        (
            roles_known & starts_ok & alternates & ends_with_assistant
            & ~has_empty_turn
        ).alias("valid"),
    ]


def flatten_conversations(
    df: DataFrame, id_col: str, conv_col: str
) -> DataFrame:
    """One row per turn with the per-conversation verdict attached
    (module contract); malformed JSON -> one null-turn row with
    parse_ok = false."""
    turns = _parsed_turns(conv_col)
    base = df.select(
        F.col(id_col),
        turns.alias("_turns"),
        turns.isNotNull().alias("parse_ok"),
    ).select(
        id_col, "_turns", "parse_ok",
        F.size("_turns").cast("int").alias("n_turns"),
        *_conversation_flags(F.col("_turns")),
    )
    exploded = base.select(
        id_col, "parse_ok", "n_turns", "roles_known", "starts_ok",
        "alternates", "ends_with_assistant", "has_empty_turn", "valid",
        F.posexplode_outer("_turns").alias("turn_index", "_t"),
    )
    return exploded.select(
        id_col,
        F.col("turn_index").cast("int").alias("turn_index"),
        F.col("_t")["role"].alias("role"),
        F.col("_t")["text"].alias("text"),
        "n_turns",
        "parse_ok",
        # a malformed conversation has no turn laws to judge: null
        # out the flags so the verdict reads parse_ok=false, not a
        # spurious pass/fail of structure that never existed
        *[
            F.when(F.col("parse_ok"), F.col(c)).alias(c)
            for c in (
                "roles_known", "starts_ok", "alternates",
                "ends_with_assistant", "has_empty_turn", "valid",
            )
        ],
    )


def conversation_pairs(
    df: DataFrame, id_col: str, conv_col: str
) -> DataFrame:
    """(prompt, response) per user->assistant adjacency (module
    contract); conversations yield as many pairs as they have such
    adjacencies, malformed/pairless rows yield none."""
    turns = _parsed_turns(conv_col)
    # sequence(1, 0) is DESCENDING in Spark, and ANSI element_at
    # throws on empty arrays — guard the empty conversation with a
    # lazy when() and use null-safe F.get inside (0-based)
    idx = F.when(
        F.size(turns) > 0,
        F.filter(
            F.sequence(F.lit(1), F.size(turns)),
            lambda i: F.coalesce(
                F.get(turns, i - 1)["role"] == "assistant", F.lit(False)
            )
            & (i > 1)
            & F.coalesce(
                F.get(turns, i - 2)["role"] == "user", F.lit(False)
            ),
        ),
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.get(turns, i - 2)["text"].alias("prompt"),
            F.get(turns, i - 1)["text"].alias("response"),
        ),
    )
    out = df.select(F.col(id_col), F.posexplode(pairs).alias("pair_index", "_p"))
    return out.select(
        id_col,
        F.col("pair_index").cast("int").alias("pair_index"),
        F.col("_p")["prompt"].alias("prompt"),
        F.col("_p")["response"].alias("response"),
    )


_TOOL_JSON_SCHEMA = (
    "array<struct<role:string,content:string,"
    "tool_calls:array<struct<id:string,name:string,arguments:string>>,"
    "tool_call_id:string>>"
)


def validate_tool_calls(
    df: DataFrame,
    id_col: str,
    conv_col: str,
    *,
    allowed_tools: list[str] | None = None,
) -> DataFrame:
    """Agentic-trace validation — tool-use conversations are the
    newest SFT corpus and their corruptions are structural: a tool
    result that answers no call, a call no result ever answers,
    arguments that aren't a JSON object, a hallucinated tool name.
    One verdict row per conversation, pure JVM expressions (the
    O(turns^2) exists-scan is over a per-record array, bounded
    small — at 100 TB this is still a projection).

    Laws (each its own counter so the gate can be tuned):
    - `n_bad_args`: tool_call `arguments` strings that do not parse
      as a JSON OBJECT (scalars/arrays/garbage all count);
    - `n_unanswered`: call ids with no tool-result turn anywhere
      after the calling assistant turn;
    - `n_orphan_results`: tool turns whose `tool_call_id` matches no
      call in any EARLIER assistant turn (ordering is the law:
      a result preceding its call is an orphan);
    - `n_unknown_tools`: call names outside `allowed_tools` (0 when
      no registry is supplied);
    - `valid` = parses AND every counter is zero.

    Malformed JSON -> one row with null counters and parse_ok=false
    (same stance as `flatten_conversations`)."""
    turns = F.from_json(F.col(conv_col), _TOOL_JSON_SCHEMA)
    n = F.size(turns)
    calls = F.flatten(
        F.transform(
            F.filter(turns, lambda t: t["tool_calls"].isNotNull()),
            lambda t: t["tool_calls"],
        )
    )
    bad_args = F.size(F.filter(
        calls,
        lambda c: F.from_json(c["arguments"], "map<string,string>").isNull(),
    ))
    # result-after-call: for each tool turn i, some earlier assistant
    # turn must have issued its id. All positional reads use the
    # null-safe F.get (0-based; `sequence(1, 0)` is DESCENDING and
    # ANSI element_at throws on an empty [] record, which is a real
    # thing in the wild) and the sequence is when()-guarded.
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    orphan = F.size(F.filter(
        idx,
        lambda i: F.coalesce(
            F.get(turns, i - 1)["role"] == "tool", F.lit(False)
        )
        & ~F.exists(
            idx,
            # only a call issued by an earlier ASSISTANT turn answers
            # a result — a malformed tool-role turn carrying
            # tool_calls must not satisfy the scan (round-18 fix)
            lambda j: (j < i)
            & F.coalesce(
                (F.get(turns, j - 1)["role"] == "assistant")
                & F.exists(
                    F.get(turns, j - 1)["tool_calls"],
                    lambda c: c["id"]
                    == F.get(turns, i - 1)["tool_call_id"],
                ),
                F.lit(False),
            ),
        ),
    ))
    # call-then-result: every call id answered by a LATER tool turn;
    # counted per unanswered CALL, not per calling turn
    unanswered = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc + F.coalesce(
            F.size(F.filter(
                F.get(turns, i - 1)["tool_calls"],
                lambda c: ~F.exists(
                    idx,
                    lambda j: (j > i)
                    & F.coalesce(
                        (F.get(turns, j - 1)["role"] == "tool")
                        & (F.get(turns, j - 1)["tool_call_id"] == c["id"]),
                        F.lit(False),
                    ),
                ),
            )),
            F.lit(0),
        ),
    )
    if allowed_tools is not None:
        unknown = F.size(F.filter(
            calls,
            lambda c: ~c["name"].isin(*allowed_tools),
        ))
    else:
        unknown = F.lit(0)
    parse_ok = turns.isNotNull()
    counters = [
        F.size(calls).cast("int").alias("n_calls"),
        bad_args.cast("int").alias("n_bad_args"),
        unanswered.cast("int").alias("n_unanswered"),
        orphan.cast("int").alias("n_orphan_results"),
        unknown.cast("int").alias("n_unknown_tools"),
    ]
    out = df.select(
        F.col(id_col),
        n.cast("int").alias("n_turns"),
        parse_ok.alias("parse_ok"),
        *counters,
    )
    # null the counters on malformed JSON (no structure to judge)
    for c in ("n_calls", "n_bad_args", "n_unanswered",
              "n_orphan_results", "n_unknown_tools"):
        out = out.withColumn(c, F.when(F.col("parse_ok"), F.col(c)))
    return out.withColumn(
        "valid",
        F.when(
            F.col("parse_ok"),
            (F.col("n_bad_args") == 0) & (F.col("n_unanswered") == 0)
            & (F.col("n_orphan_results") == 0)
            & (F.col("n_unknown_tools") == 0),
        ),
    )


def dpo_pairs(
    df: DataFrame,
    prompt_col: str,
    chosen_col: str,
    rejected_col: str,
    *,
    max_ratio: float = 8.0,
) -> DataFrame:
    """Gate + render preference pairs (module contract). Adds
    `drop_reason` (null = keep), `keep`, rendered `chosen_text` /
    `rejected_text` (pinned template, survivors only) and the two
    token counts."""
    from soda_spark_spark.operators.sft import (
        CHAT_TEMPLATE_VERSION,
        _ASSISTANT,
        _END,
        _USER,
        _ws_tokens,
    )

    c, r = F.col(chosen_col), F.col(rejected_col)
    blank = lambda x: x.isNull() | (F.length(F.trim(x)) == 0)  # noqa: E731
    n_c = F.size(_ws_tokens(c)).cast("long")
    n_r = F.size(_ws_tokens(r)).cast("long")
    ratio = (
        F.greatest(n_c, n_r).cast("double")
        / F.greatest(F.least(n_c, n_r), F.lit(1)).cast("double")
    )
    drop_reason = (
        F.when(blank(F.col(prompt_col)) | blank(c) | blank(r), "empty")
        .when(c == r, "degenerate")
        .when(ratio > max_ratio, "extreme_ratio")
    )

    def render(side: Column) -> Column:
        # same markers as sft.render_chat — ONE template across SFT
        # and DPO, asserted via the shared version tag
        return F.concat(
            F.lit(_USER + "\n"), F.col(prompt_col),
            F.lit("\n" + _ASSISTANT + "\n"), side, F.lit(_END),
        )

    keep = drop_reason.isNull()
    return (
        df.withColumn("drop_reason", drop_reason)
        .withColumn("keep", keep)
        .withColumn("n_chosen_tokens", n_c)
        .withColumn("n_rejected_tokens", n_r)
        .withColumn("length_ratio", ratio)
        .withColumn("chosen_text", F.when(keep, render(c)))
        .withColumn("rejected_text", F.when(keep, render(r)))
        .withColumn("template_version", F.lit(CHAT_TEMPLATE_VERSION))
    )


def preference_pairs_from_scores(
    df: DataFrame,
    group_col: str,
    response_col: str,
    score_col: str,
    *,
    min_margin: float = 0.0,
) -> DataFrame:
    """Mine DPO pairs from scored candidates — the step BEFORE
    `dpo_pairs`: a reward model (or human ranking) scores K responses
    per prompt, and the pair is (argmax, argmin) with the margin as
    the signal-strength gate. One map-side-combinable groupBy on the
    prompt key (the only shuffle); ties break DETERMINISTICALLY by
    response string under Spark's struct ordering, so a re-run on a
    re-partitioned corpus picks identical pairs.

    Emits per group: `chosen`/`rejected` (+ scores), `margin`,
    `n_candidates`, and `keep` = margin >= min_margin AND the two
    texts differ (a one-candidate group or an all-tied group carries
    no preference signal). Route survivors through `dpo_pairs` for
    the structural gates + the pinned-template render."""
    g = F.col(group_col)
    # a NULL score is a non-judgment: under Spark's struct ordering a
    # null-score candidate would silently WIN the min() side (nulls
    # sort first) and poison the margin — exclude it from the
    # argmax/argmin but keep it countable (n_candidates counts all,
    # n_scored the usable ones; an all-unscored group survives as a
    # keep=false row, never silently vanishes)
    scored = F.when(
        F.col(score_col).isNotNull(),
        F.struct(F.col(score_col), F.col(response_col)),
    )
    hi = F.max(scored)
    lo = F.min(scored)
    out = df.groupBy(g.alias(group_col)).agg(
        hi.alias("_hi"), lo.alias("_lo"),
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.count(F.col(score_col)).cast("long").alias("n_scored"),
    )
    chosen = F.col("_hi")[response_col]
    rejected = F.col("_lo")[response_col]
    margin = (
        F.col("_hi")[score_col].cast("double")
        - F.col("_lo")[score_col].cast("double")
    )
    return out.select(
        group_col,
        chosen.alias("chosen"),
        rejected.alias("rejected"),
        F.col("_hi")[score_col].cast("double").alias("chosen_score"),
        F.col("_lo")[score_col].cast("double").alias("rejected_score"),
        margin.alias("margin"),
        "n_candidates",
        "n_scored",
        F.coalesce(
            (margin >= F.lit(min_margin)) & (chosen != rejected),
            F.lit(False),
        ).alias("keep"),
    )


def conversation_valid(conv_col: str) -> Column:
    """Conversation-level verdict as ONE column expression: TRUE when
    the JSON parses and every structural law of
    `flatten_conversations` holds, FALSE on a structural break, NULL
    on malformed JSON. Stateless per row, so it gates a STREAMING
    ingest as-is (no state store, no foreachBatch) — the
    conversational analog of the jsonl/quality stream gates."""
    turns = _parsed_turns(conv_col)
    valid = _conversation_flags(turns)[-1]
    return F.when(turns.isNotNull(), valid)
