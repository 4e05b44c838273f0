"""SFT (supervised fine-tuning) data shaping — chat-template
rendering and loss-mask construction, pure Spark built-in
expressions. The last mile of a training-data pipeline is not text,
it is (tokens, loss_mask) pairs: the model trains on the ASSISTANT
span only, and the mask that encodes that must be built WITH the
rendering (recovering span boundaries after the fact is how silent
prompt-leak-into-loss bugs happen).

- `render_chat(df, prompt_col, response_col)` — one deterministic
  template: `<|user|>\\n{prompt}\\n<|assistant|>\\n{response}<|end|>`.
  A fixed template is the point: swapping templates between data prep
  and training is a classic corruption; pin one, version it in the
  column, and let the trainer assert it.
- `sft_token_mask(df, prompt_col, response_col)` — whitespace
  tokenization of both segments (empty-safe), special tokens
  interleaved, and a parallel 0/1 mask: 0 over the user segment and
  both structural markers, 1 over the response tokens AND the <|end|>
  token (the model must learn to stop). Emitted as `tokens`
  (array<string>), `loss_mask` (array<int>), plus the scalar counts
  (`n_tokens`, `n_loss_tokens`) a packing/budgeting step consumes.
  The arrays are index-aligned by construction — a zip of two
  independently-derived lists, not a re-parse.

Whitespace tokens are the certification granularity; a production
run swaps in BPE ids (`operators/tokenizer.py`) over the SAME
segment structure — the mask arithmetic (segment lengths + marker
positions) is identical.

All expressions are JVM-side (split/filter/transform/concat — no
UDF, no shuffle); at 100 TB this is a projection inside whole-stage
codegen like any other.

Derived from the public chat-markup conventions (ChatML-style
role markers) and standard SFT masking practice; the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — training
shaping is additive surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CHAT_TEMPLATE_VERSION",
    "render_chat",
    "sft_token_mask",
]

CHAT_TEMPLATE_VERSION = "chatml-mini/1"

_USER = "<|user|>"
_ASSISTANT = "<|assistant|>"
_END = "<|end|>"


def _ws_tokens(col: Column) -> Column:
    """Whitespace tokens, empty-safe: '' and all-space inputs give an
    EMPTY array, never ['']."""
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), r"\s+"),
        lambda x: F.length(x) > 0,
    )


def render_chat(
    df: DataFrame,
    prompt_col: str,
    response_col: str,
    *,
    out_col: str = "rendered",
    version_col: str = "template_version",
) -> DataFrame:
    """Render the pinned chat template; the template version rides
    along so the trainer can assert it."""
    rendered = F.concat(
        F.lit(_USER + "\n"), F.coalesce(F.col(prompt_col), F.lit("")),
        F.lit("\n" + _ASSISTANT + "\n"),
        F.coalesce(F.col(response_col), F.lit("")),
        F.lit(_END),
    )
    return df.withColumn(out_col, rendered).withColumn(
        version_col, F.lit(CHAT_TEMPLATE_VERSION)
    )


def sft_token_mask(
    df: DataFrame,
    prompt_col: str,
    response_col: str,
    *,
    tokens_col: str = "tokens",
    mask_col: str = "loss_mask",
) -> DataFrame:
    """Tokens + index-aligned 0/1 loss mask: loss on the response
    span and the end token only. Adds `n_tokens` and
    `n_loss_tokens` for the packing/budget step."""
    p = _ws_tokens(F.col(prompt_col))
    r = _ws_tokens(F.col(response_col))
    tokens = F.concat(
        F.array(F.lit(_USER)), p, F.array(F.lit(_ASSISTANT)), r,
        F.array(F.lit(_END)),
    )
    zero = lambda c: F.transform(c, lambda _: F.lit(0))  # noqa: E731
    one = lambda c: F.transform(c, lambda _: F.lit(1))  # noqa: E731
    mask = F.concat(
        F.array(F.lit(0)), zero(p), F.array(F.lit(0)), one(r),
        F.array(F.lit(1)),
    )
    return (
        df.withColumn(tokens_col, tokens)
        .withColumn(mask_col, mask)
        .withColumn("n_tokens", F.size(tokens).cast("long"))
        .withColumn(
            "n_loss_tokens",
            F.aggregate(
                mask, F.lit(0).cast("long"), lambda a, x: a + x
            ),
        )
    )
