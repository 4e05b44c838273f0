"""Evaluation analytics over pairwise model comparisons — the
consumption side of the preference pipeline. Once `operators/chat.py`
has mined and gated preference pairs, the SAME pairwise-outcome shape
(model A vs model B, one winner or a tie) is what human-eval and
LLM-judge campaigns emit, and the two standard reductions over it
are:

- `pairwise_win_rates(df, model_a, model_b, outcome)` — the exact
  head-to-head table. Pairs are canonicalized so (A,B) and (B,A)
  rows aggregate together (`model_lo` < `model_hi`
  lexicographically, outcomes flipped to match); one map-side
  combinable groupBy emits games / wins / ties and the win rate for
  each side (ties count half, the standard convention). All-integer
  sufficient statistics; the rates are single IEEE divisions, so
  engines agree bit-for-bit.
- `bradley_terry(df, ...)` — strength estimation: the classic
  Bradley-Terry model fit by the standard MM fixed-point iteration
  (Hunter 2004, public). The pairwise win matrix is aggregated
  DISTRIBUTED (one groupBy over pairs — the only pass over the
  data); the iteration itself runs driver-side over the M x M
  matrix, because M (number of models) is tiny by construction —
  this is the same "driver owns the model-sized state" stance as
  k-means centroids and BPE merge tables. Ties count as half a win
  each. Deterministic: fixed uniform init, fixed iteration count,
  geometric-mean normalization each step, stable model ordering.

Scale shape: both reductions are one shuffle keyed on the model
pair; at 100 TB of judgments the cost is the scan + one combine.

Derived from the public Bradley-Terry/MM literature (Hunter 2004,
"MM algorithms for generalized Bradley-Terry models") and standard
eval-harness conventions; the reference (src/sodaspark/scan.py:441)
scans already-loaded frames — eval analytics is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pairwise_win_rates",
    "win_rate_intervals",
    "bradley_terry",
    "judge_agreement",
]


def _canonical(df: DataFrame, model_a: str, model_b: str, outcome: str):
    """Orient every row so model_lo < model_hi; outcome becomes
    'lo' / 'hi' / 'tie'. The outcome vocabulary is CASE-INSENSITIVE
    ('A' / 'TIE' count — real judge logs are case-sloppy; round-18,
    matching the role-synonym leniency chat.py grants); genuinely
    unknown labels still land in `n_invalid`."""
    a, b = F.col(model_a), F.col(model_b)
    o = F.lower(F.col(outcome))
    flipped = a > b
    lo = F.when(flipped, b).otherwise(a)
    hi = F.when(flipped, a).otherwise(b)
    res = (
        F.when(o == "tie", F.lit("tie"))
        .when((o == "a") & ~flipped, F.lit("lo"))
        .when((o == "a") & flipped, F.lit("hi"))
        .when((o == "b") & ~flipped, F.lit("hi"))
        .when((o == "b") & flipped, F.lit("lo"))
    )
    return df.select(
        lo.alias("model_lo"), hi.alias("model_hi"), res.alias("_res")
    )


def pairwise_win_rates(
    df: DataFrame, model_a: str, model_b: str, outcome: str
) -> DataFrame:
    """Head-to-head table (module contract). `outcome` is 'a' / 'b' /
    'tie' (any case) relative to the row's own column order; rows
    with any other outcome value are INVALID and counted in
    `n_invalid` rather than silently dropped."""
    c = _canonical(df, model_a, model_b, outcome)
    one = F.lit(1).cast("long")
    agg = c.groupBy("model_lo", "model_hi").agg(
        F.count(one).alias("games"),
        F.sum(F.when(F.col("_res") == "lo", one).otherwise(0)).alias("wins_lo"),
        F.sum(F.when(F.col("_res") == "hi", one).otherwise(0)).alias("wins_hi"),
        F.sum(F.when(F.col("_res") == "tie", one).otherwise(0)).alias("ties"),
        F.sum(F.when(F.col("_res").isNull(), one).otherwise(0)).alias("n_invalid"),
    )
    scored = F.col("games") - F.col("n_invalid")
    half = F.col("ties").cast("double") / F.lit(2.0)
    return agg.select(
        "model_lo", "model_hi", "games", "wins_lo", "wins_hi", "ties",
        "n_invalid",
        F.when(
            scored > 0,
            (F.col("wins_lo").cast("double") + half)
            / scored.cast("double"),
        ).alias("win_rate_lo"),
        F.when(
            scored > 0,
            (F.col("wins_hi").cast("double") + half)
            / scored.cast("double"),
        ).alias("win_rate_hi"),
    )


def win_rate_intervals(
    df: DataFrame,
    model_a: str,
    model_b: str,
    outcome: str,
    *,
    z: float = 1.96,
) -> DataFrame:
    """`pairwise_win_rates` + Wilson score intervals (round 18) — a
    model comparison without uncertainty invites overclaiming on 30
    games; the Wilson interval is the standard closed-form fix (it
    never leaves [0, 1] and behaves at small n where the normal
    approximation fails). Ties count half, so the interval treats
    p_hat = (wins + ties/2) / scored as the binomial proportion over
    `scored` games (the standard ties-as-half-credit convention).

        bound = (p + z^2/2n +- z*sqrt(p(1-p)/n + z^2/4n^2)) / (1 + z^2/n)

    The arithmetic is a FIXED operation order over IEEE doubles
    (+, -, *, / and sqrt are all correctly rounded), so any engine
    replaying the same expression tree agrees bit-for-bit — the same
    determinism stance as the single-division win rates. Intervals
    are NULL when no game was scored. One projection over the
    win-rates aggregate: no extra shuffle.

    Derived from Wilson 1927 ("Probable inference, the law of
    succession, and statistical inference", JASA) via the standard
    public formulation."""
    base = pairwise_win_rates(df, model_a, model_b, outcome)
    zs = repr(float(z))
    zz = f"({zs} * {zs})"
    n = "CAST(games - n_invalid AS DOUBLE)"

    def bound(p: str, sign: str) -> F.Column:
        return F.expr(
            f"CASE WHEN games - n_invalid > 0 THEN "
            f"(({p} + {zz} / (2.0 * {n}) {sign} {zs} * "
            f"sqrt({p} * (1.0 - {p}) / {n} + {zz} / (4.0 * {n} * {n})))"
            f" / (1.0 + {zz} / {n})) END"
        )

    return base.select(
        *base.columns,
        bound("win_rate_lo", "-").alias("ci_lo_lower"),
        bound("win_rate_lo", "+").alias("ci_lo_upper"),
        bound("win_rate_hi", "-").alias("ci_hi_lower"),
        bound("win_rate_hi", "+").alias("ci_hi_upper"),
    )


def bradley_terry(
    df: DataFrame,
    model_a: str,
    model_b: str,
    outcome: str,
    *,
    iterations: int = 50,
) -> DataFrame:
    """(model, strength, rank) via the MM fixed point (module
    contract). Strengths are normalized to geometric mean 1 each
    iteration; ranks are dense by descending strength with model
    name as the deterministic tiebreak. Invalid outcomes are
    ignored (they carry no preference signal); models appearing
    only in invalid rows still get a row with the uniform
    strength."""
    c = _canonical(df, model_a, model_b, outcome)
    # distributed part: the pairwise (half-)win matrix
    rows = c.groupBy("model_lo", "model_hi").agg(
        F.sum(F.when(F.col("_res") == "lo", F.lit(1.0))
              .when(F.col("_res") == "tie", F.lit(0.5)).otherwise(0.0)
              ).alias("w_lo"),
        F.sum(F.when(F.col("_res") == "hi", F.lit(1.0))
              .when(F.col("_res") == "tie", F.lit(0.5)).otherwise(0.0)
              ).alias("w_hi"),
    ).collect()

    models = sorted({r.model_lo for r in rows} | {r.model_hi for r in rows})
    wins: dict[tuple[str, str], float] = {}
    for r in rows:
        wins[(r.model_lo, r.model_hi)] = wins.get((r.model_lo, r.model_hi), 0.0) + r.w_lo
        wins[(r.model_hi, r.model_lo)] = wins.get((r.model_hi, r.model_lo), 0.0) + r.w_hi

    p = {m: 1.0 for m in models}
    total_wins = {m: sum(wins.get((m, o), 0.0) for o in models) for m in models}
    for _ in range(iterations):
        new = {}
        for m in models:
            denom = 0.0
            for o in models:
                if o == m:
                    continue
                n_mo = wins.get((m, o), 0.0) + wins.get((o, m), 0.0)
                if n_mo:
                    denom += n_mo / (p[m] + p[o])
            new[m] = (total_wins[m] / denom) if denom else p[m]
        # geometric-mean normalization keeps the gauge fixed
        import math

        log_mean = sum(math.log(v) for v in new.values() if v > 0) / max(
            len(new), 1
        )
        scale = math.exp(log_mean)
        p = {m: (v / scale if scale else v) for m, v in new.items()}

    order = sorted(models, key=lambda m: (-p[m], m))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(m, float(p[m]), i + 1) for i, m in enumerate(order)],
        "model string, strength double, rank int",
    )


def judge_agreement(
    df: DataFrame, item_col: str, judge_col: str, label_col: str
) -> DataFrame:
    """Pairwise inter-judge agreement with Cohen's kappa — the
    reliability check BEFORE any judged dataset is trusted: raw
    agreement flatters judges who share a skewed label prior, and
    kappa subtracts exactly that chance floor. One self-equi-join on
    the item key (judge_lo < judge_hi so each unordered pair appears
    once), then integer-exact sufficient statistics:

        Po = agree / n
        Pe = sum_label cnt_lo(label) * cnt_hi(label) / n^2
        kappa = (Po - Pe) / (1 - Pe)
              = (agree * n - S) / (n^2 - S)      [exact integers]

    where S = sum_label cnt_lo * cnt_hi over the CO-LABELED items
    only (marginals conditioned on the shared item set, the standard
    Cohen formulation). The final form is one integer-exact numerator
    over one integer-exact denominator — a single IEEE division, so
    engines agree bit-for-bit; kappa is NULL when the denominator is
    zero (both judges constant and identical: chance explains
    everything, the statistic is undefined). Items a judge labeled
    twice are reduced to ONE deterministic label first (min, stable
    under re-partitioning).

    NULL labels are non-judgments and are EXCLUDED up front — leaving
    them in would let the equality test (null-safe: never agrees) and
    the marginal join (drops null keys) disagree about the same rows,
    a silent kappa skew.

    Scale shape: the join and the two marginal groupBys all key on
    (item) or (judge pair): three shuffles over judgment-sized data,
    map-side combinable."""
    j = (
        df.filter(F.col(label_col).isNotNull())
        .select(
            F.col(item_col).alias("item"),
            F.col(judge_col).alias("judge"),
            F.col(label_col).alias("label"),
        )
        .groupBy("item", "judge")
        .agg(F.min("label").alias("label"))
    )
    a = j.select(
        F.col("item"), F.col("judge").alias("judge_lo"),
        F.col("label").alias("label_lo"),
    )
    b = j.select(
        F.col("item").alias("item_b"), F.col("judge").alias("judge_hi"),
        F.col("label").alias("label_hi"),
    )
    pairs = a.join(
        b,
        (a["item"] == b["item_b"]) & (a["judge_lo"] < b["judge_hi"]),
    ).select("item", "judge_lo", "judge_hi", "label_lo", "label_hi")
    base = pairs.groupBy("judge_lo", "judge_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.when(F.col("label_lo") == F.col("label_hi"), 1).otherwise(0)
        ).cast("long").alias("n_agree"),
    )
    # chance-agreement cross term: join the two marginal tables on
    # (pair, label)
    m_lo = pairs.groupBy("judge_lo", "judge_hi", "label_lo").agg(
        F.count(F.lit(1)).cast("long").alias("c_lo")
    ).withColumnRenamed("label_lo", "label")
    m_hi = pairs.groupBy("judge_lo", "judge_hi", "label_hi").agg(
        F.count(F.lit(1)).cast("long").alias("c_hi")
    ).withColumnRenamed("label_hi", "label")
    s = (
        m_lo.join(m_hi, ["judge_lo", "judge_hi", "label"])
        .groupBy("judge_lo", "judge_hi")
        .agg(F.sum(F.col("c_lo") * F.col("c_hi")).cast("long").alias("s"))
    )
    out = base.join(s, ["judge_lo", "judge_hi"])
    n, agree, S = F.col("n_items"), F.col("n_agree"), F.col("s")
    denom = n * n - S
    return out.select(
        "judge_lo", "judge_hi", "n_items", "n_agree",
        (agree.cast("double") / n.cast("double")).alias("agreement"),
        F.when(
            denom != 0,
            (agree * n - S).cast("double") / denom.cast("double"),
        ).alias("kappa"),
    )
