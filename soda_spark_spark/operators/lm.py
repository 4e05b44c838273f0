"""N-gram language-model quality scoring and DSIR-style importance
weighting — the statistical document-quality layer of a training-data
pipeline (the CCNet recipe: score every document under a reference LM,
keep the well-modeled tail; and the DSIR recipe: reweight/resample raw
web data toward a target distribution using hashed n-gram features).

Reference behavioral anchor: soda-spark exposes user-defined SQL metrics
over a scanned table (reference/src/sodaspark/scan.py:292-421); these
operators extend that "score every row with a corpus-level statistic"
idea to LM-based document scoring, which the reference cannot express.

Spark-first design notes (100 TB):

- The LM is a **persisted model table** (prefix, word, c) — train once on
  a reference corpus with one explode + groupBy (map-side partials absorb
  the Zipf head), write it out, then score every ingestion batch by a
  plain equi-join on (prefix, word). Same reuse pattern as the minhash
  band-tag sketch (`dedup.minhash_band_tags`) and the persisted IVF index
  (`similarity.ivf_index`): scoring cost is O(batch), never O(reference).
- Scoring joins broadcast the model when it is small (vocabulary-sized,
  usually MBs even for web-scale corpora after `min_count` pruning) and
  fall back to a shuffle join on the uniformly-hashed gram key above the
  cutoff — the Zipf-head gram is a hot KEY but each model row is one
  (gram, count), so no bucket blowup.
- Everything is pure Catalyst (split / slice / arrays_zip / join /
  groupBy) inside whole-stage codegen: no Python UDFs, no interpreted
  lambda HOFs (the `transform(sequence, lambda)` hazard measured 8-9x
  slower in PLANS §14).
- Two score channels:
  * `avg_logprob` / perplexity — the standard float metric (natural log).
    Transcendental, so bit-equality across engines is NOT guaranteed;
    parity is pinned by pytest against a pure-Python reference instead.
  * `sum_score_ppm` / `avg_score_ppm` — an exact integer channel for
    cross-engine certification: per gram, floor(1e6 * (c+1) / (pc+V))
    (Laplace-smoothed conditional probability in parts-per-million).
    Every step (int->double widen, one multiply, one divide, floor) is a
    single correctly-rounded IEEE-754 double op, so ANY engine computes
    the identical bigint — the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .stats import _order_statistic  # noqa: F401 — re-export; tiering cuts use it

__all__ = [
    "ngram_lm",
    "ngram_lm_score",
    "ngram_lm_merge",
    "hashed_ngram_counts",
    "importance_weights",
    "importance_sample",
]

_PPM = 1_000_000


def _tokens(text_col: str, lowercase: bool) -> Column:
    # trim strips only spaces (0x20); text bordered by \t or \n would
    # otherwise leave '' fields in the regex split (phantom grams, '' in
    # the vocabulary). array_remove is a non-lambda builtin — same filter
    # token_vectors applies, mirrored by list_filter in the oracle SQL.
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    return F.array_remove(F.split(t, r"\s+"), "")


def _gram_pairs(df: DataFrame, id_col: str, text_col: str, n: int,
                lowercase: bool) -> DataFrame:
    """(id, prefix, word) for every n-gram occurrence; prefix is the
    space-joined (n-1)-gram ('' for a unigram model). Gram construction is
    slice + arrays_zip — non-lambda builtins that stay in codegen."""
    toks = _tokens(text_col, lowercase)
    m = F.size(toks) - F.lit(n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    g = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.when(m > 0, zipped).otherwise(F.array())).alias("__z"),
    )
    if n == 1:
        prefix = F.lit("")
    else:
        prefix = F.concat_ws(
            " ", *[F.col("__z").getField(str(i)) for i in range(n - 1)]
        )
    return g.select(
        "__id",
        prefix.alias("prefix"),
        F.col("__z").getField(str(n - 1)).alias("word"),
    )


def ngram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    lowercase: bool = True,
    min_count: int = 1,
    with_meta: bool = True,
) -> DataFrame:
    """Train an n-gram count model on a reference corpus: returns the
    persistable model table (prefix, word, c) where `prefix` is the
    space-joined (n-1)-token history ('' for n=1) and `c` the corpus
    occurrence count. Write this table out once; `ngram_lm_score` then
    scores any batch against it without touching the reference corpus.

    `min_count` prunes the singleton tail (at web scale singleton grams
    dwarf the model; CCNet prunes the same way) — pruned grams simply
    score as unseen. One explode + one groupBy; map-side partial
    aggregation absorbs the Zipf head.

    With `with_meta` (default) the table carries ONE metadata row
    `(prefix=NULL, word=NULL, c=V)` where V is the post-pruning
    vocabulary size. The meta row persists with the model, so
    `ngram_lm_score` reads V from the table itself instead of running a
    per-call `distinct().count()` job — train-time cost, score-time
    free. Pass `with_meta=False` for the bare (prefix, word, c) table
    (then `ngram_lm_score` requires an explicit `vocab_size`)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    counts = (
        _gram_pairs(df, id_col, text_col, n, lowercase)
        .groupBy("prefix", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("c") >= min_count)
    if with_meta:
        meta = counts.agg(
            F.count_distinct(F.col("word")).alias("c")
        ).select(
            F.lit(None).cast("string").alias("prefix"),
            F.lit(None).cast("string").alias("word"),
            F.col("c"),
        )
        counts = counts.unionByName(meta)
    return counts


def ngram_lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    lowercase: bool = True,
    vocab_size: int | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents under a trained n-gram model (Laplace smoothing):
    per gram, p = (c + 1) / (prefix_total + V), where V is the model
    vocabulary size. V resolves, in order: the explicit `vocab_size`
    argument; else the model's metadata row (`word IS NULL`, written by
    `ngram_lm(with_meta=True)`) via a lazy broadcast join — NO extra
    Spark job, the scoring plan stays a single action. A meta-less model
    with no `vocab_size` raises at execution time (`raise_error`), never
    silently mis-smooths.

    Returns one row per document:
      (id, n_grams, oov_grams, sum_score_ppm, avg_score_ppm,
       avg_logprob, perplexity)

    - `sum_score_ppm`/`avg_score_ppm`: exact integer channel — per gram
      floor(1e6 * p) summed as BIGINT, average as one double division of
      exact integers. Engine-exact (see module docstring); this is the
      certified projection.
    - `avg_logprob`/`perplexity`: the standard float metric (natural
      log). Deterministic within an engine (fixed-order per-gram values
      summed via the exact-ppm trick is NOT possible for logs, so the
      per-doc sum is a double aggregate over a deterministic per-gram
      value; Spark's partial aggregation order can vary — for strict
      reproducibility use the ppm channel).
    - `oov_grams`: grams whose (prefix, word) is absent from the model.

    Plan: gram explode -> join model on (prefix, word) -> join prefix
    totals on (prefix) -> one groupBy(id). Both model-side tables are
    broadcast under `broadcast_model` (vocabulary-sized); disable to
    force a shuffle join for models larger than executor memory."""
    if n < 1:
        raise ValueError("n must be >= 1")
    pairs = _gram_pairs(df, id_col, text_col, n, lowercase)
    data = model.filter(F.col("word").isNotNull())
    prefix_tot = data.groupBy("prefix").agg(F.sum("c").alias("pc"))
    if vocab_size is not None:
        if vocab_size < 1:
            raise ValueError("model has an empty vocabulary")
        vcol = F.lit(float(vocab_size))
    else:
        # Lazy V from the persisted meta row: 1-row aggregate, broadcast
        # nested-loop join — no collect, no extra job. max(c) over the
        # meta rows is NULL when the model has none -> raise_error fires
        # at execution instead of silently smoothing with a wrong V.
        vmeta = model.filter(F.col("word").isNull()).agg(
            F.max("c").alias("__vocab_v")
        )
        pairs = pairs.crossJoin(F.broadcast(vmeta))
        vcol = F.when(
            F.col("__vocab_v") >= 1, F.col("__vocab_v").cast("double")
        ).otherwise(
            F.raise_error(
                "ngram_lm_score: model has no usable vocabulary metadata"
                " row (word IS NULL, c >= 1); pass vocab_size= or train"
                " with ngram_lm(with_meta=True) on a non-empty corpus"
            ).cast("double")
        )
    m = F.broadcast(data) if broadcast_model else data
    p = F.broadcast(prefix_tot) if broadcast_model else prefix_tot
    j = (
        pairs.join(m, ["prefix", "word"], "left")
        .join(p, ["prefix"], "left")
        .select(
            "__id",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("pc"), F.lit(0)).alias("pc"),
            F.col("c").isNull().cast("long").alias("oov"),
            vcol.alias("__v"),
        )
    )
    # Laplace-smoothed probability, exact-ppm and float channels. The ppm
    # expression is 4 correctly-rounded double ops -> identical in any
    # IEEE-754 engine.
    num = (F.col("c") + F.lit(1)).cast("double")
    den = F.col("pc").cast("double") + F.col("__v")
    ppm = F.floor(F.lit(float(_PPM)) * num / den).cast("long")
    logp = F.log(num / den)
    agg = j.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("oov").alias("oov_grams"),
        F.sum(ppm).alias("sum_score_ppm"),
        F.sum(logp).alias("__sum_logp"),
    )
    out = agg.select(
        F.col("__id").alias(id_col),
        "n_grams",
        "oov_grams",
        "sum_score_ppm",
        (F.col("sum_score_ppm").cast("double") / F.col("n_grams")).alias(
            "avg_score_ppm"
        ),
        (F.col("__sum_logp") / F.col("n_grams")).alias("avg_logprob"),
        F.exp(-F.col("__sum_logp") / F.col("n_grams")).alias("perplexity"),
    )
    return out


def kn_lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    *,
    discount: float = 0.75,
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents under interpolated Kneser-Ney smoothing (Kneser &
    Ney 1995; Chen & Goodman 1999) — the smoothing CCNet's KenLM
    actually uses, much sharper than Laplace on Zipf text: a bigram's
    probability interpolates its discounted count with the word's
    CONTINUATION probability (how many distinct contexts it follows,
    not how often it occurs — 'Francisco' is frequent but only ever
    follows 'San').

    Works on the SAME persisted `ngram_lm(n=2)` artifact as
    `ngram_lm_score` — every KN statistic derives from the (prefix,
    word, c) table at score time with vocabulary-sized aggregations
    (broadcast under `broadcast_model`); no new artifact format. With
    d = discount (3-decimal precision, dm = round(1000*d)):

      p(w|u) = [max(1000*c(u,w) - dm, 0) * (NDD + V)
                + dm * N1(u.) * (N1(.w) + 1)]
               / [1000 * c(u) * (NDD + V)]              when c(u) > 0
      p(w|u) = (N1(.w) + 1) / (NDD + V)                 when c(u) = 0

    where N1(u.) = distinct continuations of prefix u, N1(.w) =
    distinct left-contexts of w (add-one smoothed so OOV words keep a
    finite score), NDD = distinct bigrams, V = vocabulary size + 1. The
    certified projection is the exact-ppm channel — floor(1e6 * p) per
    gram as a FIXED chain of correctly-rounded IEEE double ops (the
    integer products would overflow BIGINT at web scale), summed as
    BIGINTs; avg_logprob/perplexity ride the float channel
    (pytest-pinned vs an independent Python KN implementation).

    Returns (id_col, n_grams, oov_grams, sum_score_ppm, avg_score_ppm,
    avg_logprob, perplexity) — the `ngram_lm_score` contract, so it
    drops into `perplexity_buckets`-style tiering unchanged."""
    if not (0 < discount < 1):
        raise ValueError("discount must be in (0, 1)")
    dm = int(round(1000 * discount))
    pairs = _gram_pairs(df, id_col, text_col, 2, lowercase)
    data = model.filter(
        F.col("word").isNotNull() & F.col("prefix").isNotNull()
    )
    prefix_stats = data.groupBy("prefix").agg(
        F.sum("c").alias("cu"), F.count(F.lit(1)).alias("n1u")
    )
    word_stats = data.groupBy("word").agg(
        F.count(F.lit(1)).alias("n1w")
    )
    totals = data.agg(
        F.count(F.lit(1)).alias("__ndd"),
        (F.count_distinct("word") + F.lit(1)).alias("__v"),
    )
    m = F.broadcast(data) if broadcast_model else data
    ps = F.broadcast(prefix_stats) if broadcast_model else prefix_stats
    ws = F.broadcast(word_stats) if broadcast_model else word_stats
    j = (
        pairs.join(m.select("prefix", "word", "c"), ["prefix", "word"],
                   "left")
        .join(ps, ["prefix"], "left")
        .join(ws, ["word"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__id",
            F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("cd"),
            F.coalesce(F.col("cu"), F.lit(0)).cast("double").alias("cud"),
            F.coalesce(F.col("n1u"), F.lit(0)).cast("double").alias("n1ud"),
            F.coalesce(F.col("n1w"), F.lit(0)).cast("double").alias("n1wd"),
            F.col("n1w").isNull().cast("long").alias("oov"),
            (F.col("__ndd") + F.col("__v")).cast("double").alias("dv"),
        )
    )
    dmd = F.lit(float(dm))
    disc = F.greatest(F.col("cd") * F.lit(1000.0) - dmd, F.lit(0.0))
    num = disc * F.col("dv") + dmd * F.col("n1ud") * (
        F.col("n1wd") + F.lit(1.0)
    )
    den = F.lit(1000.0) * F.col("cud") * F.col("dv")
    backoff = (F.col("n1wd") + F.lit(1.0)) / F.col("dv")
    p = F.when(F.col("cud") > 0, num / den).otherwise(backoff)
    ppm = F.floor(F.lit(float(_PPM)) * p).cast("long")
    logp = F.log(p)
    agg = j.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("oov").alias("oov_grams"),
        F.sum(ppm).alias("sum_score_ppm"),
        F.sum(logp).alias("__sum_logp"),
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_grams",
        "oov_grams",
        "sum_score_ppm",
        (F.col("sum_score_ppm").cast("double") / F.col("n_grams")).alias(
            "avg_score_ppm"
        ),
        (F.col("__sum_logp") / F.col("n_grams")).alias("avg_logprob"),
        F.exp(-F.col("__sum_logp") / F.col("n_grams")).alias("perplexity"),
    )


def ngram_lm_merge(*models: DataFrame) -> DataFrame:
    """Merge trained n-gram model tables by summing gram counts — the
    incremental-training step of the persisted-model lifecycle: train a
    model per corpus snapshot, persist each, and merge instead of ever
    re-reading raw text (same reuse story as `dedup.minhash_band_tags`
    sketch append and `similarity.ivf_assign`).

    Count-exact: merge(train(A), train(B)) == train(A ∪ B) bit-for-bit
    (integer sums are associative — pinned by test). The vocabulary
    metadata row is REBUILT from the merged data rows (V of a union is
    not the sum of Vs), so the output is a valid `ngram_lm_score` input.
    Inputs may carry or omit meta rows (they are dropped and recomputed);
    mixing n-gram orders is the caller's bug — counts would merge
    silently.

    NOTE on min_count: merging PRUNED models under-counts grams that sat
    below the cutoff in every snapshot — prune once after merging
    (filter c >= k) rather than per-snapshot, or accept the approximation
    the way CCNet shards do. One union + one groupBy on (prefix, word);
    map-side partials absorb the shared Zipf head."""
    if not models:
        raise ValueError("at least one model table is required")
    merged = models[0]
    for m in models[1:]:
        merged = merged.unionByName(m)
    counts = (
        merged.filter(F.col("word").isNotNull())
        .groupBy("prefix", "word")
        .agg(F.sum("c").alias("c"))
    )
    meta = counts.agg(F.count_distinct(F.col("word")).alias("c")).select(
        F.lit(None).cast("string").alias("prefix"),
        F.lit(None).cast("string").alias("word"),
        F.col("c"),
    )
    return counts.unionByName(meta)


# ---------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weighting
# ---------------------------------------------------------------------------


def _md5_bucket(key: Column, seed: int, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets) from a string key — the
    md5-substring pattern every engine with md5/conv can replay (same
    construction as `sampling._uniform(hash_fn='md5')`)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", key, F.lit(seed))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    buckets: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
) -> DataFrame:
    """Hashed n-gram feature distribution of a corpus: every word n-gram
    is hashed into one of `buckets` buckets (md5, engine-replayable);
    returns (bucket, c) — the DSIR feature vector of the corpus as a
    table of at most `buckets` rows. Train once per corpus (raw and
    target), persist; the tables are tiny (≤ buckets rows) no matter the
    corpus size, so every downstream join broadcasts."""
    if n < 1 or buckets < 1:
        raise ValueError("n and buckets must be >= 1")
    pairs = _gram_pairs(df, id_col, text_col, n, lowercase)
    gram = F.concat_ws(" ", F.col("prefix"), F.col("word"))
    if n == 1:
        gram = F.col("word")
    return (
        pairs.select(_md5_bucket(gram, seed, buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def importance_weights(
    df: DataFrame,
    raw_counts: DataFrame,
    target_counts: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    buckets: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
) -> DataFrame:
    """DSIR importance weight per document: how much more likely the
    document's hashed n-gram features are under the TARGET distribution
    than under the RAW distribution (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public arXiv:2302.03169).
    Laplace-smoothed per-bucket ratio:

        ratio(b) = ((ct(b)+1) / (Nt+B)) / ((cr(b)+1) / (Nr+B))

    Returns (id, n_grams, log_weight, sum_ratio_ppm, avg_ratio_ppm):

    - `log_weight` = sum over grams of ln(ratio) — the DSIR score used
      for resampling (float channel; pytest-pinned vs a Python reference).
    - `sum_ratio_ppm`/`avg_ratio_ppm` — exact integer channel: per gram
      floor(1e6 * ratio) with the ratio computed as a fixed sequence of
      correctly-rounded double ops, so any IEEE-754 engine produces the
      identical BIGINT. This is the certified projection.

    `raw_counts`/`target_counts` are `hashed_ngram_counts` outputs (the
    persisted per-corpus feature tables; ≤ `buckets` rows each, always
    broadcast). Scoring cost is O(batch) — the raw/target corpora are
    never rescanned."""
    if n < 1 or buckets < 1:
        raise ValueError("n and buckets must be >= 1")
    pairs = _gram_pairs(df, id_col, text_col, n, lowercase)
    gram = F.concat_ws(" ", F.col("prefix"), F.col("word"))
    if n == 1:
        gram = F.col("word")
    feats = pairs.select("__id", _md5_bucket(gram, seed, buckets).alias("bucket"))

    # corpus-total gram counts as LAZY 1-row aggregates, broadcast-joined
    # into the plan — no eager driver job per call (the `ngram_lm_score`
    # vocab-metadata fix applied here: scoring is one fully lazy plan)
    totals = (
        raw_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("__nr"))
        .crossJoin(
            target_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("__nt"))
        )
    )
    r = F.broadcast(raw_counts.withColumnRenamed("c", "cr"))
    t = F.broadcast(target_counts.withColumnRenamed("c", "ct"))
    j = (
        feats.join(r, "bucket", "left")
        .join(t, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__id",
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            "__nr",
            "__nt",
        )
    )
    # ratio = ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)); computed as
    # ((ct+1)*(nr+B)) / ((cr+1)*(nt+B)) with each operand widened to
    # double first — 5 correctly-rounded IEEE ops, engine-exact.
    num = (F.col("ct") + F.lit(1)).cast("double") * (
        F.col("__nr") + F.lit(buckets)
    ).cast("double")
    den = (F.col("cr") + F.lit(1)).cast("double") * (
        F.col("__nt") + F.lit(buckets)
    ).cast("double")
    ratio = num / den
    ppm = F.floor(F.lit(float(_PPM)) * ratio).cast("long")
    agg = j.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.log(ratio)).alias("log_weight"),
        F.sum(ppm).alias("sum_ratio_ppm"),
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_grams",
        "log_weight",
        "sum_ratio_ppm",
        (F.col("sum_ratio_ppm").cast("double") / F.col("n_grams")).alias(
            "avg_ratio_ppm"
        ),
    )


def importance_sample(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    *,
    min_avg_ratio_ppm: int,
    keep_unscored: bool = False,
) -> DataFrame:
    """Select documents whose DSIR importance ratio clears a threshold —
    the deterministic selection step of importance resampling (a
    fixed cutoff on the exact-ppm channel rather than Gumbel-top-k, so
    the selection is reproducible across engines and partitionings; for
    randomized resampling compose with
    `sampling.deterministic_sample` keyed on the doc id). One broadcast
    semi-join; no shuffle of the corpus.

    Documents with ZERO n-grams (empty/whitespace-only text) have no
    `weights` row, so by default they are dropped regardless of the
    threshold — the DSIR-faithful behavior (an unscorable doc carries no
    evidence it is target-like). Pass `keep_unscored=True` to retain
    them instead (broadcast anti-join union; still no corpus shuffle)."""
    keep = weights.filter(
        F.col("avg_ratio_ppm") >= F.lit(float(min_avg_ratio_ppm))
    ).select(F.col(id_col))
    selected = df.join(F.broadcast(keep), id_col, "left_semi")
    if keep_unscored:
        unscored = df.join(
            F.broadcast(weights.select(F.col(id_col))), id_col, "left_anti"
        )
        selected = selected.unionByName(unscored)
    return selected


# ---------------------------------------------------------------------------
# Hashed bag-of-ngrams quality classifier (Naive-Bayes log-likelihood-ratio)
# ---------------------------------------------------------------------------


def quality_classifier_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    n: int = 1,
    buckets: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
) -> DataFrame:
    """Train the hashed-ngram quality classifier every web-scale pipeline
    carries (the GPT-3/CCNet "looks like the reference corpus" filter):
    a Naive-Bayes model over md5-hashed n-gram buckets, trained from a
    boolean `label_col` (True = positive/high-quality). Pure Catalyst —
    two hashed-count aggregations and a full outer join; no MLlib, no
    driver-side fitting, so training distributes like any aggregation.

    Returns ONE persistable model table of at most `buckets`+2 rows:
    data rows (bucket >= 0, pos_c, neg_c) plus two sentinel metadata
    rows — bucket = -1 carries total gram counts per class, bucket = -2
    carries document counts per class (the prior). md5 buckets are
    always >= 0, so the sentinels can never collide with data. Same
    persisted-artifact lifecycle as `ngram_lm` / `hashed_ngram_counts`:
    train once per snapshot, write to parquet, score every ingestion
    batch from the tiny table."""
    if n < 1 or buckets < 1:
        raise ValueError("n and buckets must be >= 1")
    lab = F.col(label_col).cast("boolean")
    # ONE corpus pass: explode grams with the class label alongside and
    # split the count per bucket with conditional sums — same rows as
    # the old per-class hashed_ngram_counts pair + full outer join
    # (buckets touched only by unlabeled docs can't appear: those docs
    # are filtered out, exactly as the class filters dropped them), at
    # half the scans/explodes and one shuffle instead of two + a join.
    toks = _tokens(text_col, lowercase)
    m = F.size(toks) - F.lit(n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    g = df.filter(lab.isNotNull()).select(
        lab.alias("__lab"),
        F.explode(F.when(m > 0, zipped).otherwise(F.array())).alias("__z"),
    )
    if n == 1:
        gram = F.col("__z").getField("0")
    else:
        gram = F.concat_ws(
            " ", *[F.col("__z").getField(str(i)) for i in range(n)]
        )
    data = (
        g.select("__lab", _md5_bucket(gram, seed, buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__lab"), 1).otherwise(0))
            .cast("long").alias("pos_c"),
            F.sum(F.when(~F.col("__lab"), 1).otherwise(0))
            .cast("long").alias("neg_c"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"), "pos_c", "neg_c"
        )
    )
    gram_tot = data.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.coalesce(F.sum("pos_c"), F.lit(0)).alias("pos_c"),
        F.coalesce(F.sum("neg_c"), F.lit(0)).alias("neg_c"),
    )
    doc_tot = df.agg(
        F.lit(-2).cast("long").alias("bucket"),
        F.coalesce(F.sum(lab.cast("long")), F.lit(0)).alias("pos_c"),
        F.coalesce(F.sum((~lab).cast("long")), F.lit(0)).alias("neg_c"),
    )
    return data.unionByName(gram_tot).unionByName(doc_tot)


def quality_classifier_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 1,
    buckets: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents under a `quality_classifier_train` model. Per gram,
    the Laplace-smoothed class likelihood ratio

        lr(b) = ((pos_c(b)+1) / (Npos+B)) / ((neg_c(b)+1) / (Nneg+B))

    computed as ((pos_c+1)*(Nneg+B)) / ((neg_c+1)*(Npos+B)) with every
    operand widened to double — the `importance_weights` fixed-order
    IEEE idiom, engine-exact. Two channels per document:

    - `sum_lr_ppm`/`avg_lr_ppm`: exact integer certification channel,
      per gram floor(1e6 * lr).
    - `log_odds` = ln(prior odds) + sum ln(lr) and
      `prob` = sigmoid(log_odds) — the actual NB decision score
      (transcendental; pytest-pinned vs a Python reference, like
      `ngram_lm_score`'s perplexity channel). Prior odds =
      (pos_docs+1)/(neg_docs+1) from the bucket=-2 metadata row.

    Model-side tables are <= buckets+2 rows and broadcast by default;
    scoring a batch is one explode, one broadcast join, one groupBy —
    O(batch), the persisted-model contract. Documents with zero grams
    produce no row (compose with `importance_sample(keep_unscored=)`
    semantics if they must be retained)."""
    if n < 1 or buckets < 1:
        raise ValueError("n and buckets must be >= 1")
    pairs = _gram_pairs(df, id_col, text_col, n, lowercase)
    gram = F.concat_ws(" ", F.col("prefix"), F.col("word"))
    if n == 1:
        gram = F.col("word")
    feats = pairs.select("__id", _md5_bucket(gram, seed, buckets).alias("bucket"))
    data = model.filter(F.col("bucket") >= 0)
    meta = (
        model.filter(F.col("bucket") < 0)
        .groupBy()
        .agg(
            F.max(F.when(F.col("bucket") == -1, F.col("pos_c"))).alias("__npos"),
            F.max(F.when(F.col("bucket") == -1, F.col("neg_c"))).alias("__nneg"),
            F.max(F.when(F.col("bucket") == -2, F.col("pos_c"))).alias("__dpos"),
            F.max(F.when(F.col("bucket") == -2, F.col("neg_c"))).alias("__dneg"),
        )
    )
    m = F.broadcast(data) if broadcast_model else data
    j = (
        feats.join(m, "bucket", "left")
        .crossJoin(F.broadcast(meta))
        .select(
            "__id",
            F.coalesce(F.col("pos_c"), F.lit(0)).alias("pos_c"),
            F.coalesce(F.col("neg_c"), F.lit(0)).alias("neg_c"),
            "__npos", "__nneg", "__dpos", "__dneg",
        )
    )
    num = (F.col("pos_c") + F.lit(1)).cast("double") * (
        F.col("__nneg") + F.lit(buckets)
    ).cast("double")
    den = (F.col("neg_c") + F.lit(1)).cast("double") * (
        F.col("__npos") + F.lit(buckets)
    ).cast("double")
    lr = num / den
    ppm = F.floor(F.lit(float(_PPM)) * lr).cast("long")
    prior = F.log(
        (F.col("__dpos") + F.lit(1)).cast("double")
        / (F.col("__dneg") + F.lit(1)).cast("double")
    )
    agg = j.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(ppm).alias("sum_lr_ppm"),
        (F.max(prior) + F.sum(F.log(lr))).alias("log_odds"),
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_grams",
        "sum_lr_ppm",
        (F.col("sum_lr_ppm").cast("double") / F.col("n_grams")).alias(
            "avg_lr_ppm"
        ),
        "log_odds",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("log_odds")))).alias("prob"),
    )


def perplexity_buckets(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    lowercase: bool = True,
    vocab_size: int | None = None,
    cache_scores: bool = True,
    smoothing: str = "laplace",
) -> DataFrame:
    """CCNet-style perplexity tiering (Wenzek et al. 2019): score every
    document under the n-gram LM, then split the corpus into three
    equal-size tiers — 'head' (most in-domain / lowest perplexity),
    'middle', 'tail' — the standard curation signal for choosing what
    to keep, downsample, or drop.

    The tier cuts use the exact-ppm channel, so the bucketing is
    engine-replayable: cut_lo is the LARGEST avg_score_ppm among the
    ceil(N/3) lowest-scoring docs, cut_mid the largest among the
    ceil(2N/3) lowest; bucket = 'tail' if avg <= cut_lo, 'middle' if
    avg <= cut_mid, else 'head'. avg_score_ppm is one correctly-rounded
    double division of exact integers, so both the values and the <=
    comparisons are bit-identical in any IEEE engine. Docs tied exactly
    AT a cut land in the lower tier (deterministic; with heavy ties the
    tiers are equal-size only up to the tie mass). Docs with zero
    scoreable grams (< n tokens) are excluded, matching
    `ngram_lm_score`'s output.

    Each cut is an EXACT order statistic computed by range-bucket
    histogram refinement (`_order_statistic` — the `assign_shards`
    cumsum idiom): a handful of tiny-output aggregations over the score
    frame, never an O(N) orderBy/limit/top-j, so per-task and driver
    state stay bounded at any corpus size (PLANS §36 measures flat cut
    cost across a 20x N sweep). `cache_scores` (default) persists the
    narrow (id, n_grams, avg) score frame MEMORY_AND_DISK so the cut
    probes and the final labeling don't re-execute the scoring lineage
    per pass (the `select_by_budget` recipe, PLANS §28). The persisted
    handle is attached to the returned frame as `_cached_scores`: the
    CALLER owns its lifetime — call `result._cached_scores.unpersist()`
    after materializing the result in long-lived sessions (otherwise
    repeated calls accumulate cached blocks until eviction).

    `smoothing` selects the scoring channel: 'laplace' (default —
    `ngram_lm_score`, the certified configuration) or 'kn' (interpolated
    Kneser-Ney via `kn_lm_score`, the smoothing CCNet's KenLM actually
    uses; requires n=2, same persisted model artifact). Both feed the
    identical exact-ppm cut machinery.

    Returns (id_col, n_grams, oov_grams, sum_score_ppm, avg_score_ppm,
    bucket)."""
    from pyspark.storagelevel import StorageLevel

    if smoothing == "laplace":
        scored = ngram_lm_score(
            df, model, id_col, text_col, n=n, lowercase=lowercase,
            vocab_size=vocab_size,
        )
    elif smoothing == "kn":
        if n != 2:
            raise ValueError("smoothing='kn' supports n=2 only")
        scored = kn_lm_score(df, model, id_col, text_col,
                             lowercase=lowercase)
    else:
        raise ValueError(f"unknown smoothing {smoothing!r}")
    scores = scored.select(
        id_col, "n_grams", "oov_grams", "sum_score_ppm", "avg_score_ppm"
    )
    if cache_scores:
        scores = scores.persist(StorageLevel.MEMORY_AND_DISK)
    stats = scores.agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("avg_score_ppm").alias("__lo"),
        F.max("avg_score_ppm").alias("__hi"),
    ).first()
    n_docs = stats["__n"]
    if n_docs == 0:
        out = scores.withColumn("bucket", F.lit(None).cast("string"))
        out._cached_scores = scores if cache_scores else None
        return out
    lo_j = -(-n_docs // 3)       # ceil(N/3)
    mid_j = -(-2 * n_docs // 3)  # ceil(2N/3)
    from .stats import _order_statistics

    cut_lo, cut_mid = _order_statistics(
        scores, "avg_score_ppm", [lo_j, mid_j], stats["__lo"], stats["__hi"]
    )
    bucket = (
        F.when(F.col("avg_score_ppm") <= F.lit(cut_lo), F.lit("tail"))
        .when(F.col("avg_score_ppm") <= F.lit(cut_mid), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    out = scores.withColumn("bucket", bucket)
    out._cached_scores = scores if cache_scores else None
    return out
