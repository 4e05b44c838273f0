"""Declarative text-curation pipeline: compose the curation operators into
the standard web-corpus flow (quality gates -> dedup tiers -> sampling ->
split) from a plain list of step dicts.

This is the integration layer a training-data pipeline actually runs —
each step is one of the library's oracle-certified operators, chained
lazily so Catalyst sees ONE logical plan end-to-end (filters merge into
the scan; nothing materializes between steps unless `report=True` asks
for per-step row counts, which costs one count action per step).

Example::

    df, report = curate(docs, [
        {"kind": "quality_filter", "min_score": 0.4},
        {"kind": "langid_filter", "allowed": ["en"]},
        {"kind": "repetition_filter", "max_dup_line_fraction": 0.3},
        {"kind": "fingerprint_dedup"},
        {"kind": "near_dedup", "threshold": 0.8},
        {"kind": "split", "weights": {"train": 0.98, "val": 0.01, "test": 0.01}},
    ], report=True)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.dedup import (
    dedup_against,
    dedup_keep_first,
    dedup_lines,
    near_dedup,
)
from .operators.packing import temperature_mixture_sample, top_k_per_group
from .operators.sampling import deterministic_sample, train_val_test_split
from .operators.text import (
    URL_HOST_RE,
    clean_lines,
    compression_ratio,
    fingerprint,
    gopher_filter,
    pii_count_exprs,
    predicted_lang_col,
    quality_score_col,
    repetition_fraction_exprs,
    repetition_stats,
    token_corpus_stats,
)

STEP_KINDS = (
    "quality_filter",
    "langid_filter",
    "repetition_filter",
    "pii_filter",
    "length_filter",
    "script_filter",
    "corpus_filter",
    "compression_filter",
    "clean_lines",
    "nbsp_normalize",
    "html_extract",
    "markdown_strip",
    "wikitext_strip",
    "email_strip",
    "gopher_filter",
    "temperature_mixture",
    "perplexity_tier",
    "link_prior",
    "exact_dedup",
    "fingerprint_dedup",
    "near_dedup",
    "containment_dedup",
    "dedup_against",
    "dedup_lines",
    "host_boilerplate_strip",
    "term_blocklist",
    "domain_cap",
    "domain_blocklist",
    "url_dedup",
    "decontaminate",
    "sample",
    "split",
)


def _join_filter(df: DataFrame, id_col: str, keep_ids: DataFrame) -> DataFrame:
    return df.join(keep_ids.select(id_col), id_col, "left_semi")


def inline_gate_condition(kind: str, params: dict, text_col: str):
    """The pure-projection gate PREDICATE shared by `curate()`'s inline
    fast path and `gate_funnel`'s single-pass accounting — one Column
    expression judging a row by its text alone (no keep-set, no join,
    no shuffle; the r12 inline-gate contract). Raises ValueError for a
    kind (or configuration — e.g. repetition with a top-bigram bound)
    that needs the keep-set channel, so callers can fall back
    explicitly. CONSUMES recognized keys from `params` (mirroring
    curate()'s step.pop discipline: leftovers mean a typo'd kwarg)."""
    t = F.col(text_col)
    if kind == "quality_filter":
        return quality_score_col(t) >= params.pop("min_score", 0.5)
    if kind == "langid_filter":
        return predicted_lang_col(t).isin(list(params.pop("allowed")))
    if kind == "repetition_filter":
        if "max_top_bigram_fraction" in params:
            raise ValueError(
                "repetition_filter with max_top_bigram_fraction needs the "
                "per-doc explode channel (keep-set) — not inline-able"
            )
        fr = repetition_fraction_exprs(t)
        cond = F.lit(True)
        for arg, col in (
            ("max_dup_line_fraction", "dup_line_fraction"),
            ("max_dup_token_fraction", "dup_token_fraction"),
        ):
            if arg in params:
                cond = cond & (fr[col] <= params.pop(arg))
        return cond
    if kind == "pii_filter":
        pe = pii_count_exprs(t)
        cond = F.lit(True)
        for arg, col in (
            ("max_url_count", "url_count"),
            ("max_email_count", "email_count"),
            ("max_ipv4_count", "ipv4_count"),
            ("max_phone_count", "phone_count"),
        ):
            if arg in params:
                cond = cond & (pe[col] <= params.pop(arg))
        return cond
    if kind == "length_filter":
        cond = F.lit(True)
        if "min_chars" in params:
            cond = cond & (F.length(t) >= params.pop("min_chars"))
        if "max_chars" in params:
            cond = cond & (F.length(t) <= params.pop("max_chars"))
        return cond
    if kind == "script_filter":
        from .operators.text import script_share_condition

        return script_share_condition(
            t,
            params.pop("script", "latin"),
            int(params.pop("min_share_ppm")),
        )
    raise ValueError(f"gate kind {kind!r} is not a pure-projection gate")


def gate_funnel(
    df: DataFrame,
    steps: list[dict],
    *,
    text_col: str = "text",
    group_by: str | None = None,
) -> DataFrame:
    """Curation OBSERVABILITY in one pass: per-stage survivor counts
    for a chain of pure-projection gates (`inline_gate_condition`
    kinds), optionally broken down by `group_by` (source, domain,
    shard...). Where `curate(report=True)` runs one counting action
    per step, this computes EVERY stage's cumulative-survival flag as
    a projection and aggregates them all in ONE job — the shape that
    scales to a 100-TB funnel dashboard: no repeated scans, map-side
    partial combine, output bounded by stages x groups.

    Returns (group?, stage, kind, n_in, n_out, n_dropped): stage 1's
    n_in is the group's row count; stage k's n_in is stage k-1's
    n_out (gates apply IN ORDER — the funnel is cumulative, matching
    what `curate()` with the same steps would keep)."""
    conds = []
    for i, step in enumerate(steps):
        step = dict(step)
        kind = step.pop("kind", None)
        cond = inline_gate_condition(kind, step, text_col)
        if step:
            raise ValueError(f"step {i}: unknown kwargs {sorted(step)}")
        conds.append((kind, cond))
    if not conds:
        raise ValueError("gate_funnel needs at least one step")
    surv = F.lit(True)
    flags = []
    for _, cond in conds:
        surv = surv & cond
        flags.append(F.sum(surv.cast("long")))
    keys = [F.col(group_by)] if group_by else []
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("__n0"),
        *[f.cast("long").alias(f"__n{i + 1}") for i, f in enumerate(flags)],
    )
    arr = F.array(*[F.col(f"__n{i}") for i in range(len(conds) + 1)])
    kinds = F.array(*[F.lit(k) for k, _ in conds])
    out = agg.select(
        *([group_by] if group_by else []),
        F.posexplode(kinds).alias("__i", "kind"),
        arr.alias("__arr"),
    ).select(
        *([group_by] if group_by else []),
        (F.col("__i") + 1).cast("int").alias("stage"),
        "kind",
        F.element_at("__arr", F.col("__i") + 1).alias("n_in"),
        F.element_at("__arr", F.col("__i") + 2).alias("n_out"),
        (
            F.element_at("__arr", F.col("__i") + 1)
            - F.element_at("__arr", F.col("__i") + 2)
        ).alias("n_dropped"),
    )
    return out


def curate(
    df: DataFrame,
    steps: list[dict],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    report: bool = False,
    checkpoint_every: int | None = None,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Run the curation steps in order; returns (curated_df, report_rows).

    `report=True` counts rows after every step (one action per step) and
    returns [{"step", "kind", "rows"}, ...]; with the default False the
    report list is empty and the whole pipeline stays one lazy plan.

    `checkpoint_every=k` eagerly `localCheckpoint`s the running frame
    after every k-th step, trading the one-lazy-plan contract for
    bounded plan growth on DEEP pipelines. The pure-projection gates
    (quality/langid/pii, repetition without a top-bigram predicate)
    run as INLINE filters — one reference, no join, no growth — but
    every KEEP-SET step (corpus/compression gates, top-bigram
    repetition, the dedup tiers, domain_cap, perplexity/link gates)
    references the running frame TWICE (the frame itself and the
    keep-set lineage derived from it), so a chain of those doubles
    both execution and Catalyst-analysis work per step — measured: 8
    keep-set gates ~7 s, 10 gates ~25 s on a 500-doc fixture,
    doubling onward. Chains deeper than ~8 keep-set steps should set
    checkpoint_every=4. Results are bit-identical either way
    (pytest-pinned); checkpoint storage is Spark-managed
    (ContextCleaner) — nothing for the caller to release.
    `checkpoint_dir=` upgrades those materializations from
    executor-local `localCheckpoint` to RELIABLE `checkpoint()`
    against the given HDFS/S3/local directory (survives executor
    loss — the right mode for multi-hour cluster runs; see
    `operators._util.materialize_step`).

    Steps (all operator kwargs pass through). The pure-projection
    gates — quality_filter, langid_filter, pii_filter, and
    repetition_filter without a top-bigram predicate — evaluate their
    verdict as an INLINE per-row `filter()` on the running frame
    (same expression trees as the corresponding operators,
    parity pytest-pinned): no keep-set join, no shuffle, whole-stage
    codegen with the scan. Keep-set steps (dedup tiers, corpus/
    compression gates, domain_cap, perplexity/link gates) semi-join
    on `id_col` as before.

    NULL-`id_col` rows: inline gates judge every row by its TEXT —
    `id_col` plays no role — so a NULL-id row that passes the
    predicate SURVIVES (pinned semantics; pytest-covered). Keep-set
    steps still drop NULL-id rows unconditionally (a NULL join key
    never matches its own keep-set row) — identify rows before
    curating if NULL ids can occur upstream.
    - quality_filter: min_score (on `quality_score`'s 0-1 composite)
    - langid_filter: allowed=[...] predicted languages
    - repetition_filter: max_dup_line_fraction / max_dup_token_fraction /
      max_top_bigram_fraction (any subset)
    - pii_filter: max_url_count / max_email_count / max_ipv4_count /
      max_phone_count (any subset)
    - length_filter: min_chars / max_chars
    - script_filter: script= (a `SCRIPT_CLASSES` name, default 'latin')
      + min_share_ppm= — keep docs whose named Unicode script covers at
      least that integer-ppm share of the non-whitespace length (the
      `script_profile` semantics as an inline pure-projection gate;
      empty/whitespace-only docs carry no script evidence and are
      dropped)
    - corpus_filter: max_rare_token_fraction / max_avg_corpus_freq /
      min_tokens (any subset; on `token_corpus_stats`' signals).
      NOTE: empty/whitespace-only documents are ALWAYS removed by this
      step regardless of which predicates are configured — a zero-token
      doc has no corpus-stats row (its signals are undefined), so the
      keep-set semi-join excludes it. Use length_filter if you want that
      cut to be explicit about thresholds.
    - compression_filter: min_ratio / max_ratio on the zlib
      `compression_ratio` (low = templated/self-similar; NULL-ratio docs
      i.e. empty text are dropped)
    - exact_dedup: keep-first on the raw text (survivor = min id)
    - fingerprint_dedup: keep-first on the whitespace/case-normalized md5
    - near_dedup: cluster-safe MinHash near-dup removal (threshold, ...)
    - containment_dedup: drop docs near-fully CONTAINED in another doc
      (quote/excerpt/syndication tier — the container survives;
      n / threshold_ppm / max_doc_freq pass through)
    - clean_lines: C4 line-correction rules (terminal punctuation /
      min_words / blocklist — REWRITES text in place; kwargs pass through)
    - nbsp_normalize: map U+00A0/U+2007/U+202F to plain spaces (one
      regexp_replace REWRITE — re-bases length/script-share signals on
      NBSP-padded pages; run before gates, after html_extract)
    - html_extract: HTML -> readable text (stdlib-parser boilerplate
      strip: script/style/head/nav dropped, block tags break lines,
      entities decoded — REWRITES text in place, or into out_col=;
      run FIRST when ingesting raw crawl HTML so every downstream
      gate sees prose, not markup)
    - markdown_strip / wikitext_strip: markup -> plain-text
      projections (operators/markdown_text.py, operators/wikitext.py
      — Arrow-batched REWRITES; run before shingle/quality gates so
      `**bold**` and `bold` dedup together)
    - email_strip: reply-scaffolding cleanup (quoted lines,
      attribution, signature block — pure JVM array REWRITE,
      operators/email_text.py)
    - gopher_filter: all published Gopher document rules as one direct
      predicate (threshold kwargs pass through)
    - temperature_mixture: alpha= / target_rows= p^alpha mixture
      resampling on group_col= (plus seed/hash_fn/ppm pass-through).
      NOTE: computes per-group rates from the CURRENT pipeline state, so
      it executes the upstream lineage twice — .cache() upstream first
      for expensive chains (PLANS §23)
    - perplexity_tier: model=<persisted ngram_lm DataFrame> CCNet
      tiering (Wenzek et al. 2019) — scores every doc under the
      reference LM, cuts the corpus into equal-size head/middle/tail
      perplexity tiers (`lm.perplexity_buckets`, exact order-statistic
      cuts), keeps the tiers named in keep= (default
      ('head', 'middle') — the standard CCNet recipe drops the
      worst-modeled third). n= / lowercase= / vocab_size= /
      smoothing= ('laplace' | 'kn') pass through. Docs with < n
      tokens have no tier and are dropped.
      cache_scores= controls the operator's score-cache lifetime:
      'release' (default) unpersists it as soon as the tier cuts are
      probed — no leak, but the final labeling join recomputes the
      scoring lineage once at materialization;
      'through_materialization' keeps it persisted so downstream
      steps and the final action reuse the cached scores — the
      CALLER then owns the release: the handle(s) are attached to
      the returned frame as `_perplexity_score_caches` (a list; call
      .unpersist() on each after materializing)
    - link_prior: edges=<(src, dst) link DataFrame> crawl-graph
      centrality gate — the quality prior web pipelines apply BEFORE
      content filters (`graph.pagerank`, exact integer channel):
      rank every node, then drop documents whose id appears in the
      graph with rank_ppt < min_rank_ppt. Documents ABSENT from the
      link graph survive by default (no-evidence-is-not-negative,
      the `domain_cap` no-URL convention); keep_missing=False drops
      them instead. src_col= / dst_col= / n_iter= / damping_m= /
      dedupe_edges= / cache_iterations= pass through to `pagerank`
      (the default materializes each PageRank superstep via eager
      localCheckpoint — the lazy chain is O(2^n_iter); checkpoint
      storage is Spark-managed, nothing for the caller to release)
    - dedup_lines: cross-corpus LINE dedup (C4-style boilerplate pass —
      REWRITES text in place rather than dropping rows; min_doc_count /
      min_line_chars pass through)
    - host_boilerplate_strip: HOST-scoped boilerplate removal (CCNet-style
      per-domain line pass — REWRITES text; url_col / host_col /
      min_doc_count / min_doc_ppm / min_line_chars pass through; docs
      with no discoverable host pass through byte-identical)
    - term_blocklist: terms=<DataFrame> C4-style content blocklist —
      drop docs containing ANY blocklisted term as a whole word
      (case-insensitive, token-aligned; multi-word terms match
      consecutively; term_col passes through)
    - dedup_against: seen=<DataFrame> incremental cross-corpus dedup
      (method='fingerprint'|'minhash' + lsh kwargs pass through); or
      method='minhash' + seen_tags=<minhash_band_tags sketch DataFrame>
      to dedup against persisted history sketches without re-reading
      history raw text (seen may then be omitted)
    - domain_cap: k=<int> — keep at most k docs per primary URL domain
      (first extracted host; docs with no URL always survive)
    - domain_blocklist: hosts=<DataFrame> — drop docs whose host (from
      url_col= or the first URL in the text) is on the blocklist;
      include_subdomains=True blocks every subdomain of a listed host,
      keep_missing=True keeps docs with no discoverable host. Run it
      FIRST: host lookups are free, content gates are not
    - url_dedup: url_col=<col> — collapse rows sharing a CANONICAL URL
      (tracking params/fragments/case variants) to the lowest-id copy;
      NULL-url rows always survive (keep= passes through)
    - decontaminate: benchmark=<DataFrame> — surgically cut every
      >= n-token window shared verbatim with the benchmark corpus from
      document text (REWRITES text; n / hash_fn / bench_text_col pass
      through)
    - sample: fraction (deterministic content-hash)
    - split: weights={name: w} -> adds a `split` column (terminal-friendly)
    """
    if checkpoint_every is not None and checkpoint_every < 1:
        # a negative value would pass a bare truthiness check and, via
        # Python's (i+1) % -1 == 0, silently checkpoint after EVERY step
        raise ValueError(
            f"checkpoint_every must be >= 1 or None, got {checkpoint_every}"
        )
    out = df
    rows: list[dict] = []
    retained_caches: list[DataFrame] = []
    for i, step in enumerate(steps):
        step = dict(step)
        kind = step.pop("kind", None)
        if kind not in STEP_KINDS:
            raise ValueError(f"step {i}: unknown kind {kind!r}; one of {STEP_KINDS}")
        if kind == "quality_filter":
            # pure-projection signal -> INLINE filter: no keep-set
            # join, no doubled lineage, stays in the scan's codegen
            # stage (same expression tree as the operator — parity
            # pytest-pinned; predicate shared with gate_funnel via
            # inline_gate_condition)
            out = out.filter(inline_gate_condition(kind, step, text_col))
        elif kind == "langid_filter":
            out = out.filter(inline_gate_condition(kind, step, text_col))
        elif kind == "repetition_filter":
            # the three per-row fractions filter inline; a
            # top-bigram predicate needs the operator's per-doc
            # explode+groupBy channel, so that configuration keeps
            # the keep-set join
            if "max_top_bigram_fraction" in step:
                rep = repetition_stats(out, id_col, text_col)
                cond = F.lit(True)
                for arg, col in (
                    ("max_dup_line_fraction", "dup_line_fraction"),
                    ("max_dup_token_fraction", "dup_token_fraction"),
                    ("max_top_bigram_fraction", "top_bigram_fraction"),
                ):
                    if arg in step:
                        cond = cond & (F.col(col) <= step.pop(arg))
                out = _join_filter(out, id_col, rep.filter(cond))
            else:
                out = out.filter(
                    inline_gate_condition(kind, step, text_col)
                )
        elif kind == "pii_filter":
            out = out.filter(inline_gate_condition(kind, step, text_col))
        elif kind == "length_filter":
            out = out.filter(inline_gate_condition(kind, step, text_col))
        elif kind == "script_filter":
            out = out.filter(inline_gate_condition(kind, step, text_col))
        elif kind == "exact_dedup":
            out = dedup_keep_first(out, [text_col], [id_col])
        elif kind == "fingerprint_dedup":
            fp = fingerprint(out, id_col, text_col)
            keep = dedup_keep_first(fp, ["fingerprint"], [id_col])
            out = _join_filter(out, id_col, keep)
        elif kind == "compression_filter":
            cr = compression_ratio(out, id_col, text_col)
            cond = F.col("compression_ratio").isNotNull()
            if "min_ratio" in step:
                cond = cond & (F.col("compression_ratio") >= step.pop("min_ratio"))
            if "max_ratio" in step:
                cond = cond & (F.col("compression_ratio") <= step.pop("max_ratio"))
            out = _join_filter(out, id_col, cr.filter(cond))
        elif kind == "corpus_filter":
            stats = token_corpus_stats(out, id_col, text_col)
            cond = F.lit(True)
            for arg, col, op in (
                ("max_rare_token_fraction", "rare_token_fraction", "le"),
                ("max_avg_corpus_freq", "avg_token_corpus_freq", "le"),
                ("min_tokens", "n_tokens", "ge"),
            ):
                if arg in step:
                    v = step.pop(arg)
                    cond = cond & (
                        F.col(col) <= v if op == "le" else F.col(col) >= v
                    )
            out = _join_filter(out, id_col, stats.filter(cond))
        elif kind == "near_dedup":
            out = near_dedup(out, id_col, text_col, **step)
            step = {}
        elif kind == "containment_dedup":
            from .operators.dedup import dedup_contained

            out = dedup_contained(out, id_col, text_col, **step)
            step = {}
        elif kind == "dedup_lines":
            out = dedup_lines(out, id_col, text_col, **step)
            step = {}
        elif kind == "host_boilerplate_strip":
            from .operators.text import host_boilerplate_strip

            out = host_boilerplate_strip(out, id_col, text_col, **step)
            step = {}
        elif kind == "term_blocklist":
            from .operators.text import term_blocklist

            terms = step.pop("terms")
            out = term_blocklist(
                out, terms, id_col, text_col=text_col, **step
            )
            step = {}
        elif kind == "clean_lines":
            out = clean_lines(out, id_col, text_col, **step)
            step = {}
        elif kind == "nbsp_normalize":
            # pure-projection REWRITE (one regexp_replace): map the
            # non-breaking space family to plain spaces so downstream
            # length/script-share gates see them as whitespace
            # (html_to_text keeps U+00A0 as content by contract)
            from .operators.text import NBSP_CLASS

            out = out.withColumn(
                text_col, F.regexp_replace(F.col(text_col), NBSP_CLASS, " ")
            )
        elif kind == "html_extract":
            from .operators.html_text import extract_html_text

            out = extract_html_text(out, text_col, **step)
            step = {}
        elif kind == "markdown_strip":
            # pure-projection REWRITE (Arrow-batched): markup out,
            # content stays — run BEFORE shingle/quality gates
            from .operators.markdown_text import markdown_strip

            out = markdown_strip(out, text_col, text_col)
        elif kind == "wikitext_strip":
            from .operators.wikitext import wikitext_strip

            out = wikitext_strip(out, text_col, text_col)
        elif kind == "email_strip":
            # pure-projection REWRITE, JVM-side: reply quoting,
            # attribution, and signature scaffolding out
            from .operators.email_text import email_strip_quotes

            out = email_strip_quotes(out, text_col, text_col)
        elif kind == "gopher_filter":
            out = gopher_filter(out, id_col, text_col, **step)
            step = {}
        elif kind == "temperature_mixture":
            group_col = step.pop("group_col")
            out = temperature_mixture_sample(out, id_col, group_col, **step)
            step = {}
        elif kind == "perplexity_tier":
            from .operators.lm import perplexity_buckets

            model = step.pop("model")
            keep = list(step.pop("keep", ("head", "middle")))
            bad = set(keep) - {"head", "middle", "tail"}
            if bad:
                raise ValueError(f"step {i}: unknown tiers {sorted(bad)}")
            cache_mode = step.pop("cache_scores", "release")
            if cache_mode not in ("release", "through_materialization"):
                raise ValueError(
                    f"step {i}: cache_scores must be 'release' or "
                    f"'through_materialization', got {cache_mode!r}"
                )
            tiers = perplexity_buckets(
                out, model, id_col, text_col, **step
            )
            step = {}
            out = _join_filter(
                out, id_col, tiers.filter(F.col("bucket").isin(keep))
            )
            # perplexity_buckets' exact tier-cut probes run EAGERLY
            # inside the call, so its MEMORY_AND_DISK score cache has
            # already served every repeated scan by this point. The
            # pipeline owns the `_cached_scores` handle (the operator's
            # caller-owns-lifetime contract). Default 'release': free
            # it here instead of leaking one persisted frame per
            # curate() invocation in long-lived sessions — the final
            # labeling join then recomputes the scoring lineage once
            # when the caller materializes. 'through_materialization':
            # keep it persisted (downstream steps and the final action
            # reuse the cached scores); ownership transfers to the
            # caller via `_perplexity_score_caches` on the returned
            # frame.
            cached = getattr(tiers, "_cached_scores", None)
            if cached is not None:
                if cache_mode == "release":
                    cached.unpersist()
                else:
                    retained_caches.append(cached)
        elif kind == "link_prior":
            from .operators.graph import pagerank

            edges = step.pop("edges")
            min_rank_ppt = int(step.pop("min_rank_ppt"))
            keep_missing = bool(step.pop("keep_missing", True))
            # pagerank's default cache_iterations=True materializes
            # each superstep via eager localCheckpoint (the lazy chain
            # is O(2^n_iter) in both execution and analysis); the gate
            # join reads the final checkpointed frame, whose storage
            # Spark's ContextCleaner reclaims when unreferenced — no
            # cache handle to manage here.
            ranks = pagerank(edges, **step)
            step = {}
            if keep_missing:
                # drop only documents the graph AFFIRMATIVELY ranks
                # low; out-of-graph docs carry no link evidence and
                # survive (anti-join against the bounded low set)
                low = ranks.filter(
                    F.col("rank_ppt") < min_rank_ppt
                ).select(F.col("node").alias(id_col))
                out = out.join(low, id_col, "left_anti")
            else:
                keep_ids = ranks.filter(
                    F.col("rank_ppt") >= min_rank_ppt
                ).select(F.col("node").alias(id_col))
                out = _join_filter(out, id_col, keep_ids)
        elif kind == "dedup_against":
            # seen may be omitted when a persisted minhash_band_tags
            # sketch is supplied via seen_tags (the O(new) path)
            seen = step.pop("seen", None)
            out = dedup_against(out, seen, id_col, text_col, **step)
            step = {}
        elif kind == "domain_cap":
            k = step.pop("k")
            primary = out.select(
                F.col(id_col),
                F.lower(
                    F.get(
                        F.regexp_extract_all(
                            F.col(text_col), F.lit(URL_HOST_RE), F.lit(1)
                        ),
                        0,
                    )
                ).alias("__dom"),
            )
            capped = top_k_per_group(
                primary.filter(F.col("__dom").isNotNull()),
                ["__dom"],
                id_col,
                k,
                id_col=id_col,
                descending=False,
            )
            keep = capped.select(id_col).unionByName(
                primary.filter(F.col("__dom").isNull()).select(id_col)
            )
            out = _join_filter(out, id_col, keep)
        elif kind == "domain_blocklist":
            from .operators.text import domain_blocklist

            hosts = step.pop("hosts")
            out = domain_blocklist(
                out, hosts, id_col, text_col=text_col, **step
            )
            step = {}
        elif kind == "url_dedup":
            from .operators.text import url_dedup

            url_col = step.pop("url_col")
            out = url_dedup(out, id_col, url_col, **step).drop("canonical_url")
            step = {}
        elif kind == "decontaminate":
            from .operators.text import decontaminate_spans

            benchmark = step.pop("benchmark")
            out = decontaminate_spans(out, benchmark, id_col, text_col, **step)
            step = {}
        elif kind == "sample":
            out = deterministic_sample(out, id_col, step.pop("fraction"), **step)
            step = {}
        elif kind == "split":
            out = train_val_test_split(out, id_col, step.pop("weights"), **step)
            step = {}
        if step and kind not in (
            "near_dedup", "containment_dedup", "dedup_against",
            "dedup_lines", "clean_lines",
            "gopher_filter", "temperature_mixture", "sample", "split",
            "url_dedup", "decontaminate",
        ):
            raise ValueError(f"step {i} ({kind}): unused arguments {sorted(step)}")
        if report:
            rows.append({"step": i, "kind": kind, "rows": out.count()})
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < len(steps):
            from .operators._util import materialize_step

            out = materialize_step(out, checkpoint_dir)
    if retained_caches:
        # cache_scores='through_materialization' transfers cache
        # ownership to the caller: unpersist each after materializing
        out._perplexity_score_caches = retained_caches
    return out, rows


def eval_split_recipe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    weights: dict[str, float] | None = None,
    train_split: str = "train",
    n: int = 8,
    seed: int = 42,
    split_hash_fn: str = "xxhash64",
    gram_hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free evaluation split — the composition every serious
    pretraining pipeline runs before training: deterministically split
    the corpus (`train_val_test_split` content-hash ranges, so a grown
    corpus never moves an existing row between splits), then
    SPAN-DECONTAMINATE the train slice against everything held out
    (`text.decontaminate_spans`): any length-`n` token window of a
    train document that appears verbatim in a val/test document is cut,
    overlapping hits merged into maximal spans. Flagging-and-dropping
    whole train docs would throw away every page a test snippet leaked
    into; surgically removing the shared windows keeps the page and
    still guarantees no verbatim >= n-token overlap between train text
    and the eval sets.

    Plan shape: the split is a narrow per-row projection (no shuffle);
    the held-out side reduces to a distinct window-hash set (bounded by
    eval-set size — tiny next to train, so the membership join
    broadcasts); the train rewrite is the `dedup_spans` island
    machinery, all shuffles on doc id or the uniform hash. Train text
    comes back whitespace-normalized (the rebuild contract); held-out
    rows pass through byte-identical. Returns the input columns plus
    `split_col`.

    `weights` defaults to {'train': .9, 'val': .05, 'test': .05};
    `train_split` names the slice to decontaminate (must be a weights
    key). hash_fn knobs: 'md5'/'text' are the oracle-replayable
    configurations (certified end-to-end by the `eval_split` registry
    entry)."""
    from .operators.text import decontaminate_spans

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if train_split not in weights:
        raise ValueError(f"train_split {train_split!r} not in weights")
    split = train_val_test_split(
        df, id_col, weights, seed=seed, hash_fn=split_hash_fn,
        split_col=split_col,
    )
    train = split.filter(F.col(split_col) == train_split)
    held = split.filter(F.col(split_col) != train_split)
    cleaned = decontaminate_spans(
        train, held, id_col, text_col,
        bench_text_col=text_col, n=n, hash_fn=gram_hash_fn,
    )
    return cleaned.unionByName(held.select(*cleaned.columns))
