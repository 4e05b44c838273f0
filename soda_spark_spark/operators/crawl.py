"""Crawl scheduling operators — the OUTBOUND half of the crawl loop.

The repo's ingestion story so far runs fetch -> parse (`sources/warc`)
-> extract (`operators/html_text`) -> curate (`pipeline`) -> link graph
(`extract_html_links` -> `graph.pagerank`). This module closes the
loop: given the link graph's discovered URLs and the set already
fetched, decide WHAT TO FETCH NEXT — frontier selection with per-host
politeness caps and a global budget (`crawl_frontier`), and robots.txt
compliance (`parse_robots` / `robots_gate`).

The reference (src/sodaspark/scan.py:424-474) scans already-loaded
frames and has no crawl story; this extends the repo's crawl surface
the way `sources/warc.py` extended its ingestion surface.

Scale model (the 100 TB frontier is billions of candidate URLs):

- Candidate collapse is one map-side-combinable aggregation per
  canonical URL (`max_by` — a URL linked from a million pages is a hot
  KEY but collapses to one row per input partition before the shuffle).
- The seen-set check is one hash anti-join on the canonical URL —
  uniformly distributed by construction, no skew.
- Politeness is `top_k_per_group` on host: output bounded by
  per_host_limit x |hosts| regardless of frontier size.
- The global budget is orderBy().limit() — Spark's distributed
  TakeOrdered (per-partition partial top-k, then a bounded merge),
  never a full global sort.
- robots rules join on host; the rules side is ~|hosts| rows (tiny
  next to the frontier) and broadcasts while it fits.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import canonical_url

# scheme://host[:port] capture (host canonicalization mirrors
# text._canonical_host: canonical_url already lowercased and stripped
# 'www.'; the port stays part of the politeness key — one host on two
# ports is two servers)
_HOST_RE = r"^[^/?#]+://([^/?#]+)"


def url_host(url: Column) -> Column:
    """Host (authority) component of a URL column, NULL when absent."""
    h = F.regexp_extract(url, _HOST_RE, 1)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def url_path(url: Column) -> Column:
    """Path component ('' -> '/'), the robots.txt matching target."""
    p = F.regexp_extract(url, r"^[^/?#]+://[^/?#]+([^?#]*)", 1)
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(p == "", F.lit("/")).otherwise(p)
    )


def crawl_frontier(
    candidates: DataFrame,
    seen: DataFrame | None = None,
    *,
    url_col: str = "url",
    priority_col: str = "priority",
    per_host_limit: int = 10,
    host_limits: DataFrame | None = None,
    budget: int | None = None,
) -> DataFrame:
    """Select the next fetch batch from discovered candidate URLs:

    1. canonicalize (`text.canonical_url`) and collapse duplicates,
       keeping each canonical URL's BEST priority (a page linked from
       many places ranks by its strongest signal — feed `pagerank`
       scores or `link_prior` weights as `priority_col`);
    2. drop URLs whose canonical form is already in `seen` (the fetch
       log — compared under the same canonicalization);
    3. politeness: keep at most `per_host_limit` URLs per host
       (priority desc, canonical URL asc — total-order deterministic);
       `host_limits` (host, limit) overrides the cap per listed host —
       feed `crawl_delay_limits` to honor robots Crawl-delay (a limit
       of 0 blocks the host entirely);
    4. optional global `budget`: the overall top-N by the same order.

    Returns (url, host, priority, host_rank) — `url` is the canonical
    form (the form to fetch and to log into `seen` for the next
    round). Candidates with no parseable host are dropped: they cannot
    be fetched politely. NULL priorities sort last (a URL with no
    signal is fetched after every scored one)."""
    if per_host_limit < 1:
        raise ValueError("per_host_limit must be >= 1")
    if budget is not None and budget < 1:
        raise ValueError("budget must be >= 1 (or None)")
    canon = candidates.select(
        canonical_url(F.col(url_col)).alias("url"),
        F.col(priority_col).cast("double").alias("priority"),
    ).filter(F.col("url").isNotNull())
    best = canon.groupBy("url").agg(F.max("priority").alias("priority"))
    if seen is not None:
        seen_canon = seen.select(
            canonical_url(F.col(url_col)).alias("url")
        ).filter(F.col("url").isNotNull())
        best = best.join(seen_canon, "url", "left_anti")
    hosted = best.select(
        "url", url_host(F.col("url")).alias("host"), "priority"
    ).filter(F.col("host").isNotNull())
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc_nulls_last(), F.col("url").asc()
    )
    polite = hosted.withColumn("host_rank", F.row_number().over(w))
    if host_limits is not None:
        lim = host_limits.select(
            F.col("host"), F.col("limit").cast("int").alias("__lim")
        )
        # no forced broadcast: AQE broadcasts a small limits table on
        # its own, and a web-scale one (millions of hosts) must shuffle
        polite = polite.join(lim, "host", "left").filter(
            F.col("host_rank") <= F.coalesce(F.col("__lim"),
                                             F.lit(per_host_limit))
        ).drop("__lim")
    else:
        polite = polite.filter(F.col("host_rank") <= per_host_limit)
    if budget is not None:
        polite = polite.orderBy(
            F.col("priority").desc_nulls_last(), F.col("url").asc()
        ).limit(budget)
    return polite.select(
        "url", "host", "priority", F.col("host_rank").cast("int").alias("host_rank")
    )


# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------

ROBOTS_RULES_SCHEMA = "host string, allow boolean, prefix string"


def _robots_group_items(
    txt: str | None, agent: str
) -> list[tuple[str, str]]:
    """Group-resolved (key, value) directive pairs of one robots.txt
    body for `agent`: directives from every group whose User-agent
    matches `agent` exactly (case-insensitive), falling back to the
    '*' groups when no exact group exists (RFC 9309 group selection).
    Consecutive User-agent lines share one group; comments strip at
    '#'; keys lowercase. Sitemap/unknown keys inside a group are kept
    (callers filter); they end agent collection but stay
    group-neutral."""
    if txt is None:
        return []
    agent_lc = agent.lower()
    exact: list[tuple[str, str]] = []
    star: list[tuple[str, str]] = []
    cur_agents: list[str] = []
    collecting_agents = True
    for raw in txt.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                cur_agents = []
                collecting_agents = True
            cur_agents.append(val.lower())
        else:
            collecting_agents = False
            if agent_lc in cur_agents:
                exact.append((key, val))
            if "*" in cur_agents:
                star.append((key, val))
    return exact if exact else star


def _parse_robots_text(txt: str | None, agent: str) -> list[tuple[bool, str]]:
    """RFC 9309 subset parse of one robots.txt body for `agent`:
    returns (allow, path_prefix) rules from the matching groups
    (`_robots_group_items`). Empty patterns match nothing and are
    skipped (a bare 'Disallow:' means allow-all, per the RFC).
    Wildcard patterns ('*' anywhere or a '$' anchor) are NOT
    interpreted; they are kept as literal text, which matches nothing
    real — callers needing RFC wildcard semantics should pre-expand
    them (documented limitation, keeps the match replayable as plain
    prefix arithmetic in any engine)."""
    return [
        (key == "allow", val)
        for key, val in _robots_group_items(txt, agent)
        if key in ("allow", "disallow") and val
    ]


def _parse_crawl_delay(txt: str | None, agent: str) -> float | None:
    """Crawl-delay (seconds) for `agent` from the matching groups —
    the MAXIMUM when several groups declare one (the conservative,
    slowest-fetch read of an already non-standard directive).
    Non-numeric or negative values are ignored."""
    best = None
    for key, val in _robots_group_items(txt, agent):
        if key != "crawl-delay":
            continue
        try:
            d = float(val)
        except ValueError:
            continue
        if d < 0:
            continue
        if best is None or d > best:
            best = d
    return best


def parse_robots(
    robots: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, allow, prefix) rule rows for `agent` from a per-host
    robots.txt table — one Arrow-batched row-local pass
    (`_parse_robots_text`), no shuffle. The output is the rules
    artifact `robots_gate` joins against; persist it like any other
    sketch (robots bodies are re-fetched on their own cadence)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            hosts, allows, prefixes = [], [], []
            for host, txt in zip(pdf[host_col].values, pdf[text_col].values):
                for allow, prefix in _parse_robots_text(txt, agent):
                    hosts.append(host)
                    allows.append(allow)
                    prefixes.append(prefix)
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype=object),
                    "allow": pd.Series(allows, dtype=bool),
                    "prefix": pd.Series(prefixes, dtype=object),
                }
            )

    return robots.select(F.col(host_col), F.col(text_col)).mapInPandas(
        run, schema=ROBOTS_RULES_SCHEMA
    )


def crawl_delay_limits(
    robots: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    window_seconds: int = 60,
) -> DataFrame:
    """(host, limit) per-window fetch caps from robots Crawl-delay:
    limit = floor(window_seconds / delay) for every host declaring one
    (conservative max across matching groups; a delay longer than the
    window caps the host at 0 — blocked this window, the frontier
    skips it). Hosts without a Crawl-delay emit no row and fall back
    to `crawl_frontier`'s `per_host_limit`. Row-local Arrow pass, no
    shuffle; feed the result to `crawl_frontier(host_limits=)`."""
    import pandas as pd

    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            hosts, limits = [], []
            for host, txt in zip(pdf[host_col].values, pdf[text_col].values):
                d = _parse_crawl_delay(txt, agent)
                if d is None:
                    continue
                hosts.append(host)
                limits.append(
                    int(window_seconds // d) if d > 0 else None
                )
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype=object),
                    "limit": pd.array(limits, dtype="Int64"),
                }
            )

    out = robots.select(F.col(host_col), F.col(text_col)).mapInPandas(
        run, schema="host string, limit long"
    )
    # Crawl-delay: 0 means "no delay" -> no cap from this directive
    return out.filter(F.col("limit").isNotNull())


def robots_gate(
    df: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
) -> DataFrame:
    """Filter a URL frame to the rows robots.txt ALLOWS, under the
    RFC 9309 longest-match rule: among the host's rules whose prefix
    starts the URL's path, the LONGEST prefix wins; a length tie goes
    to allow; no matching rule (or no rules for the host at all) means
    allowed. `rules` is a `parse_robots` result (host, allow, prefix).

    One join on host (the rules side broadcasts while it fits — pass
    `F.broadcast(rules)` to force it) + one map-side-combinable
    `max_by` per URL; the per-URL candidate set is bounded by that
    host's rule count, never by frontier size. URLs with no parseable
    host pass through (nothing to match against)."""
    host = url_host(F.col(url_col))
    path = url_path(F.col(url_col))
    keyed = df.withColumn("__host", host).withColumn("__path", path)
    matched = (
        keyed.select(F.col(url_col).alias("__url"), "__host", "__path")
        .join(rules, F.col("__host") == F.col("host"), "inner")
        .filter(F.col("__path").startswith(F.col("prefix")))
        .groupBy("__url")
        .agg(
            # longest prefix wins, ties go to allow: struct comparison
            # orders by (length, allow) lexicographically
            F.max(
                F.struct(
                    F.length("prefix").alias("len"),
                    F.col("allow").alias("allow"),
                )
            ).alias("__win")
        )
        .select("__url", F.col("__win.allow").alias("__allow"))
    )
    out = keyed.join(
        matched, keyed[url_col] == matched["__url"], "left"
    ).filter(F.coalesce(F.col("__allow"), F.lit(True)))
    return out.drop("__host", "__path", "__url", "__allow")


class _SitemapCollector(HTMLParser):
    """Collects <url>/<sitemap> entries of a sitemaps.org XML document
    (urlset or sitemapindex) with the stdlib tolerant tokenizer — the
    same no-lxml stance as `operators/html_text`. Tracks <loc> and
    <lastmod> text inside each entry; entries without a <loc> are
    dropped. (stdlib html.parser lowercases tag names and ignores XML
    namespaces' prefixes only if unprefixed — sitemaps.org documents
    use unprefixed tags.)"""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.entries: list[tuple[str, str | None, str]] = []
        self._kind: str | None = None
        self._field: str | None = None
        self._loc: list[str] = []
        self._lastmod: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in ("url", "sitemap"):
            self._kind = tag
            self._loc, self._lastmod = [], []
        elif self._kind and tag in ("loc", "lastmod"):
            self._field = tag

    def handle_endtag(self, tag):  # noqa: D102
        if tag in ("loc", "lastmod"):
            self._field = None
        elif tag in ("url", "sitemap") and self._kind == tag:
            loc = "".join(self._loc).strip()
            lastmod = "".join(self._lastmod).strip() or None
            if loc:
                self.entries.append((loc, lastmod, tag))
            self._kind = None

    def handle_data(self, data):  # noqa: D102
        if self._field == "loc":
            self._loc.append(data)
        elif self._field == "lastmod":
            self._lastmod.append(data)


def sitemap_entries_text(xml_str: str | None) -> list[tuple] | None:
    """Parse one sitemap XML body to [(loc, lastmod, kind)] — kind is
    'url' (a urlset entry, fetchable page) or 'sitemap' (a sitemapindex
    child, to be fetched and parsed in the next round). None -> None;
    a body the tokenizer cannot process -> None (quarantine-style)."""
    if xml_str is None:
        return None
    p = _SitemapCollector()
    try:
        p.feed(xml_str)
        p.close()
    except Exception:
        return None
    return p.entries


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    *,
    out_col: str = "entries",
) -> DataFrame:
    """Append `out_col` (array<struct<loc,lastmod,kind>>) of every
    row's sitemap entries — URL discovery's SECOND channel next to the
    link graph (`extract_html_links`): sites publish their canonical
    URL inventory (plus lastmod freshness hints) through robots.txt
    Sitemap lines, and a production frontier merges both. Row-local
    Arrow pass, no shuffle; explode + `canonical_url` + a lastmod
    recency priority feeds `crawl_frontier` directly. Sitemapindex
    children surface as kind='sitemap' for the next fetch round."""
    import pandas as pd

    def _parse(s):
        return pd.Series(
            [sitemap_entries_text(x) for x in s], dtype=object
        )

    _parse.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(
        _parse, "array<struct<loc string, lastmod string, kind string>>"
    )
    return df.withColumn(out_col, udf(F.col(xml_col)))


def robots_sitemap_urls(
    robots: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap_url) rows from robots.txt Sitemap lines — the
    discovery hop BEFORE `sitemap_entries`. Sitemap directives are
    group-independent per sitemaps.org, so every line counts
    regardless of User-agent groups. Row-local Arrow pass."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            hosts, urls = [], []
            for host, txt in zip(pdf[host_col].values, pdf[text_col].values):
                if txt is None:
                    continue
                for raw in txt.split("\n"):
                    line = raw.split("#", 1)[0].strip()
                    key, sep, val = line.partition(":")
                    # the value itself contains ':' (a URL) — only the
                    # FIRST colon splits the directive
                    if sep and key.strip().lower() == "sitemap":
                        v = val.strip()
                        if v:
                            hosts.append(host)
                            urls.append(v)
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype=object),
                    "sitemap_url": pd.Series(urls, dtype=object),
                }
            )

    return robots.select(F.col(host_col), F.col(text_col)).mapInPandas(
        run, schema="host string, sitemap_url string"
    )
