"""Crawl scheduling: frontier selection (`crawl.crawl_frontier`) and
robots.txt politeness (`parse_robots` / `robots_gate`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.crawl import (
    _parse_robots_text, crawl_frontier, parse_robots, robots_gate,
    url_host, url_path,
)


def test_url_host_path(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.com/x/y?q=1",),
            ("http://b.example.com",),
            ("nonsense",),
            (None,),
        ],
        "url string",
    ).select(
        url_host(F.col("url")).alias("h"), url_path(F.col("url")).alias("p")
    )
    rows = df.collect()
    assert (rows[0].h, rows[0].p) == ("a.example.com", "/x/y")
    assert (rows[1].h, rows[1].p) == ("b.example.com", "/")
    assert rows[2].h is None
    assert rows[3].h is None and rows[3].p is None


def test_crawl_frontier_dedup_seen_politeness_budget(spark):
    cands = spark.createDataFrame(
        [
            # same page via tracking variants -> one candidate, best score
            ("https://h1.example.com/a?utm_source=x", 0.2),
            ("https://WWW.h1.example.com/a", 0.9),
            ("https://h1.example.com/b", 0.8),
            ("https://h1.example.com/c", 0.7),
            ("https://h1.example.com/d", 0.6),   # politeness-capped out
            ("https://h2.example.com/a", 0.5),
            ("https://h2.example.com/seen", 1.0),  # already fetched
            ("no-host-here", 1.0),                 # unfetchable -> dropped
        ],
        "url string, priority double",
    )
    seen = spark.createDataFrame(
        [("https://h2.example.com/seen#frag",)], "url string"
    )
    out = crawl_frontier(
        cands, seen, per_host_limit=3, budget=4
    ).collect()
    got = {r.url: (r.host, r.priority, r.host_rank) for r in out}
    assert set(got) == {
        "https://h1.example.com/a",
        "https://h1.example.com/b",
        "https://h1.example.com/c",
        "https://h2.example.com/a",
    }
    assert got["https://h1.example.com/a"] == ("h1.example.com", 0.9, 1)
    assert got["https://h2.example.com/a"][2] == 1


def test_crawl_frontier_null_priority_sorts_last(spark):
    cands = spark.createDataFrame(
        [
            ("https://h.example.com/scored", 0.1),
            ("https://h.example.com/unscored", None),
        ],
        "url string, priority double",
    )
    out = crawl_frontier(cands, per_host_limit=1).collect()
    assert [r.url for r in out] == ["https://h.example.com/scored"]


def test_crawl_frontier_validates(spark):
    df = spark.createDataFrame([("https://x/", 1.0)], "url string, priority double")
    with pytest.raises(ValueError):
        crawl_frontier(df, per_host_limit=0)
    with pytest.raises(ValueError):
        crawl_frontier(df, budget=0)


# ---------------------------------------------------------------------------
# robots
# ---------------------------------------------------------------------------

ROBOTS = """# example robots
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:

User-agent: specialbot
User-agent: otherbot
Disallow: /

Sitemap: https://h.example.com/sitemap.xml
"""


def test_parse_robots_text_star_group():
    rules = _parse_robots_text(ROBOTS, "*")
    assert rules == [(False, "/private"), (True, "/private/ok")]


def test_parse_robots_text_exact_group_wins():
    assert _parse_robots_text(ROBOTS, "SpecialBot") == [(False, "/")]
    assert _parse_robots_text(ROBOTS, "otherbot") == [(False, "/")]
    # no exact group -> falls back to *
    assert _parse_robots_text(ROBOTS, "somebot") == [
        (False, "/private"), (True, "/private/ok")
    ]


def test_parse_robots_text_edge_cases():
    assert _parse_robots_text(None, "*") == []
    assert _parse_robots_text("", "*") == []
    # empty Disallow pattern matches nothing (allow-all)
    assert _parse_robots_text("User-agent: *\nDisallow:\n", "*") == []


def test_robots_gate_longest_match(spark):
    robots = spark.createDataFrame(
        [("h.example.com", ROBOTS)], "host string, robots_txt string"
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [
            ("https://h.example.com/public/page",),   # no rule -> allow
            ("https://h.example.com/private/page",),  # /private -> deny
            ("https://h.example.com/private/ok/sub",),  # longer allow wins
            ("https://unknown.example.com/private",),   # no rules host -> allow
            (None,),                                    # passthrough
        ],
        "url string",
    )
    kept = sorted(
        r.url or "" for r in robots_gate(urls, rules).collect()
    )
    assert kept == [
        "",
        "https://h.example.com/private/ok/sub",
        "https://h.example.com/public/page",
        "https://unknown.example.com/private",
    ]


def test_robots_gate_tie_goes_to_allow(spark):
    robots = spark.createDataFrame(
        [("h.example.com", "User-agent: *\nDisallow: /a\nAllow: /b\n")],
        "host string, robots_txt string",
    )
    # same-length allow and disallow prefixes on DIFFERENT paths is the
    # common case; build a genuine tie on one path
    rules = parse_robots(
        spark.createDataFrame(
            [("t.example.com", "User-agent: *\nDisallow: /x\nAllow: /x\n")],
            "host string, robots_txt string",
        )
    )
    urls = spark.createDataFrame(
        [("https://t.example.com/x/page",)], "url string"
    )
    assert robots_gate(urls, rules).count() == 1


def test_robots_gate_preserves_columns(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("h.example.com", "User-agent: *\nDisallow: /no\n")],
            "host string, robots_txt string",
        )
    )
    urls = spark.createDataFrame(
        [(1, "https://h.example.com/yes"), (2, "https://h.example.com/no")],
        "doc_id long, url string",
    )
    out = robots_gate(urls, rules, url_col="url")
    assert out.columns == ["doc_id", "url"]
    assert [r.doc_id for r in out.collect()] == [1]


# ---------------------------------------------------------------------------
# crawl-delay politeness
# ---------------------------------------------------------------------------


def test_parse_crawl_delay_groups():
    from soda_spark_spark.operators.crawl import _parse_crawl_delay

    txt = ("User-agent: special\nCrawl-delay: 2\n\n"
           "User-agent: *\nCrawl-delay: 10\nCrawl-delay: 4\n")
    assert _parse_crawl_delay(txt, "special") == 2.0
    # multiple declarations -> conservative max
    assert _parse_crawl_delay(txt, "otherbot") == 10.0
    assert _parse_crawl_delay("User-agent: *\nDisallow: /x\n", "*") is None
    assert _parse_crawl_delay("User-agent: *\nCrawl-delay: nope\n", "*") is None
    assert _parse_crawl_delay(None, "*") is None


def test_exact_group_without_rules_shadows_star():
    """RFC group selection: an exact-match group with only a
    Crawl-delay means the agent's group has NO path rules — no
    fallback to the '*' rules."""
    from soda_spark_spark.operators.crawl import _parse_robots_text

    txt = ("User-agent: special\nCrawl-delay: 2\n\n"
           "User-agent: *\nDisallow: /\n")
    assert _parse_robots_text(txt, "special") == []
    assert _parse_robots_text(txt, "anyone") == [(False, "/")]


def test_crawl_delay_limits(spark):
    from soda_spark_spark.operators.crawl import crawl_delay_limits

    robots = spark.createDataFrame(
        [
            ("slow.example.com", "User-agent: *\nCrawl-delay: 30\n"),
            ("fast.example.com", "User-agent: *\nCrawl-delay: 1.5\n"),
            ("blocked.example.com", "User-agent: *\nCrawl-delay: 90\n"),
            ("zero.example.com", "User-agent: *\nCrawl-delay: 0\n"),
            ("nodelay.example.com", "User-agent: *\nDisallow: /x\n"),
        ],
        "host string, robots_txt string",
    )
    got = {r.host: r.limit for r in crawl_delay_limits(
        robots, window_seconds=60
    ).collect()}
    assert got == {
        "slow.example.com": 2,
        "fast.example.com": 40,
        "blocked.example.com": 0,
    }


def test_crawl_frontier_host_limits_override(spark):
    from soda_spark_spark.operators.crawl import crawl_frontier

    cands = spark.createDataFrame(
        [(f"https://{h}.example.com/p{i}", float(10 - i))
         for h in ("a", "b", "c") for i in range(4)],
        "url string, priority double",
    )
    limits = spark.createDataFrame(
        [("a.example.com", 1), ("b.example.com", 0)],
        "host string, limit long",
    )
    out = crawl_frontier(
        cands, per_host_limit=3, host_limits=limits
    ).collect()
    per_host = {}
    for r in out:
        per_host.setdefault(r.host, []).append(r.url)
    assert len(per_host["a.example.com"]) == 1      # overridden down
    assert "b.example.com" not in per_host          # limit 0 blocks
    assert len(per_host["c.example.com"]) == 3      # default cap


# ---------------------------------------------------------------------------
# sitemaps
# ---------------------------------------------------------------------------

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example.com/a</loc><lastmod>2026-01-05</lastmod></url>
  <url><loc> https://h.example.com/b </loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://h.example.com/sitemap1.xml</loc>
    <lastmod>2026-02-01</lastmod></sitemap>
</sitemapindex>
"""


def test_sitemap_entries_text():
    from soda_spark_spark.operators.crawl import sitemap_entries_text

    got = sitemap_entries_text(SITEMAP)
    assert got == [
        ("https://h.example.com/a", "2026-01-05", "url"),
        ("https://h.example.com/b", None, "url"),  # loc-less entry dropped
    ]
    assert sitemap_entries_text(SITEMAP_INDEX) == [
        ("https://h.example.com/sitemap1.xml", "2026-02-01", "sitemap"),
    ]
    assert sitemap_entries_text(None) is None
    assert sitemap_entries_text("not xml at all") == []


def test_sitemap_entries_dataframe(spark):
    from soda_spark_spark.operators.crawl import sitemap_entries

    df = spark.createDataFrame(
        [(1, SITEMAP), (2, SITEMAP_INDEX), (3, None)],
        "id long, sitemap_xml string",
    )
    out = {r.id: r.entries for r in sitemap_entries(df).collect()}
    assert [e.loc for e in out[1]] == [
        "https://h.example.com/a", "https://h.example.com/b"
    ]
    assert out[1][0].lastmod == "2026-01-05" and out[1][1].lastmod is None
    assert out[2][0].kind == "sitemap"
    assert out[3] is None


def test_robots_sitemap_urls(spark):
    from soda_spark_spark.operators.crawl import robots_sitemap_urls

    robots = spark.createDataFrame(
        [
            ("h.example.com",
             "User-agent: *\nDisallow: /x\n"
             "Sitemap: https://h.example.com/sitemap.xml\n"
             "Sitemap: https://cdn.example.com/other.xml\n"),
            ("empty.example.com", "User-agent: *\nDisallow:\n"),
            ("null.example.com", None),
        ],
        "host string, robots_txt string",
    )
    got = sorted(
        (r.host, r.sitemap_url) for r in robots_sitemap_urls(robots).collect()
    )
    assert got == [
        ("h.example.com", "https://cdn.example.com/other.xml"),
        ("h.example.com", "https://h.example.com/sitemap.xml"),
    ]
