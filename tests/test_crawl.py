"""Crawl scheduling: change-rate estimation + politeness frontier."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.pipeline_ops.crawl import (
    change_rates,
    crawl_schedule,
)


@pytest.fixture(scope="module")
def pages(spark):
    # url A: 3 snapshots, 2 content flips; url B: 2 snapshots identical;
    # url C: single snapshot (cold start); url D on a second host
    rows = [
        ("https://a.example.org/x", 100, 1, "v1"),
        ("https://a.example.org/x", 200, 2, "v2"),
        ("https://a.example.org/x", 300, 3, "v3"),
        ("https://a.example.org/y", 100, 4, "same"),
        ("https://a.example.org/y", 400, 5, "same"),
        ("https://a.example.org/z", 250, 6, "only"),
        ("https://b.example.org/q", 200, 7, "w1"),
        ("https://b.example.org/q", 300, 8, "w2"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts long, doc_id long, text string"
    )


def test_change_rates(pages):
    got = {r.url: r for r in change_rates(pages).collect()}
    a = got["https://a.example.org/x"]
    assert (a.n_snaps, a.n_changes, a.last_ts) == (3, 2, 300)
    assert a.change_rate == 0.75  # (2+1)/(3+1)
    b = got["https://a.example.org/y"]
    assert (b.n_snaps, b.n_changes) == (2, 0)
    assert b.change_rate == pytest.approx(0.333333)  # Laplace: (0+1)/(2+1)
    c = got["https://a.example.org/z"]
    assert (c.n_snaps, c.n_changes) == (1, 0)
    assert c.change_rate == 0.5  # cold start gets the middle rate


def test_schedule_politeness_invariants(pages):
    rows = crawl_schedule(pages, n_fetchers=2).collect()
    # priority = floor(change_rate * (400 - last_ts) + 0.5)
    pri = {r.url: r.priority for r in rows}
    assert pri["https://a.example.org/x"] == 75   # 0.75 * 100
    assert pri["https://a.example.org/y"] == 0
    assert pri["https://a.example.org/z"] == 75   # 0.5 * 150
    assert pri["https://b.example.org/q"] == 67   # (1+1)/(2+1) * 100, rounded

    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, hrows in by_host.items():
        # one fetch per host per round: rounds are exactly 1..n
        assert sorted(r.round for r in hrows) == list(
            range(1, len(hrows) + 1)
        )
        # a host is pinned to one fetcher
        assert len({r.fetcher for r in hrows}) == 1
        # round order follows priority desc, url asc
        want = sorted(hrows, key=lambda r: (-r.priority, r.url))
        assert [r.url for r in sorted(hrows, key=lambda r: r.round)] == [
            r.url for r in want
        ]
    by_fetch: dict = {}
    for r in rows:
        by_fetch.setdefault(r.fetcher, []).append(r)
    for frows in by_fetch.values():
        # pos is a total order per fetcher, walking rounds outward
        assert sorted(r.pos for r in frows) == list(range(1, len(frows) + 1))
        ordered = sorted(frows, key=lambda r: r.pos)
        assert ordered == sorted(
            frows, key=lambda r: (r.round, -r.priority, r.url)
        )


def test_schedule_rejects_bad_fetchers(pages):
    with pytest.raises(ValueError):
        crawl_schedule(pages, n_fetchers=0)


ROBOTS_A = """# demo robots
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/pub   # inline comment
Disallow: /tmp*
disallow: /cgi
"""

ROBOTS_B = """User-agent: *
Allow: /
"""


def test_robots_rules_parse(spark):
    from themis_search_engine_spark.pipeline_ops.crawl import robots_rules

    docs = spark.createDataFrame(
        [("a.org", ROBOTS_A), ("b.org", ROBOTS_B)],
        "host string, robots_txt string",
    )
    got = {
        (r.host, r.rule_path, r.allow) for r in robots_rules(docs).collect()
    }
    assert got == {
        # evilbot's Disallow: / never leaks into the * group
        ("a.org", "/private", False),
        ("a.org", "/private/pub", True),   # comment stripped
        ("a.org", "/cgi", False),          # case-insensitive field
        # /tmp* dropped: wildcard rules are outside the subset
        ("b.org", "/", True),
    }


def test_robots_filter_longest_match(spark):
    from themis_search_engine_spark.pipeline_ops.crawl import robots_filter

    rules = spark.createDataFrame(
        [("a.org", "/private", False),
         ("a.org", "/private/pub", True),
         ("a.org", "/p", False),
         ("a.org", "/p/1", False),
         ("a.org", "/p/1", True)],       # exact-length tie: Allow wins
        "host string, rule_path string, allow boolean",
    )
    urls = spark.createDataFrame(
        [("https://a.org/private/x",),
         ("https://a.org/private/pub/x",),
         ("https://a.org/p/2",),
         ("https://a.org/p/1",),
         ("https://a.org/free",),
         ("https://other.org/anything",)],
        "url string",
    )
    got = {r.url: (r.rule_path, r.allowed)
           for r in robots_filter(urls, rules).collect()}
    assert got["https://a.org/private/x"] == ("/private", False)
    assert got["https://a.org/private/pub/x"] == ("/private/pub", True)
    assert got["https://a.org/p/2"] == ("/p", False)
    assert got["https://a.org/p/1"] == ("/p/1", True)     # tie -> Allow
    assert got["https://a.org/free"] == ("", True)        # default allow
    assert got["https://other.org/anything"] == ("", True)


def test_snapshot_retention_policy(spark):
    from themis_search_engine_spark.pipeline_ops.websnap import (
        snapshot_retention,
    )

    day = 86400
    rows = [
        # url A: 4 snapshots across 2 days
        ("u1", 1, 0),            # day 0, first of day -> daily
        ("u1", 2, 100),          # day 0, second -> expired
        ("u1", 3, day + 10),     # day 1 first AND 2nd-newest -> recent
        ("u1", 4, day + 20),     # newest -> recent
        # url B: single snapshot -> recent
        ("u2", 5, 50),
    ]
    pages = spark.createDataFrame(
        rows, "url string, doc_id long, warc_ts long"
    )
    got = {
        r.doc_id: (r.keep, r.reason)
        for r in snapshot_retention(pages, keep_last=2).collect()
    }
    assert got == {
        1: (True, "daily"),
        2: (False, "expired"),
        3: (True, "recent"),   # recent wins over daily
        4: (True, "recent"),
        5: (True, "recent"),
    }


def test_crawl_traps_detection(spark):
    from themis_search_engine_spark.pipeline_ops.crawl import crawl_traps

    rows = (
        # trap.org: 12 urls over ONE stem (query-id explosion)
        [(f"https://trap.org/cal?id={i}",) for i in range(12)]
        # ok.org: 12 urls over 12 stems (real pages)
        + [(f"https://ok.org/page{i}",) for i in range(12)]
        # small.org: huge ratio but too few urls to convict
        + [(f"https://small.org/x?id={i}",) for i in range(4)]
    )
    urls = spark.createDataFrame(rows, "canon_url string")
    got = {r.host: r for r in crawl_traps(
        urls, min_urls=10, max_ratio=3.0).collect()}
    assert got["trap.org"].trap and got["trap.org"].url_ratio == 12.0
    assert not got["ok.org"].trap and got["ok.org"].url_ratio == 1.0
    assert not got["small.org"].trap  # min_urls floor
