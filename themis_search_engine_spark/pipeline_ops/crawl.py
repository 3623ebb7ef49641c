"""Crawl scheduling: per-URL change-rate estimation + politeness frontier.

The incremental-crawl control loop above snapshot_diff: WHICH urls to
fetch next, and in WHAT order, such that (a) fast-changing pages are
revisited more often (freshness — the Cho & Garcia-Molina "Effective
Page Refresh Policies" estimation idea: observe change frequency from
the snapshot history), and (b) no host is hammered (politeness — one
fetch per host per round, hosts pinned to fetcher shards so rate limits
are enforceable locally, the standard Mercator/Heritrix frontier
shape).

Everything is deterministic and engine-portable:

* change detection compares md5 digests of ADJACENT snapshots per url
  (ts asc, doc_id asc — one url-keyed shuffle, lag() window; page
  bodies never survive past the digest);
* ``change_rate = floor((n_changes+1)/(n_snaps+1)·10⁶ + 0.5)/10⁶`` —
  Laplace-smoothed so a single-snapshot URL gets a middle rate rather
  than 0 (cold URLs must not starve);
* ``priority = floor(change_rate · age + 0.5)`` with ``age`` = seconds
  since the url's last crawl, measured against the corpus' newest
  snapshot (a 1-row broadcast, not a driver collect) — the
  rate-×-staleness product that makes hot-but-fresh and cold-but-stale
  pages comparable;
* ``fetcher = seeded-md5(host) % n_fetchers`` — the same integer hash
  trick the sampling ops use, so the DuckDB twin reproduces it
  bit-for-bit, and ALL of a host's urls land on one fetcher (politeness
  state is shard-local at 10⁹ hosts — no cross-fetcher coordination);
* ``round``   = the url's rank within its host (priority desc, url
  asc): a frontier consumer fetching round r touches every host at
  most once per round;
* ``pos``     = the url's rank within its fetcher (round asc, priority
  desc, url asc): the actual per-shard fetch order. Every window here
  is PARTITIONED (host / fetcher) — there is no global sort, so the
  plan scales to any url count.

Reference scope: the reference engine (Search.java and the indexing
pipeline) consumes a pre-crawled corpus and has no crawler; these
semantics follow the published frontier designs above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def change_rates(
    pages: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(url, last_ts, n_snaps, n_changes, change_rate) — per-URL change
    statistics over the FULL snapshot history (snapshot_diff's two-row
    window generalized to all rows): n_changes counts adjacent-snapshot
    digest flips, change_rate is Laplace-smoothed and 6dp-quantized.
    One url-keyed shuffle; the per-url agg reuses the window's
    partitioning."""
    w = Window.partitionBy("url").orderBy(F.asc("_ts"), F.asc("_id"))
    staged = pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("_h"),
    ).withColumn("_ph", F.lag("_h").over(w))
    agg = staged.groupBy("url").agg(
        F.max("_ts").alias("last_ts"),
        F.count("*").cast("long").alias("n_snaps"),
        F.sum(
            F.when(
                F.col("_ph").isNotNull() & (F.col("_h") != F.col("_ph")), 1
            ).otherwise(0)
        ).cast("long").alias("n_changes"),
    )
    return agg.withColumn(
        "change_rate",
        F.floor(
            (F.col("n_changes") + 1) * F.lit(1000000.0)
            / (F.col("n_snaps") + 1)
            + F.lit(0.5)
        ) / F.lit(1000000.0),
    )


def _fetcher_expr(host_col, n_fetchers: int):
    # seeded-md5 32-bit bucket, the sampling ops' engine-portable hash
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("fetch|"), host_col)), 1, 8),
               16, 10).cast("long") % n_fetchers
    )


def crawl_schedule(
    pages: DataFrame,
    *,
    n_fetchers: int = 4,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(url, host, n_snaps, n_changes, change_rate, priority, fetcher,
    round, pos) — the full frontier schedule: change-rate × staleness
    priority, host-pinned fetcher shards, one-fetch-per-host-per-round
    politeness, per-fetcher fetch order. See module docstring for each
    column's law; every window is host- or fetcher-partitioned, and the
    only global quantity is a broadcast 1-row max(ts)."""
    if n_fetchers < 1:
        raise ValueError("n_fetchers must be >= 1")
    rates = change_rates(
        pages, url_col=url_col, ts_col=ts_col, id_col=id_col,
        text_col=text_col,
    )
    now = pages.agg(F.max(F.col(ts_col).cast("long")).alias("_now"))
    scored = (
        rates.crossJoin(F.broadcast(now))
        .select(
            "url", "last_ts", "n_snaps", "n_changes", "change_rate",
            F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"),
            F.floor(
                F.col("change_rate") * (F.col("_now") - F.col("last_ts"))
                + F.lit(0.5)
            ).cast("long").alias("priority"),
        )
        .withColumn("fetcher", _fetcher_expr(F.col("host"), n_fetchers))
    )
    w_host = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("url")
    )
    w_fetch = Window.partitionBy("fetcher").orderBy(
        F.asc("round"), F.desc("priority"), F.asc("url")
    )
    return (
        scored.withColumn("round", F.row_number().over(w_host).cast("long"))
        .withColumn("pos", F.row_number().over(w_fetch).cast("long"))
        .select(
            "url", "host", "n_snaps", "n_changes", "change_rate",
            "priority", "fetcher", "round", "pos",
        )
    )


def robots_rules(
    robots_docs: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, rule_path, allow) — parse raw robots.txt bodies into the
    rule table :func:`robots_filter` consumes. In-plan (posexplode of
    lines + a last-ignore-nulls window carrying the current
    ``User-agent:`` group), no Python per row.

    Supported subset of RFC 9309: ``User-agent`` / ``Allow`` /
    ``Disallow`` lines, ``#`` comments, case-insensitive field names,
    plain path prefixes (no ``*``/``$`` wildcards — a rule containing
    them is dropped, which can only make the filter MORE permissive;
    documented limitation). A rule belongs to the nearest preceding
    User-agent line; only groups for ``agent`` (default ``*``) are
    kept, so an ``evilbot`` section never leaks into the default
    group."""
    lines = robots_docs.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        "host", "pos",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host", "pos",
        F.lower(
            F.trim(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
        ).alias("field"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = parsed.withColumn(
        "ua",
        F.last(
            F.when(F.col("field") == "user-agent", F.col("value")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        grouped.where(F.col("ua") == agent)
        .where(F.col("field").isin("allow", "disallow"))
        .where(F.col("value") != "")
        .where(~F.col("value").rlike(r"[*$]"))
        .select(
            "host",
            F.col("value").alias("rule_path"),
            (F.col("field") == "allow").alias("allow"),
        )
        .distinct()
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
) -> DataFrame:
    """(url, host, rule_path, allowed) — RFC 9309 rule application: the
    LONGEST rule whose path is a prefix of the url path decides; on an
    exact length tie Allow wins (Google's published tiebreak); a url
    with no matching rule is allowed, with rule_path = '' so the output
    stays null-free.

    Shape: rules are host-keyed and tiny relative to the frontier
    (even 10⁹ hosts × a few rules is dwarfed by 10¹² urls), so the join
    broadcasts when small and otherwise shuffles on host — the same key
    the frontier is already partitioned by after crawl_schedule's
    politeness window, so no extra exchange in the composed pipeline.
    The longest-match pick is a per-url window over its matched rules
    only (a handful of rows), never over a host's whole frontier."""
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, r"^https?://([^/]+)/", 1).alias("host"),
        F.regexp_replace(url_col, r"^https?://[^/]+", "").alias("_path"),
    )
    matched = (
        u.join(rules, "host")
        .where(F.col("_path").startswith(F.col("rule_path")))
    )
    w = Window.partitionBy("url").orderBy(
        F.desc(F.length("rule_path")),
        F.desc("allow"),
        F.asc("rule_path"),
    )
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "rule_path", F.col("allow").alias("allowed"))
    )
    return (
        u.join(best, "url", "left")
        .select(
            "url", "host",
            F.coalesce("rule_path", F.lit("")).alias("rule_path"),
            F.coalesce("allowed", F.lit(True)).alias("allowed"),
        )
    )


def fixture_robots_rules(hosts: DataFrame, *, host_col: str = "host") -> DataFrame:
    """Deterministic per-host robots rule fixture for the driver corpus
    (the DuckDB twin replicates the formula bit-for-bit, like
    websnap.snapshot_view): with b = seeded-md5('robots|'+host) % 7,

    * every host disallows ``/p/<(b+1)%7>``         (specific disallow)
    * hosts with b % 3 == 0 also disallow ``/p``    (broad disallow)
      and allow ``/p/<b>``                          (longer Allow wins)

    so the longest-match / allow-override semantics all fire somewhere
    at every scale factor."""
    h = hosts.select(F.col(host_col).alias("host")).distinct()
    b = (
        F.conv(F.substring(F.md5(F.concat(F.lit("robots|"), F.col("host"))),
                           1, 8), 16, 10).cast("long") % 7
    )
    hb = h.select("host", b.alias("_b"))
    specific = hb.select(
        "host",
        F.concat(F.lit("/p/"), ((F.col("_b") + 1) % 7).cast("string")).alias(
            "rule_path"
        ),
        F.lit(False).alias("allow"),
    )
    broad = hb.where(F.col("_b") % 3 == 0).select(
        "host", F.lit("/p").alias("rule_path"), F.lit(False).alias("allow")
    )
    override = hb.where(F.col("_b") % 3 == 0).select(
        "host",
        F.concat(F.lit("/p/"), F.col("_b").cast("string")).alias("rule_path"),
        F.lit(True).alias("allow"),
    )
    return specific.unionByName(broad).unionByName(override)


def crawl_traps(
    urls: DataFrame,
    *,
    url_col: str = "canon_url",
    min_urls: int = 10,
    max_ratio: float = 3.0,
) -> DataFrame:
    """(host, n_urls, n_stems, url_ratio, trap) — crawl-trap detection
    by URL-space explosion: a host whose distinct (canonicalized) URL
    count vastly exceeds its distinct path-stem count (the URL minus
    its query string) is generating pages faster than it has templates
    — the calendar/session-id/faceted-navigation trap signature every
    production crawler guards against (Heritrix's TooManyPathSegments /
    queue budgets). Run AFTER url_canon: tracking params are already
    stripped, so surviving query-string fan-out is real server-side
    state space.

    ``url_ratio = floor(n_urls·10⁶/n_stems + 0.5)/10⁶``; ``trap`` fires
    when the host has at least ``min_urls`` urls AND the ratio exceeds
    ``max_ratio``. One host-keyed aggregate over the frontier spine —
    two count-distincts per host, no text, no joins; feed ``trap``
    hosts a crawl budget cut (or a robots_filter-style deny rule)
    rather than deleting history."""
    staged = urls.select(
        F.regexp_extract(url_col, r"^https?://([^/]+)", 1).alias("host"),
        F.col(url_col).alias("_u"),
        F.regexp_replace(url_col, r"\?.*$", "").alias("_stem"),
    )
    agg = staged.groupBy("host").agg(
        F.countDistinct("_u").cast("long").alias("n_urls"),
        F.countDistinct("_stem").cast("long").alias("n_stems"),
    )
    ratio = F.floor(
        F.col("n_urls") * F.lit(1000000.0) / F.col("n_stems") + F.lit(0.5)
    ) / F.lit(1000000.0)
    return agg.select(
        "host", "n_urls", "n_stems", ratio.alias("url_ratio"),
    ).select(
        "host", "n_urls", "n_stems", "url_ratio",
        # the trap predicate reads the QUANTIZED ratio, so the flag can
        # never disagree with the reported number (engine or oracle)
        (
            (F.col("n_urls") >= min_urls)
            & (F.col("url_ratio") > max_ratio)
        ).alias("trap"),
    )
