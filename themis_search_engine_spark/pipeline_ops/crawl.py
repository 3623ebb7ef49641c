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
