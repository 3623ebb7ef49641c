"""Web-snapshot corpus operators: URL-keyed snapshot dedup + domain stats.

A Common-Crawl-style corpus (BASELINE.json input_hint: ``url, warc_ts,
html, text, lang``) carries MANY crawl snapshots of the same page; the
first ingestion step of every index build / training pipeline over it is
"one row per URL" (else the index double-counts df/tf and the training
set over-weights recrawled pages). These are that step's operators,
expressed as native DataFrame plans:

- :func:`latest_snapshot_per_url` — keep each URL's newest snapshot.
  ONE linear shuffle on url; per-group size = that page's recrawl count
  (bounded by crawl frequency, never corpus-sized), so no skew at
  10^12 rows. The window carries a rank-1 limit, which Spark executes
  as WindowGroupLimit BELOW the sort — no full per-URL sort
  materializes.
- :func:`domain_stats` — per-host page/URL counts and mean document
  size: the aggregation that feeds domain-level quality/spam decisions
  (C4/Gopher-style domain filtering). Map-side combinable except the
  exact distinct-URL count; at 10^12 rows swap
  ``F.count_distinct`` for ``F.approx_count_distinct`` (documented
  knob) — the driver oracle needs the exact form.

The reference engine has no multi-snapshot notion (its S2 corpus keys
papers by unique id — S2JsonEntryReader.java:64-65 reads ``id`` once);
these operators are part of the web-corpus extension family, like
pipeline_ops.dedup / textstats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HOST_RE = r"^https?://([^/]+)"


def latest_snapshot_per_url(
    pages: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per URL: the snapshot with the greatest ``ts_col``
    (deterministic tiebreak: greatest ``id_col``). Keeps all input
    columns."""
    w = Window.partitionBy(url_col).orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    return (
        pages.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .drop("_r")
    )


def domain_stats(
    pages: DataFrame,
    *,
    url_col: str = "url",
    size_col: str = "n_chars",
    exact_urls: bool = True,
) -> DataFrame:
    """(host, n_pages, n_urls, avg_chars) per registrable host.

    ``exact_urls=False`` switches the distinct-URL count to HLL
    (``approx_count_distinct``) — the 10^12-row form; exact is the
    oracle-checkable default."""
    n_urls = (
        F.count_distinct(F.col("_u"))
        if exact_urls
        else F.approx_count_distinct(F.col("_u"))
    )
    return (
        pages.select(
            F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
            F.col(url_col).alias("_u"),
            F.col(size_col).alias("_s"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            n_urls.alias("n_urls"),
            F.round(F.avg("_s"), 6).alias("avg_chars"),
        )
    )


def warc_ts_expr(id_col: str = "doc_id"):
    """THE warc_ts fixture formula — single Spark-side source (the DuckDB
    twin's single source is oracle_sql_ops._WARC_TS_SQL): non-monotonic
    in doc_id, collides above 1000 docs to exercise the id tiebreak."""
    return (
        F.lit(1546300800) + ((F.col(id_col) * 37) % 1000) * 3600
    ).cast("long")


def snapshot_view(docs: DataFrame, *, with_text: bool = False) -> DataFrame:
    """Deterministic (url, warc_ts) web-snapshot view of the driver's
    ``documents`` table — the test fixture mapping (documented in the
    DuckDB twin, oracle_sql_ops._PAGES_CTE, which replicates it
    bit-for-bit):

      url     = https://<source>.example.org/p/<doc_id % 7>
                (several doc_ids per source share a URL = recrawls)
      warc_ts = warc_ts_expr (see above)

    ``with_text=True`` keeps the text column — consumers that need it
    (snapshot_diff) get it from the SAME scan instead of re-joining.
    """
    cols = ["doc_id", "n_chars"] + (["text"] if with_text else [])
    return docs.select(
        *cols,
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/p/"),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
        warc_ts_expr().alias("warc_ts"),
    )


def messy_url_view(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic raw-crawl URL view of the ``documents`` table (the
    test-fixture mapping, replicated bit-for-bit by the DuckDB twin in
    oracle_sql_ops.sql_url_canon): scheme case, www prefix, default
    ports, trailing slashes, utm_* params, and fragments all vary with
    doc_id so every canonicalization rule fires at every scale factor."""
    d = F.col(id_col)
    scheme = F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.when(
        d % 3 == 0,
        F.concat(F.lit("WWW.src"), (d % 5).cast("string"),
                 F.lit(".Example.ORG")),
    ).otherwise(
        F.concat(F.lit("src"), (d % 5).cast("string"),
                 F.lit(".example.org"))
    )
    port = F.when(
        d % 4 == 0,
        F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/P"), (d % 7).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.when(
        d % 3 == 0,
        F.concat(F.lit("?utm_source=feed&id="), d.cast("string"),
                 F.lit("&utm_campaign=c"), (d % 2).cast("string")),
    ).when(
        d % 3 == 1,
        F.concat(F.lit("?id="), d.cast("string")),
    ).otherwise(F.lit(""))
    frag = F.when(
        d % 5 == 0, F.concat(F.lit("#sec"), (d % 3).cast("string"))
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, query, frag)
        .alias("url"),
    )


def url_canon(
    pages: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, url, canon_url) — URL canonicalization, the first web-
    ingestion rule set (a crawl stores the same page under
    http/https × www × :80 × utm-tagged × fragment variants; URL-keyed
    dedup — latest_snapshot_per_url — is only sound AFTER this collapse).

    Rules, in order: drop the #fragment; lowercase scheme and host; strip
    the scheme's default port and a leading www.; strip utm_* query
    params (anchored to a [?&] separator, so 'utm_' inside a path
    segment or a non-utm parameter name is never touched; if the query
    LED with a utm param, the first surviving '&' is promoted back to
    '?'); strip the trailing path slash immediately before the FIRST '?'
    (anchored — a '/?' inside a query value is data, not path); strip a
    trailing slash. Patterns stay in the Java-regex ∩ RE2 subset (no
    lookahead); anchored single-match rules make Spark's always-global
    regexp_replace and the oracle's flagged forms behave identically.
    Known limit (documented, not hidden): a raw unencoded '&' in a PATH
    whose query was entirely utm params would be promoted to '?' —
    RFC 3986 requires such a '&' to be percent-encoded.
    """
    u = F.regexp_replace(F.col(url_col), "#.*", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    rest = F.regexp_replace(u, "^[^:/?#]+://[^/?#]*", "")
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"^www\.", "")
    led_with_utm = rest.rlike(r"[?]utm_")
    stripped = F.regexp_replace(rest, "[?&]utm_[^&]*", "")
    rest = F.when(
        led_with_utm
        & stripped.contains("&")
        & ~stripped.contains("?"),
        F.regexp_replace(stripped, "^([^&]*)&", "$1?"),
    ).otherwise(stripped)
    rest = F.regexp_replace(rest, r"^([^?]*)/\?", "$1?")
    rest = F.regexp_replace(rest, "/$", "")
    return pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        F.concat(scheme, F.lit("://"), host, rest).alias("canon_url"),
    )


def snapshot_diff(
    pages: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(url, cur_doc_id, prev_doc_id, status) — per-URL diff of the two
    latest snapshots: 'new' (first crawl of the URL), 'changed'
    (md5(text) differs), 'unchanged'. The incremental-crawl primitive:
    only 'changed'/'new' pages need re-extraction, re-embedding, and a
    merge_serving_delta segment — at 10^12 pages that is the difference
    between reprocessing a crawl and reprocessing a corpus.

    Plan: ONE url-keyed shuffle. The rank<=2 filter executes as
    WindowGroupLimit (each map task pre-selects two candidates per URL —
    a hot URL's recrawl history never sorts in one task), and the
    two-row pivot groupBy reuses the SAME url partitioning, so no second
    exchange. Text comparison is by md5 so only 32-byte digests survive
    the window, not page bodies.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(F.desc("_ts"), F.desc("_id"))
    ranked = (
        pages.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 2)
    )
    pivoted = ranked.groupBy("url").agg(
        F.max(F.when(F.col("_rn") == 1, F.col("_id"))).alias("cur_doc_id"),
        F.max(F.when(F.col("_rn") == 2, F.col("_id"))).alias("prev_doc_id"),
        F.max(F.when(F.col("_rn") == 1, F.col("_h"))).alias("_ch"),
        F.max(F.when(F.col("_rn") == 2, F.col("_h"))).alias("_ph"),
    )
    return pivoted.select(
        "url",
        "cur_doc_id",
        "prev_doc_id",
        F.when(F.col("_ph").isNull(), F.lit("new"))
        .when(F.col("_ch") != F.col("_ph"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def domain_quality(
    pages: DataFrame,
    quality: DataFrame,
    langs: DataFrame,
    *,
    min_quality: float = 0.5,
    min_en_frac: float = 0.5,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(host, n_pages, mean_quality, en_frac, keep) — host-level quality
    rollup, the domain-filter stage of C4/Gopher pipelines (a spam farm
    is cheaper to drop as a HOST than page by page; MassiveWeb filters
    whole domains before any per-document gate).

    Inputs are the per-doc signal frames the standalone queries already
    produce (quality_score, lang_id) — the rollup is one combinable
    groupBy on host after two doc_id joins; host-key skew (a single
    giant host) lands on map-side partial aggregation of four longs/
    doubles. ``keep`` = mean quality AND English fraction above their
    floors; the thresholds are explicit parameters, not magic.
    """
    hosted = pages.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
    )
    joined = (
        hosted.join(quality.select("doc_id", "quality"), "doc_id")
        .join(langs.select("doc_id", "pred_lang"), "doc_id")
    )
    agg = joined.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(
            F.avg((F.col("pred_lang") == "en").cast("double")), 6
        ).alias("en_frac"),
    )
    return agg.select(
        "host", "n_pages", "mean_quality", "en_frac",
        (
            (F.col("mean_quality") >= min_quality)
            & (F.col("en_frac") >= min_en_frac)
        ).alias("keep"),
    )


def trending_terms(
    doc_terms: DataFrame,
    split_ts: int,
    *,
    ts_col: str = "warc_ts",
    term_col: str = "term",
    min_df: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """(term, df_early, df_late, ratio, rank) — terms whose document
    frequency surged between two crawl windows: the trending-topics
    signal of a continuously recrawled corpus (and, for a training-data
    pipeline, the drift detector that says WHEN a model's corpus went
    stale). ``doc_terms`` is one row per (doc, term) — e.g. the index's
    per-doc counts — carrying the doc's crawl timestamp; rows before
    ``split_ts`` are the early window.

    ratio = (df_late + 1) / (df_early + 1), Laplace-smoothed so terms
    absent from one window rank sensibly, rounded to 6dp so ranking is
    engine-independent; ``min_df`` floors total df (hapax noise domi-
    nates any unfloored surge list). Deterministic ties: (ratio desc,
    term asc).

    Plan: ONE term-keyed combinable groupBy (the window flag is a
    row-local comparison, both dfs are conditional counts — partial
    aggregation absorbs term skew), then a global top-n that executes as
    TakeOrderedAndProject (per-partition top-n, never a full sort of the
    vocabulary — check the plan for 'TakeOrderedAndProject'); rank is
    stamped on the ≤ top_n collected survivors.
    """
    agg = (
        doc_terms.groupBy(F.col(term_col).alias("term"))
        .agg(
            F.count(F.when(F.col(ts_col) < split_ts, 1))
            .cast("long").alias("df_early"),
            F.count(F.when(F.col(ts_col) >= split_ts, 1))
            .cast("long").alias("df_late"),
        )
        .where(F.col("df_early") + F.col("df_late") >= min_df)
        .select(
            "term", "df_early", "df_late",
            # floor(x·10⁶ + 0.5)/10⁶, not round(): both engines then do
            # the same IEEE ops (DuckDB's round is half-even, Spark's
            # HALF_UP — they differ exactly on the x.xxxxxx5 values a
            # (df+1)/(df+1) rational with a 2-power denominator can hit)
            (
                F.floor(
                    (F.col("df_late") + F.lit(1.0))
                    / (F.col("df_early") + F.lit(1.0))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("ratio"),
        )
        .orderBy(F.desc("ratio"), F.asc("term"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("ratio"), F.asc("term"))
    return agg.withColumn("rank", F.row_number().over(w).cast("long"))


def snapshot_retention(
    pages: DataFrame,
    *,
    keep_last: int = 2,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """(url, doc_id, warc_ts, keep, reason) — snapshot expiry marking,
    the ILM/snapshot-retention policy for a recrawl corpus: per URL keep
    the ``keep_last`` newest snapshots (reason ``recent``) plus the
    FIRST snapshot of each UTC day (reason ``daily`` — the downsampled
    history that keeps change_rates estimable after expiry); everything
    else is ``expired``. ``recent`` wins when both apply, so reasons
    partition the kept set.

    Plan: both ranks are url-keyed (and url+day-keyed) windows over the
    same shuffle — no global sort, no corpus text read (retention needs
    only the (url, ts, id) spine). Deleting the ``expired`` rows is the
    caller's storage-side action; this op is the pure decision, like
    plan_compaction."""
    w_recent = Window.partitionBy("url").orderBy(
        F.desc("_ts"), F.desc("doc_id")
    )
    day = (F.col("_ts") / F.lit(86400)).cast("long")
    w_daily = Window.partitionBy("url", "_day").orderBy(
        F.asc("_ts"), F.asc("doc_id")
    )
    staged = (
        pages.select(
            F.col(url_col).alias("url"),
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).cast("long").alias("_ts"),
        )
        .withColumn("_day", day)
        .withColumn("_rr", F.row_number().over(w_recent))
        .withColumn("_rd", F.row_number().over(w_daily))
    )
    return staged.select(
        "url", "doc_id",
        F.col("_ts").alias("warc_ts"),
        ((F.col("_rr") <= keep_last) | (F.col("_rd") == 1)).alias("keep"),
        F.when(F.col("_rr") <= keep_last, F.lit("recent"))
        .when(F.col("_rd") == 1, F.lit("daily"))
        .otherwise(F.lit("expired")).alias("reason"),
    )
