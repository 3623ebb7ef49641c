"""Distributed cardinality sketches for corpus analytics.

At 100 TB the question "how many distinct shingles / URLs / terms does
each host contribute?" is a routine pre-filter for crawl-quality and
dedup planning (a host whose distinct-shingle count is far below its
page count is boilerplate/spam), but an exact ``count(DISTINCT x)`` per
group is a full shuffle of every (group, value) pair AND an unbounded
per-group state. The classic answer is a bottom-k (KMV — "k minimum
values") sketch [Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07]: keep
the k smallest hashes of the distinct values; if the kth smallest maps
to fraction U of the hash space, the group has ≈ (k-1)/U distinct
values. The estimator is deterministic given the hash — no RNG — so it
is exactly reproducible across engines, which is what lets the DuckDB
twin (oracle_sql_ops.sql_cardinality_kmv) hash-match it bit-for-bit.

Scale shape:

* the (group, value) stream is first reduced to DISTINCT (group, hash)
  — a map-side-combinable aggregate (partial ``distinct`` in the hash
  map of every task before the shuffle), so repeated values never cross
  the network more than once per partition;
* bottom-k is the salted two-phase pattern used by the query engine's
  top-k (queryeng/bm25.py): phase 1 ranks within (group, salt) so no
  single task ever sorts a whole hot group, phase 2 ranks the ≤ salts·k
  survivors per group. Both phases are WindowExec with rank-limit
  pushdown; per-group state is O(k), never O(distinct).
* the estimate itself is arithmetic on the kth hash — no second pass.

Reference parity note: the reference engine has no sketches at all (its
Indexer holds the whole vocabulary in one HashMap — SURVEY.md §2.8);
this module is part of the beyond-reference training-data-pipeline
family, same tier as dedup/ANN (SURVEY.md §8).

Numeric determinism: the hash fraction uses the first 13 hex digits of
md5 (52 bits — exact in an IEEE double on every engine), the division
by 16^13 = 2^52 is exact (power of two), and the final estimate is
quantized floor(x·10⁶ + 0.5)/10⁶ — the repo-wide cross-engine grain
(round() would diverge: Spark HALF_UP vs DuckDB half-even).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 16^13 = 2^52: the largest power-of-16 hash prefix that is still exact
# in a double, so hash→fraction is the same bit pattern on every engine.
_HASH_SPACE = float(16**13)


def quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    k: int = 256,
    *,
    id_col: str = "doc_id",
    salt: str = "qsketch",
    salts: int = 8,
) -> DataFrame:
    """(``group_col``, q, est) — per-group quantile estimates from a
    bottom-k uniform row sample.

    The sample is the k rows whose seeded-md5 hash of ``id_col`` is
    smallest within the group — a deterministic uniform sample without
    replacement that is MERGEABLE (the bottom-k of a union is computable
    from the per-part bottom-ks), which is what lets per-partition /
    per-day sketches roll up without a second corpus pass. The estimate
    is the nearest-rank quantile of the sample: sorted_sample[max(1,
    ceil(q·m))] (1-based), exact when the group has ≤ k rows.

    Same scale shape as :func:`kmv_distinct`: salted two-phase bottom-k
    (O(k) per-group state, no task sorts a hot group); the per-group
    sorted array is ≤ k elements, so the final aggregate is bounded
    regardless of group size. Deterministic across engines: the rank
    index ceil(q·m) is IEEE arithmetic on exact small integers, and the
    sampled values pass through unrounded.
    """
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("qs must be fractions in (0, 1]")
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
        F.md5(
            F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
        ).alias("h"),
    )
    w1 = Window.partitionBy("grp", "_salt").orderBy("h")
    phase1 = (
        hashed.withColumn("_salt", F.crc32(F.col("h")) % salts)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    sample = (
        phase1.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
    )
    agg = sample.groupBy("grp").agg(
        F.array_sort(F.collect_list("v")).alias("vs"),
        F.count("*").alias("m"),
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(float(q),) for q in sorted(set(qs))], "q double"
    )
    idx = F.greatest(
        F.lit(1), F.ceil(F.col("q") * F.col("m")).cast("int")
    )
    return agg.crossJoin(F.broadcast(qdf)).select(
        F.col("grp").alias(group_col),
        "q",
        F.element_at("vs", idx).alias("est"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 128,
    *,
    salts: int = 8,
) -> DataFrame:
    """(``group_col``, sketch_size, est_distinct) — KMV distinct-count
    estimate of ``value_col`` per group.

    ``sketch_size`` is the number of retained hashes (= min(k, exact
    distinct count)); ``est_distinct`` is the exact count when the group
    has fewer than k distinct values (the sketch IS the set), else the
    (k-1)/U bottom-k estimator on the kth smallest hash. md5's hex is
    compared lexicographically — fixed-width hex orders identically to
    the numeric hash, so the rank phases never parse the hash at all;
    only the single kth hash per group is converted to a number.
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    hashes = (
        df.select(
            F.col(group_col).alias("grp"),
            F.md5(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    # salted two-phase bottom-k (the bm25.py top-k shape): phase 1 caps
    # every (grp, salt) slice at k, phase 2 ranks the ≤ salts*k
    # survivors — no task ever sorts a full hot group.
    w1 = Window.partitionBy("grp", "_salt").orderBy("h")
    phase1 = (
        hashes.withColumn("_salt", F.crc32(F.col("h")) % salts)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    sketch = (
        phase1.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
    )
    agg = sketch.groupBy("grp").agg(
        F.count("*").alias("m"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    # fraction of the hash space below the kth hash: 52 exact bits.
    frac = (
        F.conv(F.substring("hk", 1, 13), 16, 10).cast("double")
        / F.lit(_HASH_SPACE)
    )
    est_raw = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    est = F.floor(est_raw * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("m").cast("long").alias("sketch_size"),
        est.alias("est_distinct"),
    )


def cms_counts(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """(j, bucket, c): a Count-Min sketch [Cormode & Muthukrishnan '05]
    of ``value_col``'s (optionally ``weight_col``-weighted) frequencies —
    ``depth`` seeded hash rows × ``width`` buckets, so the whole sketch
    is depth·width rows regardless of input size.

    Why CMS at 100 TB: exact per-value counts of a hot column (terms,
    URLs, user ids) are a vocabulary-sized shuffle; the CMS is a FIXED-
    SIZE, MERGEABLE summary — per-partition sketches add cell-wise, which
    is exactly what a map-side-combinable groupBy(j, bucket) does, so one
    linear pass yields a structure that answers any point query with an
    overestimate bounded by ε·total (ε = e/width) at confidence 1−e^−depth.
    Streaming twin for free: the same groupBy under Structured Streaming
    maintains the sketch incrementally (update mode, depth·width state
    rows).

    Determinism: row j's hash is md5(j || ':' || value) — seeded by
    concatenation, no RNG — with the first 13 hex digits (52 bits, exact
    in a double) taken mod width; the DuckDB twin replays it bit-for-bit.
    """
    v = F.col(value_col).cast("string")
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(v.alias("v"), wt.alias("wt")).withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(depth)]))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("v"))),
                1, 13,
            ),
            16, 10,
        ).cast("long")
        % width
    )
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("j", "bucket")
        .agg(F.sum("wt").alias("c"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    top_n: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """(value, est, rank): the top-n values by CMS-estimated frequency
    (min over the depth rows — never an underestimate), ranked
    (est desc, value asc) for engine-independent determinism.

    The candidate set is the column's distinct values probed against the
    BROADCAST sketch (depth·width rows) — a narrow join, no shuffle of
    the sketch. At stream scale one keeps an explicit candidate list
    (the values seen in the current window) instead of a full distinct;
    the probe path is identical.
    """
    sketch = F.broadcast(
        cms_counts(
            df, value_col, depth=depth, width=width, weight_col=weight_col
        )
    )
    v = F.col(value_col).cast("string")
    cand = df.select(v.alias("v")).distinct().withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(depth)]))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("v"))),
                1, 13,
            ),
            16, 10,
        ).cast("long")
        % width
    )
    est = (
        cand.withColumn("bucket", bucket)
        .join(sketch, ["j", "bucket"])
        .groupBy("v")
        .agg(F.min("c").alias("est"))
    )
    # global top-n via orderBy+limit → TakeOrderedAndProject (per-task
    # n-row heaps + an n-row driver merge); the rank window then runs on
    # ≤ top_n rows — the distinct-value set never sorts in one task.
    top = est.orderBy(F.desc("est"), F.asc("v")).limit(top_n)
    w = Window.orderBy(F.desc("est"), F.asc("v"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            F.col("v").alias("value"),
            F.col("est").cast("long").alias("est"),
            "rank",
        )
    )
