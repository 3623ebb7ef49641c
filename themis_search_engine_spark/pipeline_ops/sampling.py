"""Deterministic corpus splitting, sampling, and eval decontamination.

Training-data plumbing the 100 TB pipeline needs around the cleaning ops:

* :func:`hash_split` — train/val/test assignment that is a pure function
  of the doc id: stable across runs, machines, and engine versions (no
  RNG, no seed bookkeeping — re-running the pipeline never migrates a
  doc between splits, the property sampleBy()/rand() cannot give).
* :func:`stratified_sample` — per-stratum rates with the same
  deterministic hash, so a 10% 'en' sample is the SAME 10% every run.
* :func:`decontaminate` — drop training docs sharing >= ``min_overlap``
  word n-grams with any eval-set doc (the benchmark-leakage guard).
* :func:`decontaminate_bloom` — the guard's broadcast-bounded scale
  path: the eval shingle set compressed to an m-bit Bloom filter
  (m/8 bytes flat), false positives only ever OVER-drop.

Hash math: the first 8 hex chars of md5 of the key, as a long in
[0, 2^32) — the same seeded-md5 trick the MinHash ops use, so DuckDB
replicates it bit-for-bit (no approximation in the oracle).

Scale: split/sample are stateless Column expressions (codegen, no
shuffle, no join). Decontamination is shingle-join shaped like the
Jaccard dedup verify: the eval side is tiny (benchmarks are thousands of
docs, broadcast), the training side streams through one shingle explode
— never an all-pairs comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value in [0, 2^32) derived from md5(key with salt) — matches the DuckDB
# expression ('0x' || substr(md5(...), 1, 8))::BIGINT
def _hash_bucket(key, salt: str):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


_HSPACE = float(1 << 32)


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Input rows + a ``split`` column assigned by deterministic hash.

    ``weights``: split name → fraction (must sum to ~1; validated).
    Assignment thresholds are cumulative fractions of the 2^32 hash
    space, so expected split sizes match the weights and every doc's
    split is a pure function of (salt, doc_id).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _hash_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(int(acc * _HSPACE))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sample: keep a doc iff its hash falls
    under its stratum's rate threshold. Unlisted strata get
    ``default_rate``. Same doc set every run (no RNG)."""
    h = _hash_bucket(F.col(id_col), salt)
    rate = None
    for v, r in rates.items():
        cond = F.col(stratum_col) == v
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = (
        F.lit(float(default_rate))
        if rate is None
        else rate.otherwise(float(default_rate))
    )
    # floor (not cast) the threshold: DuckDB's double→BIGINT cast rounds
    # while Spark's truncates — floor() agrees bit-for-bit on both sides
    return docs.where(h < F.floor(rate * F.lit(_HSPACE)))


def priority_sample(
    docs: DataFrame,
    k: int,
    *,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "priority",
    salts: int = 8,
) -> DataFrame:
    """(doc_id, weight, priority, rank, w_hat) — deterministic weighted
    sampling without replacement (priority sampling, Duffield–Lund–
    Thorup, JACM'07): each row gets priority q = w / u with u a
    uniform(0,1] pure function of (salt, id); the k highest-priority
    rows are the sample, and ``w_hat = max(w, tau)`` with tau the
    (k+1)-th priority is the Horvitz–Thompson weight making
    sum(w_hat · f) unbiased for any subset sum — the standard way to
    take a SMALL weighted sample of a 100 TB corpus (sample long docs
    proportionally to length) that downstream stats can still
    extrapolate from.

    No RNG: u = (hash32 + 1)/2^32 from the same seeded-md5 the split
    ops use, so the sample is identical across runs and engines, and
    the DuckDB twin (oracle_sql_ops.sql_priority_sample) hash-matches
    bit-for-bit. Priorities are quantized to the repo's cross-engine
    grain floor(x·10⁶+0.5)/10⁶ BEFORE ranking (ranking on raw doubles
    would let 1-ulp division dust flip a rank between engines).

    Scale shape: the priority is a stateless codegen Column; global
    top-(k+1) is the salted two-phase window (no single task ever sorts
    the full corpus — phase 1 caps each of ``salts`` hash slices at
    k+1, phase 2 ranks the ≤ salts·(k+1) survivors); tau is a 1-row
    aggregate broadcast back, never a driver collect.
    """
    if k < 1:
        raise ValueError("priority_sample needs k >= 1")
    h = _hash_bucket(F.col(id_col), salt)
    u = (h + F.lit(1)).cast("double") / F.lit(_HSPACE)
    w = F.col(weight_col).cast("double")
    pr = docs.select(
        F.col(id_col).alias("doc_id"),
        w.alias("weight"),
        (F.floor(w / u * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("priority"),
        (h % salts).alias("_salt"),
    )
    from pyspark.sql.window import Window

    w1 = Window.partitionBy("_salt").orderBy(
        F.desc("priority"), F.asc("doc_id")
    )
    phase1 = (
        pr.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k + 1)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy().orderBy(F.desc("priority"), F.asc("doc_id"))
    ranked = (
        phase1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k + 1)
    )
    tau = ranked.agg(
        F.max(F.when(F.col("rank") == k + 1, F.col("priority")))
        .alias("_tau")
    )
    return (
        ranked.where(F.col("rank") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id", "weight", "priority", "rank",
            F.when(F.col("_tau").isNull(), F.col("weight"))
            .otherwise(F.greatest(F.col("weight"), F.col("_tau")))
            .alias("w_hat"),
        )
    )


def cluster_sample(
    clusters: DataFrame,
    *,
    salt: str = "cdup",
) -> DataFrame:
    """Soft dedup: keep each doc with probability 1/|its near-dup
    cluster| — (doc_id, cluster_id, cluster_size) for survivors.

    Hard dedup (corpus_clean's one-canonical-per-cluster) always keeps
    the SAME representative; soft dedup keeps one *in expectation* but a
    uniformly hashed one, preserving intra-cluster diversity (boilerplate
    wrappers differ, quotes differ) while still flattening the duplicate
    mass — the SlimPajama/RefinedWeb-style "downweight, don't delete"
    lever. Singletons are always kept (rate 1/1).

    Determinism + exactness: keep iff ``h * size < 2^32`` where h is the
    seeded-md5 bucket in [0, 2^32) — INTEGER math only, so the DuckDB
    twin is bit-identical with no float-threshold drift (h < 2^32 and
    size <= |corpus| keep the product far below 2^63).

    Scale: one groupBy(cluster_id) for sizes and one join back on the
    same key — the second shuffle reuses the first's partitioning. The
    keep test is codegen'd per-row arithmetic.
    """
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    h = _hash_bucket(F.col("doc_id"), salt)
    return (
        clusters.join(sizes, "cluster_id")
        .where(h * F.col("cluster_size") < F.lit(1 << 32))
        .select("doc_id", "cluster_id", "cluster_size")
    )


def domain_mix(
    docs: DataFrame,
    target: dict[str, float],
    n_target: int,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic domain reweighting: sample each source toward a
    target mixture (the pretraining-mix op — Pile/DoReMi-style weights).

    ``target``: source → desired share of the ``n_target``-doc output.
    Per-source keep rates are DERIVED FROM THE DATA inside the plan —
    rate_s = min(1, w_s·n_target / cnt_s) — via one tiny per-source
    count aggregate broadcast back onto the corpus; no collect, no RNG
    (same md5-threshold keep rule as :func:`stratified_sample`, so the
    sample is stable across runs and engines). Sources absent from
    ``target`` get ``default_weight``.

    Downsampling only: a source too small for its target share is kept
    whole (rate capped at 1) rather than upsampled — epoch repetition is
    a training-loader concern, not a corpus op. Expected output size is
    Σ min(w_s·n_target, cnt_s)."""
    w = None
    for v, tw in target.items():
        cond = F.col(source_col) == v
        w = F.when(cond, float(tw)) if w is None else w.when(cond, float(tw))
    w = (
        F.lit(float(default_weight))
        if w is None
        else w.otherwise(float(default_weight))
    )
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_cnt"))
    rate = F.least(
        F.lit(1.0), w * F.lit(float(n_target)) / F.col("_cnt")
    )
    h = _hash_bucket(F.col(id_col), salt)
    return (
        docs.join(F.broadcast(counts), source_col)
        # floor, not cast: DuckDB's double→BIGINT cast rounds, Spark's
        # truncates — floor() agrees bit-for-bit (see stratified_sample)
        .where(h < F.floor(rate * F.lit(_HSPACE)))
        .drop("_cnt")
    )


def _shingles(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(_id, shingle) — the dedup ops' shingle construction (P2
    normalization, stopwords kept, distinct n-grams), reused from
    dedup.shingles so the two can never drift."""
    from .dedup import shingles

    return shingles(docs, n, text_col=text_col, id_col=id_col).select(
        F.col("doc_id").alias("_id"), "shingle"
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training docs minus benchmark leakage: drop any doc sharing at
    least ``min_overlap`` distinct word ``n``-grams with ANY eval doc.

    The eval shingle set is broadcast (benchmarks are tiny next to the
    corpus); the training side is one shingle explode + a groupBy on
    doc_id — linear, never pairwise. Returns surviving rows of ``docs``
    unchanged.
    """
    ev = F.broadcast(
        _shingles(eval_docs, n, id_col, text_col).select("shingle").distinct()
    )
    tr = _shingles(docs, n, id_col, text_col)
    contaminated = (
        tr.join(ev, "shingle")
        .groupBy("_id")
        .agg(F.count("*").alias("_hits"))
        .where(F.col("_hits") >= min_overlap)
        .select(F.col("_id").alias(id_col))
    )
    return docs.join(contaminated, id_col, "left_anti")


def ngram_occurrences(
    docs: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(_id, gram) — word n-grams WITH multiplicity (bag semantics, one
    row per occurrence), unlike dedup.shingles' set semantics: language-
    model features count repetitions. Stopwords kept (distributional
    features want them). Docs with < n tokens emit nothing."""
    from .dedup import _tok_array

    staged = docs.select(
        F.col(id_col).alias("_id"), _tok_array(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select("_id", F.explode(grams).alias("gram"))


def dsir_logweights(
    docs: DataFrame,
    target_docs: DataFrame,
    *,
    m_buckets: int = 4096,
    alpha: float = 1.0,
    ngrams: tuple[int, ...] = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """(doc_id, logw) — DSIR importance weights (Xie et al., "Data
    Selection for Language Models via Importance Resampling", NeurIPS
    2023, public): score every raw doc by how much more likely its
    hashed n-gram features are under the TARGET distribution than under
    the RAW distribution,

        logw(x) = Σ_{g ∈ x} [ ln p_T(b(g)) − ln p_R(b(g)) ]

    with b() the seeded-md5 bucket hash into ``m_buckets`` and p the
    Laplace-smoothed (add-``alpha``) bucket unigram model of each
    corpus. Selection = keep the highest-logw docs (or Gumbel-resample
    at the training loader) — the standard cheap way to steer a 100 TB
    crawl toward a small high-quality target domain.

    Deterministic end-to-end (hash buckets, integer counts, smoothing
    arithmetic), so the DuckDB twin value-matches at the 6-dp grain.

    Plan: feature extraction is one n-gram explode per grain (bag
    semantics, codegen transform — no UDF); the two bucket models are
    global combinable groupBys of at most ``m_buckets`` rows each,
    broadcast back as one (bucket, llr) map; per-doc scoring is the
    explode re-joined to that broadcast and one combinable sum — linear
    in corpus tokens, no shuffle keyed wider than (doc, bucket)."""
    spark = docs.sparkSession

    def _grams(d: DataFrame) -> DataFrame:
        legs = [
            ngram_occurrences(d, n, id_col=id_col, text_col=text_col)
            for n in ngrams
        ]
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        return out

    bucket = _hash_bucket(F.col("gram"), salt) % m_buckets

    def _model(grams: DataFrame, name: str) -> DataFrame:
        """(bucket, name) DENSE over all m buckets — zero-count buckets
        keep their smoothed ln(alpha / (total + alpha·m)) mass."""
        cnt = (
            grams.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        dense = (
            spark.range(m_buckets)
            .select(F.col("id").alias("bucket"))
            .join(cnt, "bucket", "left")
            .select("bucket", F.coalesce(F.col("_c"), F.lit(0)).alias("_c"))
        )
        tot = dense.agg(F.sum("_c").alias("_t"))
        return dense.crossJoin(F.broadcast(tot)).select(
            "bucket",
            F.log(
                (F.col("_c") + F.lit(alpha))
                / (F.col("_t") + F.lit(alpha * m_buckets))
            ).alias(name),
        )

    raw_grams = _grams(docs)
    llr = F.broadcast(
        _model(_grams(target_docs), "_lt")
        .join(_model(raw_grams, "_lr"), "bucket")
        .select("bucket", (F.col("_lt") - F.col("_lr")).alias("_llr"))
    )
    return (
        raw_grams.select("_id", bucket.alias("bucket"))
        .join(llr, "bucket")
        .groupBy("_id")
        .agg(F.round(F.sum("_llr"), 6).alias("logw"))
        .select(F.col("_id").alias(id_col), "logw")
    )


def _bloom_pos(value, j, m_bits: int, salt: str):
    """Hash position j of ``value`` in [0, m_bits): the repo's seeded-md5
    32-bit hash mod m_bits (m_bits a power of two, so the mod is an
    unbiased bit mask of an already-uniform hash)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + "|"),
                        j.cast("string"),
                        F.lit("|"),
                        value.cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % m_bits
    )


def bloom_bits(
    members: DataFrame,
    col: str = "shingle",
    *,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """(word_idx, word) — an ``m_bits``-wide Bloom filter over the
    ``col`` values, materialized as 32-bit words in BIGINTs (bit b of
    word w covers filter position 32·w + b; 32-bit words keep every
    shift in cross-engine-safe range). Deterministic: positions are
    seeded-md5, the word build is a commutative bit_or aggregate — no
    RNG, no order dependence, so the DuckDB twin is bit-exact.

    Map-side combinable and mergeable (bit_or of two filters over the
    same (m, h, salt) IS the filter of the union), so per-benchmark /
    per-partition filters roll up without re-scanning members.
    """
    if m_bits & (m_bits - 1) or m_bits < 32:
        raise ValueError(f"m_bits must be a power of two >= 32: {m_bits}")
    j = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j")
    pos = (
        members.select(F.col(col).alias("_v"))
        .distinct()
        .select("_v", j)
        .select(_bloom_pos(F.col("_v"), F.col("j"), m_bits, salt).alias("pos"))
    )
    return (
        pos.select(
            F.expr("shiftright(pos, 5)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 32) AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def decontaminate_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 3,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "bloom",
) -> DataFrame:
    """:func:`decontaminate` (min_overlap=1) with the eval shingle set
    compressed into a Bloom filter — the 100 TB shape when the benchmark
    suite itself is large: the broadcast is m_bits/8 bytes FLAT (a 2³⁰-bit
    filter is 128 MB for any number of eval shingles, where the exact
    shingle-set broadcast grows with the suite), at the cost of false
    positives that can only OVER-drop. One-sided by construction: a
    shingle truly shared always has all its bits set, so every doc the
    exact op drops is dropped here too — training data never silently
    keeps leakage; it loses ~(1-e^{-hs/m})^h extra docs.

    Plan: eval side = one shingle explode → h seeded-md5 positions →
    bit_or into m/32 words (tiny, broadcast); training side = one
    shingle explode → h positions → broadcast-join the words →
    all-bits-set check per (doc, shingle) → distinct contaminated ids →
    left_anti. Linear end-to-end, no shuffle keyed wider than the
    training shingle lift.
    """
    ev = _shingles(eval_docs, n, id_col, text_col).select("shingle")
    words = F.broadcast(
        bloom_bits(ev, "shingle", m_bits=m_bits, n_hashes=n_hashes, salt=salt)
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j")
    probe = (
        _shingles(docs, n, id_col, text_col)
        .select("_id", "shingle", j)
        .select(
            "_id",
            "shingle",
            _bloom_pos(F.col("shingle"), F.col("j"), m_bits, salt).alias("pos"),
        )
        .select(
            "_id",
            "shingle",
            F.expr("shiftright(pos, 5)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 32) AS INT))"
            ).alias("_mask"),
        )
    )
    hit = F.when(
        F.col("word").isNotNull()
        & (F.col("word").bitwiseAND(F.col("_mask")) != 0),
        1,
    ).otherwise(0)
    contaminated = (
        probe.join(words, "word_idx", "left")
        .select("_id", "shingle", hit.alias("_hit"))
        .groupBy("_id", "shingle")
        .agg(F.sum("_hit").alias("_hits"))
        .where(F.col("_hits") == n_hashes)
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    *,
    salt: str = "budget",
    text_col: str = "text",
    id_col: str = "doc_id",
    overshoot: float = 1.10,
) -> DataFrame:
    """(doc_id, n_tokens, cum_tokens): a deterministic document sample
    whose whitespace-token total fills ``budget_tokens`` — the mix-
    building primitive ("give me 50B tokens of this source") every
    training-data pipeline ends with.

    Selection order is the seeded-md5 hash of doc_id (no RNG — a
    uniform, reproducible shuffle), and a doc is kept while the RUNNING
    TOTAL before it is under budget — so the sample overshoots by at
    most one document, and shrinking/growing the budget yields nested
    samples (the same prefix property hash_split gives splits).

    Scale shape: a naive global cumsum sorts the whole corpus. Instead,
    one combinable aggregate estimates the corpus token total, the
    budget fraction (× ``overshoot`` slack) becomes a HASH THRESHOLD,
    and the linear pre-filter keeps ≈ fraction·N docs — only that
    (budget-sized, not corpus-sized) subset is sorted for the exact
    cumsum. If the slack band under-fills (pathological length-vs-hash
    correlation cannot happen with md5, but tiny corpora can be
    unlucky), the exact trim simply yields what the band holds; pass a
    larger ``overshoot`` to widen it.
    """
    from pyspark.sql.window import Window

    toks = F.size(
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
        )
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        _hash_bucket(F.col(id_col), salt).alias("_h"),
    )
    total = base.agg(F.sum("n_tokens")).first()[0] or 0
    if total <= budget_tokens:
        pre = base  # whole corpus fits: no pre-filter, cumsum over all
    else:
        frac = min(1.0, overshoot * budget_tokens / float(total))
        pre = base.where(F.col("_h") < F.lit(int(frac * 2**32)))
    w = (
        Window.orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pre.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(
            (F.col("cum_tokens") - F.col("n_tokens"))
            < F.lit(int(budget_tokens))
        )
        .select("doc_id", "n_tokens", "cum_tokens")
    )
