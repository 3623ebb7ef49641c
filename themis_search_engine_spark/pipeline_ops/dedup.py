"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All four are pure Column-expression pipelines (no Python UDFs): shingling
is transform/slice over a split array, MinHash permutations are seeded md5
mins (deterministic, engine-portable — the same construction is expressible
in the DuckDB oracle SQL), SimHash bit votes are 60 codegen'd aggregate
expressions. That keeps every operator inside whole-stage codegen AND makes
each one value-checkable against DuckDB.

Scale notes (100 TB):
- exact_dedup: one hash-keyed shuffle; the md5 groupBy is the canonical
  map-side-combinable aggregation.
- jaccard_pairs: the shingle self-join explodes on frequent shingles —
  correct but quadratic in shingle df; it is the small-scale ORACLE.
  MinHash+LSH is the scale path: candidate generation is a band-keyed
  shuffle (linear), and the exact-Jaccard verify enumerates ONLY candidate
  pairs (the candidate list is joined against per-doc shingle sets before
  any pair is formed — no shingle self-join in the verify plan).
- simhash: hamming-ball dedup with banded candidate generation (4×16-bit
  bands → any pair within hamming distance 3 of 64 bits shares ≥1 band by
  pigeonhole when distance < #bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared: normalized token array + shingles
# ---------------------------------------------------------------------------


def _tok_array(text: Column) -> Column:
    """Normalized token array: P2 normalization (SURVEY.md §2.2), whitespace
    split, empties dropped. Dedup keeps stopwords — boilerplate phrasing is
    signal for near-dup detection, unlike for retrieval."""
    arr = F.split(F.lower(F.regexp_replace(text, "[^a-zA-Z0-9]", " ")), r"\s+")
    return F.filter(arr, lambda t: t != "")


def shingles(
    docs: DataFrame,
    n: int = 2,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams per doc (set semantics,
    as Jaccard requires). transform(sequence(...)) stays in codegen.

    Docs with fewer than n tokens yield no shingles — the size guard
    matters because sequence(1, 0) DESCENDS to [1, 0] and slice(…, 0, …)
    is an error, not an empty array.

    The token array is staged as its own projection before the transform
    consumes it: Spark does no CSE across lambda bodies, so an inlined
    _tok_array would re-tokenize the doc once PER SHINGLE — O(tokens²)
    per row (see repetition_stats for the measured blowup)."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _tok_array(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, content_hash, canonical_id, is_duplicate).

    canonical = min doc_id per md5(text) group. min() is map-side
    combinable, so the shuffle carries one row per (partition, hash) — the
    only scalable shape for 10^12 rows. A window over the hash would work
    too but sorts within groups for no benefit.
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash")
    )
    canon = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_id")
    )
    return hashed.join(canon, "content_hash").select(
        "doc_id",
        "content_hash",
        "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (the oracle path; quadratic on frequent shingles)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    tau: float = 0.8,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with Jaccard(shingle sets) >= tau.

    With ``candidates`` (doc_a, doc_b) the verify is CANDIDATE-BOUNDED: the
    intersection is computed by joining the candidate pair list against the
    per-doc shingle sets (candidates ⋈ shingles(doc_a) on doc_a, then
    ⋈ shingles(doc_b) on (doc_b, shingle)) — work is O(|candidates| ·
    shingles/doc), never the all-pairs shingle self-join. (A left-semi above
    the self-join would NOT bound it: Catalyst can push a semi through the
    aggregate but not *into* a join whose condition spans both legs, so
    every co-shingle pair would still be enumerated — fatal on frequent
    shingles like "of the", since dedup keeps stopwords.)

    Without ``candidates`` it is the all-pairs exact shape (small-scale
    oracle only; quadratic in shingle document frequency).

    Zero-intersection candidate pairs drop out of the inner join — harmless,
    they cannot pass any tau > 0.
    """
    sh = shingles(docs, n, text_col=text_col, id_col=id_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    if candidates is not None:
        cand = candidates.select("doc_a", "doc_b").distinct()
        sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(sa, "doc_a")
            .join(sb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
             ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= tau)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    n: int = 2,
    k: int = 16,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig: array<string>[k]) — k seeded-md5 min-hashes.

    Permutation i is "sort shingles by md5(i || '|' || shingle)"; the min
    hex digest IS the min-hash (lexicographic order on hex == numeric order
    on the 128-bit value). Deterministic across engines and runs — no RNG —
    so the DuckDB oracle reproduces it exactly. k mins compute as k
    map-side-combinable aggregates in ONE groupBy pass.
    """
    sh = shingles(docs, n, text_col=text_col, id_col=id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    return per_doc.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 2,
    k: int = 16,
    bands: int = 8,
    tau: float = 0.8,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs via banded MinHash LSH.

    rows-per-band r = k/bands; candidate iff some band's r signature slots
    all match (band key = md5 of the concatenated slots). With k=16, r=2,
    P[candidate] = 1-(1-j^2)^8: j=0.8 → 99.8%, j=0.9 → 100% (≈); the exact-
    Jaccard verify then removes false positives, so output = true pairs ∩
    LSH recall. Banding is a linear shuffle — the whole point vs all-pairs.
    """
    r = k // bands
    assert bands * r == k, "k must be divisible by bands"
    sigs = minhash_signatures(docs, n, k, text_col=text_col, id_col=id_col)
    band_entries = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(
                        "|", *[F.col("sig")[b * r + j] for j in range(r)]
                    )).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")

    left = band_entries.select("band", "key", F.col("doc_id").alias("doc_a"))
    right = band_entries.select("band", "key", F.col("doc_id").alias("doc_b"))
    cand = (
        left.join(right, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if not verify:
        return cand
    return jaccard_pairs(
        docs, n, tau, text_col=text_col, id_col=id_col, candidates=cand
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIM_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit int exactly


def _term_hash60(term: Column) -> Column:
    """60-bit integer hash of a token: first 15 hex chars of md5. conv()
    base-16 → base-10 string, cast long — portable to the oracle via
    ('0x'||substr(md5(t),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")


def simhash64(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash: long) — 60-bit Charikar SimHash, tf-weighted.

    Bit b of the result is 1 iff Σ_tokens cnt·(±1 by bit b of token hash)
    ≥ 0. The 60 votes are 60 independent aggregate expressions in one
    groupBy — no 60× row explosion, no UDF; whole-stage codegen fuses them.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tok_array(F.col(text_col))).alias("term"),
    )
    counted = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).withColumn("h", _term_hash60(F.col("term")))

    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                   F.col("cnt")).otherwise(-F.col("cnt"))
        ).alias(f"v{b}")
        for b in range(_SIM_BITS)
    ]
    per_doc = counted.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(_SIM_BITS):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    return per_doc.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within a hamming ball, banded LSH.

    Pigeonhole: distance ≤ bands-1 ⇒ some band of the 60-bit hash is
    identical ⇒ banding has perfect recall for max_hamming < bands. The
    band join is the linear-shuffle candidate step; bit_count(xor) verifies.
    """
    assert max_hamming < bands, "recall guarantee needs max_hamming < bands"
    width = _SIM_BITS // bands
    sh = simhash64(docs, text_col=text_col, id_col=id_col)
    mask = (1 << width) - 1
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")

    left = banded.select("band", "key", F.col("doc_id").alias("doc_a"),
                         F.col("simhash").alias("sim_a"))
    right = banded.select("band", "key", F.col("doc_id").alias("doc_b"),
                          F.col("simhash").alias("sim_b"))
    return (
        left.join(right, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# dedup clustering: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) — connected components of the near-dup graph;
    cluster_id = MIN doc_id in the component (singletons map to themselves).

    This is the step that turns pairwise near-dup evidence (from
    :func:`minhash_lsh_pairs` / :func:`simhash_pairs` / exact hashes) into
    dedup GROUPS, so a cleaning pass can keep exactly one canonical doc per
    cluster — pairs alone under-delete on transitive chains (A~B, B~C but
    A!~C must still collapse to one survivor).

    Algorithm: HashMin label propagation with per-round pointer-jumping
    compression. Labels start at identity; each round takes
    ``label'(v) = min(label(v), min over neighbors u of label(u))`` and then
    compresses ``label''(v) = label'(label'(v))``. Labels are monotonically
    non-increasing and always name a node of v's own component, so the
    fixpoint is the component minimum; compression roughly squares the
    distance min-labels travel per round, giving O(log d) rounds for
    diameter d instead of O(d) (the same two-op round as the alternating
    large-star/small-star construction of Kiveris et al., CC-MR).

    Scale: every step is a doc_id-keyed groupBy/join (shuffles are linear in
    |edges| + |nodes|); nothing is broadcast or collected except the per-round
    convergence scalar. The label table is localCheckpoint()ed each round —
    constant-size lineage at any iteration count (the PageRank lesson,
    linkgraph.py:90). Edge tables from LSH dedup are ~O(N) by construction.

    ``nodes`` must contain every id appearing in ``pairs`` (docs absent from
    any pair come out as singletons); the compression self-join relies on it.
    """
    ids = nodes.columns[0]
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()  # materialize once; reused every round

    labels = nodes.select(
        F.col(ids).alias("doc_id"), F.col(ids).alias("cluster_id")
    ).localCheckpoint()

    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        relabeled = (
            labels.join(nbr_min, labels.doc_id == nbr_min.dst, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # pointer jumping: label(label(v)). Valid because every label is a
        # node id with its own (smaller-or-equal) label.
        a, b = relabeled.alias("a"), relabeled.alias("b")
        compressed = (
            a.join(b, F.col("a.cluster_id") == F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("b.cluster_id").alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = compressed
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(diameter > ~2^iterations is not a near-dup graph)"
    )


# ---------------------------------------------------------------------------
# C4-style span dedup: remove repeated token spans corpus-wide, keep first
# ---------------------------------------------------------------------------


def span_dedup(
    docs: DataFrame,
    *,
    span_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, clean_text) — corpus-wide exact span
    deduplication: C4 (Raffel et al. 2020 §2.2) drops any three-sentence
    span that occurs more than once in the corpus, keeping the FIRST
    occurrence. The fixture corpus is single-line token streams, so the
    span unit here is a fixed window of ``span_tokens`` normalized tokens
    (the sentence surrogate); the plan is unit-agnostic.

    Plan shape (explain-audited), built to survive a boilerplate span
    repeated 10^9 times (the cookie-banner key every web corpus has):
      1. spans AND the per-doc span count materialize IN-ROW (transform
         over an index sequence + slice — no shuffle to build them);
      2. the kept spans are exactly the per-span-text winners
         ``min(struct(doc_id, span_idx))`` — ONE map-side-combinable
         groupBy on span text, so the hot key collapses to one row per
         map task BEFORE the exchange. No window, no per-group sort:
         a row_number()==1 flag would sort the hot group in one task;
      3. winners roll up per doc (ONE doc_id shuffle, array_sort over
         (span_idx, text) structs — leading-field order, deterministic)
         and join back to the in-row totals on doc_id (skew-free key).

    Docs whose token array is empty have no spans and drop out (the
    DuckDB twin does the same). At 10^12 docs swap the raw span text for
    its 128-bit hash as the shuffle key (documented knob) — kept raw here
    so the oracle compares human-readable values.
    """
    # stage the token array first: Spark does no CSE across lambda
    # bodies, so an inlined _tok_array would re-tokenize the doc once
    # PER SPAN inside the transform (see repetition_stats' docstring)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _tok_array(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.struct(
                i.cast("long").alias("span_idx"),
                F.concat_ws(
                    " ",
                    F.slice(toks, i * span_tokens + 1, span_tokens),
                ).alias("span_text"),
            ),
        ),
    )
    base = staged.select(
        "doc_id",
        n_spans.cast("long").alias("n_spans"),
        spans.alias("_spans"),
    ).where(F.col("n_spans") > 0)
    ex = base.select(
        "doc_id", F.explode("_spans").alias("s")
    ).select("doc_id", "s.span_idx", "s.span_text")
    winners = ex.groupBy("span_text").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("w")
    )
    kept = winners.select(
        F.col("w.doc_id").alias("doc_id"),
        F.col("w.span_idx").alias("span_idx"),
        "span_text",
    )
    kept_per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("span_idx", "span_text"))
                ),
                lambda s: s["span_text"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select("doc_id", "n_spans")
        .join(kept_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            (F.col("n_spans") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dup_spans"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 2,
    tau: float = 0.9,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, containment) — DIRECTED pairs where
    |shingles(a) ∩ shingles(b)| / |shingles(a)| >= tau: doc_a is
    (near-)contained in doc_b. Broder's containment coefficient — the
    near-dup class Jaccard structurally misses (a tweet quoted inside an
    article has Jaccard ≈ |a|/|b| ≈ 0 but containment 1.0); every
    boilerplate-wrapper and quote-inclusion family in a web corpus is
    this shape.

    Same plan skeleton as :func:`jaccard_pairs` (shared-shingle
    candidate join, per-pair intersection count, broadcast-size join to
    per-doc set sizes), with an asymmetric denominator and BOTH
    directions kept (containment is not symmetric). ``candidates``
    bounds the verify exactly as in jaccard_pairs; without it this is
    the all-pairs small-scale oracle shape. MinHash estimates Jaccard,
    not containment — the scale path pairs this verify with the SAME
    LSH candidates (a containing pair shares bands unless |a| ≪ |b|;
    for the extreme-ratio case use the span_dedup lane instead).
    """
    sh = shingles(docs, n, text_col=text_col, id_col=id_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    if candidates is not None:
        cand = candidates.select("doc_a", "doc_b").distinct()
        sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(sa, "doc_a")
            .join(sb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("doc_a") != F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_sh", "na"),
            "doc_a",
        )
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter") / F.col("na")).alias("containment"),
        )
        .where(F.col("containment") >= tau)
    )


def containment_lsh_pairs(
    docs: DataFrame,
    n: int = 2,
    k: int = 16,
    bands: int = 8,
    tau: float = 0.9,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale path for :func:`containment_pairs`: banded-MinHash candidates
    (one linear band-keyed shuffle, as in minhash_lsh_pairs) verified by
    candidate-bounded exact containment. Candidates are undirected (a<b);
    containment is directed, so each candidate is checked in BOTH
    directions — doubling a candidate list, never enumerating pairs.

    Recall caveat, inherited from MinHash: band collision probability
    tracks JACCARD, so an extreme-ratio containment (tiny a inside huge
    b, jaccard ≈ |a|/|b| → 0) can miss. That class is exactly what
    span_dedup catches span-by-span; this lane is for comparable-size
    wrapper/near-copy containment.
    """
    cand = minhash_lsh_pairs(
        docs, n, k, bands, tau, text_col=text_col, id_col=id_col,
        verify=False,
    )
    both = cand.union(
        cand.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    return containment_pairs(
        docs, n, tau, text_col=text_col, id_col=id_col, candidates=both
    )


def boilerplate_strip(
    docs: DataFrame,
    *,
    span_tokens: int = 4,
    min_docs: int = 5,
    min_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """(doc_id, n_spans, n_boiler_spans, clean_text) — DOMAIN-scoped
    boilerplate removal, the CCNet/trafilatura cleaning step every web
    corpus needs before training: a span (fixed window of ``span_tokens``
    normalized tokens — the line/sentence surrogate, same unit as
    span_dedup) is boilerplate when it occurs in at least
    ``max(min_docs, ceil(min_frac * domain_doc_count))`` DISTINCT
    documents of the SAME domain (cookie banners, nav bars, copyright
    footers repeat across a site, not across the web). Unlike span_dedup
    (corpus-global, first occurrence kept) boilerplate is stripped from
    EVERY document including the first.

    Plan shape (explain-audited, sized for 10^12 docs):
      1. spans materialize in-row (transform over an index sequence —
         no shuffle);
      2. span→domain doc-frequency is countDistinct over (domain, span,
         doc) — Catalyst expands to a two-phase partial agg, map-side
         combinable, so a banner repeated 10^9 times collapses per task
         before the exchange;
      3. the boiler set (spans PASSING the frequency threshold) is tiny
         by construction — only site-template spans survive — so it
         broadcasts and the strip is a broadcast LEFT ANTI join: no
         second shuffle of the corpus on span text;
      4. kept spans roll up per doc (ONE doc_id shuffle, array_sort on
         (span_idx, text) structs) and join the in-row totals.

    Reference parity: the reference has no cleaning stage (it indexes
    S2 abstracts); this is part of the training-data pipeline family
    the build adds on top.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        _tok_array(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.struct(
                i.cast("long").alias("span_idx"),
                F.concat_ws(
                    " ",
                    F.slice(toks, i * span_tokens + 1, span_tokens),
                ).alias("span_text"),
            ),
        ),
    )
    base = staged.select(
        "doc_id",
        "domain",
        n_spans.cast("long").alias("n_spans"),
        spans.alias("_spans"),
    ).where(F.col("n_spans") > 0)
    ex = base.select(
        "doc_id", "domain", F.explode("_spans").alias("s")
    ).select("doc_id", "domain", "s.span_idx", "s.span_text")

    dom_sizes = (
        docs.select(F.col(domain_col).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("dom_docs"))
    )
    span_df = (
        ex.groupBy("domain", "span_text")
        .agg(F.count_distinct("doc_id").cast("long").alias("span_docs"))
    )
    boiler = (
        span_df.join(F.broadcast(dom_sizes), "domain")
        .where(
            F.col("span_docs")
            >= F.greatest(
                F.lit(min_docs),
                F.ceil(F.lit(min_frac) * F.col("dom_docs")).cast("long"),
            )
        )
        .select("domain", "span_text")
    )
    kept = ex.join(
        F.broadcast(boiler), ["domain", "span_text"], "left_anti"
    )
    kept_per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("span_idx", "span_text"))
                ),
                lambda s: s["span_text"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select("doc_id", "n_spans")
        .join(kept_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            (F.col("n_spans") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_boiler_spans"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
