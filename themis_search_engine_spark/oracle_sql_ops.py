r"""DuckDB oracle-SQL builders for the pipeline_ops operators.

Same contract as oracle_sql.py: each builder returns ANSI SQL over the
driver's pre-registered views (``documents``, ``embeddings``) that must
value-match the Spark query in registry.py (columns sorted by name,
6-decimal rounding on floats). The MinHash/SimHash constructions are
seeded-md5 based precisely so they ARE SQL-expressible — the oracle runs
the identical math, not an approximation of it.

Array-valued results are serialized to strings (``array_to_string``) on
both sides: the driver's value-hash compares scalars.
"""

from __future__ import annotations

from .pipeline_ops.textstats import LANG_MARKERS
from .stopwords import STOPWORDS

_ASCII_STOPS = sorted(w for w in STOPWORDS if w.isascii())
_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in _ASCII_STOPS)

# normalized token array (dedup keeps stopwords — see dedup._tok_array)
TOKS = (
    r"list_filter(regexp_split_to_array("
    r"lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\s+'),"
    r" t -> t <> '')"
)


def _shingle_cte(n: int) -> str:
    """sh(doc_id, shingle): DISTINCT word n-grams. toks[i:i+n-1] is the
    1-based inclusive slice = n tokens starting at i."""
    return f"""tokarr AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    [array_to_string(toks[i:i+{n - 1}], ' ')
     for i in range(1, len(toks) - {n - 2})]) AS shingle
  FROM tokarr WHERE len(toks) >= {n}
)"""


def sql_exact_dedup() -> str:
    return """WITH hashed AS (
  SELECT doc_id, md5(text) AS content_hash FROM documents
), canon AS (
  SELECT content_hash, min(doc_id) AS canonical_id FROM hashed GROUP BY 1
)
SELECT h.doc_id, h.content_hash, c.canonical_id,
       h.doc_id <> c.canonical_id AS is_duplicate
FROM hashed h JOIN canon c USING (content_hash)"""


def sql_jaccard_pairs(n: int = 2, tau: float = 0.8) -> str:
    return f"""WITH {_shingle_cte(n)},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= {tau}"""


def sql_minhash_signatures(n: int = 2, k: int = 16) -> str:
    mins = ",\n         ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(k)
    )
    sig = " || '|' || ".join(f"h{i}" for i in range(k))
    return f"""WITH {_shingle_cte(n)},
sigs AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
)
SELECT doc_id, md5({sig}) AS sig_digest, h0, h{k - 1} FROM sigs"""


def sql_minhash_lsh_pairs(
    n: int = 2, k: int = 16, bands: int = 8, tau: float = 0.8
) -> str:
    """LSH candidates ∩ exact-Jaccard>=tau. The oracle generates candidates
    with the SAME banding, so Spark and DuckDB agree even if LSH recall on
    some corpus were < 1."""
    r = k // bands
    mins = ",\n         ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(k)
    )
    band_rows = ", ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || '|' || ".join(f"h{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    return f"""WITH {_shingle_cte(n)},
sigs AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
bandkeys AS (
  SELECT doc_id, bk.* FROM sigs,
  LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandkeys a JOIN bandkeys b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= {tau}"""


_SIM_BITS = 60


def _simhash_cte() -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS v{b}"
        for b in range(_SIM_BITS)
    )
    val = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN {2 ** b}::BIGINT ELSE 0 END)"
        for b in range(_SIM_BITS)
    )
    return f"""tokarr AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM tokarr
),
counted AS (
  SELECT doc_id, term, count(*)::BIGINT AS cnt,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
  FROM tok GROUP BY doc_id, term
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM counted GROUP BY doc_id
),
simh AS (
  SELECT doc_id, {val} AS simhash FROM votes
)"""


def sql_simhash() -> str:
    return f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM simh"


def sql_simhash_pairs(max_hamming: int = 3, bands: int = 4) -> str:
    width = _SIM_BITS // bands
    mask = (1 << width) - 1
    band_rows = ", ".join(
        f"({b}, (simhash >> {b * width}) & {mask})" for b in range(bands)
    )
    return f"""WITH {_simhash_cte()},
banded AS (
  SELECT doc_id, simhash, bk.* FROM simh,
  LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {max_hamming}"""


# --- text stats -------------------------------------------------------------


def sql_token_stats() -> str:
    return f"""WITH tokarr AS (
  SELECT doc_id, text, {TOKS} AS toks FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars,
       len(list_distinct(toks))::BIGINT AS n_distinct,
       round(CASE WHEN len(toks) > 0
             THEN list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                  * 1.0 / len(toks)
             ELSE 0.0 END, 6) AS mean_token_len,
       len(regexp_extract_all(text,
           '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+'))::BIGINT AS n_subwords
FROM tokarr"""


def sql_lang_id() -> str:
    hits = {
        la: (
            "len(list_filter(toks, t -> t in ("
            + ", ".join(f"'{w}'" for w in words)
            + ")))"
        )
        for la, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"hit_{la}" for la in langs) + ")"
    pred = "'und'"
    for la in reversed(langs):
        pred = f"CASE WHEN hit_{la} = best THEN '{la}' ELSE {pred} END"
    hit_cols = ",\n       ".join(f"{sql} AS hit_{la}" for la, sql in hits.items())
    return f"""WITH tokarr AS (
  SELECT doc_id, text, {TOKS} AS toks FROM documents
),
hits AS (
  SELECT doc_id, text,
       {hit_cols}
  FROM tokarr
),
scored AS (
  SELECT doc_id, text, {best} AS best,
         {pred} AS pred
  FROM hits
)
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            WHEN best = 0 THEN 'und' ELSE pred END AS pred_lang,
       best::BIGINT AS marker_hits
FROM scored"""


def sql_quality_score() -> str:
    return f"""WITH tokarr AS (
  SELECT doc_id, text, {TOKS} AS toks FROM documents
),
feats AS (
  SELECT doc_id,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                   * 1.0 / length(text) ELSE 0.0 END AS alpha_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> t in ({_STOP_LIST_SQL})))
                   * 1.0 / len(toks) ELSE 0.0 END AS stop_ratio,
         least(len(toks), 256) / 256.0 AS len_score
  FROM tokarr
)
SELECT doc_id,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(len_score, 6) AS len_score,
       round(0.4 * alpha_ratio + 0.4 * least(stop_ratio * 4, 1.0)
             + 0.2 * len_score, 6) AS quality
FROM feats"""


def sql_fingerprints(n: int = 3, k: int = 4) -> str:
    return f"""WITH {_shingle_cte(n)},
hashed AS (SELECT doc_id, md5(shingle) AS h FROM sh)
SELECT doc_id, min(h) AS fingerprint,
       array_to_string((list_sort(list(DISTINCT h)))[1:{k}], ',') AS sketch
FROM hashed GROUP BY doc_id"""


def sql_cardinality_kmv(n: int = 3, k: int = 128) -> str:
    """Oracle twin of sketches.kmv_distinct over per-source distinct
    n-gram shingles: bottom-k of md5 (lexicographic ≡ numeric on
    fixed-width hex), estimate (k-1)/U with U = first 13 hex digits of
    the kth hash / 16^13 (52 bits — exact in a double on both engines),
    quantized floor(x·10⁶+0.5)/10⁶."""
    return f"""WITH {_shingle_cte(n)},
hs AS (
  SELECT DISTINCT d.source AS grp, md5(s.shingle) AS h
  FROM sh s JOIN documents d USING (doc_id)
),
rk AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hs
),
ag AS (
  SELECT grp, count(*) AS m,
         max(CASE WHEN rn = {k} THEN h END) AS hk
  FROM rk WHERE rn <= {k} GROUP BY grp
)
SELECT grp AS source, m::BIGINT AS sketch_size,
       CASE WHEN m < {k} THEN m::DOUBLE
            ELSE floor(({k} - 1.0)
                       / (('0x' || substr(hk, 1, 13))::BIGINT
                          / 4503599627370496.0) * 1e6 + 0.5) / 1e6
       END AS est_distinct
FROM ag"""


# --- embeddings -------------------------------------------------------------

# queries = every 50th vector (10 queries at sf0.01); double-precision dot
# products via index comprehension so both engines sum float32-exact values
# as doubles.
_DOT = (
    "list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE "
    "for i in range(1, len(a.embedding) + 1)])"
)
_NORM_A = (
    "sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE "
    "for i in range(1, len(a.embedding) + 1)]))"
)
_NORM_B = (
    "sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE "
    "for i in range(1, len(b.embedding) + 1)]))"
)


def sql_cosine_topk(
    k: int = 5, every_m: int = 50, corpus_filter: str | None = None
) -> str:
    """``corpus_filter`` (SQL over alias ``a`` of embeddings) restricts
    the searched corpus BEFORE scoring — the oracle twin of
    simsearch.filtered_cosine_topk's pre-filter (refill semantics)."""
    cf = f"\n    AND ({corpus_filter})" if corpus_filter else ""
    return f"""WITH scored AS (
  SELECT b.vec_id AS query_id, a.vec_id,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
  FROM embeddings a, embeddings b
  WHERE b.vec_id % {every_m} = 0{cf}
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 6) DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_cosine_pairs(tau: float = 0.4) -> str:
    return f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_DOT} / ({_NORM_A} * {_NORM_B}), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND {_DOT} / ({_NORM_A} * {_NORM_B}) >= {tau}"""


def sql_srp_lsh_pairs(
    tau: float = 0.4, n_planes: int = 16, bands: int = 8, dim: int = 64
) -> str:
    """SRP-LSH candidates ∩ exact cosine >= tau. The oracle reproduces the
    SAME deterministic ±1 hyperplanes (literal sign lists from
    simsearch.srp_signs) and banding, so Spark and DuckDB agree even where
    LSH recall < 1. Both engines sum the dot in index order as doubles, so
    the sign bits match exactly."""
    from .pipeline_ops.simsearch import srp_signs

    r = n_planes // bands
    mask = (1 << r) - 1
    bits = []
    for i in range(n_planes):
        lst = "[" + ", ".join(
            f"{s:.1f}" for s in srp_signs(i, dim)
        ) + "]"
        bits.append(
            f"(CASE WHEN list_sum([embedding[d]::DOUBLE * ({lst})[d] "
            f"for d in range(1, {dim + 1})]) >= 0 "
            f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        )
    sig_expr = "\n         + ".join(bits)
    band_rows = ", ".join(
        f"({b}, (srp >> {b * r}) & {mask})" for b in range(bands)
    )
    return f"""WITH sigs AS (
  SELECT vec_id,
         {sig_expr} AS srp
  FROM embeddings
),
banded AS (
  SELECT vec_id, bk.* FROM sigs,
  LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b,
       round({_DOT} / ({_NORM_A} * {_NORM_B}), 6) AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE {_DOT} / ({_NORM_A} * {_NORM_B}) >= {tau}"""


def sql_knn_join(
    k: int = 3, n_planes: int = 16, bands: int = 8, dim: int = 64
) -> str:
    """Oracle twin of simsearch.knn_join (banded path): the SAME SRP
    signatures and banding as sql_srp_lsh_pairs, candidates opened into
    both orientations, exact cosine, per-vector rounded-rank top-k. cand
    is MATERIALIZED — it is referenced twice (one per orientation) and
    DuckDB would otherwise inline the whole signature subtree into each."""
    from .pipeline_ops.simsearch import srp_signs

    r = n_planes // bands
    mask = (1 << r) - 1
    bits = []
    for i in range(n_planes):
        lst = "[" + ", ".join(
            f"{s:.1f}" for s in srp_signs(i, dim)
        ) + "]"
        bits.append(
            f"(CASE WHEN list_sum([embedding[d]::DOUBLE * ({lst})[d] "
            f"for d in range(1, {dim + 1})]) >= 0 "
            f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        )
    sig_expr = "\n         + ".join(bits)
    band_rows = ", ".join(
        f"({b}, (srp >> {b * r}) & {mask})" for b in range(bands)
    )
    return f"""WITH sigs AS (
  SELECT vec_id,
         {sig_expr} AS srp
  FROM embeddings
),
banded AS (
  SELECT vec_id, bk.* FROM sigs,
  LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
),
dcand AS (
  SELECT vec_a AS vec_id, vec_b AS neighbor_id FROM cand
  UNION ALL
  SELECT vec_b AS vec_id, vec_a AS neighbor_id FROM cand
),
scored AS (
  SELECT c.vec_id, c.neighbor_id,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
  FROM dcand c
  JOIN embeddings a ON a.vec_id = c.vec_id
  JOIN embeddings b ON b.vec_id = c.neighbor_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(cosine, 6) DESC,
                                     neighbor_id ASC) AS rank
  FROM scored
)
SELECT vec_id, neighbor_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def _ivf_ctes(k: int, every_m: int, n_probe: int, centroid_m: int) -> str:
    """IVF search CTE chain ending in ``ranked`` (shared by sql_ivf_topk
    and sql_ann_recall)."""
    return f"""cents AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id % {centroid_m} = 0
),
cell_scored AS (
  SELECT a.vec_id AS _id, b.centroid_id AS cell,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS c
  FROM embeddings a, (SELECT centroid_id AS vec_id, centroid_id,
                             embedding FROM cents) b
),
cells AS (
  SELECT _id, cell FROM (
    SELECT _id, cell,
           row_number() OVER (PARTITION BY _id
                              ORDER BY round(c, 6) DESC, cell ASC) AS r
    FROM cell_scored) WHERE r <= 1
),
qcells AS (
  SELECT _id AS query_id, cell FROM (
    SELECT _id, cell,
           row_number() OVER (PARTITION BY _id
                              ORDER BY round(c, 6) DESC, cell ASC) AS r
    FROM cell_scored WHERE _id % {every_m} = 0) WHERE r <= {n_probe}
),
scored AS (
  SELECT q.query_id, a.vec_id,
         max({_DOT} / ({_NORM_A} * {_NORM_B})) AS cosine
  FROM embeddings a
  JOIN cells ca ON ca._id = a.vec_id
  JOIN qcells q ON q.cell = ca.cell
  JOIN embeddings b ON b.vec_id = q.query_id
  GROUP BY q.query_id, a.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 6) DESC, vec_id ASC) AS rank
  FROM scored
)"""


def sql_ivf_topk(k: int = 5, every_m: int = 50, n_probe: int = 2,
                 centroid_m: int = 25) -> str:
    return f"""WITH {_ivf_ctes(k, every_m, n_probe, centroid_m)}
SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_ann_recall(k: int = 5, every_m: int = 50, n_probe: int = 2,
                   centroid_m: int = 25) -> str:
    """Oracle twin of simsearch.ann_recall over the registered IVF
    config: per-query recall@k of IVF vs the brute-force exact top-k."""
    return f"""WITH {_ivf_ctes(k, every_m, n_probe, centroid_m)},
ivf AS (SELECT query_id, vec_id FROM ranked WHERE rank <= {k}),
brute_scored AS (
  SELECT b.vec_id AS query_id, a.vec_id,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
  FROM embeddings a, embeddings b WHERE b.vec_id % {every_m} = 0
),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cosine, 6) DESC, vec_id ASC) AS rank
    FROM brute_scored) WHERE rank <= {k}
),
hits AS (
  SELECT b.query_id, count(*) AS n_hit
  FROM brute b JOIN ivf i
    ON i.query_id = b.query_id AND i.vec_id = b.vec_id
  GROUP BY b.query_id
)
SELECT q.query_id,
       coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       round(coalesce(h.n_hit, 0) * 1.0 / {k}, 6) AS recall
FROM (SELECT DISTINCT query_id FROM brute) q
LEFT JOIN hits h ON h.query_id = q.query_id"""


def _kmeans_ctes(
    every_m: int, iters: int, grain: int, init_cte: str | None = None
) -> str:
    """Unrolled deterministic Lloyd (simsearch.kmeans_centroids): per
    iteration an exhaustive nearest-centroid assignment (round-6 cosine,
    cell-asc ties), an element-wise mean quantized to the ``grain``
    engine-independence grid via floor(x·10^g + 0.5)/10^g, and a
    keep-previous fallback for cells that lost all members.

    ``init_cte``: optional SQL body for the ``cents0`` seed CTE
    (columns centroid_id, cv) replacing the every_m rule — the oracle
    twin of kmeans_centroids' ``init`` parameter."""
    scale = 10 ** grain
    dot_c = ("list_sum([a.embedding[i]::DOUBLE * c.cv[i] "
             "for i in range(1, len(a.embedding) + 1)])")
    norm_c = ("sqrt(list_sum([c.cv[i] * c.cv[i] "
              "for i in range(1, len(c.cv) + 1)]))")
    if init_cte is not None:
        ctes = [f"cents0 AS (\n{init_cte}\n)"]
    else:
        ctes = [f"""cents0 AS (
  SELECT vec_id AS centroid_id,
         list_transform(embedding, x -> x::DOUBLE) AS cv
  FROM embeddings WHERE vec_id % {every_m} = 0
)"""]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(f"""scored{i} AS (
  SELECT a.vec_id AS _id, c.centroid_id AS cell,
         {dot_c} / ({_NORM_A} * {norm_c}) AS c_cos
  FROM embeddings a, cents{p} c
)""")
        ctes.append(f"""cells{i} AS (
  SELECT _id, cell FROM (
    SELECT _id, cell,
           row_number() OVER (PARTITION BY _id
             ORDER BY round(c_cos, 6) DESC, cell ASC) AS r
    FROM scored{i}) WHERE r = 1
)""")
        ctes.append(f"""means{i} AS (
  SELECT centroid_id, list(mq ORDER BY pos) AS cv FROM (
    SELECT cell AS centroid_id, pos,
           floor(avg(val) * {scale} + 0.5) / {scale} AS mq
    FROM (
      SELECT c.cell, generate_subscripts(a.embedding, 1) AS pos,
             unnest(a.embedding)::DOUBLE AS val
      FROM embeddings a JOIN cells{i} c ON c._id = a.vec_id
    ) GROUP BY cell, pos
  ) GROUP BY centroid_id
)""")
        ctes.append(f"""cents{i} AS (
  SELECT centroid_id, cv FROM means{i}
  UNION ALL
  SELECT centroid_id, cv FROM cents{p}
  WHERE centroid_id NOT IN (SELECT centroid_id FROM means{i})
)""")
    return ",\n".join(ctes)


def sql_kmeans_centroids(every_m: int = 25, iters: int = 2,
                         grain: int = 6) -> str:
    """Trained centroids exploded to scalar rows (centroid_id, pos, val)
    with val on the 10^-grain grid as BIGINT — array-free output the
    value-hash compares exactly."""
    return f"""WITH {_kmeans_ctes(every_m, iters, grain)}
SELECT centroid_id,
       (generate_subscripts(cv, 1) - 1)::BIGINT AS pos,
       floor(unnest(cv) * {10 ** grain} + 0.5)::BIGINT AS val
FROM cents{iters}"""


def sql_doc_tf_vectors(dim: int = 16) -> str:
    """Oracle twin of topical.doc_tf_vectors(weighting='tfidf') in sparse
    form: per (doc, md5-hash bucket) sum of log1p(cnt)·log2(N/df), zero
    buckets dropped at the 6-dp grain on both sides (a bucket whose only
    terms have df == N sums to exactly 0 and is dense-filtered out)."""
    from .oracle_sql import TOK_CTE

    return f"""WITH {TOK_CTE},
wv AS (
  SELECT c.doc_id,
         (('0x' || substr(md5('tfvec|' || c.term), 1, 8))::BIGINT
          % {dim}) AS pos,
         sum(ln(1 + c.cnt)
             * log2((SELECT n_docs FROM gstats)::DOUBLE / d.df)) AS w
  FROM counts c JOIN dict d USING (term)
  GROUP BY 1, 2
)
SELECT doc_id, pos::BIGINT AS pos, round(w, 6) AS w
FROM wv WHERE round(w, 6) <> 0"""


def sql_topical_shards(
    n_shards: int = 4, iters: int = 2, grain: int = 6
) -> str:
    """Oracle twin of topical.vector_shard_map over the embeddings table
    with n_clusters == n_shards (the SQL-expressible pack case: with one
    cluster per shard, greedy least-loaded packing degenerates to
    size-rank order — the i-th largest cluster takes shard i). Seeds are
    the evenly-strided rank rule; Lloyd and the final classification
    mirror the kmeans/classify oracles (round-6 cosine, id-asc ties)."""
    init = f"""  SELECT vec_id AS centroid_id,
         list_transform(embedding, x -> x::DOUBLE) AS cv
  FROM (SELECT vec_id, embedding,
               row_number() OVER (ORDER BY vec_id) - 1 AS rk
        FROM embeddings)
  WHERE rk % (SELECT greatest(1, count(*) // {n_shards})
              FROM embeddings) = 0
    AND rk < (SELECT greatest(1, count(*) // {n_shards})
              FROM embeddings) * {n_shards}"""
    dot_c = ("list_sum([a.embedding[i]::DOUBLE * c.cv[i] "
             "for i in range(1, len(a.embedding) + 1)])")
    norm_c = ("sqrt(list_sum([c.cv[i] * c.cv[i] "
              "for i in range(1, len(c.cv) + 1)]))")
    return f"""WITH {_kmeans_ctes(0, iters, grain, init_cte=init)},
scored_f AS (
  SELECT a.vec_id AS _id, c.centroid_id AS cell,
         {dot_c} / ({_NORM_A} * {norm_c}) AS c_cos
  FROM embeddings a, cents{iters} c
),
cells_f AS (
  SELECT _id, cell FROM (
    SELECT _id, cell,
           row_number() OVER (PARTITION BY _id
             ORDER BY round(c_cos, 6) DESC, cell ASC) AS r
    FROM scored_f) WHERE r = 1
),
sizes AS (SELECT cell, count(*) AS sz FROM cells_f GROUP BY cell),
pack AS (
  SELECT cell,
         (row_number() OVER (ORDER BY sz DESC, cell ASC) - 1)::INT
           AS shard
  FROM sizes
)
SELECT f._id AS vec_id, p.shard
FROM cells_f f JOIN pack p USING (cell)"""


# --- link graph -------------------------------------------------------------

# two-step list→unnest: DuckDB 1.0 fails to bind an unnest-aliased column
# through a subsequent join unless it passes through an intermediate CTE
_EDGES_CTE = """nn AS (SELECT count(*) AS n FROM documents),
cite_lists AS (
  SELECT doc_id AS src,
         [(doc_id * 7 + 1) % n, (doc_id * 13 + 3) % n,
          (doc_id * 31 + 11) % n] AS ds
  FROM documents CROSS JOIN nn
),
cites AS (SELECT src, unnest(ds) AS dst FROM cite_lists),
edges AS (
  SELECT c.src, c.dst, count(*)::BIGINT AS weight
  FROM cites c JOIN documents dd ON dd.doc_id = c.dst
  WHERE c.src <> c.dst
  GROUP BY c.src, c.dst
)"""


def sql_citation_edges() -> str:
    return f"WITH {_EDGES_CTE} SELECT src, dst, weight FROM edges"


def _pagerank_ctes(damping: float = 0.85, iterations: int = 5) -> str:
    """The unrolled-PageRank CTE chain (shared by sql_pagerank and the
    static-rank blend)."""
    base = f"(1.0 - {damping}) / nn.n"
    ctes = [
        "outw AS (SELECT src, sum(weight) AS outw FROM edges GROUP BY src)",
        "trans AS (SELECT src, dst, weight * 1.0 / outw AS p "
        "FROM edges JOIN outw USING (src))",
        "pr0 AS (SELECT doc_id AS node, 1.0 / nn.n AS rank "
        "FROM documents CROSS JOIN nn)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT d.doc_id AS node, {base} + {damping} * coalesce(i.inflow, 0.0) AS rank
  FROM documents d CROSS JOIN nn
  LEFT JOIN (SELECT t.dst, sum(p.rank * t.p) AS inflow
             FROM trans t JOIN pr{i - 1} p ON p.node = t.src
             GROUP BY t.dst) i ON i.dst = d.doc_id)"""
        )
    return ",\n".join(ctes)


def sql_pagerank(damping: float = 0.85, iterations: int = 5) -> str:
    """Unrolled damped weighted PageRank — the same fixed iterations the
    Spark loop runs (linkgraph.pagerank)."""
    return (
        f"WITH {_EDGES_CTE},\n" + _pagerank_ctes(damping, iterations)
        + f"\nSELECT node AS doc_id, round(rank, 9) AS pagerank FROM pr{iterations}"
    )


def sql_trustrank(
    damping: float = 0.85, iterations: int = 5, seed_mod: int = 17
) -> str:
    """Unrolled TrustRank — same fixed iterations as linkgraph.trustrank
    with the registered seed set (doc_id % seed_mod = 0), teleport
    (1-d)·s(v) with s uniform over seeds, trust_0 = s."""
    sv = f"CASE WHEN d.doc_id % {seed_mod} = 0 THEN 1.0 / sn.ns ELSE 0.0 END"
    ctes = [
        f"sn AS (SELECT count(*) AS ns FROM documents WHERE doc_id % {seed_mod} = 0)",
        "outw AS (SELECT src, sum(weight) AS outw FROM edges GROUP BY src)",
        "trans AS (SELECT src, dst, weight * 1.0 / outw AS p "
        "FROM edges JOIN outw USING (src))",
        f"tr0 AS (SELECT d.doc_id AS node, {sv} AS rank "
        "FROM documents d CROSS JOIN sn)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""tr{i} AS (
  SELECT d.doc_id AS node,
         (1.0 - {damping}) * {sv} + {damping} * coalesce(i.inflow, 0.0) AS rank
  FROM documents d CROSS JOIN sn
  LEFT JOIN (SELECT t.dst, sum(p.rank * t.p) AS inflow
             FROM trans t JOIN tr{i - 1} p ON p.node = t.src
             GROUP BY t.dst) i ON i.dst = d.doc_id)"""
        )
    chain = ",\n".join(ctes)
    return (
        f"WITH {_EDGES_CTE},\n{chain}\n"
        f"SELECT node AS doc_id, round(rank, 9) AS trust FROM tr{iterations}"
    )


def sql_bm25_topk_pagerank(
    damping: float = 0.85,
    iterations: int = 5,
    alpha: float = 0.5,
    k: int = 10,
) -> str:
    """Oracle twin of registry_ops.q_bm25_topk_pagerank — the static-rank
    blend (queryeng/staticrank.py): bm25 + alpha·ln(N·pagerank + 1),
    composed from the BM25 scored CTE and the unrolled PageRank chain."""
    from .oracle_sql import B, K1, TOK_CTE, _qterms_values

    return f"""WITH {TOK_CTE},
{_EDGES_CTE},
{_pagerank_ctes(damping, iterations)},
bscored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
blended AS (
  SELECT b.qid, b.doc_id,
         b.score + {alpha} * ln(nn.n * coalesce(p.rank, 0.0) + 1.0) AS score
  FROM bscored b
  LEFT JOIN pr{iterations} p ON p.node = b.doc_id
  CROSS JOIN nn
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM blended
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


# --- multimodal -------------------------------------------------------------


def sql_frame_sample(k: int = 3) -> str:
    """Mirrors frame_sample over attach_fake_blobs: frame j is the 4-byte
    window at offset (j*4) % 13 of the 16-byte md5 blob → 8 hex chars at
    2*off+1 in md5(text)."""
    frames = ", ".join(
        f"({j}, lower(substr(md5(text), {2 * ((j * 4) % 13) + 1}, 8)))"
        for j in range(k)
    )
    return f"""SELECT d.doc_id, f.frame_idx::BIGINT AS frame_idx, f.frame_sig
FROM documents d,
LATERAL (SELECT * FROM (VALUES {frames}) v(frame_idx, frame_sig)) f"""


def sql_media_ann_topk(k: int = 3, every_m: int = 50, dim: int = 8) -> str:
    """Cosine top-k over the deterministic media feature vectors
    (media_feature_vectors): dim i = uint16 at md5 hex [4i+1..4i+4] /
    65536, computed in float32 then summed as double on both engines."""
    feat = ", ".join(
        f"(('0x' || substr(md5(text), {4 * i + 1}, 4))::BIGINT "
        f"/ 65536.0)::FLOAT" for i in range(dim)
    )
    return f"""WITH feats AS (
  SELECT doc_id, [{feat}] AS embedding FROM documents
),
scored AS (
  SELECT b.doc_id AS query_id, a.doc_id AS vec_id,
         list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                   for i in range(1, {dim + 1})])
         / (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                           for i in range(1, {dim + 1})]))
            * sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                             for i in range(1, {dim + 1})]))) AS cosine
  FROM feats a, feats b WHERE b.doc_id % {every_m} = 0
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 6) DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_media_meta() -> str:
    """Mirrors decode_media_meta's fake-codec header parse on md5 hex."""
    return """SELECT doc_id,
       (['png', 'jpeg', 'webp'])[
         ('0x' || substr(md5(text), 1, 2))::INT % 3 + 1] AS media_format,
       (('0x' || substr(md5(text), 3, 2))::BIGINT * 256
        + ('0x' || substr(md5(text), 5, 2))::BIGINT) AS width,
       (('0x' || substr(md5(text), 7, 2))::BIGINT * 256
        + ('0x' || substr(md5(text), 9, 2))::BIGINT) AS height,
       16::BIGINT AS n_bytes
FROM documents"""


def sql_dedup_clusters(
    n: int = 2, k: int = 16, bands: int = 8, tau: float = 0.8
) -> str:
    """Connected components over the MinHash-LSH near-dup pairs: min
    reachable doc_id per node via a recursive CTE (UNION dedups states, so
    the recursion terminates at |component|² states per component — fine at
    oracle scale; the Spark side is the O(log d) HashMin+compression op)."""
    return f"""WITH RECURSIVE pairs AS (
{sql_minhash_lsh_pairs(n, k, bands, tau)}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node"""


def sql_corpus_clean(
    quality_tau: float = 0.5,
    lang: str = "en",
    n: int = 2, k: int = 16, bands: int = 8, tau: float = 0.8,
) -> str:
    """The end-to-end cleaning pass: language filter ∩ quality filter ∩
    one-canonical-doc-per-near-dup-cluster. Composes the lang_id,
    quality_score and dedup_clusters oracles as nested subqueries."""
    return f"""WITH lang AS (
{sql_lang_id()}
),
qual AS (
{sql_quality_score()}
),
clus AS (
{sql_dedup_clusters(n, k, bands, tau)}
)
SELECT d.doc_id, lang.pred_lang, qual.quality
FROM documents d
JOIN lang USING (doc_id)
JOIN qual USING (doc_id)
JOIN clus USING (doc_id)
WHERE lang.pred_lang = '{lang}'
  AND qual.quality >= {quality_tau}
  AND clus.cluster_id = d.doc_id"""


def sql_hybrid_topk(k: int = 10, every_m: int = 50, k_rrf: int = 60) -> str:
    """Hybrid retrieval twin: BM25 top-k (oracle_sql._bm25_scored_cte over
    the documents table, QUERYSET qids) reciprocal-rank-fused with cosine
    top-k over embeddings (query vector for qid q = vec_id 50*q). Both
    sides rank on 6-dp-rounded scores with doc_id tiebreaks, so the fused
    ranking is engine-deterministic."""
    from .oracle_sql import _bm25_scored_cte

    return f"""{_bm25_scored_cte()},
t_ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS trank
  FROM scored
),
t_top AS (SELECT * FROM t_ranked WHERE trank <= {k}),
vq AS (
  SELECT (vec_id / {every_m})::INT AS qid, embedding
  FROM embeddings
  WHERE vec_id % {every_m} = 0 AND vec_id / {every_m} BETWEEN 1 AND 6
),
v_scored AS (
  SELECT b.qid, a.vec_id AS doc_id,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
  FROM embeddings a, vq b
),
v_ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(cosine, 6) DESC, doc_id ASC) AS vrank
  FROM v_scored
),
v_top AS (SELECT * FROM v_ranked WHERE vrank <= {k}),
fused AS (
  SELECT COALESCE(t.qid, v.qid) AS qid,
         COALESCE(t.doc_id, v.doc_id) AS doc_id,
         round(COALESCE(1.0::DOUBLE / ({k_rrf} + t.trank), 0)
               + COALESCE(1.0::DOUBLE / ({k_rrf} + v.vrank), 0), 6) AS rrf
  FROM t_top t FULL JOIN v_top v
    ON t.qid = v.qid AND t.doc_id = v.doc_id
),
franked AS (
  SELECT qid, doc_id, rrf,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT qid, doc_id, rrf, rank::INT AS rank
FROM franked WHERE rank <= {k}"""


def sql_fusion_topk(k: int = 10, every_m: int = 50) -> str:
    """CombMNZ twin of sql_hybrid_topk: both lanes' ROUNDED top-k scores
    min-max normalized per qid (constant lane → 1.0), normalized values
    rounded at 6 dp, summed and multiplied by the lane-match count.
    Identical doubles on both engines → identical fusion."""
    from .oracle_sql import _bm25_scored_cte

    return f"""{_bm25_scored_cte()},
t_ranked AS (
  SELECT qid, doc_id, round(score, 6) AS s,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS trank
  FROM scored
),
t_top AS (SELECT * FROM t_ranked WHERE trank <= {k}),
t_norm AS (
  SELECT qid, doc_id,
         round(CASE WHEN max(s) OVER (PARTITION BY qid)
                         = min(s) OVER (PARTITION BY qid) THEN 1.0
                    ELSE (s - min(s) OVER (PARTITION BY qid))
                         / (max(s) OVER (PARTITION BY qid)
                            - min(s) OVER (PARTITION BY qid)) END,
               6) AS tn
  FROM t_top
),
vq AS (
  SELECT (vec_id / {every_m})::INT AS qid, embedding
  FROM embeddings
  WHERE vec_id % {every_m} = 0 AND vec_id / {every_m} BETWEEN 1 AND 6
),
v_scored AS (
  SELECT b.qid, a.vec_id AS doc_id,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
  FROM embeddings a, vq b
),
v_ranked AS (
  SELECT qid, doc_id, round(cosine, 6) AS s,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(cosine, 6) DESC, doc_id ASC) AS vrank
  FROM v_scored
),
v_top AS (SELECT * FROM v_ranked WHERE vrank <= {k}),
v_norm AS (
  SELECT qid, doc_id,
         round(CASE WHEN max(s) OVER (PARTITION BY qid)
                         = min(s) OVER (PARTITION BY qid) THEN 1.0
                    ELSE (s - min(s) OVER (PARTITION BY qid))
                         / (max(s) OVER (PARTITION BY qid)
                            - min(s) OVER (PARTITION BY qid)) END,
               6) AS vn
  FROM v_top
),
fused AS (
  SELECT COALESCE(t.qid, v.qid) AS qid,
         COALESCE(t.doc_id, v.doc_id) AS doc_id,
         round((COALESCE(t.tn, 0) + COALESCE(v.vn, 0))
               * ((t.tn IS NOT NULL)::INT + (v.vn IS NOT NULL)::INT), 6)
           AS fused
  FROM t_norm t FULL JOIN v_norm v
    ON t.qid = v.qid AND t.doc_id = v.doc_id
),
franked AS (
  SELECT qid, doc_id, fused,
         row_number() OVER (PARTITION BY qid
                            ORDER BY fused DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT qid, doc_id, fused, rank::BIGINT AS rank
FROM franked WHERE rank <= {k}"""


# --- web snapshots (pipeline_ops.websnap) ------------------------------------

# the deterministic (url, warc_ts) fixture view of `documents` — MUST stay
# bit-identical to pipeline_ops.websnap.snapshot_view
# THE warc_ts fixture formula — single DuckDB-side source (Spark-side
# single source: websnap.warc_ts_expr)
_WARC_TS_SQL = "(1546300800 + ((doc_id * 37) % 1000) * 3600)::BIGINT"

_PAGES_CTE = """pages AS (
  SELECT doc_id, n_chars,
         'https://' || source || '.example.org/p/'
           || CAST(doc_id % 7 AS VARCHAR) AS url,
         (1546300800 + ((doc_id * 37) % 1000) * 3600)::BIGINT AS warc_ts
  FROM documents
)"""


def sql_web_latest_snapshot() -> str:
    """Mirrors latest_snapshot_per_url over snapshot_view: newest warc_ts
    per url, doc_id-desc tiebreak."""
    return f"""WITH {_PAGES_CTE},
ranked AS (
  SELECT url, doc_id, warc_ts,
         row_number() OVER (PARTITION BY url
                            ORDER BY warc_ts DESC, doc_id DESC) AS r
  FROM pages
)
SELECT url, doc_id, warc_ts FROM ranked WHERE r = 1"""


def sql_web_domain_stats() -> str:
    """Mirrors domain_stats over snapshot_view (exact distinct-URL form)."""
    return f"""WITH {_PAGES_CTE},
hosted AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, url, n_chars
  FROM pages
)
SELECT host, count(*)::BIGINT AS n_pages,
       count(DISTINCT url)::BIGINT AS n_urls,
       round(avg(n_chars), 6) AS avg_chars
FROM hosted GROUP BY host"""


_SESSION_CTE = """ordered AS (
  SELECT event_id, user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL
                OR floor(epoch(ts))::BIGINT - floor(epoch(prev_ts))::BIGINT
                   > {gap_s}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT event_id, user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)"""


def sql_sessionize(gap_minutes: int = 360) -> str:
    """Oracle twin of sessions.sessionize: gap-based session numbering.
    Timestamps floor to whole epoch seconds on BOTH sides (Spark's
    unix_timestamp truncates; DuckDB's epoch keeps microseconds)."""
    cte = _SESSION_CTE.format(gap_s=gap_minutes * 60)
    return f"""WITH {cte}
SELECT event_id, user_id, session_idx::BIGINT AS session_idx FROM sess"""


def sql_session_stats(gap_minutes: int = 360) -> str:
    cte = _SESSION_CTE.format(gap_s=gap_minutes * 60)
    return f"""WITH {cte}
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_events,
       floor(epoch(min(ts)))::BIGINT AS start_s,
       floor(epoch(max(ts)))::BIGINT AS end_s,
       (floor(epoch(max(ts))) - floor(epoch(min(ts))))::BIGINT AS duration_s,
       round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, session_idx"""


def sql_related_items(
    gap_minutes: int = 360, min_pair: int = 2, top_n: int = 5,
    max_items: int = 20,
) -> str:
    """Oracle twin of sessions.related_items: same sessionization,
    item-asc per-session cap, observed-pairs-only lift with the exact
    floor(x·10⁶+0.5) grain, symmetric emission, per-item rank."""
    gap_s = gap_minutes * 60
    return rf"""WITH ev AS (
  SELECT event_id, user_id, ts,
         CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '')
              AS BIGINT) AS item
  FROM events
),
ordered AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
  FROM ev
),
flagged AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL
                OR floor(epoch(ts))::BIGINT - floor(epoch(prev_ts))::BIGINT
                   > {gap_s}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT user_id, item,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
items AS (
  SELECT DISTINCT user_id, session_idx, item FROM sess
  WHERE item IS NOT NULL
),
capped AS (
  SELECT user_id, session_idx, item FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, session_idx
                                 ORDER BY item) AS rn
    FROM items
  ) WHERE rn <= {max_items}
),
nt AS (
  SELECT count(*)::BIGINT AS n
  FROM (SELECT DISTINCT user_id, session_idx FROM capped)
),
pi AS (SELECT item, count(*)::BIGINT AS n_i FROM capped GROUP BY item),
pr AS (
  SELECT a.item AS ia, b.item AS ib, count(*)::BIGINT AS n_ab
  FROM capped a
  JOIN capped b ON a.user_id = b.user_id
              AND a.session_idx = b.session_idx
              AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {min_pair}
),
lifted AS (
  SELECT ia, ib, n_ab,
         floor(n_ab * 1000000.0 * nt.n / (pa.n_i * pb.n_i) + 0.5)
           / 1000000.0 AS lift
  FROM pr
  CROSS JOIN nt
  JOIN pi pa ON pr.ia = pa.item
  JOIN pi pb ON pr.ib = pb.item
),
sym AS (
  SELECT ia AS item, ib AS related, n_ab, lift FROM lifted
  UNION ALL
  SELECT ib AS item, ia AS related, n_ab, lift FROM lifted
)
SELECT item, related, n_ab, lift, rank FROM (
  SELECT *, (row_number() OVER (PARTITION BY item
                                ORDER BY lift DESC, related ASC))::BIGINT
            AS rank
  FROM sym
) WHERE rank <= {top_n}"""


_HB = "('0x' || substr(md5('{salt}|' || {key}::VARCHAR), 1, 8))::BIGINT"


def sql_hash_split(weights: dict[str, float], salt: str = "split") -> str:
    """Oracle twin of sampling.hash_split: identical md5-bucket math and
    identical integer thresholds (same int(acc * 2^32) truncation)."""
    h = _HB.format(salt=salt, key="doc_id")
    names = list(weights)
    if len(names) == 1:  # degenerate: CASE with zero WHENs is invalid SQL
        return f"SELECT doc_id, '{names[0]}' AS split FROM documents"
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += weights[name]
        cases.append(f"WHEN h < {int(acc * (1 << 32))} THEN '{name}'")
    body = "\n         ".join(cases)
    return f"""WITH hashed AS (
  SELECT doc_id, {h} AS h FROM documents
)
SELECT doc_id,
       CASE {body}
            ELSE '{names[-1]}' END AS split
FROM hashed"""


def sql_length_quantiles(
    qs: list[float], k: int, salt: str = "qsketch"
) -> str:
    """Oracle twin of sketches.quantile_sketch over per-source n_chars:
    bottom-k rows by md5('{salt}|'||doc_id), nearest-rank quantile
    sorted_sample[max(1, ceil(q·m))] (1-based, matching element_at)."""
    vals = ", ".join(f"({float(q)!r}::DOUBLE)" for q in sorted(set(qs)))
    return f"""WITH hashed AS (
  SELECT source AS grp, n_chars::DOUBLE AS v,
         md5('{salt}|' || doc_id::VARCHAR) AS h
  FROM documents
),
rk AS (
  SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed
),
ag AS (
  SELECT grp, list_sort(list(v)) AS vs, count(*) AS m
  FROM rk WHERE rn <= {k} GROUP BY grp
),
qv(q) AS (VALUES {vals})
SELECT grp AS source, q,
       vs[greatest(1, ceil(q * m)::INT)] AS est
FROM ag CROSS JOIN qv"""


def sql_priority_sample(k: int, salt: str = "priority") -> str:
    """Oracle twin of sampling.priority_sample: q = w/u with
    u = (hash32+1)/2^32, priorities quantized floor(x·10⁶+0.5)/10⁶
    BEFORE ranking, tau = (k+1)-th priority, w_hat = max(w, tau) (w
    itself when the corpus has ≤ k rows and tau is undefined)."""
    h = _HB.format(salt=salt, key="doc_id")
    return f"""WITH pr AS (
  SELECT doc_id, n_chars::DOUBLE AS weight,
         floor(n_chars::DOUBLE
               / (({h} + 1) / 4294967296.0) * 1e6 + 0.5) / 1e6 AS priority
  FROM documents
),
ranked AS (
  SELECT doc_id, weight, priority,
         row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS rn
  FROM pr
),
tau AS (
  SELECT max(CASE WHEN rn = {k + 1} THEN priority END) AS tau
  FROM ranked WHERE rn <= {k + 1}
)
SELECT r.doc_id, r.weight, r.priority, r.rn::BIGINT AS rank,
       CASE WHEN t.tau IS NULL THEN r.weight
            ELSE greatest(r.weight, t.tau) END AS w_hat
FROM ranked r CROSS JOIN tau t
WHERE r.rn <= {k}"""


def sql_stratified_sample(
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    salt: str = "sample",
) -> str:
    h = _HB.format(salt=salt, key="doc_id")
    if rates:
        cases = " ".join(
            f"WHEN {stratum_col} = '{v}' THEN {r!r}" for v, r in rates.items()
        )
        rate_sql = f"(CASE {cases} ELSE {default_rate!r} END)"
    else:  # degenerate: CASE with zero WHENs is invalid SQL
        rate_sql = f"{default_rate!r}"
    return f"""WITH hashed AS (
  SELECT doc_id, {stratum_col}, {h} AS h FROM documents
)
SELECT doc_id, {stratum_col}
FROM hashed
WHERE h < floor({rate_sql} * 4294967296.0)::BIGINT"""


def sql_decontaminate(
    n: int = 3, min_overlap: int = 1, eval_mod: int = 37
) -> str:
    """Oracle twin of sampling.decontaminate with the registered eval set
    (doc_id % eval_mod = 0 rows of the same corpus)."""
    return f"""WITH {_shingle_cte(n)},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {eval_mod} = 0),
contaminated AS (
  SELECT s.doc_id
  FROM sh s JOIN ev USING (shingle)
  GROUP BY s.doc_id
  HAVING count(*) >= {min_overlap}
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)"""


def sql_decontaminate_bloom(
    n: int = 3,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    eval_mod: int = 37,
    salt: str = "bloom",
) -> str:
    """Oracle twin of sampling.decontaminate_bloom — replicates the Bloom
    filter BIT-FOR-BIT (same seeded-md5 positions, same 32-bit words via
    bit_or), including its false positives, then the all-bits-set probe
    and the anti-join. pos // 32 == Spark's shiftright(pos, 5) and
    1 << (pos % 32) stays < 2^32 on both engines."""
    hpos = (
        f"(('0x' || substr(md5('{salt}|' || j::VARCHAR || '|' || shingle), "
        f"1, 8))::BIGINT % {m_bits})"
    )
    return f"""WITH {_shingle_cte(n)},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {eval_mod} = 0),
evpos AS (
  SELECT {hpos} AS pos FROM ev CROSS JOIN range({n_hashes}) r(j)
),
words AS (
  SELECT pos // 32 AS word_idx,
         bit_or(1::BIGINT << (pos % 32)) AS word
  FROM evpos GROUP BY pos // 32
),
probe AS (
  SELECT s.doc_id, s.shingle, {hpos} AS pos
  FROM sh s CROSS JOIN range({n_hashes}) r(j)
),
flags AS (
  SELECT p.doc_id, p.shingle,
         sum(CASE WHEN w.word IS NOT NULL
                   AND (w.word & (1::BIGINT << (p.pos % 32))) <> 0
             THEN 1 ELSE 0 END) AS hits
  FROM (SELECT doc_id, shingle, pos, pos // 32 AS word_idx FROM probe) p
  LEFT JOIN words w ON p.word_idx = w.word_idx
  GROUP BY p.doc_id, p.shingle
),
contaminated AS (
  SELECT DISTINCT doc_id FROM flags WHERE hits = {n_hashes}
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)"""


def sql_dsir_weights(
    m_buckets: int = 4096,
    alpha: float = 1.0,
    target_mod: int = 23,
    salt: str = "dsir",
) -> str:
    """Oracle twin of sampling.dsir_logweights with the registered
    target set (doc_id % target_mod = 0): bag-semantics uni+bigram
    features, seeded-md5 bucket hash, DENSE Laplace-smoothed bucket
    models (zero-count buckets keep ln(alpha/(tot+alpha·m))), per-bucket
    log-likelihood ratio, per-doc sum at the 6-dp grain."""
    b = f"(('0x' || substr(md5('{salt}|' || gram), 1, 8))::BIGINT % {m_buckets})"
    am = alpha * m_buckets
    return f"""WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest([array_to_string(t[i:i+0], ' ')
                         for i in range(1, len(t) + 1)]) AS gram
  FROM toks WHERE len(t) >= 1
  UNION ALL
  SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                         for i in range(1, len(t))]) AS gram
  FROM toks WHERE len(t) >= 2
),
gb AS (SELECT doc_id, {b} AS bucket FROM grams),
buckets AS (SELECT range AS bucket FROM range({m_buckets})),
rdense AS (
  SELECT bk.bucket, coalesce(c.c, 0) AS c
  FROM buckets bk LEFT JOIN
    (SELECT bucket, count(*) AS c FROM gb GROUP BY bucket) c USING (bucket)
),
rtot AS (SELECT sum(c) AS t FROM rdense),
rmodel AS (
  SELECT bucket, ln((c + {alpha!r}) / (t + {am!r})) AS lr
  FROM rdense CROSS JOIN rtot
),
tdense AS (
  SELECT bk.bucket, coalesce(c.c, 0) AS c
  FROM buckets bk LEFT JOIN
    (SELECT bucket, count(*) AS c FROM gb
     WHERE doc_id % {target_mod} = 0 GROUP BY bucket) c USING (bucket)
),
ttot AS (SELECT sum(c) AS t FROM tdense),
tmodel AS (
  SELECT bucket, ln((c + {alpha!r}) / (t + {am!r})) AS lt
  FROM tdense CROSS JOIN ttot
),
llr AS (
  SELECT bucket, lt - lr AS llr FROM tmodel JOIN rmodel USING (bucket)
)
SELECT g.doc_id, round(sum(l.llr), 6) AS logw
FROM gb g JOIN llr l USING (bucket)
GROUP BY g.doc_id"""


def sql_pack_sequences(budget: int = 2048) -> str:
    """Oracle twin of packing.pack_sequences: raw (unfiltered) token
    counts, exclusive prefix sum in doc_id order, floor-division sequence
    assignment. The window here is the small-scale semantic spec; the
    Spark plan computes the identical prefix sum bucket-parallel."""
    return f"""WITH tok AS (
  SELECT doc_id, len({TOKS})::BIGINT AS n_tokens FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS start_pos
  FROM tok
)
SELECT doc_id, n_tokens, start_pos,
       (start_pos // {budget})::BIGINT AS seq_id,
       ((start_pos + greatest(n_tokens, 1) - 1) // {budget})::BIGINT AS end_seq
FROM cum"""


def sql_packed_stats(budget: int = 2048) -> str:
    """Per-sequence rollup of the packing layout (docs starting per seq)."""
    return f"""WITH tok AS (
  SELECT doc_id, len({TOKS})::BIGINT AS n_tokens FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS start_pos
  FROM tok
)
SELECT (start_pos // {budget})::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs_starting,
       sum(n_tokens)::BIGINT AS tokens_starting
FROM cum GROUP BY 1"""


def sql_domain_mix(
    target: dict[str, float],
    n_target: int,
    default_weight: float = 0.0,
    salt: str = "mix",
) -> str:
    """Oracle twin of sampling.domain_mix: identical data-derived rates
    (min(1, w·n/cnt), same double arithmetic order), identical md5
    threshold with floor()."""
    h = _HB.format(salt=salt, key="doc_id")
    if target:
        cases = " ".join(
            f"WHEN source = '{v}' THEN {w!r}" for v, w in target.items()
        )
        w_sql = f"(CASE {cases} ELSE {default_weight!r} END)"
    else:
        w_sql = f"{default_weight!r}"
    return f"""WITH cnt AS (
  SELECT source, count(*)::BIGINT AS c FROM documents GROUP BY source
),
hashed AS (
  SELECT d.doc_id, d.source, {h} AS h,
         least(1.0, {w_sql} * {float(n_target)!r} / c.c) AS rate
  FROM documents d JOIN cnt c USING (source)
)
SELECT doc_id, source FROM hashed
WHERE h < floor(rate * 4294967296.0)::BIGINT"""


def _sql_shared_neighbors(key: str, val: str, min_strength: int) -> str:
    return f"""WITH {_EDGES_CTE}
SELECT a.{val} AS doc_a, b.{val} AS doc_b, count(*)::BIGINT AS strength
FROM edges a JOIN edges b ON a.{key} = b.{key} AND a.{val} < b.{val}
GROUP BY 1, 2
HAVING count(*) >= {min_strength}"""


def sql_cocitation(min_strength: int = 2) -> str:
    """Oracle twin of linkgraph.cocitation over the synthetic citations."""
    return _sql_shared_neighbors("src", "dst", min_strength)


def sql_bib_coupling(min_strength: int = 2) -> str:
    """Oracle twin of linkgraph.bib_coupling."""
    return _sql_shared_neighbors("dst", "src", min_strength)


def sql_hits(iterations: int = 5) -> str:
    """Unrolled weighted HITS with per-half-step L2 normalization — the
    same fixed iterations the Spark loop runs (linkgraph.hits). Each
    iteration is the authority inflow + its norm + the hub outflow +
    its norm, all over the synthetic citation edges."""
    # Each recursion carrier is MATERIALIZED and the L2 norm rides a
    # sum() OVER () window inside the SAME CTE: DuckDB inlines plain
    # CTEs, so a separate norm CTE (two references per level) expands
    # the plan 2^iterations-fold and never finishes.
    ctes = [
        "ew AS MATERIALIZED (SELECT src, dst, weight FROM edges)",
        "h0 AS (SELECT doc_id AS node, 1.0 AS hub FROM documents)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT node, CASE WHEN t > 0 THEN v / sqrt(t) ELSE 0.0 END AS auth
  FROM (
    SELECT d.doc_id AS node, coalesce(x.a, 0.0) AS v,
           sum(coalesce(x.a, 0.0) * coalesce(x.a, 0.0)) OVER () AS t
    FROM documents d
    LEFT JOIN (SELECT e.dst, sum(h.hub * e.weight) AS a
               FROM ew e JOIN h{i - 1} h ON h.node = e.src
               GROUP BY e.dst) x ON x.dst = d.doc_id
  ) z)"""
        )
        ctes.append(
            f"""h{i} AS MATERIALIZED (
  SELECT node, CASE WHEN t > 0 THEN v / sqrt(t) ELSE 0.0 END AS hub
  FROM (
    SELECT d.doc_id AS node, coalesce(x.h, 0.0) AS v,
           sum(coalesce(x.h, 0.0) * coalesce(x.h, 0.0)) OVER () AS t
    FROM documents d
    LEFT JOIN (SELECT e.src, sum(a.auth * e.weight) AS h
               FROM ew e JOIN a{i} a ON a.node = e.dst
               GROUP BY e.src) x ON x.src = d.doc_id
  ) z)"""
        )
    return (
        f"WITH {_EDGES_CTE},\n" + ",\n".join(ctes)
        + f"""
SELECT h.node AS doc_id, round(h.hub, 9) AS hub,
       round(a.auth, 9) AS authority
FROM h{iterations} h JOIN a{iterations} a ON a.node = h.node"""
    )


_CHUNK_TOKARR = r"""tokarr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\s+'),
           t -> t <> '') AS toks
  FROM documents
)"""


def _chunk_cte(size: int, stride: int) -> str:
    """Sliding-window chunk CTE over tokarr — DuckDB twin of
    packing.chunk_documents (1-based inclusive list slice == Spark's
    slice(start+1, size) with overrun truncation)."""
    return f"""ch AS (
  SELECT doc_id, (s // {stride})::BIGINT AS chunk_id,
         toks[s + 1 : s + {size}] AS w
  FROM tokarr, unnest(range(0, len(toks), {stride})) u(s)
  WHERE len(toks) > 0
)"""


def sql_chunk_documents(size: int = 32, stride: int = 16) -> str:
    """Oracle twin of packing.chunk_documents."""
    return f"""WITH {_CHUNK_TOKARR},
{_chunk_cte(size, stride)}
SELECT doc_id, chunk_id, len(w)::BIGINT AS n_tokens,
       array_to_string(w, ' ') AS chunk_text
FROM ch"""


def sql_passage_topk(
    size: int = 32, stride: int = 16, k: int = 10
) -> str:
    """Oracle twin of registry_ops.q_passage_topk — BM25 at PASSAGE grain:
    the full tokenize→stats→score pipeline rebuilt over the chunk corpus
    (chunk tokens are the window slices directly — re-tokenizing
    chunk_text would produce the same array, since tokens are alnum and
    space-joined). Composite cid = doc_id·1000 + chunk_id mirrors the
    Spark side."""
    from .oracle_sql import _STOP_LIST_SQL, _qterms_values, B, K1

    return f"""WITH {_CHUNK_TOKARR},
{_chunk_cte(size, stride)},
ctok AS (
  SELECT doc_id * 1000 + chunk_id AS cid, unnest(w) AS term FROM ch
),
ctok_f AS (
  SELECT cid, term FROM ctok WHERE term NOT IN ({_STOP_LIST_SQL})
),
counts AS (
  SELECT cid, term, count(*)::BIGINT AS cnt FROM ctok_f GROUP BY cid, term
),
docstat AS (
  SELECT c.cid,
         coalesce(mx.maxcnt, 0)::BIGINT AS maxcnt,
         coalesce(mx.length, 0)::BIGINT AS length
  FROM (SELECT DISTINCT doc_id * 1000 + chunk_id AS cid FROM ch) c
  LEFT JOIN (
    SELECT cid, max(cnt) AS maxcnt, sum(cnt) AS length
    FROM counts GROUP BY cid
  ) mx USING (cid)
),
gstats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(length)::DOUBLE AS avgdl
  FROM docstat
),
dict AS (
  SELECT term, count(*)::BIGINT AS df FROM counts GROUP BY term
),
tfn AS (
  SELECT c.cid, c.term, c.cnt * 1.0 / d.maxcnt AS tf
  FROM counts c JOIN docstat d USING (cid)
),
scored AS (
  SELECT q.qid, t.cid,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.cid = s.cid
  CROSS JOIN gstats g
  GROUP BY q.qid, t.cid
),
ranked AS (
  SELECT qid, cid, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, cid ASC) AS rank
  FROM scored
)
SELECT qid, (cid // 1000)::BIGINT AS doc_id, (cid % 1000)::BIGINT AS chunk_id,
       score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_blocklist_filter(words: tuple[str, ...]) -> str:
    """Oracle twin of textstats.blocklist_filter — token-grain blocklist
    hits over the P2-normalized stream."""
    wl = ", ".join(f"'{w}'" for w in sorted(set(words)))
    return rf"""WITH tokarr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\s+'),
           t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id,
       len(list_filter(toks, t -> list_contains([{wl}], t)))::BIGINT
         AS n_blocked,
       len(list_filter(toks, t -> list_contains([{wl}], t))) = 0 AS keep
FROM tokarr"""

def sql_windowed_event_counts(window_minutes: int = 360) -> str:
    """Oracle twin of sessions.windowed_event_counts: Spark's tumbling
    window() is epoch-aligned, so window_start = floor-division of whole
    epoch seconds (both engines floor to seconds first — see
    sql_sessionize on the truncation convention)."""
    w = window_minutes * 60
    # parenthesize the integer division explicitly: DuckDB parses
    # `x // {w} * {w}` surprisingly (NOT as (x // w) * w)
    return f"""SELECT ((floor(epoch(ts))::BIGINT // {w}) * {w})::BIGINT AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2"""


def sql_doc_lm_score() -> str:
    """Oracle twin of textstats.doc_lm_score: adjacent-position bigrams
    over the normalized nonempty token stream, corpus MLE model, per-doc
    average negative log2 probability."""
    return f"""WITH tokarr AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
tokpos AS (
  SELECT doc_id, u.s.pos AS pos, u.s.term AS term
  FROM tokarr,
       unnest([{{'pos': i, 'term': toks[i]}}
               for i in range(1, len(toks) + 1)]) u(s)
),
bg AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM tokpos a JOIN tokpos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
model AS (
  SELECT w1, w2, count(*)::DOUBLE AS c12 FROM bg GROUP BY w1, w2
),
ctx AS (
  SELECT w1, sum(c12) AS c1 FROM model GROUP BY w1
)
SELECT g.doc_id,
       count(*)::BIGINT AS n_bigrams,
       round(-sum(log2(m.c12 / c.c1)) / count(*), 6) AS cross_entropy
FROM bg g JOIN model m USING (w1, w2) JOIN ctx c USING (w1)
GROUP BY g.doc_id"""


def sql_corpus_profile(group_col: str = "lang") -> str:
    """Oracle twin of textstats.corpus_profile (quantile_cont::DOUBLE —
    both engines interpolate with the (n-1)p rule)."""
    return f"""WITH tokarr AS (
  SELECT {group_col} AS grp, len({TOKS})::DOUBLE AS n FROM documents
)
SELECT grp,
       count(*)::BIGINT AS n_docs,
       sum(n)::BIGINT AS total_tokens,
       round(avg(n), 6) AS mean_tokens,
       round(quantile_cont(n, 0.25), 6) AS p25_tokens,
       round(quantile_cont(n, 0.5), 6) AS p50_tokens,
       round(quantile_cont(n, 0.9), 6) AS p90_tokens
FROM tokarr GROUP BY grp"""


def sql_repetition_stats() -> str:
    """Oracle twin of textstats.repetition_stats (adjacent-token bigrams
    via a 1-based range comprehension — range(1, len) pairs (i, i+1))."""
    return f"""WITH tokarr AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
bg AS (
  SELECT doc_id, toks,
         [toks[i] || ' ' || toks[i + 1]
          for i in range(1, len(toks))] AS bgs
  FROM tokarr
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       round(CASE WHEN len(toks) > 0
             THEN 1.0 - len(list_distinct(toks)) / len(toks)
             ELSE 0.0 END, 6) AS dup_token_frac,
       round(CASE WHEN len(bgs) > 0
             THEN 1.0 - len(list_distinct(bgs)) / len(bgs)
             ELSE 0.0 END, 6) AS dup_bigram_frac,
       round(CASE WHEN len(bgs) > 0
             THEN list_max(list_transform(list_distinct(bgs),
                  b -> len(list_filter(bgs, x -> x = b)))) * 1.0 / len(bgs)
             ELSE 0.0 END, 6) AS top_bigram_frac
FROM bg"""


# bit-for-bit twin of textstats.pii_view (the deterministic PII fixture)
_PII_CTE = """pii AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' contact u' || doc_id::VARCHAR
                || '@mail' || (doc_id % 7)::VARCHAR
                || '.example.com from 10.' || (doc_id % 200)::VARCHAR
                || '.' || ((doc_id * 7) % 250)::VARCHAR
                || '.4 call +1-555-'
                || lpad(((doc_id * 13) % 10000)::VARCHAR, 4, '0')
         ELSE text END AS text
  FROM documents
)"""

_PII_EMAIL = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
_PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def sql_pii_scrub() -> str:
    """Oracle twin of textstats.pii_scrub over the pii_view fixture.
    Same regexes (Java-regex ∩ RE2 subset), same email→ip→phone order."""
    return f"""WITH {_PII_CTE}
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT AS n_ips,
       len(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phones
FROM pii"""


def sql_span_dedup(span_tokens: int = 8) -> str:
    """Oracle twin of dedup.span_dedup: same fixed-window spans, same
    first-occurrence-by-(doc_id, span_idx) keep rule."""
    st = span_tokens
    return f"""WITH tokarr AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, cast(ceil(len(toks) / {st}.0) AS BIGINT))) AS i
  FROM tokarr WHERE len(toks) > 0
),
spans AS (
  SELECT doc_id, i::BIGINT AS span_idx,
         array_to_string(toks[(i * {st} + 1):(i * {st} + {st})], ' ')
           AS span_text
  FROM idx
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY span_text ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       (count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END))::BIGINT
         AS n_dup_spans,
       coalesce(string_agg(CASE WHEN rn = 1 THEN span_text END, ' '
                           ORDER BY span_idx), '') AS clean_text
FROM ranked GROUP BY doc_id"""


def sql_anchor_texts(title_tokens: int = 3, min_cnt: int = 2) -> str:
    """Oracle twin of linkgraph.anchor_texts over the synthetic citation
    edges (_EDGES_CTE) — anchors = source doc's leading title tokens."""
    return f"""WITH {_EDGES_CTE},
titles AS (
  SELECT doc_id AS src, ({TOKS})[1:{title_tokens}] AS title FROM documents
),
joined AS (
  SELECT e.dst, e.src, t.title FROM edges e JOIN titles t USING (src)
),
terms AS (
  SELECT dst, src, unnest(title) AS term FROM joined
)
SELECT dst AS doc_id, term,
       count(*)::BIGINT AS anchor_cnt,
       count(DISTINCT src)::BIGINT AS n_srcs
FROM terms GROUP BY dst, term
HAVING count(*) >= {min_cnt}"""


def sql_url_canon() -> str:
    """Oracle twin of websnap.url_canon over the messy_url_view fixture —
    same synthesis, same rule order, same regexes."""
    return """WITH messy AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0
             THEN 'WWW.src' || (doc_id % 5)::VARCHAR || '.Example.ORG'
             ELSE 'src' || (doc_id % 5)::VARCHAR || '.example.org' END)
         || (CASE WHEN doc_id % 4 = 0
             THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
             ELSE '' END)
         || '/P' || (doc_id % 7)::VARCHAR
         || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 3 = 0
             THEN '?utm_source=feed&id=' || doc_id::VARCHAR
                  || '&utm_campaign=c' || (doc_id % 2)::VARCHAR
             WHEN doc_id % 3 = 1 THEN '?id=' || doc_id::VARCHAR
             ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0
             THEN '#sec' || (doc_id % 3)::VARCHAR ELSE '' END) AS url
  FROM documents
),
defrag AS (
  SELECT doc_id, url, regexp_replace(url, '#.*', '', 'g') AS u FROM messy
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
         regexp_replace(u, '^[^:/?#]+://[^/?#]*', '') AS rest
  FROM defrag
),
utm AS (
  SELECT doc_id, url, scheme, hostport, rest,
         regexp_replace(rest, '[?&]utm_[^&]*', '', 'g') AS s1
  FROM parts
),
fixed AS (
  SELECT doc_id, url, scheme, hostport,
         CASE WHEN regexp_matches(rest, '\\?utm_')
                   AND strpos(s1, '&') > 0 AND strpos(s1, '?') = 0
              THEN regexp_replace(s1, '^([^&]*)&', '\\1?')
              ELSE s1 END AS s2
  FROM utm
),
canon AS (
  SELECT doc_id, url, scheme,
         regexp_replace(
           CASE WHEN scheme = 'http'
                THEN regexp_replace(hostport, ':80$', '')
                WHEN scheme = 'https'
                THEN regexp_replace(hostport, ':443$', '')
                ELSE hostport END,
           '^www\\.', '') AS host,
         regexp_replace(regexp_replace(
           s2, '^([^?]*)/\\?', '\\1?'),
           '/$', '') AS rest
  FROM fixed
)
SELECT doc_id, url, scheme || '://' || host || rest AS canon_url
FROM canon"""


def sql_corpus_clean_web(
    quality_tau: float = 0.5, rep_tau: float = 0.2
) -> str:
    """The web-corpus ingestion composition: URL canonicalization →
    latest-snapshot-per-canonical-URL → quality + repetition gates.
    Composes the url_canon, quality_score, and repetition_stats oracles
    as nested CTE subqueries (same rule code, same thresholds)."""
    return f"""WITH canonized AS ({sql_url_canon()}),
ts AS (
  SELECT doc_id, canon_url,
         (1546300800 + ((doc_id * 37) % 1000) * 3600)::BIGINT AS warc_ts
  FROM canonized
),
latest AS (
  SELECT doc_id, canon_url FROM (
    SELECT *, row_number() OVER (
      PARTITION BY canon_url ORDER BY warc_ts DESC, doc_id DESC) AS rn
    FROM ts
  ) WHERE rn = 1
),
qual AS ({sql_quality_score()}),
rep AS ({sql_repetition_stats()})
SELECT l.doc_id, l.canon_url, q.quality, r.dup_bigram_frac
FROM latest l
JOIN qual q USING (doc_id)
JOIN rep r USING (doc_id)
WHERE q.quality >= {quality_tau} AND r.dup_bigram_frac <= {rep_tau}"""


def sql_containment_pairs(n: int = 2, tau: float = 0.9) -> str:
    """Oracle twin of dedup.containment_pairs (directed, asymmetric
    denominator |shingles(doc_a)|)."""
    return f"""WITH {_shingle_cte(n)},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / x.n_sh, 6) AS containment
FROM inter JOIN sz x ON x.doc_id = doc_a
WHERE n_inter * 1.0 / x.n_sh >= {tau}"""


def sql_containment_lsh_pairs(
    n: int = 2, k: int = 16, bands: int = 8, tau: float = 0.9
) -> str:
    """Oracle twin of dedup.containment_lsh_pairs: SAME banding generates
    the (undirected) candidates, verified directionally by exact
    containment — Spark and DuckDB agree even where LSH recall < 1."""
    r = k // bands
    mins = ",\n         ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(k)
    )
    band_rows = ", ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || '|' || ".join(f"h{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    return f"""WITH {_shingle_cte(n)},
sigs AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
bandkeys AS (
  SELECT doc_id, bk.* FROM sigs,
  LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandkeys a JOIN bandkeys b
    ON a.band = b.band AND a.key = b.key AND a.doc_id <> b.doc_id
),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / x.n_sh, 6) AS containment
FROM inter JOIN sz x ON x.doc_id = doc_a
WHERE n_inter * 1.0 / x.n_sh >= {tau}"""


def sql_snapshot_diff() -> str:
    """Oracle twin of websnap.snapshot_diff over snapshot_view (+text):
    same rank-2 window, same md5 comparison, same tiebreak."""
    return """WITH pages AS (
  SELECT doc_id, text,
         'https://' || source || '.example.org/p/'
           || CAST(doc_id % 7 AS VARCHAR) AS url,
         (1546300800 + ((doc_id * 37) % 1000) * 3600)::BIGINT AS warc_ts
  FROM documents
),
ranked AS (
  SELECT url, doc_id, md5(text) AS h,
         row_number() OVER (PARTITION BY url
                            ORDER BY warc_ts DESC, doc_id DESC) AS rn
  FROM pages
),
piv AS (
  SELECT url,
         max(CASE WHEN rn = 1 THEN doc_id END) AS cur_doc_id,
         max(CASE WHEN rn = 2 THEN doc_id END) AS prev_doc_id,
         max(CASE WHEN rn = 1 THEN h END) AS ch,
         max(CASE WHEN rn = 2 THEN h END) AS ph
  FROM ranked WHERE rn <= 2 GROUP BY url
)
SELECT url, cur_doc_id, prev_doc_id,
       CASE WHEN ph IS NULL THEN 'new'
            WHEN ch <> ph THEN 'changed'
            ELSE 'unchanged' END AS status
FROM piv"""


def sql_crawl_schedule(n_fetchers: int = 4) -> str:
    """Oracle twin of crawl.crawl_schedule over snapshot_view (+text):
    same adjacent-digest lag window, Laplace-smoothed 6dp change_rate,
    rate-x-staleness priority, seeded-md5 fetcher pinning, and the two
    partitioned rank windows (round within host, pos within fetcher)."""
    return f"""WITH pages AS (
  SELECT doc_id, text,
         'https://' || source || '.example.org/p/'
           || CAST(doc_id % 7 AS VARCHAR) AS url,
         (1546300800 + ((doc_id * 37) % 1000) * 3600)::BIGINT AS warc_ts
  FROM documents
),
hist AS (
  SELECT url, warc_ts, md5(text) AS h,
         lag(md5(text)) OVER (PARTITION BY url
                              ORDER BY warc_ts ASC, doc_id ASC) AS ph
  FROM pages
),
rates AS (
  SELECT url, max(warc_ts)::BIGINT AS last_ts, count(*)::BIGINT AS n_snaps,
         sum(CASE WHEN ph IS NOT NULL AND h <> ph THEN 1 ELSE 0 END)::BIGINT
           AS n_changes
  FROM hist GROUP BY url
),
r2 AS (
  SELECT url, last_ts, n_snaps, n_changes,
         floor((n_changes + 1) * 1000000.0 / (n_snaps + 1) + 0.5)
           / 1000000.0 AS change_rate
  FROM rates
),
nowt AS (SELECT max(warc_ts)::BIGINT AS now_ts FROM pages),
scored AS (
  SELECT r2.url,
         regexp_extract(r2.url, '^https?://([^/]+)/', 1) AS host,
         n_snaps, n_changes, change_rate,
         floor(change_rate * (now_ts - last_ts) + 0.5)::BIGINT AS priority
  FROM r2 CROSS JOIN nowt
),
sharded AS (
  SELECT *,
         (('0x' || substr(md5('fetch|' || host), 1, 8))::BIGINT
           % {n_fetchers}) AS fetcher
  FROM scored
),
rounds AS (
  SELECT *,
         row_number() OVER (PARTITION BY host
                            ORDER BY priority DESC, url ASC) AS rnd
  FROM sharded
)
SELECT url, host, n_snaps, n_changes, change_rate, priority, fetcher,
       rnd::BIGINT AS round,
       (row_number() OVER (PARTITION BY fetcher
                           ORDER BY rnd ASC, priority DESC, url ASC)
       )::BIGINT AS pos
FROM rounds"""


def sql_robots_filter() -> str:
    """Oracle twin of crawl.robots_filter over snapshot_view's distinct
    urls and crawl.fixture_robots_rules (same seeded-md5 bucket formula):
    longest prefix rule wins, Allow wins length ties, no-rule default is
    allowed with rule_path = ''."""
    return """WITH pages AS (
  SELECT DISTINCT
         'https://' || source || '.example.org/p/'
           || CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents
),
u AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
         regexp_replace(url, '^https?://[^/]+', '') AS path
  FROM pages
),
hb AS (
  SELECT DISTINCT host,
         (('0x' || substr(md5('robots|' || host), 1, 8))::BIGINT % 7) AS b
  FROM u
),
rules AS (
  SELECT host, '/p/' || CAST((b + 1) % 7 AS VARCHAR) AS rule_path,
         false AS allow
  FROM hb
  UNION ALL
  SELECT host, '/p', false FROM hb WHERE b % 3 = 0
  UNION ALL
  SELECT host, '/p/' || CAST(b AS VARCHAR), true FROM hb WHERE b % 3 = 0
),
m AS (
  SELECT u.url, r.rule_path, r.allow,
         row_number() OVER (
           PARTITION BY u.url
           ORDER BY length(r.rule_path) DESC, r.allow DESC,
                    r.rule_path ASC) AS rn
  FROM u JOIN rules r
    ON u.host = r.host
   AND substr(u.path, 1, length(r.rule_path)) = r.rule_path
)
SELECT u.url, u.host,
       coalesce(m.rule_path, '') AS rule_path,
       coalesce(m.allow, true) AS allowed
FROM u LEFT JOIN (SELECT url, rule_path, allow FROM m WHERE rn = 1) m
  ON u.url = m.url"""


def sql_crawl_traps(min_urls: int = 10, max_ratio: float = 3.0) -> str:
    """Oracle twin of crawl.crawl_traps over url_canon's output: same
    host/stem extraction, same floor(x·10⁶+0.5) ratio grain, trap flag
    read from the quantized ratio."""
    return rf"""WITH canon AS ({sql_url_canon()}),
staged AS (
  SELECT regexp_extract(canon_url, '^https?://([^/]+)', 1) AS host,
         canon_url AS u,
         regexp_replace(canon_url, '\?.*$', '') AS stem
  FROM canon
),
agg AS (
  SELECT host,
         count(DISTINCT u)::BIGINT AS n_urls,
         count(DISTINCT stem)::BIGINT AS n_stems
  FROM staged GROUP BY host
),
q AS (
  SELECT host, n_urls, n_stems,
         floor(n_urls * 1000000.0 / n_stems + 0.5) / 1000000.0
           AS url_ratio
  FROM agg
)
SELECT host, n_urls, n_stems, url_ratio,
       (n_urls >= {min_urls} AND url_ratio > {max_ratio}) AS trap
FROM q"""


def sql_snapshot_retention(keep_last: int = 2) -> str:
    """Oracle twin of websnap.snapshot_retention over snapshot_view:
    keep_last newest per url (recent) + first per (url, UTC day)
    (daily), recent wins, rest expired."""
    return f"""WITH {_PAGES_CTE},
staged AS (
  SELECT url, doc_id, warc_ts,
         warc_ts // 86400 AS day,
         row_number() OVER (PARTITION BY url
                            ORDER BY warc_ts DESC, doc_id DESC) AS rr,
         row_number() OVER (PARTITION BY url, warc_ts // 86400
                            ORDER BY warc_ts ASC, doc_id ASC) AS rd
  FROM pages
)
SELECT url, doc_id, warc_ts,
       (rr <= {keep_last} OR rd = 1) AS keep,
       CASE WHEN rr <= {keep_last} THEN 'recent'
            WHEN rd = 1 THEN 'daily'
            ELSE 'expired' END AS reason
FROM staged"""


def sql_domain_quality(
    min_quality: float = 0.5, min_en_frac: float = 0.5
) -> str:
    """Oracle twin of websnap.domain_quality over snapshot_view +
    quality_score + lang_id (composed as nested CTEs)."""
    return f"""WITH {_PAGES_CTE},
qual AS ({sql_quality_score()}),
lang AS ({sql_lang_id()}),
joined AS (
  SELECT regexp_extract(p.url, '^https?://([^/]+)', 1) AS host,
         q.quality, l.pred_lang
  FROM pages p
  JOIN qual q ON q.doc_id = p.doc_id
  JOIN lang l ON l.doc_id = p.doc_id
),
agg AS (
  SELECT host, count(*)::BIGINT AS n_pages,
         round(avg(quality), 6) AS mean_quality,
         round(avg(CASE WHEN pred_lang = 'en' THEN 1.0 ELSE 0.0 END), 6)
           AS en_frac
  FROM joined GROUP BY host
)
SELECT host, n_pages, mean_quality, en_frac,
       (mean_quality >= {min_quality} AND en_frac >= {min_en_frac})
         AS keep
FROM agg"""


def sql_centroid_classify(train_mod: int = 5) -> str:
    """Oracle twin of simsearch.label_centroids + centroid_classify:
    per-label mean vectors from the vec_id % train_mod == 0 training
    subset, then argmax cosine per vector (rounded-rank, label-asc
    ties)."""
    cdot = (
        "list_sum([a.embedding[i]::DOUBLE * c.cvec[i] "
        "for i in range(1, len(a.embedding) + 1)])"
    )
    cnorm = "sqrt(list_sum([c.cvec[i] * c.cvec[i] "\
        "for i in range(1, len(c.cvec) + 1)]))"
    return f"""WITH cent AS (
  SELECT label, t.i AS pos, avg(embedding[t.i]::DOUBLE) AS m
  FROM embeddings, unnest([i for i in range(1, len(embedding) + 1)]) t(i)
  WHERE vec_id % {train_mod} = 0
  GROUP BY label, t.i
),
cvec AS (
  SELECT label, list(m ORDER BY pos) AS cvec FROM cent GROUP BY label
),
scored AS (
  SELECT a.vec_id, c.label AS pred_label,
         {cdot} / ({_NORM_A} * {cnorm}) AS cosine
  FROM embeddings a, cvec c
),
ranked AS (
  SELECT vec_id, pred_label, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(cosine, 6) DESC,
                                     pred_label ASC) AS r
  FROM scored
)
SELECT vec_id, pred_label, round(cosine, 6) AS cosine
FROM ranked WHERE r = 1"""


def sql_quantized_topk(k: int = 5, every_m: int = 50, refine: int = 3) -> str:
    """Oracle twin of simsearch.quantize_embeddings + quantized_topk:
    bit-identical int8 quantization (greatest -> /127 -> floor(x/scale
    + 0.5), the same float op sequence as the Spark side), approximate
    int-dot candidate selection (k*refine per query, rounded-rank), then
    exact cosine rescoring of candidates only."""
    qdot = (
        "list_sum([(a.qvec[i] * b.qvec[i]) "
        "for i in range(1, len(a.qvec) + 1)])::DOUBLE"
    )
    return f"""WITH mxs AS (
  SELECT vec_id, embedding,
         greatest(list_max([abs(embedding[i]::DOUBLE)
                            for i in range(1, len(embedding) + 1)]),
                  1e-30) / 127.0 AS scale
  FROM embeddings
),
qt AS (
  SELECT vec_id, scale,
         [floor(embedding[i]::DOUBLE / scale + 0.5)::BIGINT
          for i in range(1, len(embedding) + 1)] AS qvec
  FROM mxs
),
approx AS (
  SELECT b.vec_id AS query_id, a.vec_id,
         {qdot} * a.scale * b.scale AS adot
  FROM qt a, qt b
  WHERE b.vec_id % {every_m} = 0
),
cand AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(adot, 6) DESC, vec_id ASC) AS r
  FROM approx
),
scored AS (
  SELECT c.query_id, c.vec_id,
         {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.vec_id
  JOIN embeddings b ON b.vec_id = c.query_id
  WHERE c.r <= {k * refine}
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 6) DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_cluster_sample(
    n: int = 2, k: int = 16, bands: int = 8, tau: float = 0.8,
    salt: str = "cdup",
) -> str:
    """Oracle twin of sampling.cluster_sample over the MinHash-LSH
    clusters: keep iff h(doc) * cluster_size < 2^32 — integer-exact on
    both sides (same seeded-md5 bucket as hash_split)."""
    h = _HB.format(salt=salt, key="doc_id")
    return f"""WITH clusters AS (
{sql_dedup_clusters(n, k, bands, tau)}
),
sized AS (
  SELECT doc_id, cluster_id,
         count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
  FROM clusters
)
SELECT doc_id, cluster_id, cluster_size
FROM sized
WHERE {h} * cluster_size < 4294967296"""


def sql_bpe_pairs() -> str:
    """Oracle twin of tokenizer.char_pair_counts over tokenizer.word_counts:
    adjacent character pairs of every normalized word (stopwords KEPT —
    tokenizer training sees function words), weighted by corpus word
    frequency. range(1, length) is empty for 1-char words on both sides."""
    return r"""WITH tok AS (
  SELECT unnest(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
           '\s+')) AS word
  FROM documents
),
words AS (
  SELECT word, count(*)::BIGINT AS freq FROM tok
  WHERE word <> '' GROUP BY word
),
pairs AS (
  SELECT substr(w.word, t.i, 2) AS pair, w.freq
  FROM words w, unnest([i for i in range(1, length(w.word))]) t(i)
)
SELECT pair, sum(freq)::BIGINT AS cnt FROM pairs GROUP BY pair"""


def sql_bpe_encode(merges: tuple[tuple[str, str], ...]) -> str:
    """Oracle twin of tokenizer.bpe_encode over the corpus vocabulary:
    each merge is one leftmost-first non-overlapping pass over the symbol
    list (exactly bpe_encode_py's while loop), unrolled as one recursive
    CTE per merge — the recursion walks (done, rest) one step per row, so
    merge order and within-pass restart-after-merge semantics are
    replicated bit-for-bit. Output exploded to scalar (word, pos, sym)."""
    ctes = [r"""tok AS (
  SELECT unnest(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
           '\s+')) AS word
  FROM documents
),
words AS (SELECT DISTINCT word FROM tok WHERE word <> ''),
enc0 AS (
  SELECT word,
         list_append([word[i] for i in range(1, length(word) + 1)],
                     '</w>') AS syms
  FROM words
)"""]
    for j, (a, b) in enumerate(merges, start=1):
        hit = f"len(rest) >= 2 AND rest[1] = '{a}' AND rest[2] = '{b}'"
        ctes.append(f"""rec{j} AS (
  SELECT word, []::VARCHAR[] AS done, syms AS rest FROM enc{j - 1}
  UNION ALL
  SELECT word,
    CASE WHEN {hit} THEN list_append(done, '{a}{b}')
         ELSE list_append(done, rest[1]) END,
    CASE WHEN {hit} THEN rest[3:] ELSE rest[2:] END
  FROM rec{j} WHERE len(rest) > 0
),
enc{j} AS (SELECT word, done AS syms FROM rec{j} WHERE len(rest) = 0)""")
    body = ",\n".join(ctes)
    return f"""WITH RECURSIVE {body}
SELECT word, (generate_subscripts(syms, 1) - 1)::BIGINT AS pos,
       unnest(syms) AS sym
FROM enc{len(merges)}"""


# import-time pin: every embedded copy of the warc_ts fixture formula must
# match the single source — a drifted copy fails the import, not the soak
for _fn in (sql_web_latest_snapshot, sql_web_domain_stats,
            sql_corpus_clean_web, sql_snapshot_diff):
    _sql = _fn()
    if "warc_ts" in _sql:
        assert ("1546300800 + ((doc_id * 37) % 1000) * 3600" in _sql), (
            f"{_fn.__name__} lost the warc_ts fixture formula"
        )


def sql_boilerplate_strip(
    span_tokens: int = 4, min_docs: int = 5, min_frac: float = 0.5
) -> str:
    """Oracle twin of dedup.boilerplate_strip over the boiler-corpus view
    (documents with a domain-specific 'cookie consent banner <source>'
    header injected — the same synthesis the registered query applies):
    same fixed-window spans, same domain doc-frequency threshold."""
    st = span_tokens
    return f"""WITH corpus AS (
  SELECT doc_id, source AS domain,
         'cookie consent banner ' || source || ' ' || text AS text
  FROM documents
),
tokarr AS (
  SELECT doc_id, domain, {TOKS} AS toks FROM corpus
),
idx AS (
  SELECT doc_id, domain, toks,
         unnest(range(0, cast(ceil(len(toks) / {st}.0) AS BIGINT))) AS i
  FROM tokarr WHERE len(toks) > 0
),
spans AS (
  SELECT doc_id, domain, i::BIGINT AS span_idx,
         array_to_string(toks[(i * {st} + 1):(i * {st} + {st})], ' ')
           AS span_text
  FROM idx
),
dom AS (
  SELECT domain, count(*)::BIGINT AS dom_docs FROM corpus GROUP BY domain
),
spanstats AS (
  SELECT domain, span_text, count(DISTINCT doc_id)::BIGINT AS span_docs
  FROM spans GROUP BY domain, span_text
),
boiler AS (
  SELECT s.domain, s.span_text
  FROM spanstats s JOIN dom d USING (domain)
  WHERE s.span_docs >= greatest(
    {min_docs}, cast(ceil({min_frac} * d.dom_docs) AS BIGINT))
),
totals AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans FROM spans GROUP BY doc_id
),
kept AS (
  SELECT sp.* FROM spans sp
  WHERE NOT EXISTS (SELECT 1 FROM boiler b
                    WHERE b.domain = sp.domain
                      AND b.span_text = sp.span_text)
),
rolled AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(span_text, ' ' ORDER BY span_idx) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, t.n_spans,
       (t.n_spans - coalesce(r.n_kept, 0))::BIGINT AS n_boiler_spans,
       coalesce(r.clean_text, '') AS clean_text
FROM totals t LEFT JOIN rolled r USING (doc_id)"""


def sql_semdedup(
    every_m: int = 25, iters: int = 2, grain: int = 6, tau: float = 0.5
) -> str:
    """Oracle twin of simsearch.semdedup over kmeans_centroids(every_m,
    iters, grain) clusters: final-centroid assignment (one extra
    scored/cells pass against cents{iters}), then within-cell pairs
    a.vec_id < b.vec_id at round-6 cosine ≥ tau mark the higher id."""
    dot_c = ("list_sum([a.embedding[i]::DOUBLE * c.cv[i] "
             "for i in range(1, len(a.embedding) + 1)])")
    norm_c = ("sqrt(list_sum([c.cv[i] * c.cv[i] "
              "for i in range(1, len(c.cv) + 1)]))")
    return f"""WITH {_kmeans_ctes(every_m, iters, grain)},
fscored AS (
  SELECT a.vec_id AS _id, c.centroid_id AS cell,
         {dot_c} / ({_NORM_A} * {norm_c}) AS c_cos
  FROM embeddings a, cents{iters} c
),
fcells AS (
  SELECT _id, cell FROM (
    SELECT _id, cell,
           row_number() OVER (PARTITION BY _id
             ORDER BY round(c_cos, 6) DESC, cell ASC) AS r
    FROM fscored) WHERE r = 1
),
pairs AS (
  SELECT ca.cell, a.vec_id AS id_a, b.vec_id AS id_b,
         round({_DOT} / ({_NORM_A} * {_NORM_B}), 6) AS cos
  FROM embeddings a
  JOIN fcells ca ON ca._id = a.vec_id
  JOIN fcells cb ON cb.cell = ca.cell AND cb._id > ca._id
  JOIN embeddings b ON b.vec_id = cb._id
),
dups AS (SELECT DISTINCT id_b FROM pairs WHERE cos >= {tau})
SELECT c._id::BIGINT AS vec_id, c.cell::BIGINT AS cell,
       (CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS is_dup
FROM fcells c LEFT JOIN dups d ON d.id_b = c._id"""


def sql_readability(words_per_sentence: int = 20) -> str:
    """Oracle twin of textstats.readability: vowel-group syllables
    (floor 1), fixed-window sentence surrogate, Flesch reading-ease."""
    wps = words_per_sentence
    syl = (
        "greatest(1, len(list_filter("
        "regexp_split_to_array(w, '[^aeiouy]+'), x -> x <> '')))"
    )
    return f"""WITH tokarr AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
base AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         list_sum(list_transform(toks, w -> {syl}))::BIGINT AS n_syllables
  FROM tokarr WHERE len(toks) > 0
)
SELECT doc_id, n_words, n_syllables,
       cast(ceil(n_words / {wps}.0) AS BIGINT) AS n_sentences,
       round(206.835
             - 1.015 * (n_words * 1.0
                        / cast(ceil(n_words / {wps}.0) AS BIGINT))
             - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
FROM base"""


def sql_heavy_hitters(depth: int = 4, width: int = 64, top_n: int = 10) -> str:
    """Oracle twin of sketches.cms_heavy_hitters over events.user_id:
    the same seeded-md5 Count-Min sketch (depth rows × width buckets,
    bucket = first 13 hex digits of md5(j || ':' || value) mod width),
    min-over-rows estimates for the distinct values, (est desc, value
    asc) top-n."""
    return f"""WITH ev AS (
  SELECT user_id::VARCHAR AS v FROM events
),
cms AS (
  SELECT j,
         ('0x' || substr(md5(j::VARCHAR || ':' || v), 1, 13))::BIGINT
           % {width} AS bucket,
         count(*)::BIGINT AS c
  FROM ev, generate_series(0, {depth - 1}) AS t(j)
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT v FROM ev
),
probe AS (
  SELECT p.v, min(cms.c) AS est
  FROM (
    SELECT v, j,
           ('0x' || substr(md5(j::VARCHAR || ':' || v), 1, 13))::BIGINT
             % {width} AS bucket
    FROM cand, generate_series(0, {depth - 1}) AS t(j)
  ) p
  JOIN cms ON cms.j = p.j AND cms.bucket = p.bucket
  GROUP BY p.v
),
ranked AS (
  SELECT v, est,
         row_number() OVER (ORDER BY est DESC, v ASC) AS rank
  FROM probe
)
SELECT v AS value, est::BIGINT AS est, rank::BIGINT AS rank
FROM ranked WHERE rank <= {top_n}"""


def sql_token_budget_sample(
    budget: int, salt: str = "budget", overshoot: float = 1.10
) -> str:
    """Oracle twin of sampling.token_budget_sample: whitespace token
    counts over the RAW text, seeded-md5 selection order, hash-threshold
    pre-filter (skipped when the corpus fits the budget), exact running-
    total trim keeping docs whose preceding total is under budget."""
    h = _HB.format(salt=salt, key="doc_id")
    return f"""WITH base AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
                         t -> t <> ''))::BIGINT AS n_tokens,
         {h} AS _h
  FROM documents
),
tot AS (SELECT sum(n_tokens) AS total FROM base),
pre AS (
  SELECT b.* FROM base b CROSS JOIN tot
  WHERE tot.total <= {budget}
     OR b._h < CAST(floor(least(1.0, ({overshoot!r} * {budget})
                                / tot.total::DOUBLE)
                          * 4294967296.0) AS BIGINT)
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY _h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM pre
)
SELECT doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens
FROM cum WHERE (cum_tokens - n_tokens) < {budget}"""


def sql_corpus_recipe(
    budget: int,
    quality_tau: float = 0.5,
    lang: str = "en",
    n: int = 2, k: int = 16, bands: int = 8, tau: float = 0.8,
    decontam_n: int = 3,
    eval_mod: int = 37,
    salt: str = "budget",
    overshoot: float = 1.10,
) -> str:
    """Oracle twin of recipe.corpus_recipe: the full training-data
    pipeline — corpus_clean survivors, n-gram decontamination of the
    survivors against the doc_id%eval_mod eval set, then the seeded-md5
    token-budget fill — each stage the EXISTING oracle's SQL, composed."""
    ng = (
        f"[array_to_string(toks[i:i+{decontam_n - 1}], ' ') "
        f"for i in range(1, len(toks) - {decontam_n - 2})]"
    )
    h = _HB.format(salt=salt, key="doc_id")
    return f"""WITH clean AS (
{sql_corpus_clean(quality_tau, lang, n, k, bands, tau)}
),
surv AS (
  SELECT d.doc_id, d.text FROM documents d JOIN clean USING (doc_id)
),
stok AS (SELECT doc_id, {TOKS} AS toks FROM surv),
ssh AS (
  SELECT DISTINCT doc_id, unnest({ng}) AS shingle
  FROM stok WHERE len(toks) >= {decontam_n}
),
etok AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
  WHERE doc_id % {eval_mod} = 0
),
esh AS (
  SELECT DISTINCT unnest({ng}) AS shingle
  FROM etok WHERE len(toks) >= {decontam_n}
),
contaminated AS (
  SELECT s.doc_id FROM ssh s JOIN esh USING (shingle)
  GROUP BY s.doc_id HAVING count(*) >= 1
),
kept AS (
  SELECT * FROM surv
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
base AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
                         t -> t <> ''))::BIGINT AS n_tokens,
         {h} AS _h
  FROM kept
),
tot AS (SELECT sum(n_tokens) AS total FROM base),
pre AS (
  SELECT b.* FROM base b CROSS JOIN tot
  WHERE tot.total <= {budget}
     OR b._h < CAST(floor(least(1.0, ({overshoot!r} * {budget})
                                / tot.total::DOUBLE)
                          * 4294967296.0) AS BIGINT)
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY _h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM pre
)
SELECT doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens
FROM cum WHERE (cum_tokens - n_tokens) < {budget}"""
