"""Registry entries for the training-data pipeline operators.

Each Spark callable here runs pipeline_ops operators over the driver's
``documents.parquet`` / ``embeddings.parquet`` and must value-match its
DuckDB twin in oracle_sql_ops.py (driver compare: columns sorted by name,
row-order-insensitive value hash, floats pre-rounded to 6 decimals).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import oracle_sql_ops as osqlo
from .corpus import load_documents, load_embeddings
from .pipeline_ops import (
    connected_components,
    cosine_pairs,
    cosine_topk,
    exact_dedup,
    fingerprints,
    ivf_topk,
    jaccard_pairs,
    lang_id,
    minhash_lsh_pairs,
    minhash_signatures,
    quality_score,
    srp_lsh_pairs,
    simhash64,
    simhash_pairs,
    token_stats,
)
from .pipeline_ops.multimodal import media_meta_pipeline
from .session import _ship_package


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir).select("doc_id", "text")


def q_exact_dedup(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_jaccard(spark, sf_dir):
    return jaccard_pairs(_docs(spark, sf_dir), n=2, tau=0.8).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_minhash_signatures(spark, sf_dir):
    sigs = minhash_signatures(_docs(spark, sf_dir), n=2, k=16)
    return sigs.select(
        "doc_id",
        F.md5(F.concat_ws("|", *[F.col("sig")[i] for i in range(16)]))
        .alias("sig_digest"),
        F.col("sig")[0].alias("h0"),
        F.col("sig")[15].alias("h15"),
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    pairs = minhash_lsh_pairs(
        _docs(spark, sf_dir), n=2, k=16, bands=8, tau=0.8
    )
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _lsh_clusters(docs: DataFrame) -> DataFrame:
    pairs = minhash_lsh_pairs(docs, n=2, k=16, bands=8, tau=0.8)
    return connected_components(
        pairs.select("doc_a", "doc_b"), docs.select("doc_id")
    )


def q_dedup_clusters(spark, sf_dir):
    return _lsh_clusters(_docs(spark, sf_dir))


def q_corpus_clean(spark, sf_dir):
    """End-to-end cleaning pass: lang=='en' ∩ quality>=0.5 ∩ cluster
    canonical (one survivor per near-dup component — subsumes exact dedup,
    since byte-identical texts share all MinHash bands)."""
    docs = _docs(spark, sf_dir)
    qual = quality_score(docs).select("doc_id", "quality")
    lang = lang_id(docs).select("doc_id", "pred_lang")
    clus = _lsh_clusters(docs)
    return (
        docs.join(qual, "doc_id")
        .join(lang, "doc_id")
        .join(clus, "doc_id")
        .where(
            (F.col("pred_lang") == "en")
            & (F.col("quality") >= 0.5)
            & (F.col("cluster_id") == F.col("doc_id"))
        )
        .select("doc_id", "pred_lang", "quality")
    )


def q_simhash(spark, sf_dir):
    return simhash64(_docs(spark, sf_dir)).select("doc_id", "simhash")


def q_dedup_simhash(spark, sf_dir):
    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3, bands=4).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    fp = fingerprints(_docs(spark, sf_dir), n=3, k=4)
    return fp.select(
        "doc_id", "fingerprint",
        F.array_join("sketch", ",").alias("sketch"),
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_embeddings(spark, sf_dir).select("vec_id", "embedding")


def _query_vecs(embs: DataFrame, every_m: int = 50) -> DataFrame:
    return embs.where(F.col("vec_id") % every_m == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def q_ann_cosine_topk(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    out = cosine_topk(embs, _query_vecs(embs), k=5)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_ann_cosine_topk_filtered(spark, sf_dir):
    """Metadata-filtered vector search: top-5 among even-label vectors
    only (pre-filter refill semantics, simsearch.filtered_cosine_topk)."""
    from .pipeline_ops.simsearch import filtered_cosine_topk

    embs = _embs(spark, sf_dir)
    out = filtered_cosine_topk(
        embs, _query_vecs(embs), F.col("label") % 2 == 0, k=5
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_hybrid_topk(spark, sf_dir):
    """Hybrid retrieval end-to-end: BM25 top-k over the documents table
    fused with cosine ANN top-k over the embeddings table by reciprocal-
    rank fusion (pipeline_ops.simsearch.rrf_fuse). Text qid q pairs with
    query vector vec_id = 50*q; qid 4 is all-stopwords, so its fused list
    is vector-only (exercises the missing-side coalesce)."""
    from .pipeline_ops.simsearch import rrf_fuse
    from .registry import q_bm25_topk

    text = q_bm25_topk(spark, sf_dir).select("qid", "doc_id", "rank")
    embs = _embs(spark, sf_dir)
    qv = embs.where(
        (F.col("vec_id") % 50 == 0)
        & (F.col("vec_id") / 50).between(1, 6)
    ).select(
        (F.col("vec_id") / 50).cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    vec = cosine_topk(embs, qv, k=10).select(
        F.col("query_id").alias("qid"),
        F.col("vec_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse(text, vec, k=10)


def q_fusion_topk(spark, sf_dir):
    """Score-based hybrid fusion (CombMNZ) over the SAME two lanes as
    hybrid_topk: BM25 top-k scores min-max-normalized per query, fused
    with normalized cosine ANN scores, doubled where both lanes agree
    (pipeline_ops.simsearch.combmnz_fuse). Rank-based RRF next door;
    this is the Fox-Shaw score-based alternative."""
    from .pipeline_ops.simsearch import combmnz_fuse
    from .registry import q_bm25_topk

    text = q_bm25_topk(spark, sf_dir).select("qid", "doc_id", "score")
    embs = _embs(spark, sf_dir)
    qv = embs.where(
        (F.col("vec_id") % 50 == 0)
        & (F.col("vec_id") / 50).between(1, 6)
    ).select(
        (F.col("vec_id") / 50).cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    vec = cosine_topk(embs, qv, k=10).select(
        F.col("query_id").alias("qid"),
        F.col("vec_id").alias("doc_id"),
        F.round("cosine", 6).alias("score"),
    )
    return combmnz_fuse(text, vec, k=10)


def q_emb_cosine_pairs(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return cosine_pairs(embs, tau=0.4).select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


def q_emb_lsh_pairs(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return srp_lsh_pairs(embs, tau=0.4, n_planes=16, bands=8, dim=64).select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


def q_ann_ivf_topk(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    out = ivf_topk(embs, _query_vecs(embs), k=5, every_m=25, n_probe=2)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_ann_ivf_recall(spark, sf_dir):
    """Recall@k of the registered IVF config against brute-force exact
    top-k (simsearch.ann_recall): the index-quality number a deployment
    checks before trusting n_probe/centroid choices — oracled per query,
    zero-hit queries kept as recall=0 rows."""
    from .pipeline_ops.simsearch import ann_recall

    embs = _embs(spark, sf_dir)
    qv = _query_vecs(embs)
    return ann_recall(
        cosine_topk(embs, qv, k=5),
        ivf_topk(embs, qv, k=5, every_m=25, n_probe=2),
        5,
    )


def q_kmeans_centroids(spark, sf_dir):
    """Deterministic Lloyd centroid training (simsearch.kmeans_centroids,
    grain=6 engine-independence quantization between iterations) exploded
    to scalar (centroid_id, pos, val) rows on the 1e-6 grid — the IVF
    train step as an oracled query, not a prose claim."""
    from .pipeline_ops.simsearch import kmeans_centroids

    c = kmeans_centroids(_embs(spark, sf_dir), every_m=25, iters=2, grain=6)
    return c.select(
        "centroid_id", F.posexplode("centroid_vec").alias("pos", "v")
    ).select(
        "centroid_id",
        F.col("pos").cast("long").alias("pos"),
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long").alias("val"),
    )


def q_doc_tf_vectors(spark, sf_dir):
    """Hashed tf-idf document vectors (queryeng.topical.doc_tf_vectors,
    the selective-search shard-assignment feature space) in sparse
    (doc_id, pos, w) form: md5-bucketed log1p(cnt)·log2(N/df) sums,
    6-dp-rounded, exact-zero buckets dropped on both sides."""
    from .queryeng.topical import doc_tf_vectors

    v = doc_tf_vectors(_docs(spark, sf_dir), dim=16)
    return (
        v.select("doc_id", F.posexplode("embedding").alias("pos", "w"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.round("w", 6).alias("w"),
        )
        .where(F.col("w") != 0)
    )


def q_topical_shards(spark, sf_dir):
    """Topical shard assignment over the embeddings table
    (queryeng.topical.vector_shard_map): deterministic k-means with
    strided-rank seeds, round-6 nearest-centroid classification, then
    size-rank packing of clusters onto shards — oracled end to end (the
    n_clusters == n_shards case, where greedy least-loaded packing
    degenerates to size order)."""
    from .queryeng.topical import vector_shard_map

    return vector_shard_map(
        _embs(spark, sf_dir), 4, n_clusters=4, iters=2, grain=6,
        train_mod=1,
    )


SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_RATES = {"en": 0.5, "de": 0.25}


_IVFD_CACHE: dict[str, str] = {}


def q_ann_ivf_topk_delta(spark, sf_dir):
    """Incremental IVF ingestion end-to-end (simsearch.ivf_add_delta):
    the index is built over the even-id half (plus every centroid id, so
    the centroid table equals the full build's), then the odd half is
    delta-appended into the cell directories — queries over the merged
    layout must be identical to a full build, so it shares the IVF
    oracle."""
    import tempfile

    from .pipeline_ops.simsearch import (
        build_ivf_index,
        ivf_add_delta,
        ivf_topk_persisted,
    )

    embs = _embs(spark, sf_dir)
    if sf_dir not in _IVFD_CACHE:
        p = tempfile.mkdtemp(prefix="themis_ivf_delta_") + "/ivf"
        build_ivf_index(
            embs.where("vec_id % 2 = 0 OR vec_id % 25 = 0"), p, every_m=25
        )
        n = ivf_add_delta(
            spark, p, embs.where("vec_id % 2 = 1 AND vec_id % 25 <> 0")
        )
        assert n > 0
        _IVFD_CACHE[sf_dir] = p
    out = ivf_topk_persisted(
        spark, _IVFD_CACHE[sf_dir], _query_vecs(embs), k=5, n_probe=2
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )

def q_chunk_documents(spark, sf_dir):
    """RAG chunking (packing.chunk_documents): per-document sliding
    token windows, size 32 / stride 16 — pure in-row codegen, no
    shuffle."""
    from .pipeline_ops.packing import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), size=32, stride=16)


_PASSAGE_CACHE: dict[str, object] = {}


def q_passage_topk(spark, sf_dir):
    """Passage (chunk-grain) retrieval end-to-end: chunk the corpus,
    index the chunks with the standard pipeline under composite ids
    (doc_id*1000 + chunk_id), BM25 top-k, split the id back — the RAG
    retrieval lane (return the best PASSAGE, not the best page). All
    statistics (df, N, avgdl) are passage-grain, exactly what a chunk
    index serves."""
    from .indexing import build_index
    from .pipeline_ops.packing import chunk_documents
    from .queryeng.bm25 import bm25_score_all
    from .registry import _qt, _rounded_rank_topk

    if sf_dir not in _PASSAGE_CACHE:
        chunks = chunk_documents(_docs(spark, sf_dir), size=32, stride=16)
        cdocs = chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
        _PASSAGE_CACHE[sf_dir] = build_index(cdocs, stem=False).cache()
    idx = _PASSAGE_CACHE[sf_dir]
    scored = bm25_score_all(
        _qt(spark, stem=False), idx.postings_flat, idx.dictionary,
        idx.doc_stats, idx.avgdl,
    )
    top = _rounded_rank_topk(scored, 10)
    return top.select(
        "qid",
        (F.col("doc_id") / 1000).cast("long").alias("doc_id"),
        (F.col("doc_id") % 1000).cast("long").alias("chunk_id"),
        "score", "rank",
    )

BLOCKLIST = ("crash", "panic", "dup", "slow")


def q_blocklist_filter(spark, sf_dir):
    """C4 badword stage (textstats.blocklist_filter): token-grain
    blocklist hit count + keep flag, in-row codegen beside the other
    quality gates."""
    from .pipeline_ops.textstats import blocklist_filter

    return blocklist_filter(_docs(spark, sf_dir), list(BLOCKLIST))

def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by md5 hash of doc_id —
    stable across runs, no RNG (pipeline_ops/sampling.py)."""
    from .pipeline_ops.sampling import hash_split

    return hash_split(_docs(spark, sf_dir), SPLIT_WEIGHTS).select(
        "doc_id", "split"
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-lang sampling: 50% en, 25% de, 10% elsewhere
    (pipeline_ops/sampling.py)."""
    from .pipeline_ops.sampling import stratified_sample

    from .corpus import load_documents

    return stratified_sample(
        load_documents(spark, sf_dir), SAMPLE_RATES, default_rate=0.1
    ).select("doc_id", "lang")


def q_decontaminate(spark, sf_dir):
    """Benchmark-leakage guard: drop training docs sharing any 3-gram
    with the (synthetic) eval set doc_id % 37 == 0
    (pipeline_ops/sampling.py)."""
    from .pipeline_ops.sampling import decontaminate

    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    return decontaminate(docs, ev, n=3, min_overlap=1).select("doc_id")


def q_decontaminate_bloom(spark, sf_dir):
    """The leakage guard's broadcast-bounded scale path: the same eval
    set compressed into a 2^16-bit Bloom filter (m/8 bytes flat however
    large the benchmark suite grows); false positives only OVER-drop —
    the exact op's survivors are a superset (pipeline_ops/sampling.py).
    The oracle replicates the filter bit-for-bit (seeded md5 + bit_or),
    not just the semantics."""
    from .pipeline_ops.sampling import decontaminate_bloom

    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    return decontaminate_bloom(
        docs, ev, n=3, m_bits=1 << 16, n_hashes=4
    ).select("doc_id")


_IVF_CACHE: dict[str, str] = {}


def q_ann_ivf_topk_persisted(spark, sf_dir):
    """IVF over the PERSISTED partitionBy(cell) layout: probed cells are
    directory-level partition pruning (simsearch.ivf_topk_persisted) —
    result-identical to the in-memory ivf_topk, so it shares its oracle."""
    import tempfile

    from .pipeline_ops.simsearch import build_ivf_index, ivf_topk_persisted

    embs = _embs(spark, sf_dir)
    if sf_dir not in _IVF_CACHE:
        p = tempfile.mkdtemp(prefix="themis_ivf_") + "/ivf"
        build_ivf_index(embs, p, every_m=25)
        _IVF_CACHE[sf_dir] = p
    out = ivf_topk_persisted(
        spark, _IVF_CACHE[sf_dir], _query_vecs(embs), k=5, n_probe=2
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_citation_edges(spark, sf_dir):
    from .linkgraph import citation_edges, synthetic_citations

    docs = _docs(spark, sf_dir)
    return citation_edges(synthetic_citations(docs))


def q_cocitation(spark, sf_dir):
    """Co-citation similarity pairs over the citation graph
    (linkgraph.cocitation)."""
    from .linkgraph import citation_edges, cocitation, synthetic_citations

    edges = citation_edges(synthetic_citations(_docs(spark, sf_dir)))
    return cocitation(edges, min_strength=2)


def q_bib_coupling(spark, sf_dir):
    """Bibliographic-coupling pairs (shared references) over the citation
    graph (linkgraph.bib_coupling)."""
    from .linkgraph import bib_coupling, citation_edges, synthetic_citations

    edges = citation_edges(synthetic_citations(_docs(spark, sf_dir)))
    return bib_coupling(edges, min_strength=2)


def q_pagerank(spark, sf_dir):
    from .linkgraph import citation_edges, pagerank, synthetic_citations

    docs = _docs(spark, sf_dir)
    edges = citation_edges(synthetic_citations(docs))
    pr = pagerank(edges, docs.select("doc_id"), damping=0.85, iterations=5)
    return pr.select("doc_id", F.round("pagerank", 9).alias("pagerank"))


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (sampling.dsir_logweights, Xie NeurIPS'23):
    hashed uni+bigram bucket models of the target set (doc_id % 23 == 0)
    vs the raw corpus, per-doc log-likelihood-ratio sum — the importance-
    resampling signal that steers a 100 TB crawl toward a target domain."""
    from .pipeline_ops.sampling import dsir_logweights

    docs = _docs(spark, sf_dir)
    target = docs.where(F.col("doc_id") % 23 == 0)
    return dsir_logweights(docs, target, m_buckets=4096, alpha=1.0)


def q_trustrank(spark, sf_dir):
    """TrustRank over the synthetic citation graph (linkgraph.trustrank):
    teleport restricted to the curated seed set doc_id % 17 == 0 — trust
    flows out of seeds and decays with link distance, unreachable pages
    stay at 0 (the spam-demotion static signal beside pagerank/HITS)."""
    from .linkgraph import citation_edges, synthetic_citations, trustrank

    docs = _docs(spark, sf_dir)
    edges = citation_edges(synthetic_citations(docs))
    seeds = docs.select("doc_id").where(F.col("doc_id") % 17 == 0)
    tr = trustrank(
        edges, docs.select("doc_id"), seeds, damping=0.85, iterations=5
    )
    return tr.select("doc_id", F.round("trust", 9).alias("trust"))


def q_hits(spark, sf_dir):
    """Kleinberg HITS hubs/authorities over the synthetic citation graph
    (linkgraph.hits): per-half-step L2-normalized mutual reinforcement,
    edge-keyed joins + combinable groupBys, broadcast-scalar normalizers
    — the query-independent link signal beside pagerank."""
    from .linkgraph import citation_edges, hits, synthetic_citations

    docs = _docs(spark, sf_dir)
    edges = citation_edges(synthetic_citations(docs))
    out = hits(edges, docs.select("doc_id"), iterations=5)
    return out.select(
        "doc_id",
        F.round("hub", 9).alias("hub"),
        F.round("authority", 9).alias("authority"),
    )


def q_knn_join(spark, sf_dir):
    """kNN graph over the embedding table (simsearch.knn_join): each
    vector's top-3 neighbors via SRP-banded candidates (directed) +
    exact-cosine rescoring — the semantic-clustering / graph-ANN-build
    primitive; banding replicated bit-for-bit by the DuckDB twin."""
    from .pipeline_ops.simsearch import knn_join

    return knn_join(_embs(spark, sf_dir), k=3, n_planes=16, bands=8, dim=64)

def q_bm25_topk_pagerank(spark, sf_dir):
    """Static-rank blended retrieval (queryeng/staticrank.py): BM25 over
    the standard query set plus alpha·ln(N·pagerank+1) — the classic
    web-search composition of text relevance with a query-independent
    link signal. The blend join is candidate-bounded (after scoring);
    the zero-join scale path denormalizes the offline-refreshed rank
    into the index."""
    from .linkgraph import citation_edges, pagerank, synthetic_citations
    from .queryeng.staticrank import blend_static_rank
    from .registry import _qt, _rounded_rank_topk, get_index
    from .queryeng.bm25 import bm25_score_all

    docs = _docs(spark, sf_dir)
    idx = get_index(spark, sf_dir)
    pr = pagerank(
        citation_edges(synthetic_citations(docs)), docs.select("doc_id"),
        damping=0.85, iterations=5,
    )
    scored = bm25_score_all(
        _qt(spark, stem=False), idx.postings_flat, idx.dictionary,
        idx.doc_stats, idx.avgdl,
    )
    blended = blend_static_rank(scored, pr, n_docs=docs.count(), alpha=0.5)
    return _rounded_rank_topk(blended, 10)


def q_media_meta(spark, sf_dir):
    _ship_package(spark)  # decode runs in Python workers
    return media_meta_pipeline(_docs(spark, sf_dir))


def q_frame_sample(spark, sf_dir):
    from .pipeline_ops.multimodal import attach_fake_blobs, frame_sample

    _ship_package(spark)
    return frame_sample(attach_fake_blobs(_docs(spark, sf_dir)), k=3)


def q_media_ann_topk(spark, sf_dir):
    from .pipeline_ops.multimodal import (
        attach_fake_blobs,
        media_feature_vectors,
    )

    _ship_package(spark)
    feats = media_feature_vectors(attach_fake_blobs(_docs(spark, sf_dir)))
    feats = feats.withColumnRenamed("doc_id", "vec_id")
    queries = feats.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(feats, queries, k=3)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_web_latest_snapshot(spark, sf_dir):
    """URL-keyed snapshot dedup (websnap.latest_snapshot_per_url) over the
    deterministic (url, warc_ts) view of documents — the 'one row per URL'
    ingestion step of a Common-Crawl-style corpus (input_hint shape)."""
    from .pipeline_ops.websnap import latest_snapshot_per_url, snapshot_view

    pages = snapshot_view(load_documents(spark, sf_dir))
    return latest_snapshot_per_url(pages).select("url", "doc_id", "warc_ts")


def q_web_domain_stats(spark, sf_dir):
    """Per-host page/URL counts + mean document size (websnap.domain_stats)
    — the aggregation feeding domain-level quality/spam filtering."""
    from .pipeline_ops.websnap import domain_stats, snapshot_view

    pages = snapshot_view(load_documents(spark, sf_dir))
    return domain_stats(pages).select(
        "host",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_urls").cast("long").alias("n_urls"),
        "avg_chars",
    )


MIX_TARGET = {"src0": 0.4, "src1": 0.2, "src2": 0.2, "src3": 0.2}


def q_domain_mix(spark, sf_dir):
    """Deterministic domain-mixture sampling: per-source keep rates
    derived in-plan from target shares and observed counts
    (pipeline_ops/sampling.py)."""
    from .pipeline_ops.sampling import domain_mix

    docs = load_documents(spark, sf_dir)
    return domain_mix(docs, MIX_TARGET, n_target=100).select(
        "doc_id", "source"
    )


def q_doc_lm_score(spark, sf_dir):
    """Per-doc bigram cross-entropy under the corpus's own MLE model —
    the perplexity-filter primitive (pipeline_ops/textstats.py)."""
    from .pipeline_ops.textstats import doc_lm_score

    out = doc_lm_score(_docs(spark, sf_dir))
    return out.withColumn("cross_entropy", F.round("cross_entropy", 6))


def q_corpus_profile(spark, sf_dir):
    """Per-lang corpus composition report with exact token-length
    quantiles (pipeline_ops/textstats.py)."""
    from .pipeline_ops.textstats import corpus_profile

    out = corpus_profile(load_documents(spark, sf_dir), group_col="lang")
    return out.select(
        "grp", "n_docs", "total_tokens",
        F.round("mean_tokens", 6).alias("mean_tokens"),
        F.round("p25_tokens", 6).alias("p25_tokens"),
        F.round("p50_tokens", 6).alias("p50_tokens"),
        F.round("p90_tokens", 6).alias("p90_tokens"),
    )


def q_event_window_counts(spark, sf_dir):
    """Tumbling event-time window rollup over the events table (6 h
    windows — pipeline_ops/sessions.py; streaming twin in
    streaming/windows.py, stream≡batch pinned in tests)."""
    from .pipeline_ops.sessions import windowed_event_counts

    out = windowed_event_counts(_events(spark, sf_dir), window_minutes=360)
    return out.withColumn("total_value", F.round("total_value", 6))


def q_pack_sequences(spark, sf_dir):
    """Concatenate-and-chunk sequence packing: each doc's global token
    offset and sequence assignment, bucket-parallel prefix sum
    (pipeline_ops/packing.py)."""
    from .pipeline_ops.packing import pack_sequences, token_counts_raw

    tc = token_counts_raw(load_documents(spark, sf_dir))
    return pack_sequences(tc, budget=2048, bucket_size=4096)


def q_packed_stats(spark, sf_dir):
    """Per-sequence packing rollup: docs starting / tokens starting per
    fixed-budget pretraining sequence (pipeline_ops/packing.py)."""
    from .pipeline_ops.packing import (
        pack_sequences,
        packed_stats,
        token_counts_raw,
    )

    tc = token_counts_raw(load_documents(spark, sf_dir))
    return packed_stats(pack_sequences(tc, budget=2048, bucket_size=4096))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization over the events table (6 h gap —
    pipeline_ops/sessions.py)."""
    from .pipeline_ops.sessions import sessionize

    return sessionize(_events(spark, sf_dir), gap_minutes=360).select(
        "event_id", "user_id", "session_idx"
    )


def q_session_stats(spark, sf_dir):
    """Per-session rollup: counts, bounds, duration, value sum
    (pipeline_ops/sessions.py)."""
    from .pipeline_ops.sessions import session_stats

    s = session_stats(_events(spark, sf_dir), gap_minutes=360)
    return s.select(
        "user_id", "session_idx", "n_events",
        F.unix_timestamp("start_ts").alias("start_s"),
        F.unix_timestamp("end_ts").alias("end_s"),
        "duration_s", "total_value",
    )


def q_dedup_containment(spark, sf_dir):
    """Directed containment pairs (dedup.containment_pairs): doc_a's
    shingle set >= 90% inside doc_b's — the quote-inclusion /
    boilerplate-wrapper near-dup class Jaccard misses."""
    from .pipeline_ops.dedup import containment_pairs

    return containment_pairs(_docs(spark, sf_dir), n=2, tau=0.9).select(
        "doc_a", "doc_b", F.round("containment", 6).alias("containment")
    )


def q_dedup_containment_lsh(spark, sf_dir):
    """Scale-path containment: banded-MinHash candidates, directionally
    verified by candidate-bounded exact containment
    (dedup.containment_lsh_pairs)."""
    from .pipeline_ops.dedup import containment_lsh_pairs

    return containment_lsh_pairs(
        _docs(spark, sf_dir), n=2, k=16, bands=8, tau=0.9
    ).select(
        "doc_a", "doc_b", F.round("containment", 6).alias("containment")
    )


def q_snapshot_diff(spark, sf_dir):
    """Per-URL diff of the two latest crawl snapshots
    (websnap.snapshot_diff) — the incremental-crawl primitive feeding
    merge_serving_delta with only changed/new pages."""
    from .pipeline_ops.websnap import snapshot_diff, snapshot_view

    pages = snapshot_view(load_documents(spark, sf_dir), with_text=True)
    return snapshot_diff(pages)


def q_crawl_schedule(spark, sf_dir):
    """Crawl frontier schedule (pipeline_ops/crawl.crawl_schedule):
    per-URL change rates from the full snapshot history (adjacent-digest
    lag window), Laplace-smoothed rate × staleness priority, host-pinned
    seeded-md5 fetcher shards, one-fetch-per-host-per-round politeness
    ranks, per-fetcher fetch order — every window host- or fetcher-
    partitioned, the only global quantity a broadcast 1-row max(ts)."""
    from .pipeline_ops.crawl import crawl_schedule
    from .pipeline_ops.websnap import snapshot_view

    pages = snapshot_view(load_documents(spark, sf_dir), with_text=True)
    return crawl_schedule(pages, n_fetchers=4)


def q_related_items(spark, sf_dir):
    """Co-session item suggestions (sessions.related_items) — "people
    also searched for" over the events log: per-session distinct items
    (payload k property), item-asc basket cap bounding the only
    quadratic step, observed-pairs-only lift ranking."""
    from .pipeline_ops.sessions import related_items

    return related_items(
        _events(spark, sf_dir), 360, min_pair=2, top_n=5, max_items=20
    )


def q_crawl_traps(spark, sf_dir):
    """Crawl-trap detection (crawl.crawl_traps): hosts whose distinct
    canonical-URL count explodes past their path-stem count (query-id /
    calendar trap signature), over the canonicalized messy-URL fixture
    — one host-keyed aggregate, no text, no joins."""
    from .pipeline_ops.crawl import crawl_traps
    from .pipeline_ops.websnap import messy_url_view, url_canon

    canon = url_canon(messy_url_view(_docs(spark, sf_dir)))
    return crawl_traps(canon, min_urls=10, max_ratio=3.0)


def q_snapshot_retention(spark, sf_dir):
    """Snapshot expiry marking (websnap.snapshot_retention): per-URL
    keep_last newest + first-of-each-UTC-day downsampled history, rest
    expired — the pure retention decision (ILM-style) over the
    (url, ts, id) spine, no text read."""
    from .pipeline_ops.websnap import snapshot_retention, snapshot_view

    pages = snapshot_view(load_documents(spark, sf_dir))
    return snapshot_retention(pages, keep_last=2)


def q_robots_filter(spark, sf_dir):
    """Robots-exclusion filtering (pipeline_ops/crawl.robots_filter):
    RFC 9309 longest-prefix-match rule application over the frontier's
    distinct urls — Allow wins length ties, no-rule urls default to
    allowed — against the deterministic per-host rule fixture
    (crawl.fixture_robots_rules; the raw robots.txt parser
    crawl.robots_rules is pytest-pinned on real robots bodies)."""
    from .pipeline_ops.crawl import fixture_robots_rules, robots_filter
    from .pipeline_ops.websnap import snapshot_view

    urls = (
        snapshot_view(load_documents(spark, sf_dir))
        .select("url").distinct()
    )
    hosts = urls.select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host")
    )
    return robots_filter(urls, fixture_robots_rules(hosts))


def q_domain_quality(spark, sf_dir):
    """Host-level quality rollup + keep/drop flag
    (websnap.domain_quality) — the domain-filter stage of C4/Gopher
    pipelines, composed from the oracled quality_score and lang_id."""
    from .pipeline_ops.textstats import quality_score as _qs
    from .pipeline_ops.websnap import domain_quality, snapshot_view

    d = _docs(spark, sf_dir)
    pages = snapshot_view(load_documents(spark, sf_dir))
    return domain_quality(pages, _qs(d), lang_id(d))


def q_url_canon(spark, sf_dir):
    """URL canonicalization (websnap.url_canon) over the deterministic
    raw-crawl URL fixture (websnap.messy_url_view)."""
    from .pipeline_ops.websnap import messy_url_view, url_canon

    return url_canon(messy_url_view(_docs(spark, sf_dir)))


def q_corpus_clean_web(spark, sf_dir):
    """End-to-end web ingestion pass: canonicalize URLs, keep the latest
    snapshot per CANONICAL url (dedup is only sound after the collapse),
    then gate on quality >= 0.5 and dup_bigram_frac <= 0.2 — the
    C4/Gopher cleaning composition over webtext, each stage individually
    oracled (url_canon, web_latest_snapshot, quality_score,
    repetition_stats)."""
    from .pipeline_ops.textstats import quality_score as _qscore
    from .pipeline_ops.textstats import repetition_stats
    from .pipeline_ops.websnap import (
        latest_snapshot_per_url,
        messy_url_view,
        url_canon,
        warc_ts_expr,
    )

    docs = _docs(spark, sf_dir)
    pages = url_canon(messy_url_view(docs)).withColumn(
        "warc_ts", warc_ts_expr()
    )
    latest = latest_snapshot_per_url(
        pages, url_col="canon_url", ts_col="warc_ts"
    ).select("doc_id", "canon_url")
    qual = _qscore(docs).select("doc_id", "quality")
    rep = repetition_stats(docs).select("doc_id", "dup_bigram_frac")
    return (
        latest.join(qual, "doc_id")
        .join(rep, "doc_id")
        .where((F.col("quality") >= 0.5) & (F.col("dup_bigram_frac") <= 0.2))
        .select("doc_id", "canon_url", "quality", "dup_bigram_frac")
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style within-doc repetition signals
    (textstats.repetition_stats) — in-row only, no shuffle."""
    from .pipeline_ops.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def q_pii_scrub(spark, sf_dir):
    """Regex PII redaction + counts (textstats.pii_scrub) over the
    deterministic PII fixture view (textstats.pii_view)."""
    from .pipeline_ops.textstats import pii_scrub, pii_view

    return pii_scrub(pii_view(_docs(spark, sf_dir)))


def q_span_dedup(spark, sf_dir):
    """C4-style corpus-wide span dedup (dedup.span_dedup): drop repeated
    8-token spans, keep first occurrence, reassemble docs."""
    from .pipeline_ops.dedup import span_dedup

    return span_dedup(_docs(spark, sf_dir), span_tokens=8)


def q_anchor_texts(spark, sf_dir):
    """In-link anchor-term aggregation per destination doc
    (linkgraph.anchor_texts) over the synthetic citation graph."""
    from .linkgraph import anchor_texts, citation_edges, synthetic_citations

    docs = _docs(spark, sf_dir)
    edges = citation_edges(synthetic_citations(docs))
    return anchor_texts(edges, docs, title_tokens=3, min_cnt=2)


def q_ann_quantized_topk(spark, sf_dir):
    """int8-quantized ANN with exact rescoring: approximate int-dot
    candidates (refine*k) over the quantized table, true cosine only on
    candidates (pipeline_ops/simsearch.py — the 4x-memory serving lever)."""
    from .pipeline_ops.simsearch import quantize_embeddings, quantized_topk

    embs = _embs(spark, sf_dir)
    out = quantized_topk(
        quantize_embeddings(embs), embs, _query_vecs(embs), k=5, refine=3
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_centroid_classify(spark, sf_dir):
    """Nearest-centroid (Rocchio) domain classifier: per-label mean
    vectors from the vec_id%5==0 training subset, argmax cosine over the
    broadcast centroids for EVERY vector (pipeline_ops/simsearch.py)."""
    from .pipeline_ops.simsearch import centroid_classify, label_centroids

    embs = load_embeddings(spark, sf_dir).select("vec_id", "embedding", "label")
    cents = label_centroids(embs, labeled=F.col("vec_id") % 5 == 0)
    out = centroid_classify(embs, cents)
    return out.select(
        "vec_id", "pred_label", F.round("cosine", 6).alias("cosine")
    )


def q_cluster_sample(spark, sf_dir):
    """Soft dedup: keep each doc with probability 1/|near-dup cluster|
    via integer-exact seeded-md5 thresholds (pipeline_ops/sampling.py),
    over the MinHash-LSH connected components."""
    from .pipeline_ops.sampling import cluster_sample

    return cluster_sample(_lsh_clusters(_docs(spark, sf_dir)))


def q_bpe_pairs(spark, sf_dir):
    """First BPE training iteration: adjacent char-pair frequencies over
    the corpus word-frequency table (pipeline_ops/tokenizer.py — the
    only corpus-scale stage of tokenizer training)."""
    from .pipeline_ops.tokenizer import char_pair_counts, word_counts

    return char_pair_counts(word_counts(_docs(spark, sf_dir)))


# fixed literal merge list: chained rules (t+h, then th+e) pin the
# order-dependence and within-pass restart semantics of the applier
BPE_MERGES = (
    ("t", "h"), ("th", "e"), ("e", "</w>"), ("s", "</w>"),
    ("i", "n"), ("a", "n"), ("r", "e"), ("o", "n"),
)


def q_bpe_encode(spark, sf_dir):
    """Tokenize-with-trained-tokenizer (tokenizer.bpe_encode): the corpus
    vocabulary encoded under a fixed merge list via one Arrow-batched
    pandas UDF over the DISTINCT-word table (never re-running Python per
    occurrence), exploded to scalar (word, pos, sym) rows. The DuckDB
    oracle unrolls each merge as a recursive leftmost-first pass."""
    from .pipeline_ops.tokenizer import bpe_encode, word_counts

    enc = bpe_encode(
        word_counts(_docs(spark, sf_dir)).select("word"), list(BPE_MERGES)
    )
    return enc.select(
        "word", F.posexplode("tokens").alias("pos", "sym")
    ).select("word", F.col("pos").cast("long").alias("pos"), "sym")


def q_priority_sample(spark, sf_dir):
    """Weighted sampling without replacement (sampling.priority_sample,
    Duffield–Lund–Thorup): top-k by deterministic priority w/u over
    doc length, with the Horvitz–Thompson w_hat column — the
    extrapolatable small-sample primitive for 100 TB corpora."""
    from .pipeline_ops.sampling import priority_sample

    docs = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    return priority_sample(docs, k=50)


def q_length_quantiles(spark, sf_dir):
    """Per-source document-length quantiles from a bottom-k uniform
    sample (pipeline_ops/sketches.quantile_sketch): the mergeable O(k)
    length-distribution profiler behind Gopher-style min/max-length
    gates — k=16 < docs-per-source at sf>=0.01, so the sampling branch
    (not the exact small-group case) is what the oracle verifies."""
    from .pipeline_ops.sketches import quantile_sketch

    docs = load_documents(spark, sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    return quantile_sketch(
        docs, "source", "n_chars", qs=[0.25, 0.5, 0.9], k=16
    )


def q_cardinality_kmv(spark, sf_dir):
    """KMV bottom-k distinct-shingle cardinality per source host
    (pipeline_ops/sketches.kmv_distinct): the crawl-quality pre-filter
    sketch — O(k) state per group, salted two-phase bottom-k, estimate
    (k-1)/U on the kth hash. k=128 < per-source distinct shingles at
    every sf, so the estimator branch (not the exact-count fallback) is
    what the oracle verifies."""
    from .pipeline_ops.dedup import shingles
    from .pipeline_ops.sketches import kmv_distinct

    docs = load_documents(spark, sf_dir)
    sh = shingles(docs.select("doc_id", "text"), n=3)
    keyed = sh.join(docs.select("doc_id", "source"), "doc_id")
    return kmv_distinct(keyed, "source", "shingle", k=128)


def q_readability(spark, sf_dir):
    """Flesch reading-ease (textstats.readability): vowel-group syllable
    heuristic, fixed-window sentence surrogate — the classic readability
    filter feature, all in-row arithmetic."""
    from .pipeline_ops.textstats import readability

    return readability(_docs(spark, sf_dir), words_per_sentence=20)


def q_semdedup(spark, sf_dir):
    """SemDeDup (simsearch.semdedup): k-means-clustered semantic
    near-duplicate marking — within-cell round-6 cosine ≥ tau flags the
    higher vec_id; clusters from the same grain-6 deterministic Lloyd
    training the kmeans_centroids entry oracles."""
    from .pipeline_ops.simsearch import kmeans_centroids, semdedup

    embs = _embs(spark, sf_dir)
    cents = kmeans_centroids(embs, every_m=25, iters=2, grain=6)
    return semdedup(embs, cents, tau=0.3)


def q_boilerplate_strip(spark, sf_dir):
    """Domain-scoped boilerplate removal (dedup.boilerplate_strip — the
    CCNet-style cleaning step): a 'cookie consent banner <source>' header
    is injected into every document (the synthesis the oracle mirrors),
    and the operator must strip exactly the spans frequent within each
    source domain."""
    from .pipeline_ops.dedup import boilerplate_strip

    docs = load_documents(spark, sf_dir).select(
        "doc_id",
        "source",
        F.concat_ws(
            " ", F.lit("cookie consent banner"), F.col("source"),
            F.col("text"),
        ).alias("text"),
    )
    return boilerplate_strip(docs, span_tokens=4, min_docs=5, min_frac=0.5)


def q_heavy_hitters(spark, sf_dir):
    """CMS heavy hitters (pipeline_ops/sketches.py): top-10 users by
    Count-Min-estimated event count — the fixed-size mergeable sketch a
    query-log / abuse monitor keeps at stream scale; estimates are
    deterministic (seeded md5) and replayed exactly by the SQL twin."""
    from .pipeline_ops.sketches import cms_heavy_hitters

    return cms_heavy_hitters(
        _events(spark, sf_dir), "user_id", depth=4, width=64, top_n=10
    )


def q_corpus_recipe(spark, sf_dir):
    """End-to-end training-data recipe (pipeline_ops/recipe.py): clean
    (en ∩ quality≥0.5 ∩ near-dup canonical) → decontaminate vs the
    doc_id%37 eval set → fill a 2k-token budget. One call, one oracle,
    every stage replayed."""
    from .pipeline_ops.recipe import corpus_recipe

    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    return corpus_recipe(docs, ev, 2_000)


def q_token_budget_sample(spark, sf_dir):
    """Token-budget mix sampling (pipeline_ops/sampling.py): fill a
    20k-token budget from the documents table in seeded-md5 order —
    hash-threshold pre-filter when the corpus exceeds the budget, exact
    running-total trim; overshoots by at most one doc."""
    from .pipeline_ops.sampling import token_budget_sample

    return token_budget_sample(_docs(spark, sf_dir), 20_000)


OPS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "heavy_hitters": q_heavy_hitters,
    "token_budget_sample": q_token_budget_sample,
    "corpus_recipe": q_corpus_recipe,
    "bpe_pairs": q_bpe_pairs,
    "bpe_encode": q_bpe_encode,
    "cluster_sample": q_cluster_sample,
    "centroid_classify": q_centroid_classify,
    "doc_tf_vectors": q_doc_tf_vectors,
    "topical_shards": q_topical_shards,
    "ann_quantized_topk": q_ann_quantized_topk,
    "sessionize": q_sessionize,
    "session_stats": q_session_stats,
    "hash_split": q_hash_split,
    "stratified_sample": q_stratified_sample,
    "decontaminate": q_decontaminate,
    "decontaminate_bloom": q_decontaminate_bloom,
    "exact_dedup": q_exact_dedup,
    "dedup_jaccard": q_dedup_jaccard,
    "minhash_signatures": q_minhash_signatures,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "corpus_clean": q_corpus_clean,
    "simhash": q_simhash,
    "dedup_simhash": q_dedup_simhash,
    "token_stats": q_token_stats,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "fingerprints": q_fingerprints,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_cosine_topk_filtered": q_ann_cosine_topk_filtered,
    "hybrid_topk": q_hybrid_topk,
    "fusion_topk": q_fusion_topk,
    "emb_cosine_pairs": q_emb_cosine_pairs,
    "emb_lsh_pairs": q_emb_lsh_pairs,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_recall": q_ann_ivf_recall,
    "kmeans_centroids": q_kmeans_centroids,
    "ann_ivf_topk_persisted": q_ann_ivf_topk_persisted,
    "ann_ivf_topk_delta": q_ann_ivf_topk_delta,
    "chunk_docs": q_chunk_documents,
    "blocklist_filter": q_blocklist_filter,
    "passage_topk": q_passage_topk,
    "media_meta": q_media_meta,
    "citation_edges": q_citation_edges,
    "pagerank": q_pagerank,
    "trustrank": q_trustrank,
    "dsir_weights": q_dsir_weights,
    "hits": q_hits,
    "bm25_topk_pagerank": q_bm25_topk_pagerank,
    "knn_join": q_knn_join,
    "cocitation": q_cocitation,
    "bib_coupling": q_bib_coupling,
    "frame_sample": q_frame_sample,
    "media_ann_topk": q_media_ann_topk,
    "web_latest_snapshot": q_web_latest_snapshot,
    "web_domain_stats": q_web_domain_stats,
    "domain_mix": q_domain_mix,
    "doc_lm_score": q_doc_lm_score,
    "corpus_profile": q_corpus_profile,
    "event_window_counts": q_event_window_counts,
    "pack_sequences": q_pack_sequences,
    "packed_stats": q_packed_stats,
    "repetition_stats": q_repetition_stats,
    "pii_scrub": q_pii_scrub,
    "span_dedup": q_span_dedup,
    "anchor_texts": q_anchor_texts,
    "url_canon": q_url_canon,
    "corpus_clean_web": q_corpus_clean_web,
    "dedup_containment": q_dedup_containment,
    "dedup_containment_lsh": q_dedup_containment_lsh,
    "snapshot_diff": q_snapshot_diff,
    "crawl_schedule": q_crawl_schedule,
    "robots_filter": q_robots_filter,
    "related_items": q_related_items,
    "snapshot_retention": q_snapshot_retention,
    "crawl_traps": q_crawl_traps,
    "domain_quality": q_domain_quality,
    "cardinality_kmv": q_cardinality_kmv,
    "priority_sample": q_priority_sample,
    "length_quantiles": q_length_quantiles,
    "boilerplate_strip": q_boilerplate_strip,
    "semdedup": q_semdedup,
    "readability": q_readability,
}

OPS_ORACLE_SQL: dict[str, str] = {
    "heavy_hitters": osqlo.sql_heavy_hitters(4, 64, 10),
    "token_budget_sample": osqlo.sql_token_budget_sample(20_000),
    "corpus_recipe": osqlo.sql_corpus_recipe(2_000),
    "sessionize": osqlo.sql_sessionize(360),
    "session_stats": osqlo.sql_session_stats(360),
    "hash_split": osqlo.sql_hash_split(SPLIT_WEIGHTS),
    "stratified_sample": osqlo.sql_stratified_sample(SAMPLE_RATES, 0.1),
    "decontaminate": osqlo.sql_decontaminate(3, 1, 37),
    "decontaminate_bloom": osqlo.sql_decontaminate_bloom(3, 1 << 16, 4, 37),
    "exact_dedup": osqlo.sql_exact_dedup(),
    "dedup_jaccard": osqlo.sql_jaccard_pairs(2, 0.8),
    "minhash_signatures": osqlo.sql_minhash_signatures(2, 16),
    "dedup_minhash_lsh": osqlo.sql_minhash_lsh_pairs(2, 16, 8, 0.8),
    "dedup_clusters": osqlo.sql_dedup_clusters(2, 16, 8, 0.8),
    "corpus_clean": osqlo.sql_corpus_clean(0.5, "en", 2, 16, 8, 0.8),
    "simhash": osqlo.sql_simhash(),
    "dedup_simhash": osqlo.sql_simhash_pairs(3, 4),
    "token_stats": osqlo.sql_token_stats(),
    "lang_id": osqlo.sql_lang_id(),
    "quality_score": osqlo.sql_quality_score(),
    "fingerprints": osqlo.sql_fingerprints(3, 4),
    "ann_cosine_topk": osqlo.sql_cosine_topk(5, 50),
    "ann_cosine_topk_filtered": osqlo.sql_cosine_topk(5, 50, "a.label % 2 = 0"),
    "hybrid_topk": osqlo.sql_hybrid_topk(10),
    "fusion_topk": osqlo.sql_fusion_topk(10),
    "emb_cosine_pairs": osqlo.sql_cosine_pairs(0.4),
    "emb_lsh_pairs": osqlo.sql_srp_lsh_pairs(0.4, 16, 8, 64),
    "ann_ivf_topk": osqlo.sql_ivf_topk(5, 50, 2, 25),
    "ann_ivf_recall": osqlo.sql_ann_recall(5, 50, 2, 25),
    "kmeans_centroids": osqlo.sql_kmeans_centroids(25, 2, 6),
    "ann_ivf_topk_persisted": osqlo.sql_ivf_topk(5, 50, 2, 25),
    "ann_ivf_topk_delta": osqlo.sql_ivf_topk(5, 50, 2, 25),
    "chunk_docs": osqlo.sql_chunk_documents(32, 16),
    "blocklist_filter": osqlo.sql_blocklist_filter(BLOCKLIST),
    "passage_topk": osqlo.sql_passage_topk(32, 16, 10),
    "media_meta": osqlo.sql_media_meta(),
    "citation_edges": osqlo.sql_citation_edges(),
    "pagerank": osqlo.sql_pagerank(0.85, 5),
    "trustrank": osqlo.sql_trustrank(0.85, 5, 17),
    "dsir_weights": osqlo.sql_dsir_weights(4096, 1.0, 23),
    "hits": osqlo.sql_hits(5),
    "bm25_topk_pagerank": osqlo.sql_bm25_topk_pagerank(0.85, 5, 0.5, 10),
    "knn_join": osqlo.sql_knn_join(3, 16, 8, 64),
    "cocitation": osqlo.sql_cocitation(2),
    "bib_coupling": osqlo.sql_bib_coupling(2),
    "frame_sample": osqlo.sql_frame_sample(3),
    "media_ann_topk": osqlo.sql_media_ann_topk(3, 50, 8),
    "web_latest_snapshot": osqlo.sql_web_latest_snapshot(),
    "web_domain_stats": osqlo.sql_web_domain_stats(),
    "domain_mix": osqlo.sql_domain_mix(MIX_TARGET, 100),
    "doc_lm_score": osqlo.sql_doc_lm_score(),
    "corpus_profile": osqlo.sql_corpus_profile("lang"),
    "event_window_counts": osqlo.sql_windowed_event_counts(360),
    "pack_sequences": osqlo.sql_pack_sequences(2048),
    "packed_stats": osqlo.sql_packed_stats(2048),
    "repetition_stats": osqlo.sql_repetition_stats(),
    "pii_scrub": osqlo.sql_pii_scrub(),
    "span_dedup": osqlo.sql_span_dedup(8),
    "anchor_texts": osqlo.sql_anchor_texts(3, 2),
    "url_canon": osqlo.sql_url_canon(),
    "corpus_clean_web": osqlo.sql_corpus_clean_web(0.5, 0.2),
    "dedup_containment": osqlo.sql_containment_pairs(2, 0.9),
    "dedup_containment_lsh": osqlo.sql_containment_lsh_pairs(2, 16, 8, 0.9),
    "snapshot_diff": osqlo.sql_snapshot_diff(),
    "crawl_schedule": osqlo.sql_crawl_schedule(4),
    "robots_filter": osqlo.sql_robots_filter(),
    "related_items": osqlo.sql_related_items(360, 2, 5, 20),
    "snapshot_retention": osqlo.sql_snapshot_retention(2),
    "crawl_traps": osqlo.sql_crawl_traps(10, 3.0),
    "domain_quality": osqlo.sql_domain_quality(0.5, 0.5),
    "cardinality_kmv": osqlo.sql_cardinality_kmv(3, 128),
    "priority_sample": osqlo.sql_priority_sample(50),
    "length_quantiles": osqlo.sql_length_quantiles([0.25, 0.5, 0.9], 16),
    "bpe_pairs": osqlo.sql_bpe_pairs(),
    "bpe_encode": osqlo.sql_bpe_encode(BPE_MERGES),
    "cluster_sample": osqlo.sql_cluster_sample(2, 16, 8, 0.8),
    "centroid_classify": osqlo.sql_centroid_classify(5),
    "doc_tf_vectors": osqlo.sql_doc_tf_vectors(16),
    "topical_shards": osqlo.sql_topical_shards(4, 2, 6),
    "ann_quantized_topk": osqlo.sql_quantized_topk(5, 50, 3),
    "boilerplate_strip": osqlo.sql_boilerplate_strip(4, 5, 0.5),
    "semdedup": osqlo.sql_semdedup(25, 2, 6, 0.3),
    "readability": osqlo.sql_readability(20),
}
