"""Scale-shape tests for the dedup/ANN pipeline operators.

The correctness of these operators is covered by the DuckDB contract tests
(test_driver_contract.py); these tests pin the PHYSICAL shape — that the
LSH verify paths are candidate-bounded (no all-pairs join survives in the
optimized plan once candidates are supplied) and that the SRP LSH scale
path loses nothing vs brute force on the fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.pipeline_ops import (
    cosine_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
    srp_lsh_pairs,
)
from themis_search_engine_spark.pipeline_ops.simsearch import srp_signature

SF_DIR = "/root/testdata/sf0.001"


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_jaccard_verify_is_candidate_bounded(spark, tiny_docs_df):
    """With candidates supplied, the verify plan must contain NO all-pairs
    shingle self-join. Marker: the all-pairs path is the only one that
    filters on (doc_a < doc_b) — the candidate path never forms an
    unordered pair, so the '<' predicate must be absent."""
    cand = spark.createDataFrame([(0, 2)], "doc_a long, doc_b long")
    bounded = jaccard_pairs(tiny_docs_df, n=2, tau=0.1, candidates=cand)
    assert "< doc_b" not in _optimized_plan(bounded)

    # sanity: the marker detects the all-pairs shape
    unbounded = jaccard_pairs(tiny_docs_df, n=2, tau=0.1)
    assert "< doc_b" in _optimized_plan(unbounded)


def test_jaccard_candidates_match_allpairs_restriction(spark, tiny_docs_df):
    """Candidate-bounded verify == all-pairs output restricted to the
    candidate list (same jaccard values, no spurious rows)."""
    full = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in jaccard_pairs(tiny_docs_df, n=2, tau=0.0).collect()
    }
    assert full, "fixture must produce at least one overlapping pair"
    pairs = sorted(full)[:3] + [(0, 5)]  # mix real pairs + a non-pair
    cand = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in jaccard_pairs(
            tiny_docs_df, n=2, tau=0.0, candidates=cand
        ).collect()
    }
    expect = {p: full[p] for p in pairs if p in full}
    assert got == expect


def test_minhash_lsh_verify_plan(spark, tiny_docs_df):
    """End-to-end LSH: the full pipeline's optimized plan has no shingle
    self-join in the verify stage — the only '<' comparison left is the
    band-join candidate ordering (doc_a over band/key columns)."""
    df = minhash_lsh_pairs(tiny_docs_df, n=2, k=16, bands=8, tau=0.1)
    plan = _optimized_plan(df)
    # exactly one unordered-pair formation: the banded candidate join
    assert plan.count("< doc_b") == 1


def test_cosine_pairs_candidate_bounded_plan(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cand = spark.createDataFrame([(1, 2)], "vec_a long, vec_b long")
    plan = _optimized_plan(cosine_pairs(embs, tau=0.0, candidates=cand))
    assert "< vec_b" not in plan
    assert "Cross" not in plan  # no cartesian in the bounded path


def test_srp_lsh_full_recall_on_fixture(spark):
    """SRP LSH (16 planes, 8 bands) finds every true pair at tau=0.4 on the
    fixture — deterministic construction, so this pins exact equality, and
    candidate generation prunes the quadratic pair space."""
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    exact = {
        (r.vec_a, r.vec_b, round(r.cosine, 6))
        for r in cosine_pairs(embs, tau=0.4).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b, round(r.cosine, 6))
        for r in srp_lsh_pairs(
            embs, tau=0.4, n_planes=16, bands=8, dim=64
        ).collect()
    }
    assert exact == lsh
    assert len(exact) > 0


def test_srp_signature_deterministic(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).limit(50)
    a = dict(srp_signature(embs, 16, 64).collect())
    b = dict(srp_signature(embs, 16, 64).collect())
    assert a == b
    assert all(0 <= v < (1 << 16) for v in a.values())


def test_connected_components_chain_and_singletons(spark):
    """A transitive chain 1-2-3-4-5 collapses to one cluster labeled by its
    min id; disconnected pair and singletons stay separate. Chains are the
    case pairwise dedup under-deletes on — the clustering op exists for
    exactly this."""
    from themis_search_engine_spark.pipeline_ops import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    got = dict(
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, nodes).collect()
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   6: 6, 7: 7, 8: 8, 9: 8, 10: 10}


def test_connected_components_long_path_converges_fast(spark):
    """Pointer-jumping compression: a 64-node path needs ~log2(64)+1 rounds,
    not 64 — max_iterations=8 must suffice (plain HashMin would need 63)."""
    from themis_search_engine_spark.pipeline_ops import connected_components

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = connected_components(pairs, nodes, max_iterations=8)
    assert {r.cluster_id for r in got.collect()} == {0}


def test_connected_components_matches_lsh_pair_closure(spark, tiny_docs_df):
    """Cluster labels = transitive closure of the LSH near-dup pairs."""
    from themis_search_engine_spark.pipeline_ops import connected_components

    pairs = minhash_lsh_pairs(tiny_docs_df, n=2, k=16, bands=8, tau=0.1)
    nodes = tiny_docs_df.select("doc_id")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            pairs.select("doc_a", "doc_b"), nodes
        ).collect()
    }
    # python-side union-find oracle
    parent = {r.doc_id: r.doc_id for r in nodes.collect()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.select("doc_a", "doc_b").collect():
        ra, rb = find(r.doc_a), find(r.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    # union-find roots are not guaranteed min-of-component; normalize
    comp = {}
    for x, r in want.items():
        comp.setdefault(r, []).append(x)
    want = {x: min(members) for r, members in comp.items() for x in members}
    assert got == want


def test_latest_snapshot_per_url(spark):
    """Newest warc_ts wins per url; ts tie → greatest doc_id wins; all
    input columns survive; plan carries WindowGroupLimit (rank-1 limit
    below the sort, no full per-url sort)."""
    from themis_search_engine_spark.pipeline_ops.websnap import (
        latest_snapshot_per_url,
    )

    rows = [
        (1, "https://a.example.org/x", 100, "v1"),
        (2, "https://a.example.org/x", 300, "v3"),   # newest → wins
        (3, "https://a.example.org/x", 200, "v2"),
        (4, "https://b.example.org/y", 500, "old"),
        (5, "https://b.example.org/y", 500, "tie"),  # ts tie → max id wins
        (6, "https://c.example.org/z", 7, "only"),
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long, text string"
    )
    got = {
        r["url"]: (r["doc_id"], r["text"])
        for r in latest_snapshot_per_url(pages).collect()
    }
    assert got == {
        "https://a.example.org/x": (2, "v3"),
        "https://b.example.org/y": (5, "tie"),
        "https://c.example.org/z": (6, "only"),
    }
    plan = latest_snapshot_per_url(pages)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_domain_stats_and_snapshot_view(spark):
    """domain_stats invariants over the deterministic snapshot view:
    Σ n_pages = corpus size, host = <source>.example.org, n_urls ≤ 7 per
    host (doc_id % 7 residues), and the HLL form keeps the same grouping."""
    from themis_search_engine_spark.corpus import load_documents
    from themis_search_engine_spark.pipeline_ops.websnap import (
        domain_stats,
        snapshot_view,
    )

    docs = load_documents(spark, SF_DIR)
    n_docs = docs.count()
    pages = snapshot_view(docs)
    stats = domain_stats(pages).collect()
    assert sum(r["n_pages"] for r in stats) == n_docs
    assert all(r["host"].endswith(".example.org") for r in stats)
    assert all(1 <= r["n_urls"] <= 7 for r in stats)
    hll = domain_stats(pages, exact_urls=False)
    assert {r["host"] for r in hll.collect()} == {r["host"] for r in stats}


def test_ivf_kmeans_trained(spark):
    """Deterministic Lloyd refinement: same input → identical centroids
    across runs (no RNG), centroid count preserved (empty cells keep their
    previous vector), and the trained IVF index keeps recall@k against
    brute-force cosine at least as high as the untrained one on the
    fixture (both probe the same n_probe)."""
    from themis_search_engine_spark.corpus import load_embeddings
    from themis_search_engine_spark.pipeline_ops import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    embs = load_embeddings(spark, SF_DIR).select("vec_id", "embedding")
    c1 = kmeans_centroids(embs, every_m=25, iters=2)
    c2 = kmeans_centroids(embs, every_m=25, iters=2)
    rows1 = sorted(
        (r["centroid_id"], tuple(round(v, 9) for v in r["centroid_vec"]))
        for r in c1.collect()
    )
    rows2 = sorted(
        (r["centroid_id"], tuple(round(v, 9) for v in r["centroid_vec"]))
        for r in c2.collect()
    )
    assert rows1 == rows2
    n_init = embs.where(F.col("vec_id") % 25 == 0).count()
    assert len(rows1) == n_init

    queries = embs.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(embs, queries, k=5).collect()
    }

    def recall(train_iters: int) -> float:
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                embs, queries, k=5, every_m=25, n_probe=2,
                train_iters=train_iters,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r2_ = recall(0), recall(2)
    # Lloyd optimizes quantization error, not this query set's recall, so
    # strict monotonicity is NOT guaranteed (measured 0.96 → 0.92 on the
    # fixture); both variants must stay high-recall ANN (loss comes only
    # from n_probe cell pruning)
    assert r0 >= 0.9, r0
    assert r2_ >= 0.9, r2_


def test_filtered_cosine_topk_refill(spark):
    """Filtered vector search refills with next-best MATCHING vectors:
    every hit satisfies the predicate and the result still has k rows
    (post-filtering the unfiltered top-k would not)."""
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        cosine_topk,
        filtered_cosine_topk,
    )

    # vec 0 is the query; vecs 1-2 (odd label) are nearest, 3-6 (even
    # label) progressively farther — an even-label filter must drop 1-2
    # and surface 3-5, not return 1 row.
    rows = [
        (0, [1.0, 0.0, 0.0], 1),
        (1, [0.99, 0.1, 0.0], 1),
        (2, [0.98, 0.15, 0.0], 3),
        (3, [0.9, 0.3, 0.0], 0),
        (4, [0.8, 0.5, 0.0], 2),
        (5, [0.6, 0.7, 0.0], 4),
        (6, [0.1, 0.9, 0.1], 6),
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    qv = embs.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    filt = filtered_cosine_topk(
        embs, qv, F.col("label") % 2 == 0, k=3
    ).collect()
    # query vec 0 has odd label → excluded too; even-label by cosine
    # order is 3 > 4 > 5
    assert [r["vec_id"] for r in sorted(filt, key=lambda r: r["rank"])] == [3, 4, 5]
    labels = {r[0]: r[2] for r in rows}
    assert len(filt) == 3 and all(labels[r["vec_id"]] % 2 == 0 for r in filt)
    unfilt = cosine_topk(embs, qv, k=3).collect()
    post = [r for r in unfilt if labels[r["vec_id"]] % 2 == 0]
    assert len(post) < 3  # post-filter loses rows; pre-filter refilled


def test_sessionize_gap_semantics(spark):
    """Session numbering: gap STRICTLY greater than the threshold starts
    a new session; equal-ts events order by event_id."""
    from datetime import datetime

    from themis_search_engine_spark.pipeline_ops.sessions import (
        session_stats,
        sessionize,
    )

    T = datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes, sec=0):
        from datetime import timedelta

        return T + timedelta(minutes=minutes, seconds=sec)

    rows = [
        # user 1: events at 0, 10, 40 (gap 30 == threshold → SAME
        # session), 71 (gap 31 > threshold → new session)
        (1, 1, at(0), 1.0),
        (2, 1, at(10), 2.0),
        (3, 1, at(40), 3.0),
        (4, 1, at(71), 4.0),
        # user 2: two events with the same timestamp (tie on event_id)
        (5, 2, at(0), 1.0),
        (6, 2, at(0), 1.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    s = sessionize(events, gap_minutes=30).collect()
    idx = {r["event_id"]: r["session_idx"] for r in s}
    assert idx == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1}
    st = session_stats(events, gap_minutes=30).collect()
    by = {(r["user_id"], r["session_idx"]): r for r in st}
    assert by[(1, 1)]["n_events"] == 3 and by[(1, 1)]["duration_s"] == 2400
    assert by[(1, 2)]["n_events"] == 1 and by[(1, 2)]["duration_s"] == 0
    assert by[(1, 1)]["total_value"] == 6.0
    assert by[(2, 1)]["n_events"] == 2


def test_ivf_persisted_matches_inmemory_and_prunes(spark, tmp_path):
    """Persisted partitionBy(cell) IVF returns EXACTLY the in-memory
    ivf_topk results, and the probed-cell filter is directory-level
    partition pruning (only probed cell dirs are read)."""
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_persisted,
    )

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qv = embs.where("vec_id % 50 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    p = str(tmp_path / "ivf")
    build_ivf_index(embs, p, every_m=25)
    got = ivf_topk_persisted(spark, p, qv, k=5, n_probe=2)
    want = ivf_topk(embs, qv, k=5, every_m=25, n_probe=2)
    key = lambda rows: sorted(
        (r["query_id"], r["vec_id"], round(r["cosine"], 6), r["rank"])
        for r in rows
    )
    assert key(got.collect()) == key(want.collect())
    # partition pruning: the probed-cell IN filter is a PartitionFilter
    # on the vectors scan, and the pruned single-source scan reads only
    # probed cell dirs (input_file_name can't run on the joined plan —
    # probe the scan itself with the same filter)
    import os
    import re

    plan = got._jdf.queryExecution().toString()
    # the probed-cell filter lands as a partition filter (INSET) on the
    # vectors scan; the literal list is truncated in toString, so derive
    # the probed set from the same deterministic assignment
    assert re.search(r"PartitionFilters: \[cell#\d+ INSET", plan)
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        assign_cells,
    )

    centroids = spark.read.parquet(f"{p}/centroids")
    probed = {
        r["cell"]
        for r in assign_cells(
            qv.withColumnRenamed("query_vec", "embedding")
            .withColumnRenamed("query_id", "vec_id"),
            centroids, n_probe=2,
        ).select("cell").distinct().collect()
    }
    all_cells = {
        int(d.split("=")[1])
        for d in os.listdir(f"{p}/vectors")
        if d.startswith("cell=")
    }
    assert probed < all_cells  # genuinely pruned, not all-cells
    vecs = spark.read.parquet(f"{p}/vectors").where(
        F.col("cell").isin(sorted(probed))
    )
    files = [
        r.f
        for r in vecs.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    read_cells = {
        int(f.split("/vectors/")[1].split("/")[0].split("=")[1])
        for f in files
    }
    assert read_cells == probed


def test_sampling_ops_deterministic_and_semantics(spark):
    from themis_search_engine_spark.pipeline_ops.sampling import (
        decontaminate,
        hash_split,
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"unique text number {i} alpha beta", "en" if i % 2 else "de")
         for i in range(200)],
        "doc_id long, text string, lang string",
    )
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b and set(a.values()) == {"train", "val", "test"}
    # roughly weight-proportional (hash uniformity, wide tolerance)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 120 <= n_train <= 190
    s1 = {r["doc_id"] for r in stratified_sample(docs, {"en": 1.0, "de": 0.0}).collect()}
    assert s1 == {i for i in range(200) if i % 2}  # rate 1.0 keeps all en, 0.0 drops de
    with __import__("pytest").raises(ValueError):
        hash_split(docs, {"train": 0.5, "val": 0.1})

    # decontamination: doc 0's text placed verbatim in the eval set →
    # doc 0 dropped, disjoint docs survive
    ev = spark.createDataFrame(
        [(9000, "unique text number 0 alpha beta")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in decontaminate(docs, ev, n=5).collect()}
    assert 0 not in kept
    # docs sharing only shorter overlaps (<5-gram) survive
    assert len(kept) >= 150


def test_degenerate_sampling_oracles_are_valid_sql():
    """Single-split hash_split and empty-rates stratified_sample must
    emit parseable SQL (a CASE with zero WHENs is invalid)."""
    import duckdb

    from themis_search_engine_spark import oracle_sql_ops as o

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.sql(o.sql_hash_split({"all": 1.0})).fetchall()
    assert len(rows) == 500 and all(r[1] == "all" for r in rows)
    rows = con.sql(o.sql_stratified_sample({}, 0.1)).fetchall()
    assert 20 <= len(rows) <= 90  # ~10% of 500 by hash


def test_domain_mix_caps_and_rates(spark):
    """domain_mix: a source whose target share exceeds its size is kept
    WHOLE (rate capped at 1); zero-weight sources vanish; the sample is
    deterministic across invocations."""
    from themis_search_engine_spark.pipeline_ops.sampling import domain_mix

    rows = [(i, f"s{i % 4}") for i in range(200)]  # 50 docs per source
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    target = {"s0": 0.9, "s1": 0.1}  # s2/s3 default to weight 0
    out = domain_mix(docs, target, n_target=100)
    got = {(r.doc_id, r.source) for r in out.select("doc_id", "source").collect()}
    srcs = {}
    for _d, s in got:
        srcs[s] = srcs.get(s, 0) + 1
    # s0: rate min(1, 90/50) = 1 → all 50 kept; s1: rate 10/50 = 0.2
    assert srcs.get("s0") == 50
    assert 0 < srcs.get("s1", 0) < 25
    assert "s2" not in srcs and "s3" not in srcs
    again = {(r.doc_id, r.source) for r in out.collect()}
    assert got == again


def test_doc_lm_score_hand_computed(spark):
    """Bigram cross-entropy on a 3-doc corpus, checked against a
    hand-computed MLE model; a 1-token doc has no bigrams and is absent."""
    import math

    from themis_search_engine_spark.pipeline_ops.textstats import doc_lm_score

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    # model: c(a,b)=3 c(b,a)=1 c(b,c)=1 ; c(a,·)=3 c(b,·)=2
    # doc0: bigrams ab, ba, ab → -(2·log2(3/3) + 1·log2(1/2))/3 = 1/3
    # doc1: ab, bc → -(log2(1) + log2(1/2))/2 = 1/2
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in doc_lm_score(docs).collect()
    }
    assert set(got) == {0, 1}
    assert got[0][0] == 3 and math.isclose(got[0][1], 1 / 3, rel_tol=1e-12)
    assert got[1][0] == 2 and math.isclose(got[1][1], 1 / 2, rel_tol=1e-12)


def test_repetition_stats_hand_computed(spark):
    from themis_search_engine_spark.pipeline_ops.textstats import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (0, "a a a a"),          # 4 tokens, 1 distinct; bigrams all "a a"
            (1, "x y x y x"),        # bigrams: xy yx xy yx -> 2 distinct of 4
            (2, "one"),              # no bigrams
            (3, ""),                 # no tokens
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[0]["n_tokens"] == 4
    assert rows[0]["dup_token_frac"] == 0.75
    assert rows[0]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert rows[0]["top_bigram_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 0.5
    assert rows[1]["top_bigram_frac"] == 0.5
    assert rows[2]["n_tokens"] == 1
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["dup_token_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from themis_search_engine_spark.pipeline_ops.textstats import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "mail a.b-c@host.example.org then 192.168.0.1 and "
                "+44-123-4567 done"),
            (1, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[0]["n_emails"] == 1
    assert rows[0]["n_ips"] == 1
    assert rows[0]["n_phones"] == 1
    assert rows[0]["clean_text"] == (
        "mail <EMAIL> then <IP> and <PHONE> done"
    )
    assert rows[1]["clean_text"] == "no pii here at all"
    assert rows[1]["n_emails"] == 0


def test_span_dedup_keeps_first_occurrence(spark):
    from themis_search_engine_spark.pipeline_ops.dedup import span_dedup

    span = "w1 w2 w3 w4"  # span_tokens=4 for the test
    df = spark.createDataFrame(
        [
            (0, f"{span} unique tail of doc zero"),
            (1, f"{span} different ending here now"),   # dup of doc 0 span 0
            (2, f"{span} {span}"),                      # in-doc duplicate
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in span_dedup(df, span_tokens=4).collect()
    }
    # doc 0 is the first occurrence everywhere: nothing removed
    assert rows[0]["n_dup_spans"] == 0
    assert rows[0]["clean_text"].startswith(span)
    # doc 1 loses its leading span but keeps its tail
    assert rows[1]["n_spans"] == 2
    assert rows[1]["n_dup_spans"] == 1
    assert rows[1]["clean_text"] == "different ending here now"
    # doc 2: both spans are duplicates (of doc 0's and of each other)
    assert rows[2]["n_dup_spans"] == 2
    assert rows[2]["clean_text"] == ""


def test_anchor_texts_counts_and_floor(spark):
    from themis_search_engine_spark.linkgraph import anchor_texts

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma rest of zero"),
            (1, "alpha beta delta rest of one"),
            (2, "epsilon zeta eta rest of two"),
            (3, "target page body text here"),
        ],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame(
        [(0, 3, 1), (1, 3, 1), (2, 3, 1), (0, 2, 1)],
        "src long, dst long, weight long",
    )
    out = {
        (r["doc_id"], r["term"]): r
        for r in anchor_texts(edges, docs, title_tokens=3, min_cnt=2).collect()
    }
    # 'alpha' and 'beta' arrive at doc 3 from both src 0 and src 1
    assert out[(3, "alpha")]["anchor_cnt"] == 2
    assert out[(3, "alpha")]["n_srcs"] == 2
    assert out[(3, "beta")]["anchor_cnt"] == 2
    # hapax anchors (gamma, delta, epsilon...) are floored out by min_cnt=2
    assert (3, "gamma") not in out
    assert (2, "alpha") not in out  # single link 0->2


def test_url_canon_rules(spark):
    from themis_search_engine_spark.pipeline_ops.websnap import url_canon

    cases = [
        (0, "HTTP://WWW.Host.COM:80/a/b/?utm_source=x&q=1#frag",
            "http://host.com/a/b?q=1"),
        (1, "https://host.com:443/a", "https://host.com/a"),
        (2, "https://host.com:8443/a", "https://host.com:8443/a"),
        (3, "http://host.com/?utm_a=1&utm_b=2", "http://host.com"),
        (4, "http://www.host.com/path/", "http://host.com/path"),
        (5, "http://host.com/p?id=3&utm_c=9", "http://host.com/p?id=3"),
        # utm_ inside a path segment is NOT a query param — untouched
        (6, "http://host.com/utm_x/page?a=1&b=2",
            "http://host.com/utm_x/page?a=1&b=2"),
        # a param merely CONTAINING 'utm_' keeps its value
        (7, "http://host.com/p?checkoutm_total=5&x=1",
            "http://host.com/p?checkoutm_total=5&x=1"),
        # '/?' inside a query VALUE is data; only the path's slash goes
        (8, "http://host.com/p/?next=/home/?x=1",
            "http://host.com/p?next=/home/?x=1"),
        # leading utm param: the first surviving '&' is promoted to '?'
        (9, "http://host.com/p?utm_a=1&b=2&utm_c=3",
            "http://host.com/p?b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {r["doc_id"]: r["canon_url"] for r in url_canon(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_containment_asymmetric(spark):
    from themis_search_engine_spark.pipeline_ops.dedup import (
        containment_pairs,
    )

    quote = "to be or not to be that is the question"
    df = spark.createDataFrame(
        [
            (0, quote),
            (1, f"he wrote {quote} and then much more entirely new text "
                "follows here with many other words"),
            (2, "completely unrelated content about spark joins"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, n=2, tau=0.9).collect()
    }
    # the quote (doc 0) is fully contained in the article (doc 1)...
    assert out[(0, 1)] == 1.0
    # ...but NOT vice versa (article >> quote), and Jaccard would miss it
    assert (1, 0) not in out
    assert not any(2 in p for p in out)


def test_containment_lsh_matches_allpairs_on_fixture(spark):
    """On the sf0.001 fixture the banded path reproduces the all-pairs
    containment set exactly (recall 1.0 — comparable-size near-dups all
    share bands); pins the candidate→verify plumbing."""
    from themis_search_engine_spark.corpus import load_documents
    from themis_search_engine_spark.pipeline_ops.dedup import (
        containment_lsh_pairs,
        containment_pairs,
    )

    docs = load_documents(spark, "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    allp = {
        (r["doc_a"], r["doc_b"]): round(r["containment"], 6)
        for r in containment_pairs(docs, n=2, tau=0.9).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): round(r["containment"], 6)
        for r in containment_lsh_pairs(
            docs, n=2, k=16, bands=8, tau=0.9
        ).collect()
    }
    assert lsh == allp and allp


def test_snapshot_diff_statuses(spark):
    from themis_search_engine_spark.pipeline_ops.websnap import snapshot_diff

    pages = spark.createDataFrame(
        [
            # u1: two snapshots, text changed
            (0, "u1", 100, "old text"),
            (1, "u1", 200, "new text"),
            # u2: two snapshots, identical text (recrawl, no change)
            (2, "u2", 100, "same"),
            (3, "u2", 200, "same"),
            # u3: single snapshot (first crawl)
            (4, "u3", 100, "fresh"),
            # u4: three snapshots — only the two latest compared
            (5, "u4", 100, "v1"),
            (6, "u4", 200, "v2"),
            (7, "u4", 300, "v2"),
        ],
        "doc_id long, url string, warc_ts long, text string",
    )
    out = {r["url"]: r for r in snapshot_diff(pages).collect()}
    assert out["u1"]["status"] == "changed"
    assert (out["u1"]["cur_doc_id"], out["u1"]["prev_doc_id"]) == (1, 0)
    assert out["u2"]["status"] == "unchanged"
    assert out["u3"]["status"] == "new"
    assert out["u3"]["prev_doc_id"] is None
    # u4: v2 vs v2 — the v1 snapshot is beyond the rank-2 horizon
    assert out["u4"]["status"] == "unchanged"
    assert (out["u4"]["cur_doc_id"], out["u4"]["prev_doc_id"]) == (7, 6)


def test_trending_terms_semantics_and_plan(spark):
    """trending_terms: Laplace-smoothed surge ratio, min_df floor,
    deterministic ties, and a TakeOrderedAndProject top-n (never a full
    vocabulary sort)."""
    from themis_search_engine_spark.pipeline_ops.websnap import trending_terms

    rows = []
    # 'surge': 1 early doc, 5 late → ratio (5+1)/(1+1)=3.0
    rows += [(100, "surge", 10)] + [(200 + i, "surge", 900) for i in range(5)]
    # 'flat': 3 early, 3 late → ratio 1.0
    rows += [(300 + i, "flat", 10) for i in range(3)]
    rows += [(400 + i, "flat", 900) for i in range(3)]
    # 'fade': 5 early, 0 late → ratio 1/6
    rows += [(500 + i, "fade", 10) for i in range(5)]
    # 'rare': below min_df, must not appear
    rows += [(600, "rare", 900)]
    dt = spark.createDataFrame(rows, "doc_id long, term string, warc_ts long")
    out = trending_terms(dt, 500, min_df=5, top_n=10)
    got = [(r["term"], r["df_early"], r["df_late"], r["ratio"], r["rank"])
           for r in out.collect()]
    assert got == [
        ("surge", 1, 5, 3.0, 1),
        ("flat", 3, 3, 1.0, 2),
        ("fade", 5, 0, round(1 / 6, 6), 3),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_knn_join_exact_matches_numpy(spark):
    import numpy as np

    from themis_search_engine_spark.pipeline_ops.simsearch import knn_join

    rng = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
           for i in range(12)]
    embs = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    out = knn_join(embs, k=2, exact=True).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    V = {i: np.array(v) for i, v in rng}
    for i, got in by_vec.items():
        cos = sorted(
            ((round(float(V[i] @ V[j] / (np.linalg.norm(V[i])
                                         * np.linalg.norm(V[j]))), 6), -j)
             for j in V if j != i),
            reverse=True,
        )[:2]
        want = [(rk + 1, -j, c) for rk, (c, j) in enumerate(cos)]
        assert sorted(got) == want, (i, sorted(got), want)
    assert len(by_vec) == 12


def test_knn_join_banded_is_candidate_bounded_subset(spark):
    """Banded ranks agree with exact cosine on every emitted pair, and
    every emitted neighbor really is an SRP candidate of its vector."""
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        knn_join,
        srp_lsh_candidates,
    )

    rows = [(i, [float((i * 5 + d) % 7) - 3.0 for d in range(64)])
            for i in range(20)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    banded = knn_join(embs, k=3, n_planes=16, bands=8, dim=64).collect()
    assert banded
    exact = {
        (r["vec_id"], r["neighbor_id"]): r["cosine"]
        for r in knn_join(embs, k=19, exact=True).collect()
    }
    cand = set()
    for r in srp_lsh_candidates(embs, n_planes=16, bands=8,
                                dim=64).collect():
        cand.add((r["vec_a"], r["vec_b"]))
        cand.add((r["vec_b"], r["vec_a"]))
    for r in banded:
        key = (r["vec_id"], r["neighbor_id"])
        assert key in cand
        assert abs(exact[key] - r["cosine"]) < 1e-9


def test_blocklist_filter_token_grain(spark):
    """Token-grain matching: substrings never trip the list; counts are
    occurrence counts, not distinct-word counts."""
    from themis_search_engine_spark.pipeline_ops.textstats import (
        blocklist_filter,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean page about scrapbooks"),   # 'crap' as substring only
            (2, "crash then crash then panic"),
            (3, "entirely fine text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_blocked"], r["keep"])
        for r in blocklist_filter(docs, ["crash", "panic", "crap"]).collect()
    }
    assert out == {1: (0, True), 2: (3, False), 3: (0, True)}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        blocklist_filter(docs, [])


def test_ann_recall_counts_and_zero_hit_rows(spark):
    """Hand-built exact/approx frames: recall = |∩|/k per query, and a
    query whose approx set misses everything still appears (recall 0)."""
    from themis_search_engine_spark.pipeline_ops.simsearch import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)],
        "query_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 21), (2, 99), (3, 98), (3, 99)],
        "query_id long, vec_id long",
    )
    out = {
        r["query_id"]: (r["n_hit"], r["recall"])
        for r in ann_recall(exact, approx, k=2).collect()
    }
    assert out == {1: (2, 1.0), 2: (1, 0.5), 3: (0, 0.0)}


def test_kmeans_grain_quantizes_means(spark):
    """grain=6 training emits means on the exact 1e-6 grid (the
    engine-independence grid: floor(x·1e6+0.5)/1e6) while preserving the
    centroid count; grain=None output differs from it by < 1e-6 per
    element (quantization, not a different algorithm)."""
    from themis_search_engine_spark.corpus import load_embeddings
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        kmeans_centroids,
    )

    embs = load_embeddings(spark, SF_DIR).select("vec_id", "embedding")
    cq = {r["centroid_id"]: r["centroid_vec"]
          for r in kmeans_centroids(
              embs, every_m=25, iters=2, grain=6).collect()}
    cr = {r["centroid_id"]: r["centroid_vec"]
          for r in kmeans_centroids(embs, every_m=25, iters=2).collect()}
    assert set(cq) == set(cr) and len(cq) > 0
    import math
    for cid, vec in cq.items():
        for vq, vr in zip(vec, cr[cid]):
            scaled = vq * 1e6
            assert abs(scaled - math.floor(scaled + 0.5)) < 1e-6
            assert abs(vq - vr) < 2e-6


def test_related_items_lift_and_cap(spark):
    """Co-session suggestions: items sharing sessions rank by lift;
    pairs below min_pair drop; the basket cap bounds enumeration."""
    import datetime as dt

    from themis_search_engine_spark.pipeline_ops.sessions import (
        related_items,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, minute, k):
        return (eid, user, t0 + dt.timedelta(minutes=minute), "q",
                0.0, '{"k": %d}' % k)

    rows = [
        # user 1, session 1: items 10, 11  (pair 10-11)
        ev(1, 1, 0, 10), ev(2, 1, 1, 11),
        # user 1, session 2 (after the 360-min gap): items 10, 11 again
        ev(3, 1, 500, 10), ev(4, 1, 501, 11),
        # user 2, one session: items 10, 12 — pair 10-12 occurs ONCE
        ev(5, 2, 0, 10), ev(6, 2, 1, 12),
        # user 3, a lone item session (contributes to N only)
        ev(7, 3, 0, 13),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    got = related_items(events, 360, min_pair=2, top_n=5).collect()
    pairs = {(r.item, r.related): r for r in got}
    # pair (10,11): n_ab=2, N=4 sessions, n_10=3, n_11=2 -> lift 8/6
    assert set(pairs) == {(10, 11), (11, 10)}  # 10-12 dropped (min_pair)
    r = pairs[(10, 11)]
    assert r.n_ab == 2 and r.lift == round(2 * 4 / (3 * 2), 6) and r.rank == 1

    # cap: a 3-item session with max_items=2 keeps items 10,11 only
    rows2 = [
        ev(1, 9, 0, 10), ev(2, 9, 1, 11), ev(3, 9, 2, 12),
    ]
    events2 = spark.createDataFrame(
        rows2,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    got2 = {
        (r.item, r.related)
        for r in related_items(
            events2, 360, min_pair=1, top_n=5, max_items=2
        ).collect()
    }
    assert got2 == {(10, 11), (11, 10)}  # item 12 fell past the cap


def test_boilerplate_strip_domain_scoped(spark):
    from themis_search_engine_spark.pipeline_ops.dedup import (
        boilerplate_strip,
    )

    banner = "b1 b2 b3 b4"  # span_tokens=4 for the test
    rows = []
    # domain A: 3 docs, all carry the banner → frequent (min_docs=2,
    # min_frac=0.5 → threshold max(2, 2)=2) → stripped from ALL docs.
    for i in range(3):
        rows.append((i, "a", f"{banner} body{i} w{i} x{i} y{i}"))
    # domain B: one doc with the SAME banner — not frequent in B, kept.
    rows.append((10, "b", f"{banner} solo tail here now"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_strip(
            df, span_tokens=4, min_docs=2, min_frac=0.5
        ).collect()
    }
    for i in range(3):
        assert out[i]["n_boiler_spans"] == 1, out[i]
        assert out[i]["clean_text"] == f"body{i} w{i} x{i} y{i}"
    assert out[10]["n_boiler_spans"] == 0
    assert out[10]["clean_text"].startswith(banner)


def test_semdedup_within_cluster_only(spark):
    from themis_search_engine_spark.pipeline_ops.simsearch import semdedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # cell 0
            (1, [0.9, 0.1]),   # cell 0, cos(0,1)=0.993 → dup of 0
            (2, [0.0, 1.0]),   # cell 1
            (3, [0.1, 1.0]),   # cell 1, cos(2,3)=0.995 → dup of 2
            (4, [0.7, 0.7]),   # tie → cell 0 (asc); cos to 0/1 < 0.9
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in semdedup(embs, cents, tau=0.9).collect()
    }
    assert [out[i]["is_dup"] for i in range(5)] == [0, 1, 0, 1, 0]
    assert out[4]["cell"] == 0  # cosine tie breaks on cell asc


def test_readability_flesch_hand_computed(spark):
    from themis_search_engine_spark.pipeline_ops.textstats import (
        readability,
    )

    df = spark.createDataFrame(
        [
            (0, "the cat sat"),        # syl: 1+1+1=3, w=3, s=1
            (1, "42 7"),               # digit tokens floor to 1 syl each
            (2, ""),                   # zero words → dropped
            (3, "beautiful analysis"), # beau-ti-ful=3 (eau,i,u... groups)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability(df, words_per_sentence=20).collect()}
    assert 2 not in out
    r0 = out[0]
    assert (r0["n_words"], r0["n_syllables"], r0["n_sentences"]) == (3, 3, 1)
    assert abs(r0["flesch"] - round(206.835 - 1.015 * 3 - 84.6 * 1.0, 6)) < 1e-9
    assert out[1]["n_syllables"] == 2
    # vowel-GROUP counting: 'beautiful' → eau|i|u = 3, 'analysis' → a|a|y|i = 4
    assert out[3]["n_syllables"] == 7


def test_combmnz_fuse_semantics(spark):
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        combmnz_fuse,
    )

    # qid 1: doc 10 in both lanes (agreement doubles), 11/12 one-sided;
    # qid 2: constant text lane (max == min) normalizes to 1.0.
    text = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 2.0), (2, 20, 3.0), (2, 21, 3.0)],
        "qid int, doc_id long, score double",
    )
    vec = spark.createDataFrame(
        [(1, 10, 0.5), (1, 12, 1.0)],
        "qid int, doc_id long, score double",
    )
    out = {
        (r["qid"], r["doc_id"]): r
        for r in combmnz_fuse(text, vec, k=10).collect()
    }
    # qid 1 text: 10→1.0, 11→0.0; vec: 12→1.0, 10→0.0
    assert out[(1, 10)]["fused"] == 2.0       # (1.0 + 0.0) * 2 lanes
    assert out[(1, 12)]["fused"] == 1.0       # vec-only
    assert out[(1, 11)]["fused"] == 0.0       # text floor, single lane
    assert out[(1, 10)]["rank"] == 1
    # constant lane → 1.0 each, never 0/0
    assert out[(2, 20)]["fused"] == 1.0 and out[(2, 21)]["fused"] == 1.0
    assert out[(2, 20)]["rank"] == 1          # doc_id tiebreak
    # CombSUM twin: no agreement multiplier
    sums = {
        (r["qid"], r["doc_id"]): r["fused"]
        for r in combmnz_fuse(text, vec, k=10, mnz=False).collect()
    }
    assert sums[(1, 10)] == 1.0


def test_corpus_recipe_stage_contract(spark):
    """The composed recipe honors each stage: every sampled doc is an
    English-quality cluster canonical, none shares an n-gram with the
    eval set, and the budget fill has the ≤1-doc overshoot property."""
    from themis_search_engine_spark.pipeline_ops.recipe import corpus_recipe
    from themis_search_engine_spark.pipeline_ops.sampling import (
        decontaminate,
    )
    from themis_search_engine_spark.pipeline_ops.textstats import (
        lang_id,
        quality_score,
    )

    import random as _r
    _r.seed(7)
    vocab = [f"word{j}" for j in range(200)]
    rows = [
        (i, "the and of " + " ".join(_r.sample(vocab, 12)))
        for i in range(30)
    ] + [
        (100, "zzz qqq xxy"),                       # low quality → dropped
        (101, "el zorro rápido salta sobre el perro perezoso ahora"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = docs.where("doc_id % 7 = 0")
    out = corpus_recipe(docs, ev, 120, decontam_n=5).collect()
    assert out
    ids = {r["doc_id"] for r in out}
    # stage 1: survivors are en + quality-passing (101 is es, 100 junk)
    assert 100 not in ids and 101 not in ids
    # stage 2: nothing contaminated survived — recompute independently
    clean_ids = ids | set()  # sampled ⊆ decontaminated by construction:
    kept = {
        r["doc_id"]
        for r in decontaminate(docs, ev, n=5, min_overlap=1).collect()
    }
    assert clean_ids <= kept
    # stage 3: budget fill, ≤ 1-doc overshoot
    total = sum(r["n_tokens"] for r in out)
    last = max(out, key=lambda r: r["cum_tokens"])
    assert total - last["n_tokens"] < 120
