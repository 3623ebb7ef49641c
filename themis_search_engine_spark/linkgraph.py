"""L1/L2: citation/link graph build + PageRank (SURVEY.md §2.6).

The reference builds a weighted citation graph in two corpus passes
(PageRank.java:48-108, Graph.java:49-139) and then STUBS the rank
computation (the fill loop is empty, PageRank.java:110-137) — documents
keep pagerank 0.0 and it never reaches scoring. This module implements
what that code declares:

- :func:`citation_edges` — (src, dst, weight): explode out-citations,
  keep only edges whose dst exists in the corpus (the reference skips
  unknown ids), multi-edges collapse into integer weights.
- :func:`pagerank` — damped weighted PageRank with a FIXED iteration
  count, as iterative DataFrame joins. Fixed iterations (not a
  convergence loop) keep the computation deterministic and make the whole
  thing SQL-expressible (the DuckDB oracle unrolls the same iterations).
  Dangling mass: ranks of nodes with no out-edges are NOT redistributed
  (the straightforward reading of the reference's row-normalized
  transition matrix, where a dangling row stays all-zero).

Scale: each iteration is one (edges ⋈ ranks) shuffle + a groupBy(dst).
Edges are repartitioned by src once and reused; ranks are the small side
at web scale only after aggregation — at 10^12 docs both sides are big,
so the join keys co-partition (src) and AQE handles skewed hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def citation_edges(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    citations_col: str = "citations",
) -> DataFrame:
    """(src, dst, weight) — exploded, known-dst-only, multi-edge-weighted
    (PageRank.java:69-101: nodes pass then edges pass skipping unknown)."""
    ids = docs.select(F.col(id_col).alias("dst")).distinct()
    raw = docs.select(
        F.col(id_col).alias("src"),
        F.explode(F.col(citations_col)).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return (
        raw.join(ids, "dst", "left_semi")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def synthetic_citations(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic pseudo-citations for corpora without a citation field:
    doc d cites (d*7+1) % N, (d*13+3) % N, (d*31+11) % N (self-cites and
    unknown ids naturally excluded downstream). Mirrors the oracle CTE."""
    n = docs.count()
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array(
            (F.col(id_col) * 7 + 1) % n,
            (F.col(id_col) * 13 + 3) % n,
            (F.col(id_col) * 31 + 11) % n,
        ).alias("citations"),
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(doc_id, pagerank) after ``iterations`` damped weighted steps.

    rank_{t+1}(v) = (1-d)/N + d·Σ_{u→v} rank_t(u)·weight(u,v)/outweight(u)

    Every ``checkpoint_every`` iterations the rank frame is
    ``localCheckpoint``-ed: iterative self-joins otherwise grow the logical
    plan linearly (analysis/optimization time goes superlinear and the
    lineage eventually overflows), while a checkpoint truncates lineage to
    the materialized ranks — at cluster scale use a reliable
    ``checkpoint()`` directory instead so executor loss stays recoverable.
    """
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("outw"))
    # transition probability per edge — static across iterations, cache it
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("outw")).alias("p"))
        .cache()
    )
    ranks = nodes.select(
        F.col(nodes.columns[0]).alias("node"), F.lit(1.0 / n).alias("rank")
    )
    base = (1.0 - damping) / n
    for it in range(1, iterations + 1):
        contribs = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .join(contribs, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (F.lit(base)
                 + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
        if it % checkpoint_every == 0 and it < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("doc_id"),
                        F.col("rank").alias("pagerank"))


def pagerank_py(
    edges: list[tuple[int, int, int]], nodes: list[int],
    damping: float = 0.85, iterations: int = 5,
) -> dict[int, float]:
    """Pure-Python twin for unit tests."""
    n = len(nodes)
    outw: dict[int, int] = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    ranks = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        inflow = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += ranks[s] * (w / outw[s])
        ranks = {v: base + damping * inflow[v] for v in nodes}
    return ranks


def trustrank(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    *,
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(doc_id, trust) — TrustRank (Gyöngyi/Garcia-Molina/Pedersen,
    VLDB'04): PageRank with the teleport vector restricted to a curated
    trusted seed set, the classic web-spam-demotion static signal:

        trust_{t+1}(v) = (1-d)·s(v) + d·Σ_{u→v} trust_t(u)·w(u,v)/outw(u)

    with s uniform over ``seeds`` (0 elsewhere) and trust_0 = s. Trust
    flows OUT of seeds along links and decays with distance; pages
    unreachable from any seed keep trust 0 — the spam-mass reading.

    Plan per iteration: identical shuffle shape to :func:`pagerank` (one
    edge-keyed join + combinable groupBy); the per-node teleport term is
    a cached (node, base) frame joined back — still no driver loop, no
    collect, lineage truncated every ``checkpoint_every`` iterations.
    ``seeds``: one column of trusted node ids (a curated list — tiny)."""
    ns = seeds.count()
    if ns == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("outw"))
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("outw")).alias("p"))
        .cache()
    )
    seed_f = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(1.0 / ns).alias("b")
    )
    bases = (
        nodes.select(F.col(nodes.columns[0]).alias("node"))
        .join(seed_f, "node", "left")
        .select("node", F.coalesce(F.col("b"), F.lit(0.0)).alias("b"))
        .cache()
    )
    ranks = bases.select("node", F.col("b").alias("rank"))
    for it in range(1, iterations + 1):
        contribs = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            bases.join(contribs, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (F.lit(1.0 - damping) * F.col("b")
                 + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
        if it % checkpoint_every == 0 and it < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("doc_id"),
                        F.col("rank").alias("trust"))


def trustrank_py(
    edges: list[tuple[int, int, int]], nodes: list[int], seeds: list[int],
    damping: float = 0.85, iterations: int = 5,
) -> dict[int, float]:
    """Pure-Python twin for unit tests."""
    outw: dict[int, int] = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    sset = set(seeds)
    base = {v: (1.0 / len(seeds) if v in sset else 0.0) for v in nodes}
    ranks = dict(base)
    for _ in range(iterations):
        inflow = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += ranks[s] * (w / outw[s])
        ranks = {
            v: (1.0 - damping) * base[v] + damping * inflow[v] for v in nodes
        }
    return ranks


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    iterations: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(doc_id, hub, authority) — Kleinberg's HITS (1999), weighted, after
    ``iterations`` mutual-reinforcement steps with L2 normalization per
    half-step:

        auth_t(v) = Σ_{u→v} hub_{t-1}(u)·w(u,v)   then  a /= ‖a‖₂
        hub_t(u)  = Σ_{u→v} auth_t(v)·w(u,v)      then  h /= ‖h‖₂

    The PageRank sibling the reference's citation graph declares but
    never consumes (PageRank.java builds the graph; no scorer reads it) —
    hubs/authorities are the classic query-independent web-link signals
    beside PageRank.

    Plan per half-step: ONE edge-keyed join + combinable groupBy (the
    same shuffle shape as a pagerank step), and the L2 normalizer is a
    one-row aggregate crossJoined back as a broadcast scalar — no
    collect, no driver loop over data. Lineage is truncated by
    localCheckpoint every ``checkpoint_every`` iterations (HITS doubles
    plan depth per iteration — twice pagerank's — so the default is
    tighter); at cluster scale use reliable ``checkpoint()`` instead.
    An edgeless graph normalizes to all-zero scores, not NaN.
    """
    node = nodes.select(F.col(nodes.columns[0]).alias("node"))
    e = edges.select(
        "src", "dst", F.col("weight").cast("double").alias("w")
    ).cache()

    def _normalize(df: DataFrame, raw: str, out: str) -> DataFrame:
        nrm = df.agg(F.sqrt(F.sum(F.col(raw) ** 2)).alias("_nrm"))
        return df.crossJoin(F.broadcast(nrm)).select(
            "node",
            F.when(F.col("_nrm") > 0, F.col(raw) / F.col("_nrm"))
            .otherwise(F.lit(0.0))
            .alias(out),
        )

    hubs = node.select("node", F.lit(1.0).alias("hub"))
    auths = node.select("node", F.lit(0.0).alias("auth"))
    for it in range(1, iterations + 1):
        a_in = (
            e.join(hubs, e["src"] == hubs["node"])
            .select("dst", (F.col("hub") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("a"))
        )
        a_raw = node.join(a_in, node["node"] == a_in["dst"], "left").select(
            "node", F.coalesce(F.col("a"), F.lit(0.0)).alias("_raw")
        )
        auths = _normalize(a_raw, "_raw", "auth")
        h_out = (
            e.join(auths, e["dst"] == auths["node"])
            .select("src", (F.col("auth") * F.col("w")).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("h"))
        )
        h_raw = node.join(h_out, node["node"] == h_out["src"], "left").select(
            "node", F.coalesce(F.col("h"), F.lit(0.0)).alias("_raw")
        )
        hubs = _normalize(h_raw, "_raw", "hub")
        if it % checkpoint_every == 0 and it < iterations:
            auths = auths.localCheckpoint(eager=True)
            hubs = hubs.localCheckpoint(eager=True)
    return (
        node.join(hubs, "node")
        .join(auths, "node")
        .select(
            F.col("node").alias("doc_id"),
            F.col("hub"),
            F.col("auth").alias("authority"),
        )
    )


def hits_py(
    edges: list[tuple[int, int, int]], nodes: list[int], iterations: int = 5
) -> dict[int, tuple[float, float]]:
    """Pure-Python twin for unit tests: node -> (hub, authority)."""
    import math

    hub = {v: 1.0 for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        auth = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            auth[d] += hub[s] * w
        na = math.sqrt(sum(a * a for a in auth.values()))
        auth = {v: (a / na if na > 0 else 0.0) for v, a in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            hub[s] += auth[d] * w
        nh = math.sqrt(sum(h * h for h in hub.values()))
        hub = {v: (h / nh if nh > 0 else 0.0) for v, h in hub.items()}
    return {v: (hub[v], auth[v]) for v in nodes}


def _shared_neighbor_pairs(
    edges: DataFrame, key: str, val: str, min_strength: int
) -> DataFrame:
    """(doc_a, doc_b, strength) — unordered pairs of ``val``-side nodes
    sharing >= min_strength common ``key``-side neighbors. The self-join
    is keyed on ``key``, so the blow-up is bounded by per-key degree²
    (citation out-degrees are small constants), and the strength rollup
    is one map-side-combinable groupBy."""
    a = edges.select(F.col(key).alias("_k"), F.col(val).alias("doc_a"))
    b = edges.select(F.col(key).alias("_k"), F.col(val).alias("doc_b"))
    return (
        a.join(b, "_k")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("strength"))
        .where(F.col("strength") >= min_strength)
    )


def cocitation(edges: DataFrame, *, min_strength: int = 2) -> DataFrame:
    """(doc_a, doc_b, strength) — co-citation similarity (Small 1973):
    docs cited TOGETHER by >= min_strength common citing docs. The
    related-paper signal the reference's citation graph (Graph.java)
    declares but never consumes."""
    return _shared_neighbor_pairs(edges, "src", "dst", min_strength)


def bib_coupling(edges: DataFrame, *, min_strength: int = 2) -> DataFrame:
    """(doc_a, doc_b, strength) — bibliographic coupling (Kessler 1963):
    citing docs sharing >= min_strength common references — the transpose
    of co-citation."""
    return _shared_neighbor_pairs(edges, "dst", "src", min_strength)


def anchor_texts(
    edges: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_tokens: int = 3,
    min_cnt: int = 2,
) -> DataFrame:
    """(doc_id, term, anchor_cnt, n_srcs) — in-link anchor-text
    aggregation, the classic web-ranking signal (Brin & Page 1998 §2.2:
    anchor words describe the TARGET page better than its own body).
    The corpus has no literal <a> text, so the anchor surrogate is the
    source doc's leading ``title_tokens`` normalized tokens — the same
    stand-in the reference uses for titles (S2 'title' concat,
    S2JsonEntryReader.java:66-70); the plan is anchor-source-agnostic.

    Plan shape: anchors materialize in-row on the source side (slice of
    the token array — no per-token explode of whole documents), then ONE
    shuffle joins edges to source anchors on src, explode of a
    ``title_tokens``-length array, and a combinable groupBy on
    (dst, term). Per-group size is bounded by a page's in-degree × title
    length; at web scale the dst-key skew of celebrity pages is absorbed
    by the map-side partial aggregation (sum/count_distinct of longs).
    ``min_cnt`` floors hapax anchors, mirroring how production anchor
    fields drop single-link noise. Output feeds BM25F as an extra field.
    """
    from .pipeline_ops.dedup import _tok_array

    anchors = docs.select(
        F.col(id_col).alias("src"),
        F.slice(_tok_array(F.col(text_col)), 1, title_tokens).alias(
            "_title"
        ),
    )
    return (
        edges.join(anchors, "src")
        .select("dst", "src", F.explode("_title").alias("term"))
        .groupBy(F.col("dst").alias("doc_id"), "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("anchor_cnt"),
            F.count_distinct(F.col("src")).cast("long").alias("n_srcs"),
        )
        .where(F.col("anchor_cnt") >= min_cnt)
    )
