"""BM25F: field-weighted Okapi retrieval over structured documents.

The reference flattens every document to one text stream before indexing
(S2 field concat, Parser.java — title + abstract are concatenated and all
positions forgotten), so a title hit scores exactly like a body hit. Real
web search weights fields: this module implements the simple BM25F of
Robertson & Zaragoza ("The Probabilistic Relevance Framework", §6.2 —
public literature), composed entirely from Catalyst expressions:

  cnt_f(d,f,t)  per-field term counts (one tokenization pass, field from
                token position)
  wtf(d,t)    = Σ_f w_f · cnt_f(d,f,t)     weighted term frequency
  wdl(d)      = Σ_f w_f · len_f(d,f)       weighted doc length
  idf(t)      = log2((N - df + 0.5)/(df + 0.5)), df = docs containing t
                in ANY field (the house BM25 idf, OkapiBM25.java:104-106)
  score(q,d)  = Σ_t idf·wtf·(k1+1) / (wtf + k1·(1 - b + b·wdl/avgwdl))

With one field at weight 1.0 this degrades to raw-count BM25, which is
how the operator is sanity-pinned in tests.

Field extraction: the engine's web corpus carries an html ``<title>``
(corpus.synth_pages); for the flat driver ``documents`` table the fielded
view is positional — the first ``title_tokens`` tokens of the normalized
unfiltered stream are 'title', the rest 'body' (both engines compute the
same rule, so the DuckDB oracle checks values, not just plumbing).

Scale shape: ONE corpus pass (posexplode of the normalized split — no
second tokenization per field), then two map-side-combinable linear
groupBys ((doc,field,term) → (doc,term)); dictionary and per-doc weighted
lengths are column-pruned derivations; qterms and dictionary broadcast
into the scored join exactly like bm25.bm25_score_all. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..stopwords import STOPWORDS
from .bm25 import B, K1

DEFAULT_WEIGHTS = {"title": 2.0, "body": 1.0}


def fielded_counts(
    docs: DataFrame,
    *,
    title_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, field, term, cnt) — P2/P3/P4 pipeline with a positional
    field tag: token position (0-based, counted over the normalized
    NONEMPTY token stream, pre-stopword) < ``title_tokens`` → 'title',
    else 'body'. Stopwords are dropped after field assignment so the
    title boundary doesn't shift with the stopword list."""
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", " ")),
            r"\s+",
        ),
        lambda t: t != F.lit(""),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.posexplode("_toks").alias("pos", "term"))
        .where(~F.col("term").isin(sorted(STOPWORDS)))
        .select(
            "doc_id",
            F.when(F.col("pos") < title_tokens, F.lit("title"))
            .otherwise(F.lit("body"))
            .alias("field"),
            "term",
        )
        .groupBy("doc_id", "field", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _weight_expr(weights: dict[str, float]):
    expr = None
    for field, w in sorted(weights.items()):
        branch = (F.col("field") == field, F.lit(float(w)))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    return expr.otherwise(F.lit(0.0))


def bm25f_score_all(
    qterms: DataFrame,
    fcounts: DataFrame,
    docs: DataFrame,
    *,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    cache: bool = True,
) -> DataFrame:
    """(qid, doc_id, score) — BM25F over a fielded counts table.

    ``docs`` supplies the full doc_id universe: token-less docs count
    toward N and avgwdl with wdl 0, the house every-doc-gets-a-stats-row
    rule (Indexer.java:423-443). Plan: wtf/wdl are linear combinable
    aggregates of fcounts; N/avgwdl collapse to driver scalars (one
    2-column scan); dictionary + qterms broadcast into the postings-shaped
    wtf table; score arithmetic is whole-stage-codegen Column math.

    ``cache``: fcounts feeds THREE plan legs (wtf, wdl, dictionary) plus
    the N/avgwdl collect — uncached, the tokenization pass would run four
    times per action. The default caches it (the collect below populates
    the cache); the cached blocks live until the session evicts them, so
    a long-lived caller that builds fcounts repeatedly should pass
    ``cache=False`` and manage persistence itself (the same lifecycle
    contract as expansion.embedding_synonyms)."""
    if cache:
        fcounts = fcounts.cache()
    w = _weight_expr(weights or DEFAULT_WEIGHTS)
    weighted = fcounts.select(
        "doc_id", "term", (F.col("cnt") * w).alias("_wcnt")
    )
    wtf = weighted.groupBy("doc_id", "term").agg(
        F.sum("_wcnt").alias("wtf")
    )
    wdl = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            weighted.groupBy("doc_id").agg(F.sum("_wcnt").alias("wdl")),
            "doc_id",
            "left",
        )
        .fillna({"wdl": 0.0})
    )
    gs = wdl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("wdl").alias("avgwdl")
    ).collect()[0]
    n_docs, avgwdl = int(gs["n_docs"]), float(gs["avgwdl"] or 0.0)

    dictionary = fcounts.select("doc_id", "term").distinct().groupBy(
        "term"
    ).agg(F.count(F.lit(1)).alias("df")).withColumn(
        "idf",
        F.log2(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
    )

    q = F.broadcast(
        qterms.select("qid", "term").distinct()
        .join(dictionary.select("term", "idf"), "term")
    )
    denom = F.col("wtf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("wdl") / F.lit(avgwdl)
    )
    part = F.col("idf") * F.col("wtf") * F.lit(k1 + 1.0) / denom
    return (
        wtf.join(q, "term")
        .join(wdl, "doc_id")
        .select("qid", "doc_id", part.alias("part"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("part").alias("score"))
    )
