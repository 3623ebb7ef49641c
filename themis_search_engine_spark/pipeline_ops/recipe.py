"""The end-to-end training-data recipe: clean → decontaminate → fill a
token budget — the whole FineWeb/C4-style pipeline as ONE composition of
the engine's existing operators, so a user gets "N tokens of clean,
leak-free English" in a single call and the driver gets one oracle that
replays every stage.

Stages (each is an already-oracled operator; this module only wires
them, adding no new semantics):

1. clean      — language filter ∩ quality floor ∩ one canonical doc per
                MinHash-LSH near-dup cluster (dedup.minhash_lsh_pairs +
                connected_components; subsumes exact dedup).
2. decontam   — drop survivors sharing any word n-gram with the eval
                set (sampling.decontaminate; broadcast eval shingles).
3. budget     — deterministic seeded-md5 token-budget fill over what
                remains (sampling.token_budget_sample: hash-threshold
                pre-filter, ≤ 1-doc overshoot, nested under growth).

Scale: every stage is linear with the shuffles its component already
documented (PLANS.md); the composition adds only narrow joins between
stages. Order matters and is the production order: dedup before the
budget (or the budget fills with copies), decontamination after dedup
(cheaper: fewer docs to shingle) and before the budget (or leakage
eats budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, minhash_lsh_pairs
from .sampling import decontaminate, token_budget_sample
from .textstats import lang_id, quality_score


def corpus_recipe(
    docs: DataFrame,
    eval_docs: DataFrame,
    budget_tokens: int,
    *,
    lang: str = "en",
    quality_tau: float = 0.5,
    dedup_n: int = 2,
    dedup_k: int = 16,
    dedup_bands: int = 8,
    dedup_tau: float = 0.8,
    decontam_n: int = 3,
    salt: str = "budget",
) -> DataFrame:
    """(doc_id, n_tokens, cum_tokens): the budget-filled clean sample."""
    qual = quality_score(docs).select("doc_id", "quality")
    langs = lang_id(docs).select("doc_id", "pred_lang")
    pairs = minhash_lsh_pairs(
        docs, n=dedup_n, k=dedup_k, bands=dedup_bands, tau=dedup_tau
    )
    clus = connected_components(
        pairs.select("doc_a", "doc_b"), docs.select("doc_id")
    )
    clean = (
        docs.join(qual, "doc_id")
        .join(langs, "doc_id")
        .join(clus, "doc_id")
        .where(
            (F.col("pred_lang") == lang)
            & (F.col("quality") >= quality_tau)
            & (F.col("cluster_id") == F.col("doc_id"))
        )
        .select("doc_id", "text")
    )
    kept = decontaminate(clean, eval_docs, n=decontam_n, min_overlap=1)
    return token_budget_sample(
        kept.select("doc_id", "text"), budget_tokens, salt=salt
    )
