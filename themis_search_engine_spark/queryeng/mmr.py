"""MMR-diversified reranking: Maximal Marginal Relevance (Carbonell &
Goldstein, SIGIR 1998) over a BM25 candidate pool with embedding
similarity as the redundancy term.

    pick_1 = argmax rel(d)
    pick_i = argmax [ λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s) ]

The diversified top-k every result page wants (collapse_topk diversifies
by a discrete source key; MMR diversifies in embedding space — near-
duplicate hits melt out of the page even when their metadata differs).

Scale design (10^12 docs, 10^4-query batches):

* The greedy loop is inherently sequential PER QUERY but queries are
  independent — so the distributed axis is the query batch: ONE
  ``applyInPandas`` over qid groups, each group a candidate pool of N
  rows (the BM25 top-N, candidate-bounded upstream). Per-group work is
  O(k·N) dim-length dots — microseconds; a batch of queries saturates
  executors.
* Pool embeddings arrive by a candidate-bounded join (pool ⋈ embedding
  table on doc_id) — the corpus-sized table is probed, never scanned
  into the rerank.
* Determinism (oracle-grade): relevance is the 6dp-rounded BM25 score;
  each greedy step ranks on floor(mmr·10⁶ + 0.5)/10⁶ with doc_id-asc
  ties; dot products accumulate in index order — bit-identical to the
  DuckDB twin's list_sum left fold (oracle_sql.sql_mmr_topk).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cos(a: list[float], b: list[float]) -> float:
    """Index-order left-fold cosine — the same op sequence as the SQL
    twin's list_sum comprehension (never numpy: BLAS reorders sums)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def mmr_py(
    pool: list[tuple[int, float, list[float]]],
    k: int,
    lam: float,
) -> list[tuple[int, int]]:
    """Greedy MMR over one query's pool [(doc_id, rel, vec)] →
    [(doc_id, rank)]. Pure-Python core, shared by the Spark group
    function and the unit tests."""
    one_minus = 1.0 - lam
    vecs = {d: v for d, rel, v in pool}
    rels = {d: rel for d, rel, v in pool}
    remaining = set(vecs)
    selected: list[int] = []
    out: list[tuple[int, int]] = []
    simcache: dict[tuple[int, int], float] = {}

    def sim(a: int, b: int) -> float:
        key = (a, b) if a < b else (b, a)
        if key not in simcache:
            simcache[key] = _cos(vecs[key[0]], vecs[key[1]])
        return simcache[key]

    for rank in range(1, min(k, len(pool)) + 1):
        best_d = None
        best_v = None
        for d in sorted(remaining):
            if not selected:
                v = rels[d]
            else:
                mx = max(sim(d, s) for s in selected)
                v = math.floor(
                    (lam * rels[d] - one_minus * mx) * 1e6 + 0.5
                ) / 1e6
            if best_v is None or v > best_v:
                best_d, best_v = d, v
        selected.append(best_d)
        remaining.discard(best_d)
        out.append((best_d, rank))
    return out


def mmr_rerank(
    pool: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, doc_id, rank) — greedy MMR over ``pool`` (qid, doc_id,
    score: the per-query candidate top-N, score at ranking precision).
    Candidates without an embedding row drop out of the pool (an
    unembedded page cannot be diversity-scored; both engines agree by
    the same inner join)."""
    lam = float(lam)
    k = int(k)
    withvec = pool.select("qid", "doc_id", "score").join(
        embeddings.select(
            F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_vec")
        ),
        "doc_id",
    )

    def _group(pdf):
        import pandas as pd

        rows = [
            (int(d), float(s), list(v))
            for d, s, v in zip(pdf["doc_id"], pdf["score"], pdf["_vec"])
        ]
        qid = int(pdf["qid"].iloc[0])
        picked = mmr_py(rows, k, lam)
        return pd.DataFrame(
            {
                "qid": [qid] * len(picked),
                "doc_id": [d for d, _ in picked],
                "rank": [r for _, r in picked],
            }
        )

    return withvec.groupBy("qid").applyInPandas(
        _group, schema="qid long, doc_id long, rank long"
    )
