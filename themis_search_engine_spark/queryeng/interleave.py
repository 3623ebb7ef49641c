"""Team-draft interleaving — online ranker comparison (Radlinski,
Kurup & Joachims, CIKM 2008).

The offline eval family (AP/nDCG/RBP/ERR/P@k) needs judgments; a live
search tier compares two rankers by INTERLEAVING their lists and letting
clicks vote. Team-draft: like schoolyard captains, the two rankings take
turns picking their highest-ranked not-yet-picked doc; each shown doc
remembers which team picked it, and the ranker whose team collects more
clicks wins the impression.

Engine shape: both inputs are top-k frames (≤ |Q|·k rows), so the merge
is one ``applyInPandas`` over qid groups — the greedy draft is
sequential per query (inherently so) and parallel across the batch,
exactly MMR's execution shape. The draft coin (who picks first on a
tie) must be random ACROSS queries but reproducible, or the A/B isn't
auditable: it is the parity of md5(qid, round) — deterministic, fair in
aggregate, and replayable by any engine.

Credit assignment (:func:`interleave_credit`) is one join + one
combinable groupBy over the click log — per (qid, team) click counts,
the per-impression vote.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "qid int, doc_id long, pos int, team string"


def _coin(qid: int, rnd: int) -> int:
    """Deterministic fair coin: md5(qid|round) parity."""
    return int(hashlib.md5(f"{qid}|{rnd}".encode()).hexdigest(), 16) & 1


def team_draft_py(
    qid: int, list_a: list[int], list_b: list[int]
) -> list[tuple[int, str]]:
    """Pure-Python team-draft (the oracle twin): [(doc_id, team)] in
    display order. Each round the team with fewer picks drafts; ties
    break on the md5 coin; a team drafts its best not-yet-shown doc and
    skips docs the other team already showed; an exhausted team cedes
    its turns."""
    out: list[tuple[int, str]] = []
    seen: set[int] = set()
    ia = ib = na = nb = rnd = 0
    while ia < len(list_a) or ib < len(list_b):
        while ia < len(list_a) and list_a[ia] in seen:
            ia += 1
        while ib < len(list_b) and list_b[ib] in seen:
            ib += 1
        a_can, b_can = ia < len(list_a), ib < len(list_b)
        if not a_can and not b_can:
            break
        if a_can and (not b_can or na < nb
                      or (na == nb and _coin(qid, rnd) == 0)):
            out.append((list_a[ia], "a"))
            seen.add(list_a[ia])
            na += 1
        else:
            out.append((list_b[ib], "b"))
            seen.add(list_b[ib])
            nb += 1
        rnd += 1
    return out


def team_draft_interleave(
    ranked_a: DataFrame, ranked_b: DataFrame
) -> DataFrame:
    """(qid, doc_id, pos, team) — the interleaved impression per query.
    Inputs are (qid, doc_id, rank) frames (any of the engine's top-k
    outputs). One qid-keyed shuffle over ≤ |Q|·2k rows total."""
    both = (
        ranked_a.select("qid", "doc_id", "rank", F.lit("a").alias("_side"))
        .unionByName(
            ranked_b.select(
                "qid", "doc_id", "rank", F.lit("b").alias("_side")
            )
        )
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        la = [int(d) for d in
              pdf[pdf["_side"] == "a"].sort_values("rank")["doc_id"]]
        lb = [int(d) for d in
              pdf[pdf["_side"] == "b"].sort_values("rank")["doc_id"]]
        rows = team_draft_py(qid, la, lb)
        return pd.DataFrame(
            {"qid": qid, "doc_id": [d for d, _ in rows],
             "pos": range(1, len(rows) + 1),
             "team": [t for _, t in rows]}
        )

    return both.groupBy("qid").applyInPandas(merge, _SCHEMA)


def interleave_credit(
    interleaved: DataFrame, clicks: DataFrame
) -> DataFrame:
    """(qid, clicks_a, clicks_b, winner) — the per-impression vote.
    ``clicks`` is a (qid, doc_id) frame from the click log; credit goes
    to the team that DRAFTED the clicked doc. winner ∈ a/b/tie."""
    hit = interleaved.join(clicks.select("qid", "doc_id"), ["qid", "doc_id"])
    per = hit.groupBy("qid").agg(
        F.sum(F.when(F.col("team") == "a", 1).otherwise(0))
        .cast("long").alias("clicks_a"),
        F.sum(F.when(F.col("team") == "b", 1).otherwise(0))
        .cast("long").alias("clicks_b"),
    )
    return per.select(
        "qid", "clicks_a", "clicks_b",
        F.when(F.col("clicks_a") > F.col("clicks_b"), "a")
        .when(F.col("clicks_b") > F.col("clicks_a"), "b")
        .otherwise("tie").alias("winner"),
    )
