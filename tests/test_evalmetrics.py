"""E1/E2 eval metrics: DataFrame implementation vs the pure-Python walk."""

import pytest

from themis_search_engine_spark.queryeng.evalmetrics import (
    ap_ndcg,
    ap_ndcg_py,
    metric_aggregates,
    synthetic_judgments,
)


def test_ap_ndcg_matches_python_walk(spark):
    # hand-built ranked lists + judgments with judged-irrelevant gaps
    ranked_rows = [
        # qid, doc_id, rank
        (1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5),
        (2, 20, 1), (2, 21, 2), (2, 22, 3),
        (3, 30, 1),  # no judged docs → absent from output
    ]
    judged = {
        (1, 10): 1, (1, 12): 0, (1, 13): 1, (1, 99): 1,
        (2, 21): 1, (2, 22): 1, (2, 50): 0,
        (3, 77): 1,
    }
    ranked = spark.createDataFrame(ranked_rows, "qid int, doc_id long, rank long")
    jdf = spark.createDataFrame(
        [(q, d, r) for (q, d), r in judged.items()],
        "qid int, doc_id long, relevance int",
    )
    got = {r["qid"]: (r["ap"], r["ndcg"]) for r in ap_ndcg(ranked, jdf).collect()}
    want = ap_ndcg_py(
        [(q, d) for q, d, _ in sorted(ranked_rows, key=lambda t: (t[0], t[2]))],
        judged,
    )
    assert set(got) == set(want) == {1, 2}
    for qid in got:
        assert got[qid][0] == pytest.approx(want[qid][0], abs=1e-6)
        assert got[qid][1] == pytest.approx(want[qid][1], abs=1e-6)


def test_synthetic_judgments_deterministic(spark):
    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    j1 = sorted(map(tuple, synthetic_judgments(docs, {1: "a", 4: "b"}).collect()))
    j2 = sorted(map(tuple, synthetic_judgments(docs, {1: "a", 4: "b"}).collect()))
    assert j1 == j2
    assert all(d % 7 == q % 7 for q, d, _ in j1)
    assert {r for _, _, r in j1} == {0, 1}


def test_metric_aggregates(spark):
    perq = spark.createDataFrame(
        [(1, 0.5, 0.6), (2, 1.0, 0.8)], "qid int, ap double, ndcg double"
    )
    row = metric_aggregates(perq).collect()[0]
    assert row["ap_min"] == 0.5 and row["ap_max"] == 1.0
    assert row["ap_avg"] == pytest.approx(0.75)
    assert row["ap_mean"] == pytest.approx(0.75)
    assert row["ndcg_avg"] == pytest.approx(0.7)


def test_prf_mrr_hand_computed(spark):
    """P@k / recall@k / MRR on a hand-checkable fixture: full-rank
    positions (unjudged answers count against precision), MRR=0 when no
    relevant doc is retrieved, zero-relevant queries skipped."""
    from themis_search_engine_spark.queryeng.evalmetrics import prf_mrr

    ranked = spark.createDataFrame(
        # qid 1: relevant at ranks 2 and 4; qid 2: none relevant in top-k;
        # qid 3: has no relevant docs at all (skipped)
        [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        + [(2, d, r) for r, d in enumerate([20, 21], 1)]
        + [(3, 30, 1)],
        "qid long, doc_id long, rank long",
    )
    judgments = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 1), (1, 99, 1),   # R=3, two retrieved
         (2, 77, 1),                           # R=1, zero retrieved
         (3, 30, 0)],                          # judged but irrelevant
        "qid long, doc_id long, relevance int",
    )
    got = {r["qid"]: r for r in prf_mrr(ranked, judgments, k=5).collect()}
    assert got[1]["p_at_k"] == 0.4            # 2/5
    assert got[1]["recall_at_k"] == round(2 / 3, 6)
    assert got[1]["mrr"] == 0.5               # first relevant at rank 2
    assert got[2]["p_at_k"] == 0.0 and got[2]["mrr"] == 0.0
    assert 3 not in got                       # zero-relevant → skipped


def test_rbp_err_hand_computed(spark):
    """RBP(p=0.5) and binary-grade ERR on the prf_mrr fixture: qid 1 has
    relevant docs at ranks 2 and 4, so
      rbp = 0.5 * (0.5^1 + 0.5^3) = 0.3125
      err = 0.5/2 + (0.5*0.5)/4 = 0.3125
    qid 2 retrieves nothing relevant -> 0.0 (kept, unlike AP's skip);
    qid 3's judged-irrelevant doc also scores 0.0."""
    from themis_search_engine_spark.queryeng.evalmetrics import rbp_err

    ranked = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        + [(2, d, r) for r, d in enumerate([20, 21], 1)]
        + [(3, 30, 1)],
        "qid long, doc_id long, rank long",
    )
    judgments = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 1), (1, 99, 1),
         (2, 77, 1),
         (3, 30, 0)],
        "qid long, doc_id long, relevance int",
    )
    got = {r["qid"]: r for r in rbp_err(ranked, judgments, k=5).collect()}
    assert got[1]["rbp"] == 0.3125
    assert got[1]["err"] == 0.3125
    assert got[2]["rbp"] == 0.0 and got[2]["err"] == 0.0
    assert got[3]["rbp"] == 0.0 and got[3]["err"] == 0.0


# --- paired randomization significance test ---------------------------------

def test_randomization_identical_rankers_p1(spark):
    from themis_search_engine_spark.queryeng.evalmetrics import (
        paired_randomization_test,
    )

    rows = [(q, 0.1 * (q % 5)) for q in range(1, 21)]
    a = spark.createDataFrame(rows, "qid int, ap double")
    out = paired_randomization_test(a, a, "ap", rounds=64).collect()[0]
    # identical metrics: zero diff, every permutation ties the observed 0
    assert out["n_queries"] == 20
    assert out["mean_diff"] == 0.0
    assert out["p_value"] == 1.0


def test_randomization_consistent_winner_significant(spark):
    from themis_search_engine_spark.queryeng.evalmetrics import (
        paired_randomization_test,
    )

    a = spark.createDataFrame(
        [(q, 0.8) for q in range(1, 17)], "qid int, ap double"
    )
    b = spark.createDataFrame(
        [(q, 0.3) for q in range(1, 17)], "qid int, ap double"
    )
    out = paired_randomization_test(a, b, "ap", rounds=256).collect()[0]
    # 16 equal diffs: a permutation ties |obs| only when all 16 signs
    # agree — vanishingly rare under the md5 assignment, so p is at the
    # add-one floor and the advantage is significant.
    assert out["mean_diff"] == 0.5
    assert out["p_value"] < 0.05
    # symmetry: swapping the rankers flips the sign, not the p-value
    swapped = paired_randomization_test(b, a, "ap", rounds=256).collect()[0]
    assert swapped["mean_diff"] == -0.5
    assert swapped["p_value"] == out["p_value"]
