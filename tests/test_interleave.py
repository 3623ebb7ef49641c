"""Team-draft interleaving (queryeng/interleave.py): Spark ≡ python
twin, draft-fairness properties, credit assignment."""

from themis_search_engine_spark.queryeng.interleave import (
    _coin,
    interleave_credit,
    team_draft_interleave,
    team_draft_py,
)


def test_team_draft_py_properties():
    la, lb = [1, 2, 3, 4], [3, 5, 1, 6]
    out = team_draft_py(7, la, lb)
    docs = [d for d, _ in out]
    # a permutation of the union, no repeats
    assert sorted(docs) == sorted(set(la) | set(lb))
    # prefix fairness: pick counts never drift more than 1 apart while
    # both teams still have candidates
    na = nb = 0
    remaining_a, remaining_b = set(la), set(lb)
    for d, t in out:
        if not (remaining_a - {d} if t == "a" else remaining_a) \
           or not remaining_b:
            break
        na, nb = na + (t == "a"), nb + (t == "b")
        remaining_a.discard(d)
        remaining_b.discard(d)
        if remaining_a and remaining_b:
            assert abs(na - nb) <= 1
    # disjoint singleton lists: the coin decides who leads
    first = team_draft_py(7, [10], [20])[0]
    expect = ("a" if _coin(7, 0) == 0 else "b")
    assert first[1] == expect
    # one team exhausted → the other cedes nothing
    assert [d for d, _ in team_draft_py(1, [1, 2], [])] == [1, 2]


def test_spark_matches_python_twin(spark):
    ra = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "qid int, doc_id long, rank long",
    )
    rb = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3),
         (2, 22, 1)],
        "qid int, doc_id long, rank long",
    )
    got = {
        (r["qid"], r["pos"]): (r["doc_id"], r["team"])
        for r in team_draft_interleave(ra, rb).collect()
    }
    want = {}
    for qid, la, lb in [(1, [10, 11, 12], [11, 13, 10]),
                        (2, [20, 21], [22])]:
        for pos, (d, t) in enumerate(team_draft_py(qid, la, lb), 1):
            want[(qid, pos)] = (d, t)
    assert got == want


def test_interleave_credit(spark):
    inter = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 11, 2, "b"), (1, 12, 3, "a"),
         (2, 20, 1, "b")],
        "qid int, doc_id long, pos int, team string",
    )
    clicks = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 11), (2, 99)], "qid int, doc_id long"
    )
    out = {r["qid"]: r for r in interleave_credit(inter, clicks).collect()}
    assert (out[1]["clicks_a"], out[1]["clicks_b"], out[1]["winner"]) \
        == (2, 1, "a")
    assert 2 not in out  # clicked doc was never shown → no vote
