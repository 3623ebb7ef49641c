"""KMV cardinality sketch, priority sampling, and suffix wildcard."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from themis_search_engine_spark.pipeline_ops.sampling import priority_sample
from themis_search_engine_spark.pipeline_ops.sketches import kmv_distinct
from themis_search_engine_spark.queryeng.spell import suffix_qterms


def _vals(grp: str, n: int):
    return [(grp, f"{grp}-value-{i}") for i in range(n)]


def test_kmv_exact_branch_below_k(spark):
    """A group with fewer than k distinct values gets the EXACT count
    (the sketch is the whole set), including duplicate collapsing."""
    rows = _vals("small", 10) + _vals("small", 10)  # dups collapse
    df = spark.createDataFrame(rows, "grp string, v string")
    out = kmv_distinct(df, "grp", "v", k=64).collect()
    assert len(out) == 1
    assert out[0].sketch_size == 10
    assert out[0].est_distinct == 10.0


def test_kmv_estimator_branch_accuracy(spark):
    """With k=64 over 500 distinct values the (k-1)/U estimate lands
    within the sketch's stderr regime (~1/sqrt(k-2) ≈ 13%); assert a
    loose 3-sigma band so the test pins correctness, not luck."""
    df = spark.createDataFrame(_vals("big", 500), "grp string, v string")
    out = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    assert out.sketch_size == 64
    assert 500 * 0.6 <= out.est_distinct <= 500 * 1.4


def test_kmv_salt_invariance(spark):
    """The salted two-phase bottom-k must be a pure optimization: the
    sketch (and therefore the estimate) is identical for any salts."""
    rows = _vals("g1", 300) + _vals("g2", 30)
    df = spark.createDataFrame(rows, "grp string, v string")
    a = sorted(kmv_distinct(df, "grp", "v", k=32, salts=2).collect())
    b = sorted(kmv_distinct(df, "grp", "v", k=32, salts=16).collect())
    assert a == b


def test_kmv_matches_reference_math(spark):
    """Recompute the kth hash and the estimate in pure Python."""
    n, k = 200, 16
    df = spark.createDataFrame(_vals("g", n), "grp string, v string")
    out = kmv_distinct(df, "grp", "v", k=k).collect()[0]
    hashes = sorted(
        hashlib.md5(f"g-value-{i}".encode()).hexdigest() for i in range(n)
    )
    hk = hashes[k - 1]
    frac = int(hk[:13], 16) / float(16**13)
    import math

    expected = math.floor((k - 1) / frac * 1e6 + 0.5) / 1e6
    assert out.est_distinct == expected


def test_quantile_sketch_exact_when_group_fits(spark):
    """m <= k: the sample IS the group, so estimates are the exact
    nearest-rank quantiles."""
    from themis_search_engine_spark.pipeline_ops.sketches import (
        quantile_sketch,
    )

    rows = [(i, "g", float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v double")
    out = {
        r.q: r.est
        for r in quantile_sketch(
            df, "grp", "v", qs=[0.2, 0.5, 1.0], k=64
        ).collect()
    }
    # sorted = [1,3,5,7,9]; ceil(0.2*5)=1, ceil(0.5*5)=3, ceil(1*5)=5
    assert out == {0.2: 1.0, 0.5: 5.0, 1.0: 9.0}


def test_quantile_sketch_matches_python_twin(spark):
    """Sampling branch: recompute the bottom-k sample + nearest-rank
    quantile in pure Python (same md5 hash, same index math)."""
    import math

    from themis_search_engine_spark.pipeline_ops.sketches import (
        quantile_sketch,
    )

    n, k = 200, 32
    rows = [(i, "g", float((i * 13) % 97)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v double")
    out = {
        r.q: r.est
        for r in quantile_sketch(
            df, "grp", "v", qs=[0.5, 0.9], k=k, salts=4
        ).collect()
    }
    byhash = sorted(
        (hashlib.md5(f"qsketch|{i}".encode()).hexdigest(), float((i * 13) % 97))
        for i in range(n)
    )
    sample = sorted(v for _, v in byhash[:k])
    for q in (0.5, 0.9):
        idx = max(1, math.ceil(q * k))
        assert out[q] == sample[idx - 1]


def _docs_with_weights(spark, n):
    return spark.createDataFrame(
        [(i, 10 + (i * 7) % 90) for i in range(n)],
        "doc_id long, n_chars long",
    )


def test_priority_sample_is_topk_by_priority(spark):
    """The sample must be exactly the k highest-priority rows, with
    priorities recomputed independently (md5 + quantization in pure
    Python), and w_hat = max(w, tau) with tau the (k+1)-th priority."""
    import math

    n, k = 120, 20
    docs = _docs_with_weights(spark, n)
    out = {r.doc_id: r for r in priority_sample(docs, k=k).collect()}
    prios = []
    for i in range(n):
        w = 10 + (i * 7) % 90
        h = int(
            hashlib.md5(f"priority|{i}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / 4294967296.0
        q = math.floor(w / u * 1e6 + 0.5) / 1e6
        prios.append((q, i, w))
    prios.sort(key=lambda t: (-t[0], t[1]))
    expect = prios[:k]
    tau = prios[k][0]
    assert sorted(out) == sorted(i for _, i, _ in expect)
    for rank, (q, i, w) in enumerate(expect, start=1):
        assert out[i].priority == q
        assert out[i].rank == rank
        assert out[i].w_hat == max(float(w), tau)


def test_priority_sample_small_corpus_keeps_all(spark):
    """k >= corpus size: every row kept, tau undefined, w_hat = w."""
    docs = _docs_with_weights(spark, 5)
    rows = priority_sample(docs, k=10).collect()
    assert len(rows) == 5
    assert all(r.w_hat == r.weight for r in rows)


def test_suffix_qterms_expansion(spark):
    """*suffix expands to dictionary terms ending with the suffix,
    df-desc capped — via the reversed-term range predicate."""
    dictionary = spark.createDataFrame(
        [
            ("customer", 50),
            ("filter", 80),
            ("order", 60),
            ("merge", 10),
            ("scan", 40),
            ("era", 99),  # contains 'er' but does not END with it
        ],
        "term string, df long",
    )
    out = suffix_qterms(
        spark, dictionary, {1: "er", 2: "an"}, max_terms=2
    ).collect()
    got = {(r.qid, r.term) for r in out}
    # top-2 by df among {filter:80, order:60, customer:50} and {scan:40}
    assert got == {(1, "filter"), (1, "order"), (2, "scan")}
    assert all(r.qweight == 1.0 for r in out)


def test_suffix_qterms_range_predicate_plan(spark):
    """The expansion must stay a range predicate on reverse(term) — no
    unanchored LIKE/contains in the plan (the 100 TB shape: a sorted
    reversed dictionary serves it with row-group pruning)."""
    dictionary = spark.createDataFrame(
        [("filter", 80)], "term string, df long"
    )
    plan = suffix_qterms(
        spark, dictionary, {1: "er"}
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Contains" not in plan and "LIKE" not in plan.upper()


# --- Count-Min heavy hitters -------------------------------------------------

def test_cms_never_underestimates(spark):
    """CMS point estimates are ≥ the true count for EVERY value (the
    one-sided error guarantee), and the sketch is depth·width rows max."""
    from collections import Counter

    from themis_search_engine_spark.pipeline_ops.sketches import (
        cms_counts,
        cms_heavy_hitters,
    )

    vals = [f"u{i % 17}" for i in range(500)] + ["hot"] * 200
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sketch = cms_counts(df, "v", depth=4, width=16).collect()
    assert len(sketch) <= 4 * 16
    hh = cms_heavy_hitters(df, "v", depth=4, width=16, top_n=50).collect()
    got = {r["value"]: r["est"] for r in hh}
    assert set(got) == set(truth)  # top_n=50 > 18 distinct: all probed
    for v, est in got.items():
        assert est >= truth[v], (v, est, truth[v])


def test_cms_top1_is_true_top1(spark):
    """With a width giving few collisions, the estimated top-1 is the
    true heavy hitter and its estimate is exact (no colliding value in
    any of its 4 buckets at width=256 for 18 distinct values — pinned
    by this test; a collision would only RAISE a lighter value)."""
    from themis_search_engine_spark.pipeline_ops.sketches import (
        cms_heavy_hitters,
    )

    vals = [f"u{i % 17}" for i in range(340)] + ["hot"] * 99
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    hh = cms_heavy_hitters(df, "v", depth=4, width=256, top_n=3).collect()
    top = {r["rank"]: r for r in hh}
    assert top[1]["value"] == "hot"
    assert top[1]["est"] == 99


def test_cms_weighted(spark):
    """weight_col: the sketch counts Σ weight, not rows."""
    from themis_search_engine_spark.pipeline_ops.sketches import (
        cms_heavy_hitters,
    )

    rows = [("a", 10), ("a", 5), ("b", 1), ("c", 2)]
    df = spark.createDataFrame(rows, "v string, w long")
    hh = cms_heavy_hitters(
        df, "v", depth=4, width=256, top_n=1, weight_col="w"
    ).collect()
    assert hh[0]["value"] == "a" and hh[0]["est"] == 15


# --- token-budget sampling ---------------------------------------------------

def test_token_budget_fill_and_overshoot(spark):
    from themis_search_engine_spark.pipeline_ops.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    out = token_budget_sample(docs, 300).collect()
    total = sum(r["n_tokens"] for r in out)
    # filled: within budget before the last doc, overshoot ≤ 1 doc
    last = max(out, key=lambda r: r["cum_tokens"])
    assert total == last["cum_tokens"]
    assert total - last["n_tokens"] < 300 <= total + last["n_tokens"]


def test_token_budget_nested_prefix(spark):
    """Growing the budget only APPENDS documents — smaller samples are
    prefixes of larger ones (the hash-order prefix property)."""
    from themis_search_engine_spark.pipeline_ops.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i % 11))) for i in range(300)],
        "doc_id long, text string",
    )
    small = {r["doc_id"] for r in token_budget_sample(docs, 200).collect()}
    big = {r["doc_id"] for r in token_budget_sample(docs, 800).collect()}
    assert small and small < big


def test_token_budget_whole_corpus_when_budget_large(spark):
    from themis_search_engine_spark.pipeline_ops.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(20)], "doc_id long, text string"
    )
    out = token_budget_sample(docs, 10_000).collect()
    assert len(out) == 20  # everything fits: no pre-filter, no trim
