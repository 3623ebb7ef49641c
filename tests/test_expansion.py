"""P6/P7 expansion operators: plan-shape guarantees for the banded
embedding-synonym path (the 100 TB plan must not contain the |V|²
all-pairs join) and the srp_signature dim guard.

Value correctness of the expansion queries is driver-contract-tested
against DuckDB in test_driver_contract.py (query_expansion,
query_expansion_emb, bm25_topk_expanded, bm25_topk_expanded_emb).
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.queryeng.expansion import (
    embedding_synonyms,
    term_vectors,
)


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    # 6 docs × 8 dims, deterministic values
    rows = [
        (i, [float((i * 7 + d * 3) % 5) - 2.0 for d in range(8)])
        for i in range(6)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def tiny_term_docs(spark):
    rows = [
        ("fox", 0), ("fox", 5), ("dog", 0), ("dog", 2), ("lazy", 2),
        ("quick", 0), ("quick", 4), ("query", 4), ("engine", 1),
    ]
    return spark.createDataFrame(rows, "term string, doc_id long")


def test_banded_plan_has_no_all_pairs_join(tiny_term_docs, tiny_vecs):
    syn = embedding_synonyms(
        tiny_term_docs, tiny_vecs, top_n=2, banded=True, cache=False
    )
    plan = _plan(syn)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate join is keyed on (band, key) — the banding is real
    assert "band" in plan


def test_all_pairs_twin_is_explicit_opt_in(tiny_term_docs, tiny_vecs):
    syn = embedding_synonyms(
        tiny_term_docs, tiny_vecs, top_n=2, banded=False, cache=False
    )
    plan = _plan(syn)
    assert ("CartesianProduct" in plan) or ("BroadcastNestedLoopJoin" in plan)


def test_banded_matches_all_pairs_on_surviving_terms(
    tiny_term_docs, tiny_vecs
):
    """Banded output is the exact top-n over the candidate subset: every
    banded (term, synonym) whose term also has >= top_n all-pairs
    neighbors among candidates must appear in the all-pairs top-n when
    the candidate set retained those neighbors. Sanity-level recall check
    at tiny scale (16 planes over 6 terms -> candidates are dense)."""
    banded = set(
        map(tuple, embedding_synonyms(
            tiny_term_docs, tiny_vecs, top_n=2, banded=True, cache=False
        ).collect())
    )
    allp = set(
        map(tuple, embedding_synonyms(
            tiny_term_docs, tiny_vecs, top_n=2, banded=False, cache=False
        ).collect())
    )
    # banded can only lose pairs, never invent them beyond the vocabulary
    terms = {t for t, _ in allp} | {s for _, s in allp}
    assert all(t in terms and s in terms for t, s in banded)
    # at this density the banding should retain most true neighbors
    assert len(banded & allp) >= len(allp) // 2


def test_term_vectors_shape(tiny_term_docs, tiny_vecs):
    tv = term_vectors(tiny_term_docs, tiny_vecs)
    rows = {r["term"]: r["vec"] for r in tv.collect()}
    assert set(rows) == {
        "fox", "dog", "lazy", "quick", "query", "engine",
    }
    assert all(len(v) == 8 for v in rows.values())


def test_srp_signature_dim_mismatch_fails_loud(spark):
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        srp_signature,
    )

    bad = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    sig = srp_signature(bad, n_planes=4, dim=8)
    with pytest.raises(Exception, match="expected 8-dim"):
        sig.collect()


def test_srp_signature_correct_dim_passes(spark):
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        srp_signature,
    )

    ok = spark.createDataFrame(
        [(0, [float(d) for d in range(8)])],
        "vec_id long, embedding array<float>",
    )
    rows = srp_signature(ok, n_planes=4, dim=8).collect()
    assert len(rows) == 1 and rows[0]["srp"] is not None


def test_embedding_synonyms_no_cache_leak(spark, tiny_term_docs, tiny_vecs):
    """cache=False must leave no new cached RDDs behind after an action."""
    spark.catalog.clearCache()
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    embedding_synonyms(
        tiny_term_docs, tiny_vecs, top_n=1, banded=True, cache=False
    ).collect()
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after == before


def test_prefix_synonyms_group_cap(spark):
    from themis_search_engine_spark.queryeng.expansion import prefix_synonyms

    # 10 terms share prefix "inte"; cap at 3 -> only the 3 asc-first terms
    terms = [(f"inte{c}",) for c in "abcdefghij"] + [("zebra",)]
    d = spark.createDataFrame(terms, "term string")
    out = prefix_synonyms(d, prefix_len=4, max_group=3).collect()
    got_terms = {r["term"] for r in out} | {r["synonym"] for r in out}
    assert got_terms == {"intea", "inteb", "intec"}
    assert len(out) == 3 * 2  # capped group of 3 -> 6 directed pairs


def test_collect_idf_map_size_guard(spark):
    import pytest as _pytest

    from themis_search_engine_spark.queryeng.sharded import collect_idf_map

    d = spark.createDataFrame(
        [(f"t{i}", 1.0) for i in range(10)], "term string, idf double"
    )
    assert len(collect_idf_map(d)) == 10
    with _pytest.raises(ValueError, match="max_terms"):
        collect_idf_map(d, max_terms=5)
