"""build_and_save (streamlined salted-shuffle build) ≡ build_index."""

import pytest

from themis_search_engine_spark.corpus import load_documents
from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.indexing.build import build_and_save

SF_DIR = "/root/testdata/sf0.001"


def test_build_and_save_equals_logical_build(spark, tmp_path):
    docs = load_documents(spark, SF_DIR).select("doc_id", "text")
    idx_d = build_and_save(docs, str(tmp_path / "idx"), stem=True,
                           term_buckets=8)
    idx_m = build_index(docs, stem=True)

    a = sorted(
        (r["term"], r["doc_id"], round(r["tf"], 9), r["length"])
        for r in idx_d.postings_flat.collect()
    )
    b = sorted(
        (r["term"], r["doc_id"], round(r["tf"], 9), r["length"])
        for r in idx_m.postings_flat.collect()
    )
    assert a == b
    da = sorted((r["term"], r["df"]) for r in idx_d.dictionary.collect())
    db = sorted((r["term"], r["df"]) for r in idx_m.dictionary.collect())
    assert da == db
    assert idx_d.n_docs == idx_m.n_docs
    assert idx_d.avgdl == pytest.approx(idx_m.avgdl)
    sa = sorted((r["doc_id"], r["length"]) for r in idx_d.doc_stats.collect())
    sb = sorted((r["doc_id"], r["length"]) for r in idx_m.doc_stats.collect())
    assert sa == sb
