"""P1 invariant (BASELINE.json input_hint): extraction(html) == text,
byte-identical per url — including multibyte (Greek) docs. Plus dense
deterministic docID assignment."""

from themis_search_engine_spark.corpus import (
    assign_doc_ids,
    extract_text,
    synth_pages,
)


def test_extraction_byte_identical(spark):
    pages = synth_pages(spark, 500, partitions=8)
    joined = extract_text(pages).withColumnRenamed("text", "extracted").join(
        pages.select("url", "text", "lang"), "url"
    )
    rows = joined.collect()
    assert len(rows) == 500
    mismatches = [r for r in rows if r["extracted"] != r["text"]]
    assert mismatches == []
    # multibyte docs included in the corpus and extracted byte-exactly
    greek = [r for r in rows if r["lang"] == "el"]
    assert greek and all("ελληνικό" in r["extracted"] for r in greek)
    # byte-level check (not just str equality after normalization)
    for r in rows[:50] + greek:
        assert r["extracted"].encode("utf-8") == r["text"].encode("utf-8")


def test_extraction_deterministic(spark):
    pages = synth_pages(spark, 200, partitions=4)
    a = sorted((r["url"], r["text"]) for r in extract_text(pages).collect())
    b = sorted((r["url"], r["text"]) for r in extract_text(pages).collect())
    assert a == b


def test_assign_doc_ids_dense_and_deterministic(spark):
    pages = synth_pages(spark, 300, partitions=8)
    ids1 = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(pages, partitions=4).collect()
    }
    # dense 0..N-1
    assert sorted(ids1.values()) == list(range(300))
    # deterministic under a different partitioning
    ids2 = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(pages.repartition(13), partitions=4).collect()
    }
    assert ids1 == ids2
