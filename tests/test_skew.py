"""North-rule skew handling: a 100%-df head term must not concentrate the
postings shuffle into one task, and compressed chunking must bound its
group sizes."""

from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.indexing.compress import (
    build_postings_compressed,
)


def _skewed_corpus(spark, n_docs=2000):
    # every doc contains the head term 5x; tail terms are per-doc unique
    rows = [
        (i, "head " * 5 + f"tail{i} tail{i % 7} word{i % 31}")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_salted_write_balances_head_term(spark, tmp_path):
    from themis_search_engine_spark.indexing.build import build_and_save

    docs = _skewed_corpus(spark)
    idx = build_and_save(docs, str(tmp_path / "idx"), stem=False,
                         term_buckets=8)
    # head term present in every doc
    head_df = idx.dictionary.where("term = 'head'").collect()[0]["df"]
    assert head_df == 2000
    # the written postings: no single file holds the whole head term's
    # postings (salt=4 splits it across >= 2 files)
    files = (
        idx.postings_flat.where("term = 'head'")
        .select(F.input_file_name().alias("f"))
        .groupBy("f").count().collect()
    )
    assert len(files) >= 2
    assert max(r["count"] for r in files) < 2000


def test_chunking_bounds_head_term_groups(spark):
    docs = _skewed_corpus(spark)
    idx = build_index(docs, stem=False)
    comp = build_postings_compressed(
        idx.counts, idx.doc_stats, idx.avgdl, chunk_bits=8
    )  # 256-doc chunks
    head = comp.where("term = 'head'").select("chunk", "df_chunk").collect()
    # 2000 docs / 256-doc ranges -> 8 chunks, each bounded by chunk size
    assert len(head) == 8
    assert all(r["df_chunk"] <= 256 for r in head)
    assert sum(r["df_chunk"] for r in head) == 2000


def test_serving_build_layout_invariant_to_input_partitioning(spark, tmp_path):
    """The serving index is a pure function of the corpus: rebuilding from a
    differently-partitioned input yields the identical compressed chunk set,
    and the fixed-width (term, chunk) shuffle bounds every head-term group."""
    from themis_search_engine_spark.indexing.build import build_and_save_serving

    docs = _skewed_corpus(spark)

    def chunk_set(path):
        sv = build_and_save_serving(
            docs.repartition(*path[1]), str(tmp_path / path[0]),
            stem=False, chunk_bits=8, partitions=path[2],
        )
        return {
            (r["term"], r["chunk"]): (r["df_chunk"], bytes(r["doc_bytes"]))
            for r in sv.compressed.collect()
        }

    a = chunk_set(("a", [2], 16))
    b = chunk_set(("b", [7, "doc_id"], 16))
    assert a == b and len(a) > 0
    # head term (df=2000, every doc) split into bounded 256-doc-range groups
    head = [(k[1], v[0]) for k, v in a.items() if k[0] == "head"]
    assert len(head) == 8
    assert all(df <= 256 for _, df in head)
