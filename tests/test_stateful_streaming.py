"""applyInPandasWithState: cross-micro-batch exact dedup with keyed state."""

from themis_search_engine_spark.streaming.stateful import streaming_exact_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    # corpus with duplicates: doc i and i+100 share text for i in 0..49;
    # land as multiple files → multiple micro-batches
    rows = []
    for i in range(100):
        rows.append((i, f"text number {i % 50}"))
    for i in range(100, 150):
        rows.append((i, f"text number {i - 100}"))  # dup of 0..49
    df = spark.createDataFrame(rows, "doc_id long, text string")
    in_dir = str(tmp_path / "in")
    df.repartition(4).write.parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM dedup_out").collect()
    # exactly one survivor per distinct text (50 distinct texts)
    assert len(got) == 50
    assert len({r["content_hash"] for r in got}) == 50
    # duplicates of a hash never appear twice even across batches
    by_hash = {}
    for r in got:
        assert r["content_hash"] not in by_hash
        by_hash[r["content_hash"]] = r["doc_id"]
