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


def test_streaming_sessionize_equals_batch(spark, tmp_path):
    """Per-user session numbering from the keyed-state streaming op equals
    the batch sessionize over the same (time-ordered) event log."""
    from datetime import datetime, timedelta

    from themis_search_engine_spark.pipeline_ops.sessions import sessionize
    from themis_search_engine_spark.streaming.stateful import (
        streaming_sessionize,
    )

    T = datetime(2024, 3, 1, 8, 0, 0)
    rows = []
    eid = 0
    for u in range(5):
        t = T
        for k in range(12):
            # alternate small gaps (same session) and >30 min breaks
            t = t + timedelta(minutes=(5 if k % 3 else 40), seconds=u)
            rows.append((eid, u, t))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    in_dir = str(tmp_path / "ev")
    # time-ordered log: one file, ordered by event time
    events.orderBy("ts", "event_id").coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(in_dir)
    out = streaming_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_id"]): (r["user_id"], r["session_idx"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert got == want and len(got) == len(rows)


def test_streaming_snapshot_diff_equals_batch(spark, tmp_path):
    """Stream ≡ batch: fed ts-ordered crawl files, each url's FINAL
    emitted row equals the batch snapshot_diff verdict, and every
    arriving snapshot emits exactly one change-data row."""
    from themis_search_engine_spark.pipeline_ops.websnap import snapshot_diff
    from themis_search_engine_spark.streaming.stateful import (
        streaming_snapshot_diff,
    )

    rows = [
        # (doc_id, url, warc_ts, text) — two crawl waves
        (0, "u1", 100, "alpha"), (1, "u2", 100, "beta"),
        (2, "u3", 100, "gamma"),
        (3, "u1", 200, "alpha CHANGED"), (4, "u2", 200, "beta"),
        (5, "u4", 200, "delta"),
    ]
    schema = "doc_id long, url string, warc_ts long, text string"
    wave1 = spark.createDataFrame(rows[:3], schema)
    wave2 = spark.createDataFrame(rows[3:], schema)
    in_dir = str(tmp_path / "in")
    wave1.coalesce(1).write.parquet(in_dir)
    wave2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        streaming_snapshot_diff(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("snapdiff_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM snapdiff_out").collect()
    assert len(got) == len(rows)  # one change-data row per snapshot
    final = {}
    for r in sorted(got, key=lambda r: r["doc_id"]):
        final[r["url"]] = r
    batch = {
        r["url"]: r
        for r in snapshot_diff(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert set(final) == set(batch)
    for url, b in batch.items():
        s = final[url]
        assert (s["doc_id"], s["prev_doc_id"], s["status"]) == (
            b["cur_doc_id"], b["prev_doc_id"], b["status"]
        ), url


def test_streaming_snapshot_diff_multichunk_group(spark, tmp_path):
    """A group split across Arrow chunks must be concatenated BEFORE
    sorting: with maxRecordsPerBatch=2 and one url's 6 snapshots arriving
    ts-DESCENDING in one micro-batch, per-chunk sorting would apply
    snapshots out of order and corrupt prev/status."""
    from themis_search_engine_spark.pipeline_ops.websnap import snapshot_diff
    from themis_search_engine_spark.streaming.stateful import (
        streaming_snapshot_diff,
    )

    rows = [
        (i, "u1", 600 - i * 100, f"v{(600 - i * 100) // 200}")
        for i in range(6)  # ts 600..100, texts v3 v2 v2 v1 v1 v0
    ]
    schema = "doc_id long, url string, warc_ts long, text string"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "in")
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(
            str(tmp_path / "in")
        )
        q = (
            streaming_snapshot_diff(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("snapdiff_mc")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = sorted(
        spark.sql("SELECT * FROM snapdiff_mc").collect(),
        key=lambda r: -r["warc_ts"] if "warc_ts" in r else 0,
    )
    # replay in ts order: statuses must be new,(un)changed per text runs
    by_ts = {}
    for r in got:
        by_ts[r["doc_id"]] = r
    # ts ascending = doc_id descending: 5(ts100,v0) 4(200,v1) 3(300,v1)
    # 2(400,v2) 1(500,v2) 0(600,v3)
    expect = {5: "new", 4: "changed", 3: "unchanged",
              2: "changed", 1: "unchanged", 0: "changed"}
    assert {d: by_ts[d]["status"] for d in expect} == expect
    # final row matches batch verdict
    batch = snapshot_diff(spark.createDataFrame(rows, schema)).collect()[0]
    assert (by_ts[0]["doc_id"], by_ts[0]["prev_doc_id"],
            by_ts[0]["status"]) == (
        batch["cur_doc_id"], batch["prev_doc_id"], batch["status"]
    )
