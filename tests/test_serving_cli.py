"""submit_serving_index.py lifecycle CLI: each subcommand runs against the
active session (getOrCreate) and prints one JSON report line. Drives
build → merge-delta → describe → compact → query in-process — the same
argv surface spark-submit dispatches on a cluster."""

import json
import sys

import pytest


@pytest.fixture(scope="module")
def cli(spark):
    sys.path.insert(0, "/root/repo/scripts")
    import submit_serving_index

    return submit_serving_index


def _run(cli, capsys, argv):
    cli.main(argv)
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(out[-1])


def test_cli_lifecycle(spark, cli, capsys, tmp_path):
    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    rows = [(i, f"alpha beta doc{i} gamma") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.where("doc_id < 20").write.parquet(base)
    df.where("doc_id >= 20").write.parquet(delta)
    idx = str(tmp_path / "idx")

    r = _run(cli, capsys, ["build", "--input", base, "--index", idx,
                           "--no-stem", "--partitions", "4"])
    assert r["cmd"] == "build" and r["n_docs"] == 20 and r["postings"] > 0
    assert "postings_write" in r["seconds"]

    r = _run(cli, capsys, ["merge-delta", "--input", delta, "--index", idx,
                           "--no-stem", "--partitions", "4"])
    assert r["n_docs_after"] == 40

    r = _run(cli, capsys, ["describe", "--index", idx])
    assert r["segments"] == 2 and r["max_doc_id"] == 39
    assert "maintenance" in r and isinstance(
        r["maintenance"]["compact"], bool
    )
    assert r["maintenance"]["metrics"]["segments"] == 2

    r = _run(cli, capsys, ["compact", "--index", idx, "--partitions", "4"])
    assert r["segments"] == 1 and r["bound_scales"] == [1.0, 1.0]

    r = _run(cli, capsys, ["query", "--index", idx, "--no-stem",
                           "--queries", "alpha gamma;zzznope", "-k", "3"])
    assert r["n_queries"] == 2 and r["result_rows"] == 3
    assert r["top1"]["0"] is not None and r["top1"]["1"] is None


def test_cli_partitioned_lifecycle(spark, cli, capsys, tmp_path):
    pages = str(tmp_path / "pp.parquet")
    rows = [
        (i, f"alpha beta doc{i} gamma", "en" if i % 2 else "de")
        for i in range(30)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(pages)
    idx = str(tmp_path / "pidx")

    r = _run(cli, capsys, ["build-partitioned", "--input", pages,
                           "--index", idx, "--attr", "lang", "--no-stem",
                           "--partitions", "4"])
    assert r["cmd"] == "build-partitioned"
    assert r["values"] == ["de", "en"] and r["n_docs"] == 30
    assert r["parts"] == {"de": 15, "en": 15}

    r = _run(cli, capsys, ["query-partitioned", "--index", idx,
                           "--queries", "alpha gamma", "--values", "en",
                           "--no-stem", "-k", "3"])
    assert r["result_rows"] == 3 and r["values"] == ["en"]

    r = _run(cli, capsys, ["query-partitioned", "--index", idx,
                           "--queries", "alpha gamma", "--no-stem", "-k", "3"])
    assert r["result_rows"] == 3 and r["values"] == "all"
