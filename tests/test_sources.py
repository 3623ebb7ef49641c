"""S2 JSON-lines reader: schema-on-read, defaults, graph projection, P1
field concat (S2JsonEntryReader.java semantics)."""

import json

from themis_search_engine_spark.sources import (
    read_s2_jsonl,
    s2_doc_text,
    s2_graph_projection,
)

FULL = {
    "id": "a" * 40,
    "title": "Deep Retrieval",
    "paperAbstract": "We study ranking.",
    "entities": ["IR", "ranking"],
    "fieldsOfStudy": ["Computer Science"],
    "authors": [
        {"name": "Ada L", "ids": ["1"]},
        {"name": "Bob K", "ids": ["2", "3"]},
    ],
    "outCitations": ["b" * 40],
    "journalName": "JIR",
    "sources": ["DBLP"],
    "year": 2019,
    "venue": "SIGIR",
}
SPARSE = {"id": "c" * 40}  # everything else missing → defaults


def _write(tmp_path):
    p = tmp_path / "s2.jsonl"
    with open(p, "w") as fh:
        fh.write(json.dumps(FULL) + "\n")
        fh.write(json.dumps(SPARSE) + "\n")
    return str(p)


def test_defaults_and_schema(spark, tmp_path):
    df = read_s2_jsonl(spark, _write(tmp_path))
    rows = {r["id"]: r for r in df.collect()}
    sparse = rows["c" * 40]
    assert sparse["title"] == "" and sparse["journalName"] == ""
    assert sparse["entities"] == [] and sparse["authors"] == []
    assert sparse["year"] == 0
    full = rows["a" * 40]
    assert full["year"] == 2019
    assert [a["name"] for a in full["authors"]] == ["Ada L", "Bob K"]


def test_graph_projection(spark, tmp_path):
    df = s2_graph_projection(read_s2_jsonl(spark, _write(tmp_path)))
    rows = {r["id"]: r for r in df.collect()}
    assert rows["a" * 40]["authorIds"] == ["1", "2", "3"]
    assert rows["a" * 40]["outCitations"] == ["b" * 40]
    assert rows["c" * 40]["authorIds"] == []


def test_doc_text_field_concat(spark, tmp_path):
    df = s2_doc_text(read_s2_jsonl(spark, _write(tmp_path)))
    rows = {r["id"]: r["text"] for r in df.collect()}
    assert rows["a" * 40] == (
        "Deep Retrieval We study ranking. JIR 2019 SIGIR IR ranking "
        "Computer Science DBLP Ada L Bob K"
    )
    # sparse doc: empty fields leave only separators around the year-0
    # token; the downstream tokenizer (P2/P3) collapses them, so the
    # invariant is the token stream, not the raw concat string
    assert rows["c" * 40].split() == ["0"]
