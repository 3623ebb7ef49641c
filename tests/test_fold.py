"""Accent folding: Column/python-twin parity, map sanity, P2 composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_search_engine_spark.textproc import (
    FOLD_DST,
    FOLD_SRC,
    fold_accents,
    fold_accents_py,
    normalize_expr,
    tokenize_py,
)

SAMPLES = [
    ("Café crème brûlée", "Cafe creme brulee"),
    ("Größe weiß", "Grosse weiss"),          # ß → ss (1→2 ligature)
    ("Œuvre æble", "OEuvre aeble"),          # ligatures both cases
    ("Dvořák žlutý kůň", "Dvorak zluty kun"),
    ("plain ascii", "plain ascii"),           # no-op on ASCII
    ("日本語 текст", "日本語 текст"),          # unmapped scripts untouched
]


def test_fold_map_wellformed():
    assert len(FOLD_SRC) == len(FOLD_DST)
    assert len(set(FOLD_SRC)) == len(FOLD_SRC)  # no duplicate sources
    assert all(ord(c) < 128 for c in FOLD_DST)  # targets are ASCII


def test_python_twin():
    for raw, want in SAMPLES:
        assert fold_accents_py(raw) == want, raw


def test_column_matches_python_twin(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(SAMPLES)], "i long, t string"
    )
    got = {
        r.i: r.f
        for r in df.select("i", fold_accents(F.col("t")).alias("f")).collect()
    }
    for i, (raw, want) in enumerate(SAMPLES):
        assert got[i] == want, raw


def test_fold_then_p2_keeps_words(spark):
    """Without folding P2 shreds 'café' to 'caf'; with folding it
    survives as 'cafe'."""
    df = spark.createDataFrame([(1, "Café déjà vu")], "doc_id long, t string")
    plain = df.select(normalize_expr(F.col("t")).alias("n")).collect()[0].n
    folded = df.select(
        normalize_expr(fold_accents(F.col("t"))).alias("n")
    ).collect()[0].n
    assert plain.split() == ["caf", "d", "j", "vu"]
    assert folded.split() == ["cafe", "deja", "vu"]
    # and the python pipeline agrees end-to-end
    assert tokenize_py(fold_accents_py("Café déjà vu"), stem=False) == [
        "cafe", "deja", "vu",
    ]
