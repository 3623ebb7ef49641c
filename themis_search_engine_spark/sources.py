"""Corpus source adapters beyond parquet: the reference's JSON-lines input.

S2 (Semantic Scholar) JSON-lines reader — the reference's corpus format
(S2JsonEntryReader.java:54-159, field defaults :69,74,80,90,146): one JSON
object per line, fixed schema, missing fields defaulting to ''/[]/0. The
Spark mapping is an explicit StructType + spark.read.json (schema-on-read;
no inference pass over 10^12 lines), plus the P1 field-concat that turns
an entry into the indexable text (Indexer.java:307-372 — citations are
deliberately excluded, :336-341).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

S2_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("title", StringType()),
        StructField("paperAbstract", StringType()),
        StructField("entities", ArrayType(StringType())),
        StructField("fieldsOfStudy", ArrayType(StringType())),
        StructField(
            "authors",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField("ids", ArrayType(StringType())),
                    ]
                )
            ),
        ),
        StructField("outCitations", ArrayType(StringType())),
        StructField("journalName", StringType()),
        StructField("sources", ArrayType(StringType())),
        StructField("year", IntegerType()),
        StructField("venue", StringType()),
    ]
)


def read_s2_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S2 entries with the reference's missing-field defaults applied."""
    df = spark.read.schema(S2_SCHEMA).json(path)
    return df.select(
        F.col("id"),
        F.coalesce("title", F.lit("")).alias("title"),
        F.coalesce("paperAbstract", F.lit("")).alias("paperAbstract"),
        F.coalesce("entities", F.array()).alias("entities"),
        F.coalesce("fieldsOfStudy", F.array()).alias("fieldsOfStudy"),
        F.coalesce("authors", F.array()).alias("authors"),
        F.coalesce("outCitations", F.array()).alias("outCitations"),
        F.coalesce("journalName", F.lit("")).alias("journalName"),
        F.coalesce("sources", F.array()).alias("sources"),
        F.coalesce("year", F.lit(0)).alias("year"),
        F.coalesce("venue", F.lit("")).alias("venue"),
    )


def s2_graph_projection(entries: DataFrame) -> DataFrame:
    """S3: the slim (id, authorIds, outCitations) projection feeding the
    citation graph (S2JsonEntryReader.java:162-209)."""
    return entries.select(
        "id",
        F.flatten("authors.ids").alias("authorIds"),
        "outCitations",
    )


def s2_doc_text(entries: DataFrame) -> DataFrame:
    """P1: (id, text) — the exact field concatenation the reference indexes
    (title ⊕ abstract ⊕ journalName ⊕ str(year) ⊕ venue ⊕ entities ⊕
    fieldsOfStudy ⊕ sources ⊕ author names; citations skipped,
    Indexer.java:307-372). Normalization (P2) happens downstream in the
    shared tokenize pipeline, so this stays a pure projection."""
    return entries.select(
        F.col("id"),
        F.concat_ws(
            " ",
            "title",
            "paperAbstract",
            "journalName",
            F.col("year").cast("string"),
            "venue",
            F.array_join("entities", " "),
            F.array_join("fieldsOfStudy", " "),
            F.array_join("sources", " "),
            F.array_join(F.col("authors.name"), " "),
        ).alias("text"),
    )
