"""Multimodal binary-column plumbing: schema, batching, decode UDF shape.

Images/audio/video ride in opaque ``binary`` columns with typed metadata,
exactly like the corpus table's ``html binary`` column (BASELINE.json
input_hint). The Spark-side machinery here is real and tested: binary
columns through Arrow batches, mapInPandas decode signature, metadata
struct schema, partition sizing for large blobs. The codec itself is
STUBBED — this container has no image/audio libraries — behind
:func:`decode_media_real`, which raises NotImplementedError with the
integration point documented; :func:`decode_media_meta` implements a
deterministic header parse (the fake codec) so the plumbing is testable
end-to-end and DuckDB-oracle-checkable.

Header layout of the synthetic blobs (attach_fake_blobs): 16 bytes =
md5(text); byte 0 → format, bytes 1-2 → width, bytes 3-4 → height. A real
pipeline swaps attach_fake_blobs for the table's real binary column and
decode_media_meta for a PIL/ffmpeg batch decode with the SAME signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ["png", "jpeg", "webp"]

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_format", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media", BinaryType(), False),
    ]
)


def attach_fake_blobs(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, media binary) — deterministic 16-byte blobs (md5 of text).

    Stands in for reading a real media column; unhex(md5()) is a native
    expression, so blob synthesis adds no Python.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.unhex(F.md5(F.col(text_col))).alias("media"),
    )


def decode_media_meta(blobs: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': parse typed metadata out of each blob.

    The real decode (pixels, frames, waveforms) plugs in here with the
    same (Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame] shape; batch
    size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch, so
    blob memory per batch = batch_rows × blob_size — size accordingly for
    multi-MB media (set maxRecordsPerBatch low, or repartition first).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            b = media.map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": b.map(lambda x: FORMATS[x[0] % 3]),
                    "width": b.map(lambda x: x[1] * 256 + x[2]),
                    "height": b.map(lambda x: x[3] * 256 + x[4]),
                    "n_bytes": b.map(len),
                }
            )

    return blobs.select("doc_id", "media").mapInPandas(gen, MEDIA_META_SCHEMA)


def decode_media_real(blobs: DataFrame) -> DataFrame:
    """Integration point for a real codec (PIL / torchaudio / pyav).

    STUB: the sandbox has none of those libraries. A real implementation
    mirrors decode_media_meta's mapInPandas shape and emits decoded
    features (pixel tensors flattened to array<float>, frame samples, ...).
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; use decode_media_meta "
        "for the metadata path and slot a batch decoder with the same "
        "mapInPandas signature here"
    )


def media_meta_pipeline(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """docs → blobs → decoded metadata, the end-to-end multimodal lane."""
    return decode_media_meta(attach_fake_blobs(docs, text_col=text_col,
                                               id_col=id_col))
