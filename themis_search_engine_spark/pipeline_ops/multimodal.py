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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_sig", StringType(), False),
    ]
)


def frame_sample(blobs: DataFrame, k: int = 3) -> DataFrame:
    """'Video' frame sampling plumbing: emit k deterministic frames per
    blob. A real sampler (pyav) decodes at timestamps; the stub derives
    frame signatures from byte windows of the blob — per-blob fan-out,
    Arrow-batched, one row per (doc, frame). frame_sig is a hex digest so
    the lane is engine-portable (DuckDB oracle mirrors the window math).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(media)
                for j in range(k):
                    # frame j = 4-byte window starting at j*4 (wraps via mod)
                    off = (j * 4) % max(len(b) - 3, 1)
                    rows.append((int(doc_id), j, b[off:off + 4].hex()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_sig"]
            )

    return blobs.select("doc_id", "media").mapInPandas(gen, FRAME_SCHEMA)


def media_feature_vectors(
    blobs: DataFrame, dim: int = 8
) -> DataFrame:
    """(doc_id, embedding array<float>) — deterministic pseudo-features
    from blob bytes (byte pairs scaled to [0,1)); the integration point
    for a real encoder. Output schema matches the ANN operators
    (simsearch.cosine_topk / ivf_topk), closing the multimodal → ANN lane.
    """
    assert dim <= 8, "fake blobs carry 16 bytes -> at most 8 byte-pair dims"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            mats = []
            for media in pdf["media"]:
                b = np.frombuffer(bytes(media)[: 2 * dim], dtype=np.uint8)
                mats.append((b[0::2].astype(np.float32) * 256
                             + b[1::2]) / 65536.0)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"],
                 "embedding": [m.tolist() for m in mats]}
            )

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )
    return blobs.select("doc_id", "media").mapInPandas(gen, schema)
