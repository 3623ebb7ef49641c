from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from themis_search_engine_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("themis-tests", shuffle_partitions=8)
    yield s


TINY_DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "sparking sparks spark sparked in the engine engine",
    2: "a lazy dog and another lazy lazy dog",
    3: "Ελληνικά μόνο κείμενο",  # normalizes to nothing
    4: "quick queries query the index; indexes indexing!",
    5: "fox FOX Fox f0x 42 42 42",
}


@pytest.fixture(scope="session")
def tiny_docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in TINY_DOCS.items()], "doc_id long, text string"
    )
