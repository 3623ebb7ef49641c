"""Property parity: the Arrow batch kernel (_batch_term_counts) must agree
with the pure-Python oracle pipeline on arbitrary unicode input — the
invariant that makes the pytest rank-identity checks meaningful."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from themis_search_engine_spark.textproc import (
    _batch_term_counts,
    term_counts_py,
)

texts = st.lists(
    st.text(max_size=120), min_size=1, max_size=8
)


def _kernel_counts(docs: list[str], stem: bool) -> dict:
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = _batch_term_counts(pdf, "doc_id", "text", stem)
    res: dict[tuple[int, str], int] = {}
    for _, r in out.iterrows():
        res[(int(r["doc_id"]), r["term"])] = int(r["cnt"])
    return res


@settings(max_examples=150, deadline=None)
@given(texts, st.booleans())
def test_arrow_kernel_matches_python(docs, stem):
    want = {}
    for i, text in enumerate(docs):
        for term, cnt in term_counts_py(text, stem=stem).items():
            want[(i, term)] = cnt
    assert _kernel_counts(docs, stem) == want


def test_pyarrow_split_whitespace_regression():
    """pyarrow 16.x utf8_split_whitespace can emit a stale ' ' token on
    buffers shrunk by multibyte replace_substring_regex; the kernel's
    vocab guard must drop it (hypothesis-found falsifying example)."""
    docs = [
        "\x80ðbÑ", "00\x88\U0004c2a5",
        "0000000000\x80\x80\x80\x80𐀀𐀀𐀀𐀀𐀀",
        "\x80𐀀𐀀𐀀", "\x80𐀀𐀀𐀀",
        "0000\x80\x80\x80\x80\x80\x80\x80\x80𐀀𐀀𐀀𐀀𐀀𐀀𐀀",
    ]
    got = _kernel_counts(docs, False)
    want = {}
    for i, text in enumerate(docs):
        for term, cnt in term_counts_py(text, stem=False).items():
            want[(i, term)] = cnt
    assert got == want
    assert all(" " not in term for (_i, term) in got)


@settings(max_examples=50, deadline=None)
@given(texts)
def test_kernel_doc_stats_consistent(docs):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = _batch_term_counts(pdf, "doc_id", "text", True)
    for doc_id, grp in out.groupby("doc_id"):
        assert (grp["maxcnt"] == grp["cnt"].max()).all()
        assert (grp["length"] == grp["cnt"].sum()).all()
