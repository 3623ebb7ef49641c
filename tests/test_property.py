"""Property tests (hypothesis): varbyte codec, tokenizer invariants,
Porter stemmer stability. Pure-Python — no SparkSession needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from themis_search_engine_spark.indexing.compress import vb_decode, vb_encode
from themis_search_engine_spark.porter import stem
from themis_search_engine_spark.textproc import normalize_py, tokenize_py


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert vb_decode(vb_encode(arr)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=127), min_size=1,
                max_size=200))
def test_varbyte_small_values_one_byte(values):
    arr = np.array(values, dtype=np.uint64)
    assert len(vb_encode(arr)) == len(values)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_normalize_idempotent_and_ascii(text):
    n = normalize_py(text)
    assert normalize_py(n) == n
    assert all(c.isascii() and (c.isalnum() or c == " ") or c == " "
               for c in n)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_tokenize_terms_are_clean(text):
    for t in tokenize_py(text, stem=False):
        assert t and t == t.lower()
        assert " " not in t


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
               max_size=30))
def test_porter_stable_and_idempotent_on_stems(word):
    s = stem(word)
    assert s  # never empties a word
    assert stem(word) == s  # deterministic
    # stemming is not idempotent in general for Porter, but must not blow up
    assert len(stem(s)) <= len(word) + 2
