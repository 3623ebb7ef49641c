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


def _del_keys(w: str) -> set[str]:
    """Python twin of spell._DELETION_KEYS: {w} ∪ single-char deletions."""
    return {w} | {w[:i] + w[i + 1:] for i in range(len(w))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcde", min_size=1, max_size=8),
    st.text(alphabet="abcde", min_size=1, max_size=8),
)
def test_deletion_key_candidates_complete_at_distance_1(a, b):
    """The SymSpell identity spell_suggest relies on: ANY pair within
    levenshtein distance 1 shares a deletion key — the banded candidate
    join loses nothing the exact verify would keep (completeness; the
    verify step handles precision)."""
    if _lev(a, b) <= 1:
        assert _del_keys(a) & _del_keys(b)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=12),
       st.lists(st.sampled_from("ab"), min_size=1, max_size=3))
def test_phrase_occurrence_count_matches_scan(tokens, phrase):
    """The n-1-join phrase identity: occurrences found by joining
    per-term position lists on (pos - offset) == a linear scan count."""
    positions = {}
    for i, t in enumerate(tokens, 1):
        positions.setdefault(t, []).append(i)
    # the join form: start positions p where term_j sits at p + j for all j
    starts = set(positions.get(phrase[0], []))
    for j, t in enumerate(phrase[1:], 1):
        starts &= {p - j for p in positions.get(t, [])}
    # the scan form
    scan = sum(
        1
        for i in range(len(tokens) - len(phrase) + 1)
        if tokens[i : i + len(phrase)] == phrase
    )
    assert len(starts) == scan


def test_url_canon_idempotent(spark):
    """canon(canon(u)) == canon(u) over the full messy fixture — the rule
    set is a projection onto canonical space, so re-applying it must be
    a no-op (a rule that keeps firing would mean ambiguous keys for the
    URL-keyed dedup built on top)."""
    from pyspark.sql import functions as F

    from themis_search_engine_spark.pipeline_ops.websnap import (
        messy_url_view,
        url_canon,
    )

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    once = url_canon(messy_url_view(docs))
    twice = url_canon(
        once.select("doc_id", F.col("canon_url").alias("url"))
    )
    diff = (
        once.select("doc_id", "canon_url")
        .join(
            twice.select("doc_id", F.col("canon_url").alias("c2")),
            "doc_id",
        )
        .where(F.col("canon_url") != F.col("c2"))
        .count()
    )
    assert diff == 0


def test_span_dedup_kept_spans_globally_distinct(spark):
    """Corpus-level invariant: the kept-span count equals the corpus's
    distinct-span count exactly — every distinct span survives exactly
    once (nothing lost, nothing kept twice)."""
    from pyspark.sql import functions as F

    from themis_search_engine_spark.corpus import load_documents
    from themis_search_engine_spark.pipeline_ops.dedup import (
        _tok_array,
        span_dedup,
    )

    docs = load_documents(spark, "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    out = span_dedup(docs, span_tokens=8).cache()
    toks = _tok_array(F.col("text"))
    n = F.ceil(F.size(toks) / F.lit(8)).cast("int")
    spans = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * 8 + 1, 8)),
        ),
    )
    distinct_corpus_spans = (
        docs.select(F.explode(spans).alias("s")).distinct().count()
    )
    kept_total = out.agg(
        F.sum(F.col("n_spans") - F.col("n_dup_spans"))
    ).first()[0]
    assert kept_total == distinct_corpus_spans
    out.unpersist()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_compress_batches_random_splits(data):
    """_compress_batches must be invariant to WHERE the Arrow batch
    boundaries fall: random sorted (term, chunk, doc_id) postings, split
    into random-length record batches, decode back to exactly the input.
    Exercises the carried-group path and the zero-copy (offsets, buffer)
    binary assembly together."""
    import pyarrow as pa

    from themis_search_engine_spark.indexing.compress import (
        _compress_batches,
        vb_decode,
    )

    n_groups = data.draw(st.integers(min_value=1, max_value=8))
    rows = []  # (term, chunk, doc_id, cnt, maxcnt, length)
    for g in range(n_groups):
        term = f"t{data.draw(st.integers(min_value=0, max_value=3))}"
        chunk = data.draw(st.integers(min_value=0, max_value=2))
        n = data.draw(st.integers(min_value=1, max_value=6))
        docs = sorted(
            data.draw(
                st.sets(
                    st.integers(min_value=0, max_value=(1 << 16) - 1),
                    min_size=n, max_size=n,
                )
            )
        )
        maxc = data.draw(st.integers(min_value=1, max_value=9))
        for d in docs:
            rows.append((
                term, chunk, (chunk << 16) + d,
                data.draw(st.integers(min_value=1, max_value=maxc)),
                maxc,
                data.draw(st.integers(min_value=1, max_value=500)),
            ))
    # group-contiguous sorted order, dedup (term, chunk) collisions by
    # merging their doc lists (sorted => still one contiguous group)
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    seen = set()
    dedup = []
    for r in rows:
        key = (r[0], r[1], r[2])
        if key not in seen:
            seen.add(key)
            dedup.append(r)
    rows = dedup

    # random batch split points
    splits = sorted(
        data.draw(
            st.sets(
                st.integers(min_value=1, max_value=max(1, len(rows) - 1)),
                max_size=5,
            )
        )
    )
    bounds = [0, *splits, len(rows)]
    batches = []
    for a, b in zip(bounds, bounds[1:]):
        part = rows[a:b]
        if not part:
            continue
        batches.append(
            pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in part]),
                    pa.array([r[1] for r in part], type=pa.int64()),
                    pa.array([r[2] for r in part], type=pa.int64()),
                    pa.array([r[3] for r in part], type=pa.int64()),
                    pa.array([r[4] for r in part], type=pa.int64()),
                    pa.array([r[5] for r in part], type=pa.int64()),
                ],
                names=["term", "chunk", "doc_id", "cnt", "maxcnt", "length"],
            )
        )

    out = {}
    for rb in _compress_batches(iter(batches), 16, 100.0):
        for row in rb.to_pylist():
            key = (row["term"], row["chunk"])
            assert key not in out, f"split group emitted twice: {key}"
            base = row["chunk"] << 16
            docs = np.cumsum(vb_decode(row["doc_bytes"])) + base
            out[key] = list(
                zip(
                    docs.tolist(),
                    vb_decode(row["cnt_bytes"]).tolist(),
                    vb_decode(row["mc_bytes"]).tolist(),
                    vb_decode(row["dl_bytes"]).tolist(),
                )
            )
            assert row["df_chunk"] == len(out[key])

    expect = {}
    for term, chunk, d, c, mc, dl in rows:
        expect.setdefault((term, chunk), []).append((d, c, mc, dl))
    assert out == expect
