"""BPE tokenizer training (pipeline_ops/tokenizer.py) vs a pure-Python
reference implementation (Sennrich 2016 semantics, deterministic
lexicographic tiebreak)."""

from __future__ import annotations

import collections

from themis_search_engine_spark.pipeline_ops.tokenizer import (
    END,
    bpe_encode,
    bpe_encode_py,
    bpe_train,
    char_pair_counts,
    word_counts,
)


# --- pure-Python reference trainer (structurally independent twin) ----------

def _ref_train(wordfreq: dict[str, int], n_merges: int):
    vocab = {tuple(w) + (END,): f for w, f in wordfreq.items()}
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # deterministic: max count, ties broken by LEXICOGRAPHICALLY
        # SMALLEST "a b" string (the Spark side's orderBy(desc(cnt), asc(p)))
        top_cnt = max(counts.values())
        best = min(
            f"{a} {b}" for (a, b), c in counts.items() if c == top_cnt
        )
        a, b = best.split(" ", 1)
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


WORDS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2, "a": 7,
}


def test_char_pair_counts_exact(spark):
    wf = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    got = {r["pair"]: r["cnt"] for r in char_pair_counts(wf).collect()}
    want: collections.Counter = collections.Counter()
    for w, f in WORDS.items():
        for i in range(len(w) - 1):
            want[w[i:i + 2]] += f
    assert got == dict(want)
    assert "a" not in got  # 1-char word contributes no pairs


def test_word_counts_keeps_stopwords(spark, tiny_docs_df):
    wc = {r["word"]: r["freq"] for r in word_counts(tiny_docs_df).collect()}
    assert wc["the"] >= 3  # stopwords MUST be visible to the tokenizer
    assert wc["lazy"] == 4
    assert "" not in wc


def test_bpe_train_matches_reference(spark):
    wf = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    got = bpe_train(wf, 8)
    want = _ref_train(WORDS, 8)
    assert got == want
    # classic corpus: "est</w>" family merges early from newest/widest
    joined = {"".join(p) for p in got}
    assert any("est" in m for m in joined)


def test_bpe_encode_matches_python_twin(spark):
    wf = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    merges = bpe_train(wf, 6)
    enc = {
        r["word"]: r["tokens"]
        for r in bpe_encode(wf.select("word"), merges).collect()
    }
    for w in WORDS:
        assert enc[w] == bpe_encode_py(w, merges)
        assert "".join(enc[w]) == w + END  # lossless segmentation
