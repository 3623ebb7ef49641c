"""Golden tests for the Porter stemmer (FIXTURES.md §6 tokens.golden).

Expected values pinned to the reference's executable smoke checks
(Stemmer.java:90-95: ending→end, publications→public) plus classic Porter
vectors from the 1980 paper.
"""

from themis_search_engine_spark.porter import stem

GOLDEN = {
    # reference smoke checks (Stemmer.java:92-94)
    "ending": "end",
    "publications": "public",
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "hopping": "hop", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "filing": "file", "sized": "size",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2 (incl. tartarus departures bli→ble, logi→log)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "digitizer": "digit", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


# Every post-stopword term in the driver corpora (/root/testdata/sf*), with
# its hand-verified Porter stem. This pins the EXACT substitution table the
# DuckDB stemmed oracle joins through (oracle_sql._corpus_stem_map), so the
# driver's stemmed value-checks rest on these independent expectations, not
# on porter.py agreeing with itself.
CORPUS_GOLDEN = {
    "agg": "agg", "batch": "batch", "big": "big", "column": "column",
    "customer": "custom",       # step 4: -er, m("custom")=2
    "data": "data", "dup": "dup", "fast": "fast", "filter": "filter",
    "group": "group", "hash": "hash", "join": "join",
    "key": "kei",               # step 1c: y→i after vowel
    "line": "line",
    "merge": "merg",            # step 5a: -e, m=1 and not *o
    "order": "order", "query": "queri", "row": "row", "scan": "scan",
    "slow": "slow", "small": "small", "sort": "sort", "spark": "spark",
    "stream": "stream",
    "table": "tabl",            # step 5a
    "value": "valu",            # step 5a
    "vector": "vector",         # -or not removable: m("vect")=1
    "window": "window",
}


def test_golden_pairs():
    bad = {w: (want, stem(w)) for w, want in GOLDEN.items() if stem(w) != want}
    assert not bad, bad


def test_corpus_vocabulary_stems():
    bad = {
        w: (want, stem(w))
        for w, want in CORPUS_GOLDEN.items()
        if stem(w) != want
    }
    assert not bad, bad


def test_oracle_stem_map_matches_goldens():
    """The mapping the stemmed DuckDB oracle embeds == the hand-verified
    goldens, and it covers the whole corpus vocabulary."""
    from themis_search_engine_spark.oracle_sql import _corpus_stem_map

    got = dict(_corpus_stem_map())
    assert got == CORPUS_GOLDEN


def test_non_ascii_passthrough():
    # Stemmer.java:58-72 — first char outside ASCII 33-126 → unchanged
    assert stem("αλλο") == "αλλο"
    assert stem("ωριαία") == "ωριαία"


def test_short_words_unchanged():
    assert stem("a") == "a"
    assert stem("is") == "is"
    assert stem("") == ""


def test_lowercases_input():
    assert stem("Running") == "run"
