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


def test_golden_pairs():
    bad = {w: (want, stem(w)) for w, want in GOLDEN.items() if stem(w) != want}
    assert not bad, bad


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
