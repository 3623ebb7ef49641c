"""Pure-Python Porter stemmer (Porter 1980, tartarus reference behavior).

Reimplements the algorithm the reference engine uses via its bundled
``PorterStemmer.java`` (the classic tartarus implementation, called from
``Stemmer.java:47-73`` / ``EnglishStemmer.java:52-58``). This module is the
single stemmer shared by the Spark UDFs AND the pure-Python oracle scorer so
bit-parity between engine and oracle is structural, not tested-for.

Reference-semantics notes (SURVEY.md §2.2 P5):
- input is lowercased+trimmed before stemming (Stemmer.java:55-57);
- only tokens whose first char is printable ASCII (33-126) are stemmed,
  anything else is returned unchanged (Stemmer.java:58-72);
- 1- and 2-letter words are returned unchanged.

Includes the tartarus departures from the 1980 paper that the reference
ships: step2 ``bli -> ble`` (paper: ``abli -> able``) and the added
``logi -> log`` rule.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str, j: int) -> int:
    """Number of VC sequences in w[0:j+1]."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _is_cons(w, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(w, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(w, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(w: str, j: int) -> bool:
    return any(not _is_cons(w, i) for i in range(j + 1))


def _double_cons(w: str, j: int) -> bool:
    return j >= 1 and w[j] == w[j - 1] and _is_cons(w, j)


def _cvc(w: str, i: int) -> bool:
    """cons-vowel-cons ending at i, where the final cons is not w, x or y."""
    if i < 2 or not _is_cons(w, i) or _is_cons(w, i - 1) or not _is_cons(w, i - 2):
        return False
    return w[i] not in "wxy"


def _ends(w: str, s: str) -> bool:
    return w.endswith(s)


def _rule_list(w: str, rules: list[tuple[str, str]]) -> str:
    """Apply the first rule whose suffix matches and whose stem has m > 0."""
    for suf, rep in rules:
        if w.endswith(suf):
            stem_j = len(w) - len(suf) - 1
            if _measure(w, stem_j) > 0:
                return w[: stem_j + 1] + rep
            return w
    return w


def _step1ab(w: str) -> str:
    if w.endswith("s"):
        if _ends(w, "sses"):
            w = w[:-2]
        elif _ends(w, "ies"):
            w = w[:-2]
        elif not _ends(w, "ss"):
            w = w[:-1]
    if _ends(w, "eed"):
        if _measure(w, len(w) - 4) > 0:
            w = w[:-1]
    elif (_ends(w, "ed") and _vowel_in_stem(w, len(w) - 3)) or (
        _ends(w, "ing") and _vowel_in_stem(w, len(w) - 4)
    ):
        w = w[:-2] if _ends(w, "ed") else w[:-3]
        if _ends(w, "at") or _ends(w, "bl") or _ends(w, "iz"):
            w = w + "e"
        elif _double_cons(w, len(w) - 1):
            if w[-1] not in "lsz":
                w = w[:-1]
        elif _measure(w, len(w) - 1) == 1 and _cvc(w, len(w) - 1):
            w = w + "e"
    return w


def _step1c(w: str) -> str:
    if _ends(w, "y") and _vowel_in_stem(w, len(w) - 2):
        w = w[:-1] + "i"
    return w


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem_j = len(w) - len(suf) - 1
            if suf == "ion" and (stem_j < 0 or w[stem_j] not in "st"):
                return w
            if _measure(w, stem_j) > 1:
                return w[: stem_j + 1]
            return w
    return w


def _step5(w: str) -> str:
    if w.endswith("e"):
        a = _measure(w, len(w) - 2)
        if a > 1 or (a == 1 and not _cvc(w, len(w) - 2)):
            w = w[:-1]
    if w.endswith("l") and _double_cons(w, len(w) - 1) and _measure(w, len(w) - 1) > 1:
        w = w[:-1]
    return w


@lru_cache(maxsize=1 << 18)
def stem(token: str) -> str:
    """Stem one token with reference semantics (lowercase, ASCII-gate, Porter)."""
    w = token.lower().strip()
    if not w or not (33 <= ord(w[0]) <= 126):
        return w
    if len(w) <= 2:
        return w
    w = _step1ab(w)
    w = _step1c(w)
    w = _rule_list(w, _STEP2)
    w = _rule_list(w, _STEP3)
    w = _step4(w)
    w = _step5(w)
    return w
