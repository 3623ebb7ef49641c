"""Regex retrieval: RegexpQuery over the vocabulary via trigram planning.

The full-match regex term query (Lucene RegexpQuery's public surface;
the reference's Search loop — Search.java — has no regex support of any
kind). The naive plan is an unanchored-per-query rlike over the whole
dictionary — a |V| regex scan per query, unusable at a 10⁸-term web
vocabulary. The standard fix is R. Cox's trigram planning ("Regular
Expression Matching with a Trigram Index", 2012 — the Google Code
Search design, also pg_trgm's): analyze the regex into trigrams every
match MUST contain, serve candidates from the same vocabulary
gram→term index the infix wildcard uses (queryeng/trigram.py), and run
the exact regex only on candidates.

The analysis propagates, per regex AST node (the Cox shape):

* ``exact``    — the node's full finite match language, when small;
* ``pre/suf``  — otherwise, sets such that every match starts/ends
                 with some member (trimmed/capped; ``""`` = no info);
* ``match``    — an AND/OR tree over required trigrams (True = cannot
                 constrain);
* concatenation additionally requires the BOUNDARY trigrams: every
  match of ``ab`` contains some ``suffix(a) + prefix(b)`` contiguously,
  so the OR over those junction strings' trigrams is sound.

Soundness invariant (what the pytest brute-force twin pins): the
candidate criterion NEVER excludes a true match — caps and unsupported
shapes degrade to ``True`` (less pruning), not to false negatives.

Per-query physical plan, chosen driver-side by :func:`plan_regex`:

* ``exact`` — the language is a small finite set: candidates are an
  IN-list into the dictionary (at scale: point lookups on the sorted
  term sink, no gram index touched);
* ``grams`` — candidates come from the gram→term artifact exactly like
  infix_qterms (gram IN-list pushdown + broadcast (qid, gram) join,
  work linear in matched gram postings, never |V|), with the AND/OR
  tree evaluated codegen-side over each candidate's matched-gram set;
* ``scan``  — the regex genuinely constrains no trigram (``s.an``,
  ``.*``): an honest df-capped full-dictionary rlike scan, the same
  cost Lucene pays when a RegexpQuery's automaton has no common
  prefix. Kept per-query, so one bad regex in a batch doesn't drag
  the others off the index.

All lanes end in the same anchored-rlike verify on candidates only,
then the df-desc / term-asc maxClauseCount cap, then the standard
OR-scored BM25 plan with IN-list postings pushdown. The supported
syntax (literals, ``.``, ``[ab0-9]`` classes, ``(..|..)`` groups,
``? * +``) is the RE2 ∩ java.util.regex common subset, so the Spark
verify and the DuckDB ``regexp_full_match`` oracle agree by
construction.
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .trigram import gram_candidates

# --- parser -----------------------------------------------------------------

_SPECIAL = set("()[]|?*+.\\")


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else None

    def eat(self):
        c = self.s[self.i]
        self.i += 1
        return c


def parse_regex(pattern: str):
    """Parse the supported subset into an AST of
    ``("lit", c) | ("cls", frozenset) | ("dot",) | ("cat", a, b) |
    ("alt", [..]) | ("quest"|"star"|"plus", a)``. Raises ValueError on
    anything outside the subset (negated classes, backrefs, ``{m,n}``,
    anchors — full-match semantics make ``^$`` redundant)."""
    p = _P(pattern)
    ast = _alt(p)
    if p.peek() is not None:
        raise ValueError(f"unbalanced ')' in regex: {pattern!r}")
    return ast


def _alt(p: _P):
    legs = [_concat(p)]
    while p.peek() == "|":
        p.eat()
        legs.append(_concat(p))
    return ("alt", legs) if len(legs) > 1 else legs[0]


def _concat(p: _P):
    atoms = []
    while p.peek() not in (None, "|", ")"):
        atoms.append(_quant(p))
    if not atoms:
        return ("lit", "")  # empty branch: matches ""
    node = atoms[0]
    for a in atoms[1:]:
        node = ("cat", node, a)
    return node


def _quant(p: _P):
    a = _atom(p)
    while p.peek() in ("?", "*", "+"):
        a = ({"?": "quest", "*": "star", "+": "plus"}[p.eat()], a)
    return a


def _atom(p: _P):
    c = p.eat()
    if c == "(":
        inner = _alt(p)
        if p.peek() != ")":
            raise ValueError("unclosed group")
        p.eat()
        return inner
    if c == "[":
        if p.peek() == "^":
            raise ValueError("negated classes unsupported")
        chars: set[str] = set()
        while p.peek() != "]":
            if p.peek() is None:
                raise ValueError("unclosed class")
            ch = p.eat()
            if ch == "\\":
                ch = p.eat()
            if p.peek() == "-" and p.s[p.i + 1 : p.i + 2] not in ("]", ""):
                p.eat()
                hi = p.eat()
                if ord(hi) < ord(ch):
                    raise ValueError(f"bad class range {ch}-{hi}")
                chars.update(chr(o) for o in range(ord(ch), ord(hi) + 1))
            else:
                chars.add(ch)
        p.eat()
        return ("cls", frozenset(chars))
    if c == ".":
        return ("dot",)
    if c == "\\":
        return ("lit", p.eat())
    if c == "{":
        raise ValueError("{m,n} repetition unsupported")
    if c in _SPECIAL:
        raise ValueError(f"unexpected {c!r}")
    return ("lit", c)


# --- trigram-requirement analysis (Cox) -------------------------------------

MAX_SET = 32   # cap on exact/prefix/suffix set sizes
MAX_CROSS = 64  # cap on boundary-junction pairs
_TRIM = 12      # prefix/suffix strings carry at most this many chars


class Info(NamedTuple):
    emptyable: bool
    exact: frozenset | None  # full finite language, when known & small
    pre: frozenset           # every match starts with some member
    suf: frozenset           # every match ends with some member
    match: object            # AND/OR gram tree; True = unconstrained


def _trigs(s: str):
    """AND-tree of the trigrams of one required string (True if too
    short to contain any)."""
    if len(s) < 3:
        return True
    gs = sorted({s[i : i + 3] for i in range(len(s) - 2)})
    legs = [("gram", g) for g in gs]
    return legs[0] if len(legs) == 1 else ("and", legs)


def _or_tree(trees):
    if not trees or any(t is True for t in trees):
        return True
    flat, seen = [], set()
    for t in trees:
        for leg in t[1] if t[0] == "or" else [t]:
            k = repr(leg)
            if k not in seen:
                seen.add(k)
                flat.append(leg)
    return flat[0] if len(flat) == 1 else ("or", flat)


def _and_tree(trees):
    flat, seen = [], set()
    for t in trees:
        if t is True:
            continue
        for leg in t[1] if t[0] == "and" else [t]:
            k = repr(leg)
            if k not in seen:
                seen.add(k)
                flat.append(leg)
    if not flat:
        return True
    return flat[0] if len(flat) == 1 else ("and", flat)


def _pre_of(i: Info) -> frozenset:
    return i.exact if i.exact is not None else i.pre


def _suf_of(i: Info) -> frozenset:
    return i.exact if i.exact is not None else i.suf


def _match_of(i: Info):
    if i.exact is not None:
        return _or_tree([_trigs(s) for s in i.exact])
    return i.match


def _cap_pre(s: frozenset) -> frozenset:
    s = frozenset(x[:_TRIM] for x in s)
    return s if len(s) <= MAX_SET else frozenset({""})


def _cap_suf(s: frozenset) -> frozenset:
    s = frozenset(x[-_TRIM:] if x else x for x in s)
    return s if len(s) <= MAX_SET else frozenset({""})


def _exact(strings) -> Info:
    e = frozenset(strings)
    return Info("" in e, e, frozenset(), frozenset(), True)


def _analyze(ast) -> Info:
    kind = ast[0]
    if kind == "lit":
        return _exact({ast[1]})
    if kind == "cls":
        if len(ast[1]) <= MAX_SET:
            return _exact(ast[1])
        return Info(False, None, frozenset({""}), frozenset({""}), True)
    if kind == "dot":
        # the term alphabet is larger than any useful exact cap
        return Info(False, None, frozenset({""}), frozenset({""}), True)
    if kind == "alt":
        infos = [_analyze(a) for a in ast[1]]
        if all(i.exact is not None for i in infos) and (
            sum(len(i.exact) for i in infos) <= MAX_SET
        ):
            return _exact(frozenset().union(*(i.exact for i in infos)))
        return Info(
            any(i.emptyable for i in infos),
            None,
            _cap_pre(frozenset().union(*(_pre_of(i) for i in infos))),
            _cap_suf(frozenset().union(*(_suf_of(i) for i in infos))),
            _or_tree([_match_of(i) for i in infos]),
        )
    if kind == "cat":
        a, b = _analyze(ast[1]), _analyze(ast[2])
        if (
            a.exact is not None
            and b.exact is not None
            and len(a.exact) * len(b.exact) <= MAX_SET
        ):
            return _exact({x + y for x in a.exact for y in b.exact})
        if a.exact is not None:
            pre = _cap_pre(frozenset(x + y for x in a.exact for y in _pre_of(b)))
        else:
            pre = _cap_pre(a.pre | (_pre_of(b) if a.emptyable else frozenset()))
        if b.exact is not None:
            suf = _cap_suf(frozenset(x + y for x in _suf_of(a) for y in b.exact))
        else:
            suf = _cap_suf(b.suf | (_suf_of(a) if b.emptyable else frozenset()))
        sa, pb = _suf_of(a), _pre_of(b)
        if 0 < len(sa) * len(pb) <= MAX_CROSS:
            boundary = _or_tree([_trigs(x + y) for x in sa for y in pb])
        else:
            boundary = True
        return Info(
            a.emptyable and b.emptyable,
            None,
            pre,
            suf,
            _and_tree([_match_of(a), _match_of(b), boundary]),
        )
    if kind == "quest":
        return _analyze(("alt", [ast[1], ("lit", "")]))
    if kind == "star":
        return Info(True, None, frozenset({""}), frozenset({""}), True)
    if kind == "plus":
        a = _analyze(ast[1])
        return Info(
            a.emptyable, None, _cap_pre(_pre_of(a)), _cap_suf(_suf_of(a)),
            _match_of(a),
        )
    raise AssertionError(f"unknown node {kind}")


def plan_regex(pattern: str):
    """Driver-side physical-plan choice for one regex:
    ``("exact", sorted_strings)`` | ``("grams", tree)`` | ``("scan",)``.
    Pure function over the pattern — pytest pins the matrix."""
    info = _analyze(parse_regex(pattern))
    if info.exact is not None:
        return ("exact", sorted(x for x in info.exact if x))
    tree = _match_of(info)
    if tree is True:
        return ("scan",)
    return ("grams", tree)


def plan_regex_grep(pattern: str):
    """Driver-side gram requirement for UNANCHORED (grep) matching: the
    AND/OR trigram tree every text containing a match must satisfy, or
    True when the regex constrains no trigram (→ fallback scan). The
    exact-language case folds into the tree (containment of one of the
    strings ⇒ containment of its trigrams), since an IN-list is no
    shortcut at the document grain."""
    return _match_of(_analyze(parse_regex(pattern)))


def _tree_grams(tree) -> set[str]:
    if tree is True:
        return set()
    if tree[0] == "gram":
        return {tree[1]}
    return set().union(*(_tree_grams(t) for t in tree[1]))


def _tree_col(tree, gs_col: str):
    if tree is True:
        return F.lit(True)
    if tree[0] == "gram":
        return F.array_contains(F.col(gs_col), tree[1])
    op = and_ if tree[0] == "and" else or_
    return reduce(op, (_tree_col(t, gs_col) for t in tree[1]))


# --- the Spark operator ------------------------------------------------------

def regex_qterms(
    spark: SparkSession,
    dictionary: DataFrame,
    regex_queries: dict[int, str],
    *,
    max_terms: int = 16,
    gram_table: DataFrame | None = None,
) -> DataFrame:
    """(qid, term, qweight=1.0) — each full-match regex expands to its
    at-most-``max_terms`` highest-df matching dictionary terms (df desc,
    term asc — the deterministic maxClauseCount cap), through the
    per-query lane :func:`plan_regex` picked. Output feeds the standard
    OR-scored BM25 plan exactly like the other MultiTermQuery rewrites.

    Lane shapes: the exact lane is a broadcast (qid, term) IN-join; the
    gram lane is the infix plan (gram IN-pushdown + broadcast (qid,
    gram) join + candidate-bounded collect_set, with the AND/OR tree as
    a codegen Column); terms shorter than 3 chars sidecar into the gram
    lane via a broadcast nested-loop over the (tiny, ≤ alphabet²)
    short-term slice so gram-less short matches are not lost; the scan
    lane is the honest full-dictionary rlike fallback, taken only by
    queries whose regex constrains no trigram.
    """
    if not regex_queries:
        raise ValueError("empty regex_queries")
    exact_rows: list[tuple[int, str]] = []
    gram_rows: list[tuple[int, str]] = []
    gram_trees: dict[int, object] = {}
    scan_qids: list[int] = []
    pat_rows = []
    for qid, pat in sorted(regex_queries.items()):
        qid = int(qid)
        pat_rows.append((qid, f"^(?:{pat})$"))
        plan = plan_regex(pat)
        if plan[0] == "exact":
            exact_rows.extend((qid, t) for t in plan[1])
        elif plan[0] == "grams":
            gram_trees[qid] = plan[1]
            gram_rows.extend((qid, g) for g in sorted(_tree_grams(plan[1])))
        else:
            scan_qids.append(qid)
    qpat = F.broadcast(
        spark.createDataFrame(pat_rows, "qid long, _pat string")
    )
    d = dictionary.select("term", "df")
    lanes: list[DataFrame] = []
    if exact_rows:
        ex = F.broadcast(
            spark.createDataFrame(exact_rows, "qid long, term string")
        )
        lanes.append(d.join(ex, "term").select("qid", "term", "df"))
    if gram_rows:
        qgrams = F.broadcast(
            spark.createDataFrame(gram_rows, "qid long, gram string")
        )
        all_grams = sorted({g for _, g in gram_rows})
        cand = (
            # live-derived or persisted gram→term source; the explicit
            # IN-list row-group-prunes the persisted artifact's scan
            gram_candidates(d, all_grams, gram_table)
            .join(qgrams, "gram")
            .groupBy("qid", "term", "df")
            .agg(F.collect_set("gram").alias("_gs"))
        )
        tree_ok = None
        for qid, tree in sorted(gram_trees.items()):
            leg = (F.col("qid") == qid) & _tree_col(tree, "_gs")
            tree_ok = leg if tree_ok is None else (tree_ok | leg)
        lanes.append(
            cand.where(tree_ok).select("qid", "term", "df")
        )
        # short-term sidecar: the gram index owns only len>=3 terms
        gq = F.broadcast(
            spark.createDataFrame(
                [(q,) for q in sorted(gram_trees)], "qid long"
            )
        )
        lanes.append(
            d.where(F.length("term") < 3)
            .crossJoin(gq)
            .select("qid", "term", "df")
        )
    if scan_qids:
        sq = F.broadcast(
            spark.createDataFrame([(q,) for q in scan_qids], "qid long")
        )
        lanes.append(d.crossJoin(sq).select("qid", "term", "df"))
    hits = lanes[0]
    for leg in lanes[1:]:
        hits = hits.unionByName(leg)
    verified = hits.join(qpat, "qid").where(
        F.expr("term rlike _pat")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_terms)
        .select("qid", "term", F.lit(1.0).alias("qweight"))
    )
