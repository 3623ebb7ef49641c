"""Boolean query language: AND / OR / NOT with parentheses over BM25.

The reference's Search loop parses queries as a bag of words only
(Search.java:41-66); real users of a fulltext engine write
``spark AND (join OR merge) NOT window``. This module adds the classic
Lucene-style boolean surface as a thin layer over the existing scored
plan — parsing is driver-side (queries are tiny), evaluation is ONE
distributed job for the whole batch.

Grammar (case-sensitive keywords, lowercase words are terms):

    expr   := or ;  or := and (OR and)* ;
    and    := not ((AND)? not)*          # adjacency = implicit AND
    not    := NOT not | atom ;  atom := '(' expr ')' | TERM

Semantics (Lucene's BooleanQuery, restricted to this grammar):

* a document MATCHES iff the predicate holds over its term-presence
  flags, evaluated among candidate docs containing AT LEAST ONE query
  term (positive or negated — the index can only enumerate docs it has
  postings for; a doc with no query term at all is never a result, and
  pure-negative queries are rejected outright, as Lucene rejects them:
  iterating the complement of nothing is a full-corpus enumeration);
* the SCORE is the BM25 sum over the doc's matching positive terms
  (prohibited clauses never contribute score, Lucene behavior);
* ties and ordering: the repo's standard round(score, 6) desc,
  doc_id asc.

Plan shape: the batch's full term set (positive + negated — negated
terms are needed as presence FLAGS) is one IN-pushed postings scan;
qterms broadcast; one groupBy (qid, doc_id) computes the positive-part
sum AND collect_set(term) together; each query's compiled predicate is
a Column over array_contains flags dispatched by qid — whole-stage
codegen, no per-query job, no UDF. NOT costs nothing extra: absence of
a flag, not an anti-join over the corpus.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import MAX_PRUNE_LITERALS, bm25_part_expr

_TOKEN_RE = re.compile(r"\(|\)|[A-Za-z0-9]+")


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


Node = Term | Not | And | Or


def parse_boolean(query: str) -> Node:
    """Recursive-descent parse of the grammar above. Terms are
    normalized through P2 (lowercase; the tokenizer splits on
    non-alnum already)."""
    toks = _TOKEN_RE.findall(query)
    if not toks:
        raise ValueError(f"empty boolean query: {query!r}")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        legs = [parse_and()]
        while peek() == "OR":
            take()
            legs.append(parse_and())
        return legs[0] if len(legs) == 1 else Or(tuple(legs))

    def parse_and():
        legs = [parse_not()]
        while True:
            nxt = peek()
            if nxt == "AND":
                take()
                legs.append(parse_not())
            elif nxt is not None and nxt not in (")", "OR"):
                legs.append(parse_not())  # adjacency = implicit AND
            else:
                break
        return legs[0] if len(legs) == 1 else And(tuple(legs))

    def parse_not():
        if peek() == "NOT":
            take()
            return Not(parse_not())
        return parse_atom()

    def parse_atom():
        t = peek()
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"unbalanced parens in {query!r}")
            take()
            return node
        if t is None or t in (")", "AND", "OR", "NOT"):
            raise ValueError(f"unexpected token {t!r} in {query!r}")
        return Term(take().lower())

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {query!r}")
    return node


def _walk_terms(node: Node, negated: bool, pos_set: set, all_set: set):
    if isinstance(node, Term):
        all_set.add(node.term)
        if not negated:
            pos_set.add(node.term)
    elif isinstance(node, Not):
        _walk_terms(node.child, not negated, pos_set, all_set)
    else:
        for c in node.children:
            _walk_terms(c, negated, pos_set, all_set)


def query_terms(node: Node) -> tuple[list[str], list[str]]:
    """(positive_terms, all_terms), each sorted — a term is positive if
    it has at least one non-negated occurrence."""
    p: set = set()
    a: set = set()
    _walk_terms(node, False, p, a)
    return sorted(p), sorted(a)


def _predicate(node: Node, flags):
    """Compile the AST to a boolean Column over ``flags`` (a column of
    array<string>: the doc's present query terms)."""
    if isinstance(node, Term):
        return F.array_contains(flags, node.term)
    if isinstance(node, Not):
        return ~_predicate(node.child, flags)
    legs = [_predicate(c, flags) for c in node.children]
    out = legs[0]
    for leg in legs[1:]:
        out = (out & leg) if isinstance(node, And) else (out | leg)
    return out


def predicate_sql(node: Node, flag_fmt: str = "f_{t}") -> str:
    """The same predicate as ANSI SQL over per-term boolean flag columns
    (``flag_fmt`` formats a term's flag column) — the DuckDB oracle twin
    compiles the IDENTICAL AST, so grammar and SQL can never drift."""
    if isinstance(node, Term):
        return flag_fmt.format(t=node.term)
    if isinstance(node, Not):
        return f"(NOT {predicate_sql(node.child, flag_fmt)})"
    op = " AND " if isinstance(node, And) else " OR "
    return "(" + op.join(predicate_sql(c, flag_fmt) for c in node.children) + ")"


def boolean_score_all(
    spark: SparkSession,
    queries: dict[int, str],
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
) -> DataFrame:
    """(qid, doc_id, score) — boolean-filtered BM25 for a query batch in
    ONE distributed job (plan shape in the module docstring)."""
    asts = {int(q): parse_boolean(s) for q, s in sorted(queries.items())}
    rows = []
    for qid, ast in asts.items():
        positive, allt = query_terms(ast)
        if not positive:
            raise ValueError(
                f"pure-negative boolean query {queries[qid]!r}: nothing to "
                "iterate (Lucene rejects these too)"
            )
        rows.extend((qid, t, t in set(positive)) for t in allt)
    qt = F.broadcast(
        spark.createDataFrame(rows, "qid long, term string, positive boolean")
    )
    batch_terms = sorted({t for _, t, _ in rows})
    pruned = postings_flat
    if 0 < len(batch_terms) <= MAX_PRUNE_LITERALS:
        pruned = postings_flat.where(F.col("term").isin(batch_terms))
    joined = pruned.join(qt, "term").join(
        dictionary.select("term", "idf"), "term"
    )
    if "length" not in postings_flat.columns:
        joined = joined.join(doc_stats.select("doc_id", "length"), "doc_id")
    part = bm25_part_expr(avgdl=avgdl)
    grouped = (
        joined.select(
            "qid",
            "doc_id",
            F.when(F.col("positive"), part).otherwise(0.0).alias("part"),
            "term",
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("part").alias("score"),
            F.collect_set("term").alias("_flags"),
        )
    )
    pred = None
    for qid, ast in asts.items():
        leg = (F.col("qid") == qid) & _predicate(ast, F.col("_flags"))
        pred = leg if pred is None else (pred | leg)
    return grouped.where(pred).select("qid", "doc_id", "score")
