"""Pure-Python reference oracle: single-process rebuild of the reference
engine's documented semantics (SURVEY.md §7 quirk decision — clean float
math, deterministic (score desc, doc_id asc) ties).

The Spark engine must match this scorer EXACTLY (same tokenizer module, same
formulas: OkapiBM25.java:104-106,161-164; VSM.java:84-99,130,146,236-253).
Used by tests as the rank-identity gate before any benchmark number is
reported (BASELINE.md).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .textproc import term_counts_py, tokenize_py

K1 = 2.0
B = 0.75


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, float]] = field(default_factory=dict)  # term → {doc: tf}
    doc_len: dict[int, int] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0
    stem: bool = True

    @classmethod
    def build(cls, docs: dict[int, str], *, stem: bool = True) -> "OracleIndex":
        idx = cls(stem=stem)
        for doc_id, text in docs.items():
            counts = term_counts_py(text, stem=stem)
            if not counts:
                idx.doc_len[doc_id] = 0
                continue
            mx = max(counts.values())
            idx.doc_len[doc_id] = sum(counts.values())
            for term, c in counts.items():
                idx.postings.setdefault(term, {})[doc_id] = c / mx
        idx.n_docs = len(docs)
        idx.avgdl = (
            sum(idx.doc_len.values()) / idx.n_docs if idx.n_docs else 0.0
        )
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf_bm25(self, term: str) -> float:
        df = self.df(term)
        return math.log2((self.n_docs - df + 0.5) / (df + 0.5))

    def bm25(self, query: str, k: int | None = 10) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize_py(query, stem=self.stem)))
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue  # missing terms silently dropped (Q1)
            idf = self.idf_bm25(t)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                part = idf * tf * (K1 + 1.0) / (
                    tf + K1 * (1.0 - B + B * dl / self.avgdl)
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + part
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k] if k is not None else ranked

    def vsm(self, query: str, k: int | None = 10) -> list[tuple[int, float]]:
        qcounts: dict[str, int] = {}
        for t in tokenize_py(query, stem=self.stem):
            qcounts[t] = qcounts.get(t, 0) + 1
        if not qcounts:
            return []
        max_qtf = max(qcounts.values())
        qw = {}
        for t, qtf in qcounts.items():
            df = self.df(t)
            if df == 0:
                continue
            qw[t] = (qtf / max_qtf) * math.log2(self.n_docs / df)
        qnorm = math.sqrt(sum(w * w for w in qw.values()))
        norms: dict[int, float] = {}
        for t, plist in self.postings.items():
            idf = math.log2(self.n_docs / len(plist))
            for doc_id, tf in plist.items():
                norms[doc_id] = norms.get(doc_id, 0.0) + (tf * idf) ** 2
        norms = {d: math.sqrt(v) for d, v in norms.items()}
        scores: dict[int, float] = {}
        for t, w in qw.items():
            idf = math.log2(self.n_docs / self.df(t))
            for doc_id, tf in self.postings[t].items():
                scores[doc_id] = scores.get(doc_id, 0.0) + w * tf * idf
        out = []
        for doc_id, dot in scores.items():
            dn = norms.get(doc_id, 0.0)
            out.append(
                (doc_id, dot / (dn * qnorm) if dn > 0 and qnorm > 0 else 0.0)
            )
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k] if k is not None else out

    def existential(self, query: str) -> list[int]:
        terms = set(tokenize_py(query, stem=self.stem))
        docs: set[int] = set()
        for t in terms:
            docs.update(self.postings.get(t, {}).keys())
        return sorted(docs)
