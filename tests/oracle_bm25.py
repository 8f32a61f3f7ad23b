"""Independent NumPy BM25 oracle (SURVEY.md §5.3).

A deliberately separate code path from the engine: plain dict/Counter term
statistics and a straight-line implementation of the pinned Lucene-8 formula
(k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)), no (k1+1) factor,
tie-break doc_id asc). Generates the golden top-k fixtures the engine must
match rank-identically (BASELINE.json:14).

Shares ONLY the analyzer with the engine (identical analysis is part of the
pinned spec — rank identity is impossible without it).
"""

from __future__ import annotations

import math
from collections import Counter

from engine.tokenizer import tokenize

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        """docs: doc_id -> raw text."""
        self.tfs: dict[int, Counter] = {}
        self.df: Counter = Counter()
        self.dl: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize(text)
            c = Counter(toks)
            self.tfs[doc_id] = c
            self.dl[doc_id] = len(toks)
            for t in c:
                self.df[t] += 1
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, terms: list[str]) -> float:
        s = 0.0
        for t in terms:
            tf = self.tfs[doc_id].get(t, 0)
            if tf == 0:
                continue
            dl = self.dl[doc_id]
            s += self.idf(t) * tf / (tf + K1 * (1 - B + B * dl / self.avgdl))
        return s

    def search(
        self,
        query_terms: list[str],
        k: int,
        mode: str = "or",
        must_not: list[str] | None = None,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Exhaustive top-k: (doc_id, score) sorted score desc, doc_id asc."""
        must_not = must_not or []
        hits = []
        for doc_id, c in self.tfs.items():
            if doc_filter is not None and not doc_filter(doc_id):
                continue
            matched = [t for t in query_terms if c.get(t, 0) > 0]
            if not matched:
                continue
            if mode == "and" and len(set(matched)) != len(set(query_terms)):
                continue
            if any(c.get(t, 0) > 0 for t in must_not):
                continue
            hits.append((doc_id, self.score(doc_id, query_terms)))
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k]
