"""Pure-Python reference engine (the golden oracle for tests).

Implements the same analyzer + exact BM25 + exhaustive top-k as the
behavior target (Lucene/OpenSearch defaults, see bm25.py). Used by the
pytest suite to verify the distributed engine rank-identically
(FIXTURES.md section 2: ties broken by score desc, doc_id asc; scores
compared to 1e-6).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from .analysis import tokenize_py
from .bm25 import score_py


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    doclen: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id -> tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)

    @classmethod
    def build(cls, docs: dict[int, str],
              tokenizer=None) -> "OracleIndex":
        """docs: doc_id -> text. ``tokenizer`` defaults to the shared
        core analyzer; pass the matching Python twin when the engine
        index was built with a tokenizer override."""
        ix = cls()
        tokenize = tokenizer or tokenize_py
        total = 0
        for doc_id, text in docs.items():
            toks = tokenize(text)
            ix.doclen[doc_id] = len(toks)
            total += len(toks)
            for term, tf in Counter(toks).items():
                ix.postings.setdefault(term, {})[doc_id] = tf
        ix.n_docs = len(docs)
        ix.avgdl = total / ix.n_docs if ix.n_docs else 0.0
        return ix

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(self, query: str, k: int = 10,
               tokenizer=None) -> list[tuple[int, float]]:
        """Top-k (doc_id, score); OR semantics over query terms
        (OpenSearch ``match`` default operator), tie-break
        (score desc, doc_id asc). Duplicate query terms contribute
        once per occurrence, matching Lucene's per-clause scoring."""
        scores: dict[int, float] = {}
        for term in (tokenizer or tokenize_py)(query):
            plist = self.postings.get(term)
            if not plist:
                continue
            dfv = len(plist)
            for doc_id, tf in plist.items():
                s = score_py(tf, self.doclen[doc_id], self.avgdl, self.n_docs, dfv)
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
