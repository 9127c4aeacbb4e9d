"""Single-process Python BM25 oracle — the golden reference for rank-identity.

Plays the role the reference's golden STS labels play in its CI gate
(reference tests/test_eval.py:4-20), tightened from threshold to exact
equality per the north rule: the Spark engine's top-k (docIDs and scores)
must be rank-identical to this oracle on the reference query set.

Determinism contract shared with the engine:
  - tokenizer: angle_spark.functions.tokenizer.tokenize_py (same module)
  - docID: dense 0..N-1 over rows sorted by (conv_id, turn_idx)
  - score: float64, per-(query,doc) contributions summed in ascending
    term order (fixed fold order -> bit-stable)
  - top-k ties broken by ascending doc_id
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from angle_spark.codec import B, K1
from angle_spark.functions.tokenizer import tokenize_py


class Bm25Oracle:
    def __init__(self, transcripts: pd.DataFrame):
        """transcripts: pandas DF with at least (conv_id, turn_idx, text)."""
        ordered = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        self.doc_texts: list[str] = [t if isinstance(t, str) else "" for t in ordered["text"]]
        self.doc_keys = list(zip(ordered["conv_id"], ordered["turn_idx"]))
        self.n_docs = len(self.doc_texts)

        self.tf: dict[str, dict[int, int]] = defaultdict(dict)
        self.dl: list[int] = []
        for doc_id, text in enumerate(self.doc_texts):
            toks = tokenize_py(text)
            self.dl.append(len(toks))
            for term, c in Counter(toks).items():
                self.tf[term][doc_id] = c
        self.avgdl = (sum(self.dl) / self.n_docs) if self.n_docs else 0.0
        self.df = {term: len(post) for term, post in self.tf.items()}

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score_query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Return top-k [(doc_id, score)] — distinct query terms (the
        reference query x doc retrieval treats the query as a set,
        reference README.md:119-128), terms folded in sorted order."""
        terms = sorted(set(tokenize_py(text)))
        acc: dict[int, float] = defaultdict(float)
        for term in terms:
            postings = self.tf.get(term)
            if not postings:
                continue
            idf = self.idf(term)
            for doc_id, tf in postings.items():
                denom = tf + K1 * (1.0 - B + B * self.dl[doc_id] / self.avgdl)
                acc[doc_id] += idf * tf * (K1 + 1.0) / denom
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def score_weighted(
        self, weights: dict[str, float], k: int = 10
    ) -> list[tuple[int, float]]:
        """Boost-aware fold: each term's idf is multiplied by its weight
        BEFORE the per-posting product — the same driver-side
        idf * boost the engine applies (query/wand.py mode="boolean"),
        so per-element products stay bit-identical. Terms iterate in
        sorted order like score_query."""
        acc: dict[int, float] = defaultdict(float)
        for term in sorted(weights):
            postings = self.tf.get(term)
            if not postings:
                continue
            idf = self.idf(term) * weights[term]
            for doc_id, tf in postings.items():
                denom = tf + K1 * (1.0 - B + B * self.dl[doc_id] / self.avgdl)
                acc[doc_id] += idf * tf * (K1 + 1.0) / denom
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def golden(self, queries: pd.DataFrame) -> pd.DataFrame:
        """queries: (query_id, text, k) -> (query_id, rank, doc_id, score)."""
        rows = []
        for _, q in queries.iterrows():
            for rank, (doc_id, score) in enumerate(
                self.score_query(q["text"], int(q["k"])), start=1
            ):
                rows.append((q["query_id"], rank, doc_id, score))
        return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
