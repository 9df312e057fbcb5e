"""Single-process pure-Python BM25 oracle — the correctness anchor.

Brute-force dict-based inverted index + exact Lucene-default BM25
(k1=1.2, b=0.75). The distributed engine must be *rank-identical*
(docids AND scores, bit-for-bit) to this oracle on every query
(SURVEY.md §5). Summation order is fixed to sorted-unique-term order in
both, so IEEE-754 double results agree exactly.

Reference parity: this is the query capability the reference delegates
to Elasticsearch (``/root/reference/README.md:3``) — ES default
similarity over documents ingested one-JSON-doc-per-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from excelastic_ray.analysis import query_terms, tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.query.bm25 import contribution, idf


class BM25Oracle:
    def __init__(self, table: pa.Table, config: IndexConfig | None = None):
        cfg = config or IndexConfig()
        self.cfg = cfg
        conv = table["conv_id"].to_pylist()
        turn = table["turn_idx"].to_pylist()
        text = table["text"].to_pylist()
        ranks = {c: i for i, c in enumerate(sorted(set(conv)))}
        self.conv_ids = sorted(ranks)

        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.dl: dict[int, int] = {}
        for c, t, x in zip(conv, turn, text):
            docid = (ranks[c] << cfg.turn_bits) | t
            toks = tokenize(x, cfg.analyzer)
            self.dl[docid] = len(toks)
            for p, w in enumerate(toks):
                d = self.postings.setdefault(w, {})
                d[docid] = d.get(docid, 0) + 1
                self.positions.setdefault(w, {}).setdefault(docid, []).append(p)
        self.n_docs = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def search(self, query: str, k: int = 10,
               mode: str = "or") -> list[tuple[int, float]]:
        """Exact top-k [(docid, score)] — score DESC, docid ASC ties.
        ``mode="and"``: every query term must match (ES operator=and)."""
        terms = query_terms(query, self.cfg.analyzer)
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        n_live = 0
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            n_live += 1
            t_idf = idf(self.n_docs, len(plist))
            for docid in sorted(plist):
                scores[docid] = scores.get(docid, 0.0) + float(
                    contribution(
                        t_idf,
                        np.float64(plist[docid]),
                        np.float64(self.dl[docid]),
                        self.avgdl,
                        self.cfg.k1,
                        self.cfg.b,
                    )
                )
                hits[docid] = hits.get(docid, 0) + 1
        if mode == "and":
            if n_live < len(terms):
                return []
            scores = {d: s for d, s in scores.items() if hits[d] == n_live}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """match_phrase oracle: ptf = consecutive-occurrence count, df =
        docs with ptf > 0, score = idf(N, df) * tfnorm(ptf, dl) — the
        single-pseudo-term PhraseQuery shape the engine mirrors."""
        terms = tokenize(query, self.cfg.analyzer)  # ordered, duplicates kept
        if not terms:
            return []
        maps = [self.positions.get(t) for t in terms]
        if any(m is None for m in maps):
            return []
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        ptf: dict[int, int] = {}
        for d in common:
            sets = [set(m[d]) for m in maps]
            n = sum(
                1 for p in maps[0][d] if all(p + j in sets[j]
                                             for j in range(1, len(terms)))
            )
            if n:
                ptf[d] = n
        if not ptf:
            return []
        p_idf = idf(self.n_docs, len(ptf))
        scored = [
            (
                d,
                float(
                    contribution(
                        p_idf, np.float64(n), np.float64(self.dl[d]),
                        self.avgdl, self.cfg.k1, self.cfg.b,
                    )
                ),
            )
            for d, n in ptf.items()
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:k]

    def keys_of(self, docid: int) -> tuple[str, int]:
        cfg = self.cfg
        return self.conv_ids[docid >> cfg.turn_bits], docid & (cfg.max_turns - 1)
