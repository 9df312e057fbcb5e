"""Percolator — reverse search (ES ``percolate`` query analog).

Elasticsearch's percolator indexes *queries* and matches incoming
*documents* against them (alerting / routing / classification at
ingest).  The reference delegates that to ES; here it is a streaming
Ray Data stage: the registered query set is compiled once on the
driver into a term-membership structure (the inverted "query index"),
and a ``map_batches`` pass classifies every document with pure numpy —
no per-row Python in the hot loop beyond the C-level tokenizer.

Two compiled layouts, selected by ``layout`` (default ``auto``):

- **dense** — term × K int8 membership matrix + one ``reduceat`` per
  batch.  O(doc-term groups × K) per batch: unbeatable for the
  hundreds-to-thousands of queries a typical alerting set holds.
- **csr** — ES's actual term→queries posting layout: per matched
  (doc, term) pair, gather that term's query-id list (CSR
  indptr/indices) with one ragged range gather, then count per
  (doc, query) via ``np.unique`` over packed keys.  O(matched pairs ×
  avg queries per term) — the true posting size — independent of K,
  so a K ≫ 10⁴ router costs only what its matches cost.

Both kernels are exact and return identical rows (pytest-pinned);
``auto`` switches to CSR past 2048 queries.

Scale shape: either compiled spec is broadcast once per task; the
driver never holds anything document-sized.

Match semantics per query: every analyzer term must appear in the doc
(ES ``match`` with ``operator: and``), or at least
``minimum_should_match`` of them.  A query with no analyzer tokens
matches nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from excelastic_ray.analysis import TOKEN_RE, query_terms

#: auto layout switchover: below this many registered queries the
#: dense reduceat wins (no ragged gather bookkeeping); above, CSR's
#: K-independence dominates
DENSE_MAX_QUERIES = 2048


def _term_sets(queries: list[str],
               minimum_should_match: int | None):
    term_sets = [query_terms(q) for q in queries]
    uq = sorted({t for ts in term_sets for t in ts})
    required = np.empty(len(queries), dtype=np.int64)
    for qi, ts in enumerate(term_sets):
        if ts:
            # clamp to [1, len]: required = 0 would make the query
            # match any doc containing ANY registered term
            required[qi] = (len(ts) if minimum_should_match is None
                            else max(1, min(minimum_should_match,
                                            len(ts))))
        else:
            required[qi] = 1  # no terms -> unmatched forever
    return term_sets, uq, required


def compile_queries(queries: list[str],
                    minimum_should_match: int | None = None):
    """Dense layout → (uq, M, required): sorted unique term array
    (numpy ``U`` dtype, zero-copy broadcastable), term×query
    membership matrix (int8), per-query required match counts."""
    term_sets, uq, required = _term_sets(queries, minimum_should_match)
    pos = {t: i for i, t in enumerate(uq)}
    m = np.zeros((len(uq), len(queries)), dtype=np.int8)
    for qi, ts in enumerate(term_sets):
        for t in ts:
            m[pos[t], qi] = 1
    return np.asarray(uq, dtype=np.str_), m, required


def compile_queries_csr(queries: list[str],
                        minimum_should_match: int | None = None):
    """CSR layout → (uq, indptr, qids, required): for term slot i,
    ``qids[indptr[i]:indptr[i+1]]`` are the query ids containing it —
    exactly ES's term→queries posting list."""
    term_sets, uq, required = _term_sets(queries, minimum_should_match)
    pos = {t: i for i, t in enumerate(uq)}
    pairs = sorted(
        {(pos[t], qi) for qi, ts in enumerate(term_sets) for t in ts}
    )
    tids = np.fromiter((p[0] for p in pairs), dtype=np.int64,
                       count=len(pairs))
    qids = np.fromiter((p[1] for p in pairs), dtype=np.int64,
                       count=len(pairs))
    indptr = np.searchsorted(tids, np.arange(len(uq) + 1))
    return np.asarray(uq, dtype=np.str_), indptr, qids, required


def _matched_pairs(batch: pa.Table, uq: np.ndarray, text_col: str):
    """Tokenize + dedupe → (docs, tidx): one row per (doc, registered
    term) hit, sorted by (doc, term)."""
    texts = batch[text_col].to_pylist()
    findall = TOKEN_RE.findall
    toks = [findall(t.lower()) if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in toks), dtype=np.int64,
                         count=len(toks))
    flat = np.asarray([w for row in toks for w in row], dtype=np.str_)
    if not len(flat) or not len(uq):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    ins = np.searchsorted(uq, flat)
    ins[ins == len(uq)] = 0
    valid = uq[ins] == flat
    if not valid.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # dedupe (doc, term) pairs: tf does not matter for matching
    key = row_idx[valid] * np.int64(len(uq)) + ins[valid]
    key = np.unique(key)  # sorted by (doc, term)
    return key // len(uq), key % len(uq)


def percolate_batch(batch: pa.Table, uq: np.ndarray, m: np.ndarray,
                    required: np.ndarray, id_cols: tuple[str, ...],
                    text_col: str) -> pa.Table:
    """One classified batch (dense kernel) → (id_cols..., query_id)."""
    docs, tidx = _matched_pairs(batch, uq, text_col)
    out_doc = np.zeros(0, dtype=np.int64)
    out_q = np.zeros(0, dtype=np.int64)
    if len(docs):
        # per-doc per-query matched-term counts in one reduceat
        starts = np.flatnonzero(np.diff(docs, prepend=-1))
        hit = np.add.reduceat(
            m[tidx].astype(np.int64, copy=False), starts, axis=0
        )
        doc_of_group = docs[starts]
        gi, qi = np.nonzero(hit >= required[None, :])
        out_doc = doc_of_group[gi]
        out_q = qi.astype(np.int64)
    return _emit(batch, id_cols, out_doc, out_q)


def percolate_batch_csr(batch: pa.Table, uq: np.ndarray,
                        indptr: np.ndarray, qids: np.ndarray,
                        required: np.ndarray, n_queries: int,
                        id_cols: tuple[str, ...],
                        text_col: str) -> pa.Table:
    """One classified batch (CSR kernel): ragged gather of each
    matched term's query list, then (doc, query) counts via one
    ``np.unique`` over packed keys — work is O(posting hits), never
    O(groups × K)."""
    docs, tidx = _matched_pairs(batch, uq, text_col)
    out_doc = np.zeros(0, dtype=np.int64)
    out_q = np.zeros(0, dtype=np.int64)
    if len(docs):
        starts = indptr[tidx]
        lens = indptr[tidx + 1] - starts
        tot = int(lens.sum())
        if tot:
            cum = np.cumsum(lens)
            idx = (
                np.arange(tot, dtype=np.int64)
                - np.repeat(cum - lens, lens)
                + np.repeat(starts, lens)
            )
            q_of_pair = qids[idx]
            doc_of_pair = np.repeat(docs, lens)
            key = doc_of_pair * np.int64(n_queries) + q_of_pair
            ukey, cnt = np.unique(key, return_counts=True)
            uq_q = ukey % n_queries
            ok = cnt >= required[uq_q]
            out_doc = (ukey // n_queries)[ok]
            out_q = uq_q[ok]
    return _emit(batch, id_cols, out_doc, out_q)


def _emit(batch: pa.Table, id_cols: tuple[str, ...],
          out_doc: np.ndarray, out_q: np.ndarray) -> pa.Table:
    cols: dict[str, pa.Array] = {}
    for c in id_cols:
        cols[c] = batch[c].take(pa.array(out_doc))
    cols["query_id"] = pa.array(out_q)
    return pa.table(cols)


def percolate(ds, queries: list[str], id_cols: tuple[str, ...] = ("doc_id",),
              text_col: str = "text",
              minimum_should_match: int | None = None,
              layout: str = "auto"):
    """Match every document of ``ds`` against the registered query set
    → Dataset of (id_cols..., query_id), one row per (doc, query)
    match.  ``layout``: "dense" | "csr" | "auto" (CSR past
    ``DENSE_MAX_QUERIES`` registered queries)."""
    if layout not in ("auto", "dense", "csr"):
        raise ValueError(f"unknown percolate layout {layout!r}")
    if layout == "auto":
        layout = "dense" if len(queries) <= DENSE_MAX_QUERIES else "csr"
    if layout == "dense":
        uq, m, required = compile_queries(queries, minimum_should_match)

        def fn(batch: pa.Table) -> pa.Table:
            return percolate_batch(batch, uq, m, required, id_cols,
                                   text_col)
    else:
        uq, indptr, qids, required = compile_queries_csr(
            queries, minimum_should_match
        )
        n_queries = len(queries)

        def fn(batch: pa.Table) -> pa.Table:
            return percolate_batch_csr(batch, uq, indptr, qids,
                                       required, n_queries, id_cols,
                                       text_col)

    return ds.map_batches(fn, batch_format="pyarrow")
