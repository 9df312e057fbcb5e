"""Percolator — reverse search (ES ``percolate`` query analog).

Elasticsearch's percolator indexes *queries* and matches incoming
*documents* against them (alerting / routing / classification at
ingest).  The reference delegates that to ES; here it is a streaming
Ray Data stage: the registered query set is compiled once on the
driver into a term-membership matrix (the dense form of ES's inverted
"query index": rows = distinct query terms, columns = queries), and a
``map_batches`` pass classifies every document with pure numpy — no
per-row Python in the hot loop beyond the C-level tokenizer.

Scale shape: the compiled query spec is O(distinct query terms × K)
and broadcast once per task (tiny for the thousands of registered
percolator queries ES deployments run); the per-batch cost is
O(tokens + matched-term-pairs × K).  For K ≫ 10⁴ the dense int8
matrix should become a sparse CSR over query ids — same kernel, same
reduceat — which is exactly ES's term→queries posting layout.

Match semantics per query: every analyzer term must appear in the doc
(ES ``match`` with ``operator: and``), or at least
``minimum_should_match`` of them.  A query with no analyzer tokens
matches nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from excelastic_ray.analysis import TOKEN_RE, query_terms


def compile_queries(queries: list[str],
                    minimum_should_match: int | None = None):
    """→ (uq, M, required): sorted unique term array (numpy ``U``
    dtype, zero-copy broadcastable), term×query membership matrix
    (int8), and per-query required match counts."""
    term_sets = [query_terms(q) for q in queries]
    uq = sorted({t for ts in term_sets for t in ts})
    pos = {t: i for i, t in enumerate(uq)}
    m = np.zeros((len(uq), len(queries)), dtype=np.int8)
    required = np.empty(len(queries), dtype=np.int64)
    for qi, ts in enumerate(term_sets):
        for t in ts:
            m[pos[t], qi] = 1
        if ts:
            # clamp to [1, len]: required = 0 would make the query
            # match any doc containing ANY registered term
            required[qi] = (len(ts) if minimum_should_match is None
                            else max(1, min(minimum_should_match,
                                            len(ts))))
        else:
            required[qi] = 1  # no terms -> unmatched forever
    return np.asarray(uq, dtype=np.str_), m, required


def percolate_batch(batch: pa.Table, uq: np.ndarray, m: np.ndarray,
                    required: np.ndarray, id_cols: tuple[str, ...],
                    text_col: str) -> pa.Table:
    """One classified batch → (id_cols..., query_id) match rows."""
    texts = batch[text_col].to_pylist()
    findall = TOKEN_RE.findall
    toks = [findall(t.lower()) if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in toks), dtype=np.int64,
                         count=len(toks))
    flat = np.asarray([w for row in toks for w in row], dtype=np.str_)
    out_doc = np.zeros(0, dtype=np.int64)
    out_q = np.zeros(0, dtype=np.int64)
    if len(flat) and len(uq):
        row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        # membership of each token in the registered-term dictionary
        ins = np.searchsorted(uq, flat)
        ins[ins == len(uq)] = 0
        valid = uq[ins] == flat
        if valid.any():
            # dedupe (doc, term) pairs: tf does not matter for matching
            key = row_idx[valid] * np.int64(len(uq)) + ins[valid]
            key = np.unique(key)  # sorted by (doc, term)
            docs = key // len(uq)
            tidx = key % len(uq)
            # per-doc per-query matched-term counts in one reduceat
            starts = np.flatnonzero(np.diff(docs, prepend=-1))
            hit = np.add.reduceat(
                m[tidx].astype(np.int64, copy=False), starts, axis=0
            )
            doc_of_group = docs[starts]
            gi, qi = np.nonzero(hit >= required[None, :])
            out_doc = doc_of_group[gi]
            out_q = qi.astype(np.int64)
    cols: dict[str, pa.Array] = {}
    for c in id_cols:
        cols[c] = batch[c].take(pa.array(out_doc))
    cols["query_id"] = pa.array(out_q)
    return pa.table(cols)


def percolate(ds, queries: list[str], id_cols: tuple[str, ...] = ("doc_id",),
              text_col: str = "text",
              minimum_should_match: int | None = None):
    """Match every document of ``ds`` against the registered query set
    → Dataset of (id_cols..., query_id), one row per (doc, query)
    match."""
    uq, m, required = compile_queries(queries, minimum_should_match)

    def fn(batch: pa.Table) -> pa.Table:
        return percolate_batch(batch, uq, m, required, id_cols, text_col)

    return ds.map_batches(fn, batch_format="pyarrow")
