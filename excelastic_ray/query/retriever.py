"""ES 8.x retriever-tree executor: the ``retriever`` search-body shape
that composes first-phase rankers — ``standard`` (a query-DSL ranking),
``knn`` (vector top-k), ``rrf`` (reciprocal rank fusion of child
retrievers) and ``linear`` (normalized weighted score sum) — into one
ranked result. Reference purpose: the reference delegates ranking to
Elasticsearch (``ElasticWriter.java``); retrievers are the modern ES
surface for the hybrid BM25 + vector searches this engine's
``hybrid_rrf`` pipeline already serves in fixed form — this module is
the composable request-body form.

Execution shape: the tree is driver-side assembly over top-WINDOW
rankings (ES ``rank_window_size``, ≤ ~100 ids per leg by contract);
the expensive legs — BM25 top-k over the shards, ANN top-k over the
embeddings — stay the distributed parts, injected as callables so the
tree is corpus-agnostic. Fusion math is deterministic: per-doc terms
accumulate in child order (fixed float summation order), ties break
id-ASC, exactly the :func:`~excelastic_ray.pipelines.similarity.rrf_fuse`
contract.

Leaf callables:

- ``standard_fn(query, window, filter) -> list[(id, score)]`` ranked
  score DESC / id ASC; ``query`` is whatever the caller's engine
  accepts (free text or a query-DSL tree).
- ``knn_fn(spec, window) -> list[(id, score)]`` for a knn node's spec
  dict (``query_vector`` / ``k`` / ``num_candidates`` / ``filter`` —
  passed through verbatim).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["execute_retriever", "search_retriever"]

_NORMALIZERS = ("minmax", "l2_norm", "none")


def _exec(node: dict, window: int, standard_fn, knn_fn):
    """→ ordered list[(id, score)], score DESC / id ASC, ≤ window."""
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(
            f"a retriever node is a single-key dict, got {node!r}"
        )
    (kind, body), = node.items()
    if kind == "standard":
        return standard_fn(body.get("query"), window,
                           body.get("filter"))[:window]
    if kind == "knn":
        lim = min(window, int(body.get("k", window)))
        return knn_fn(body, window)[:lim]
    if kind == "rrf":
        from excelastic_ray.pipelines.similarity import rrf_fuse

        children = body.get("retrievers")
        if not children:
            raise ValueError("rrf retriever needs a retrievers list")
        cw = int(body.get("rank_window_size", window))
        rankings = [
            [d for d, _s in _exec(c, cw, standard_fn, knn_fn)]
            for c in children
        ]
        return rrf_fuse(rankings, k=window,
                        rank_constant=int(body.get("rank_constant", 60)))
    if kind == "linear":
        children = body.get("retrievers")
        if not children:
            raise ValueError("linear retriever needs a retrievers list")
        cw = int(body.get("rank_window_size", window))
        scores: dict[int, float] = {}
        for item in children:
            sub = item["retriever"] if "retriever" in item else {
                k_: v for k_, v in item.items()
                if k_ not in ("weight", "normalizer")
            }
            w = float(item.get("weight", 1.0))
            norm = item.get("normalizer", "none")
            if norm not in _NORMALIZERS:
                raise ValueError(
                    f"unknown normalizer {norm!r} (have {_NORMALIZERS})"
                )
            ranked = _exec(sub, cw, standard_fn, knn_fn)
            if not ranked:
                continue
            vals = np.asarray([s for _d, s in ranked], dtype=np.float64)
            if norm == "minmax":
                lo, hi = float(vals.min()), float(vals.max())
                # a constant window normalizes to 1.0 (documented; the
                # ES minmax edge where max == min)
                vals = ((vals - lo) / (hi - lo) if hi > lo
                        else np.ones_like(vals))
            elif norm == "l2_norm":
                n2 = float(np.sqrt((vals * vals).sum()))
                vals = vals / n2 if n2 > 0 else vals
            for (d, _s), v in zip(ranked, vals):
                scores[d] = scores.get(d, 0.0) + w * float(v)
        out = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:window]
        return [(d, float(s)) for d, s in out]
    raise ValueError(
        f"unknown retriever kind {kind!r} "
        "(have standard / knn / rrf / linear)"
    )


def execute_retriever(node: dict, window: int, *, standard_fn,
                      knn_fn=None) -> list[tuple, ]:
    """Execute one retriever tree → ranked ``[(id, score)]``
    (score DESC, id ASC, ≤ ``window``)."""
    def _no_knn(_spec, _w):
        raise ValueError("this search has no knn leaf executor wired")

    return _exec(node, window, standard_fn, knn_fn or _no_knn)


def search_retriever(body: dict, k: int = 10, *, standard_fn,
                     knn_fn=None) -> pa.Table:
    """ES ``POST _search {"retriever": {...}, "size": k}`` analog →
    pyarrow table (rank, id, score). ``body`` may be the full search
    body (with a ``retriever`` key) or a bare retriever node."""
    node = body.get("retriever", body)
    ranked = execute_retriever(node, max(k, int(body.get("size", k))),
                               standard_fn=standard_fn, knn_fn=knn_fn)[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(ranked) + 1), type=pa.int64()),
            "id": pa.array([d for d, _ in ranked], type=pa.int64()),
            "score": pa.array([s for _, s in ranked], type=pa.float64()),
        }
    )
