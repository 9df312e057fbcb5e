"""Trained corpus classifiers — the fasttext-style linear stage of an
LLM data pipeline, expressed as exact integer counting so results are
deterministic and SQL-twinnable (the engine's correctness bar; a
gradient-trained model would be scheduling-order-dependent).

``nb_langid``: a multinomial Naive Bayes language classifier TRAINED on
the corpus's own labels and applied back to every document — the
standard train-then-score pipeline shape:

1. ONE distributed counting pass builds the model: per-(term, label)
   token counts (vectorized factorize + groupby partials, combined by
   the term-hash bucket exchange every counting op here uses) plus the
   per-label doc/token totals.
2. The model broadcasts once (``ray.put``) — budget-gated, never
   silently truncated.
3. ONE scoring pass computes every document's per-label log-likelihood
   with Laplace smoothing: lp(d, l) = ln(docs_l / N) + Σ_tokens
   ln((c(term, l) + 1) / (tokens_l + V)), V = distinct trained terms.

Reference relationship: the reference (codingchili/excelastic) has no
classifier surface; this extends the engine like the other
``pipelines/`` training-data operators (SURVEY §2 beyond-the-reference
ops). Scale shape: model size is vocab × labels (vocabulary-sized, not
corpus-sized); the scoring pass is a pure map over broadcast state —
the same broadcast-small-side rule as keywords/dsir.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from excelastic_ray.pipelines.events import _bucketed_sum_combine
from excelastic_ray.pipelines.textstats import _tokenize_batch, trunc6

__all__ = ["nb_langid"]


def nb_langid(ds, id_col: str = "doc_id", text_col: str = "text",
              label_col: str = "lang", model_budget: int = 50_000_000):
    """→ Dataset of (id, label-column value ``lang``, ``lp``) — one row
    per (document, trained label) with the trunc6'd NB log-likelihood.
    Downstream argmaxes per doc (ties broken by label ASC) for the
    prediction; emitting the full score table keeps the gate
    tie-proof. ``model_budget`` bounds the broadcast (term, label)
    count table; exceeding it raises (pre-prune the vocabulary or
    raise the budget — never a silent cap)."""
    narrow = ds.select_columns([id_col, text_col, label_col])

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch[text_col].to_pylist()
        labels = np.asarray(batch[label_col].to_pylist(), dtype=object)
        codes, uniques, row_idx = _tokenize_batch(texts)
        df = pd.DataFrame(
            {"term": uniques[codes], "lang": labels[row_idx],
             "c": np.ones(len(codes), dtype=np.int64)}
        )
        out = (df.groupby(["term", "lang"], sort=False)["c"].sum()
               .reset_index())
        # per-label doc counts ride along as sentinel term rows ('' is
        # never an analyzer token)
        lp = pd.DataFrame(
            {"term": "", "lang": pd.Series(labels).astype(object),
             "c": 1}
        )
        lp = lp.groupby(["term", "lang"], sort=False)["c"].sum() \
               .reset_index()
        return pd.concat([out, lp], ignore_index=True)

    counts = _bucketed_sum_combine(
        narrow.map_batches(count_partial, batch_format="pyarrow",
                           batch_size=4096),
        ["term", "lang"],
    ).materialize()
    n_rows = counts.count()
    if n_rows > model_budget:
        raise ValueError(
            f"nb_langid model has {n_rows} (term, label) rows — over "
            f"model_budget={model_budget}; pre-prune the vocabulary or "
            f"raise the budget"
        )
    model = counts.to_pandas()
    docs_l = (model[model["term"] == ""]
              .set_index("lang")["c"].sort_index())
    tcounts = model[model["term"] != ""]
    langs = sorted(docs_l.index)
    n_docs = int(docs_l.sum())
    terms = np.asarray(sorted(tcounts["term"].unique()), dtype=object)
    vocab_v = float(len(terms))
    # dense (term, lang) count matrix (missing pair = 0)
    cmat = np.zeros((len(terms), len(langs)), dtype=np.float64)
    trow = np.searchsorted(terms, tcounts["term"].to_numpy())
    lcol = np.searchsorted(np.asarray(langs, dtype=object),
                           tcounts["lang"].to_numpy())
    cmat[trow, lcol] = tcounts["c"].to_numpy().astype(np.float64)
    toks_l = cmat.sum(axis=0)
    logp = np.log((cmat + 1.0) / (toks_l + vocab_v))
    floor = np.log(1.0 / (toks_l + vocab_v))
    prior = np.log(docs_l.to_numpy().astype(np.float64) / n_docs)

    import ray

    model_ref = ray.put((terms, logp, floor, prior))

    def score(batch: pa.Table) -> pa.Table:
        terms_b, logp_b, floor_b, prior_b = ray.get(model_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col]
        n = len(texts)
        codes, uniques, row_idx = _tokenize_batch(texts)
        upos = np.searchsorted(terms_b, uniques) if len(uniques) else \
            np.zeros(0, dtype=np.int64)
        found = np.zeros(len(uniques), dtype=bool)
        if len(uniques):
            upc = np.minimum(upos, len(terms_b) - 1)
            found = terms_b[upc] == uniques
            upos = upc
        L = len(langs)
        lps = np.tile(prior_b, (n, 1))
        if len(codes):
            occ_row = upos[codes]
            occ_found = found[codes]
            for j in range(L):
                w = np.where(occ_found, logp_b[occ_row, j], floor_b[j])
                lps[:, j] += np.bincount(row_idx, weights=w, minlength=n)
        out_ids = ids.take(pa.array(np.repeat(
            np.arange(n, dtype=np.int64), L)))
        return pa.table(
            {
                id_col: out_ids,
                "lang": pa.array(langs * n, type=pa.string()),
                "lp": pa.array(trunc6(lps.reshape(-1)),
                               type=pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=4096
    )
