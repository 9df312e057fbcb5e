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

``nb_langid_eval``: the proper ML evaluation of the same model — train
on the deterministic Knuth-hash holdout split's train side, score the
held-out documents, and emit the confusion matrix. Prediction is the
argmax of the TRUNC6'd log-likelihood (ties → label ASC) so the engine
and the SQL twin argmax identical values.

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
from excelastic_ray.pipelines.sampling import KNUTH, MOD
from excelastic_ray.pipelines.textstats import _tokenize_batch, trunc6

__all__ = ["nb_langid", "nb_langid_eval"]


def _nb_model(train_ds, id_col: str, text_col: str, label_col: str,
              model_budget: int):
    """One distributed counting pass → (langs, terms, logp matrix,
    OOV floor per label, log prior per label). Budget-gated: a model
    over ``model_budget`` (term, label) rows raises instead of
    silently truncating."""

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
        train_ds.map_batches(count_partial, batch_format="pyarrow",
                             batch_size=4096),
        ["term", "lang"],
    ).materialize()
    n_rows = counts.count()
    if n_rows > model_budget:
        raise ValueError(
            f"NB model has {n_rows} (term, label) rows — over "
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
    cmat = np.zeros((len(terms), len(langs)), dtype=np.float64)
    trow = np.searchsorted(terms, tcounts["term"].to_numpy())
    lcol = np.searchsorted(np.asarray(langs, dtype=object),
                           tcounts["lang"].to_numpy())
    cmat[trow, lcol] = tcounts["c"].to_numpy().astype(np.float64)
    toks_l = cmat.sum(axis=0)
    # empty vocabulary (token-less train split) ⇒ Laplace denominator
    # 0; pin it to 1 so the floor is ln(1)=0 — a per-label constant
    # that cannot change any argmax — instead of ln(1/0)=inf
    denom = np.maximum(toks_l + vocab_v, 1.0)
    logp = np.log((cmat + 1.0) / denom)
    floor = np.log(1.0 / denom)
    prior = np.log(docs_l.to_numpy().astype(np.float64) / n_docs)
    return langs, terms, logp, floor, prior


def _score_table(batch: pa.Table, model, langs, id_col, text_col):
    """Per-(doc, label) raw log-likelihoods for one batch →
    (ids repeated, lang tiled, lp matrix)."""
    terms_b, logp_b, floor_b, prior_b = model
    texts = batch[text_col].to_pylist()
    n = len(texts)
    codes, uniques, row_idx = _tokenize_batch(texts)
    upos = np.zeros(0, dtype=np.int64)
    found = np.zeros(len(uniques), dtype=bool)
    if len(uniques):
        upos = np.searchsorted(terms_b, uniques)
        upc = np.minimum(upos, len(terms_b) - 1)
        found = (terms_b[upc] == uniques) if len(terms_b) else found
        upos = upc
    L = len(langs)
    lps = np.tile(prior_b, (n, 1))
    if len(codes):
        occ_row = upos[codes]
        occ_found = found[codes]
        for j in range(L):
            if len(terms_b):
                w = np.where(occ_found, logp_b[occ_row, j], floor_b[j])
            else:
                # empty trained vocabulary (e.g. the train split held
                # only token-less docs): every occurrence scores the
                # floor — np.where would eagerly index the (0, L) logp
                w = np.full(len(codes), floor_b[j])
            lps[:, j] += np.bincount(row_idx, weights=w, minlength=n)
    return lps


def nb_langid(ds, id_col: str = "doc_id", text_col: str = "text",
              label_col: str = "lang", model_budget: int = 50_000_000):
    """→ Dataset of (id, label-column value ``lang``, ``lp``) — one row
    per (document, trained label) with the trunc6'd NB log-likelihood.
    Downstream argmaxes per doc (ties broken by label ASC) for the
    prediction; emitting the full score table keeps the gate
    tie-proof."""
    narrow = ds.select_columns([id_col, text_col, label_col])
    langs, terms, logp, floor, prior = _nb_model(
        narrow, id_col, text_col, label_col, model_budget
    )

    import ray

    model_ref = ray.put((terms, logp, floor, prior))

    def score(batch: pa.Table) -> pa.Table:
        lps = _score_table(batch, ray.get(model_ref), langs, id_col,
                           text_col)
        n = len(lps)
        out_ids = batch[id_col].take(pa.array(np.repeat(
            np.arange(n, dtype=np.int64), len(langs))))
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


def nb_langid_eval(ds, test_frac: float = 0.2, id_col: str = "doc_id",
                   text_col: str = "text", label_col: str = "lang",
                   model_budget: int = 50_000_000):
    """Holdout evaluation: train the NB model on the Knuth-hash train
    side (``(id * KNUTH) % 2^32 >= floor(test_frac * 2^32)`` — the
    assign_splits rule, reproducible at any parallelism and immune to
    corpus growth), score the held-out documents, and emit the
    confusion matrix (lang_true, lang_pred, n). Prediction = argmax of
    the TRUNC6'd per-label log-likelihood, ties → label ASC. Held-out
    terms absent from the train vocabulary score the Laplace floor."""
    if not 0.0 < test_frac < 1.0:
        raise ValueError("test_frac must be in (0, 1)")
    thr = int(np.floor(test_frac * MOD))
    narrow = ds.select_columns([id_col, text_col, label_col])

    def split_mask(batch: pa.Table, want_test: bool) -> pa.Table:
        h = (batch[id_col].to_numpy().astype(np.int64) * KNUTH) % MOD
        keep = (h < thr) if want_test else (h >= thr)
        return batch.filter(pa.array(keep))

    train = narrow.map_batches(
        lambda b: split_mask(b, False), batch_format="pyarrow"
    )
    test = narrow.map_batches(
        lambda b: split_mask(b, True), batch_format="pyarrow"
    )
    langs, terms, logp, floor, prior = _nb_model(
        train, id_col, text_col, label_col, model_budget
    )

    import ray

    model_ref = ray.put((terms, logp, floor, prior))
    langs_arr = np.asarray(langs, dtype=object)

    def confuse(batch: pa.Table) -> pd.DataFrame:
        lps = trunc6(_score_table(batch, ray.get(model_ref), langs,
                                  id_col, text_col))
        # argmax over trunc6'd values; ties break to the SMALLEST label
        # index (np.argmax keeps the first maximum; langs are sorted)
        pred = langs_arr[np.argmax(lps, axis=1)]
        truth = np.asarray(batch[label_col].to_pylist(), dtype=object)
        df = pd.DataFrame(
            {"lang_true": truth, "lang_pred": pred,
             "n": np.ones(len(truth), dtype=np.int64)}
        )
        return (df.groupby(["lang_true", "lang_pred"], sort=False)["n"]
                .sum().reset_index())

    return _bucketed_sum_combine(
        test.map_batches(confuse, batch_format="pyarrow",
                         batch_size=4096),
        ["lang_true", "lang_pred"], n_buckets=8,
    )
