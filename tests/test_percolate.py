"""Percolator (ES reverse-search analog): AND / minimum_should_match
semantics, empty queries, and batch-size invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest

from excelastic_ray.pipelines.percolate import (
    compile_queries,
    percolate,
    percolate_batch,
)

DOCS = pa.table(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma",
            "alpha beta",
            "gamma delta ALPHA",
            "",
        ],
    }
)
QUERIES = [
    "alpha beta",        # q0: docs 0, 1
    "gamma",             # q1: docs 0, 2
    "alpha gamma",       # q2: docs 0, 2 (case-folded)
    "zeta",              # q3: nothing
    "",                  # q4: no tokens -> matches nothing
]


def _pairs(t: pa.Table) -> set[tuple[int, int]]:
    return {(r["doc_id"], r["query_id"]) for r in t.to_pylist()}


def test_and_semantics_batch_kernel():
    uq, m, req = compile_queries(QUERIES)
    out = percolate_batch(DOCS, uq, m, req, ("doc_id",), "text")
    assert _pairs(out) == {
        (0, 0), (1, 0), (0, 1), (2, 1), (0, 2), (2, 2),
    }


def test_minimum_should_match():
    uq, m, req = compile_queries(QUERIES, minimum_should_match=1)
    out = percolate_batch(DOCS, uq, m, req, ("doc_id",), "text")
    # q2 "alpha gamma" with msm=1 now also matches doc 1 (alpha only);
    # the empty query still matches nothing
    got = _pairs(out)
    assert (1, 2) in got and (3, 4) not in got
    assert not any(q == 4 for _, q in got)


def test_batch_size_invariance(ray_session):
    """Matches are per-row: forcing tiny batches must not change the
    result set (no cross-batch state)."""
    import ray.data as rd

    big = pa.concat_tables([DOCS] * 8).combine_chunks()
    big = big.set_column(
        0, "doc_id", pa.array(range(big.num_rows), type=pa.int64())
    )
    uq, m, req = compile_queries(QUERIES)

    def fn(t: pa.Table) -> pa.Table:
        return percolate_batch(t, uq, m, req, ("doc_id",), "text")

    whole = _pairs(pa.Table.from_pylist(
        percolate(rd.from_arrow(big), QUERIES).take_all()
    ))
    tiny = _pairs(pa.Table.from_pylist(
        rd.from_arrow(big)
        .map_batches(fn, batch_size=3, batch_format="pyarrow")
        .take_all()
    ))
    assert whole == tiny and len(whole) == 8 * 6


def test_no_registered_terms():
    uq, m, req = compile_queries(["", ""])
    out = percolate_batch(DOCS, uq, m, req, ("doc_id",), "text")
    assert out.num_rows == 0


def test_msm_zero_clamped_to_one():
    """required must never drop to 0 (a 0 threshold would match every
    doc containing ANY registered term)."""
    uq, m, req = compile_queries(["alpha beta", "zeta"],
                                 minimum_should_match=0)
    out = percolate_batch(DOCS, uq, m, req, ("doc_id",), "text")
    got = _pairs(out)
    # doc 0 has alpha+beta+gamma but NOT zeta: must not match query 1
    assert (0, 1) not in got and (0, 0) in got


def test_csr_kernel_equals_dense():
    """The CSR (term->queries posting) kernel returns exactly the
    dense reduceat kernel's rows — fixed set + randomized sets, both
    msm variants."""
    import numpy as np

    from excelastic_ray.pipelines.percolate import (
        compile_queries_csr,
        percolate_batch_csr,
    )

    def csr(docs, queries, msm=None):
        uq, indptr, qids, req = compile_queries_csr(queries, msm)
        return _pairs(
            percolate_batch_csr(docs, uq, indptr, qids, req,
                                len(queries), ("doc_id",), "text")
        )

    def dense(docs, queries, msm=None):
        uq, m, req = compile_queries(queries, msm)
        return _pairs(
            percolate_batch(docs, uq, m, req, ("doc_id",), "text")
        )

    assert csr(DOCS, QUERIES) == dense(DOCS, QUERIES)
    assert csr(DOCS, QUERIES, 1) == dense(DOCS, QUERIES, 1)

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        docs = pa.table(
            {
                "doc_id": list(range(40)),
                "text": [
                    " ".join(rng.choice(vocab,
                                        size=rng.randint(0, 12)))
                    for _ in range(40)
                ],
            }
        )
        queries = [
            " ".join(rng.choice(vocab, size=rng.randint(1, 4)))
            for _ in range(25)
        ] + ["", "w0 w0 w1"]  # empty + duplicate-term queries
        for msm in (None, 1, 2):
            assert csr(docs, queries, msm) == dense(docs, queries, msm)


def test_percolate_layout_param(ray_session):
    """percolate(layout=...) forces the kernel; auto == dense at small
    K; both layouts agree end-to-end through Ray."""
    import ray.data as rd

    from excelastic_ray.pipelines.percolate import percolate as perc

    ds = rd.from_arrow(DOCS)

    def run(layout):
        df = perc(ds, QUERIES, layout=layout).to_pandas()
        return set(zip(df["doc_id"], df["query_id"]))

    assert run("dense") == run("csr") == run("auto")
    assert len(run("dense")) > 0
    with pytest.raises(ValueError):
        perc(ds, QUERIES, layout="nope")
