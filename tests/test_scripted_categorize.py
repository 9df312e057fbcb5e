"""scripted_metric + categorize_text aggs: brute-force parity on a
synthetic table, reduce modes, tie ordering, empty/digit handling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_ds():
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    types = np.array(["a", "b", "c"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    value = rng.normal(10.0, 5.0, size=n)
    t = pa.table({"event_type": pa.array(types, type=pa.string()),
                  "value": pa.array(value, type=pa.float64())})
    return rd.from_arrow(t).repartition(8), t


def test_scripted_metric_reduce_modes(ray_session):
    from excelastic_ray.pipelines.events import scripted_metric
    from excelastic_ray.pipelines.textstats import trunc6

    ds, t = _events_ds()
    df = t.to_pandas()
    mapped = df["value"].to_numpy() * 2 + np.sqrt(
        np.abs(df["value"].to_numpy())
    ) * 0.5
    df = df.assign(m=mapped)
    for reduce, fold in (("sum", "sum"), ("min", "min"),
                         ("max", "max"), ("avg", "mean")):
        got = scripted_metric(
            ds, "value * 2 + sqrt(abs(value)) * w", params={"w": 0.5},
            reduce=reduce,
        ).to_pandas()
        want = df.groupby("event_type")["m"].agg(fold).sort_index()
        assert got["event_type"].tolist() == list(want.index)
        np.testing.assert_allclose(
            got["value"].to_numpy(),
            trunc6(want.to_numpy()),
            atol=2e-6,  # partial-vs-single-pass float sum order
        )
    with pytest.raises(ValueError, match="reduce"):
        scripted_metric(ds, "value", reduce="median")
    # malformed scripts die at COMPILE time, before any Ray work
    with pytest.raises(ValueError):
        scripted_metric(ds, "__import__('os')")


def test_scripted_metric_constant_expr(ray_session):
    """A constant map script broadcasts over the batch (count-shaped
    scripted_metric, a real ES idiom)."""
    from excelastic_ray.pipelines.events import scripted_metric

    ds, t = _events_ds()
    got = scripted_metric(ds, "1 + 1", reduce="sum").to_pandas()
    want = t.to_pandas().groupby("event_type").size() * 2.0
    assert got["value"].tolist() == want.sort_index().tolist()


def test_categorize_text_brute_force(ray_session):
    import ray.data as rd

    from excelastic_ray.analysis import TOKEN_RE
    from excelastic_ray.pipelines.textstats import categorize_text

    texts = [
        "error 404 in module alpha",
        "error 500 in module alpha",
        "error 404 in module beta extra words here",
        "connected to db42 ok",
        "connected to db17 ok",
        "",
        "   ",
        "single",
    ] * 3
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    ds = rd.from_arrow(t).repartition(4)
    got = categorize_text(ds, n_tokens=4, size=100).to_pandas()

    def cat(s):
        toks = TOKEN_RE.findall(s.lower())[:4]
        return " ".join(
            "<num>" if any(c.isdigit() for c in w) else w for w in toks
        )

    want = (
        pd.Series([cat(s) for s in texts if TOKEN_RE.findall(s.lower())])
        .value_counts()
        .rename_axis("category")
        .reset_index(name="doc_count")
        .sort_values(["doc_count", "category"],
                     ascending=[False, True])
        .reset_index(drop=True)
    )
    # "error <num> in module" collapses the 404/500/alpha/beta variants
    assert want["category"].iloc[0] == "error <num> in module"
    assert got["category"].tolist() == want["category"].tolist()
    assert got["doc_count"].tolist() == want["doc_count"].tolist()
    # size truncates at the (doc_count DESC, category ASC) order
    top2 = categorize_text(ds, n_tokens=4, size=2).to_pandas()
    assert top2["category"].tolist() == want["category"].tolist()[:2]
