"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_config():
    from excelastic_ray.config import IndexConfig

    # Small chunk/shard geometry so the tiny corpus exercises multi-chunk
    # shuffles and multi-shard merges (the setMaxMapSize analog,
    # /root/reference/src/test/java/com/codingchili/TestParser.java:68-76).
    return IndexConfig(
        turn_bits=6, convs_per_chunk_bits=4, num_shards=4, batch_size=256
    )


@pytest.fixture(scope="session")
def tiny_table():
    from excelastic_ray.corpus import generate_transcripts

    return generate_transcripts(n_convs=120, seed=42)


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory, tiny_table):
    import os

    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("corpus")
    n = tiny_table.num_rows
    per = (n + 3) // 4
    for i in range(4):
        part = tiny_table.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(str(d), f"part-{i:05d}.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def tiny_index(tmp_path_factory, tiny_corpus_dir, tiny_config):
    from excelastic_ray.index.build import build_index

    d = str(tmp_path_factory.mktemp("index") / "idx")
    result = build_index(tiny_corpus_dir, d, tiny_config, clear=True)
    return d, result


@pytest.fixture(scope="session")
def tiny_oracle(tiny_table, tiny_config):
    from excelastic_ray.query.oracle import BM25Oracle

    return BM25Oracle(tiny_table, tiny_config)


@pytest.fixture(scope="session")
def query_set(tiny_table):
    """Reference query set (FIXTURES.md §F2): rare, mid, hot, mixed,
    absent, duplicate-term, punctuation/case-noise queries."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize

    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    rare = [t for t, c in counts.items() if c == 1][:3]
    mid = [t for t, c in counts.items() if 5 <= c <= 50][:3]
    hot = [t for t, _ in counts.most_common(3)]
    qs = [
        *rare,
        *mid,
        *hot,
        f"{hot[0]} {rare[0]}",
        f"{mid[0]} {mid[1]} {hot[1]}",
        f"{hot[0]} {hot[1]} {hot[2]} {mid[2]} {rare[1]}",
        "term_not_in_corpus",
        f"{hot[0]} {hot[0]} {hot[0]}",  # duplicate terms count once
        f"{hot[0].upper()}, {mid[0].title()}!",  # analyzer noise
    ]
    return qs
