"""Transcript corpora: deterministic synthesis + documents-derived form.

The engine's input is a Parquet table of multi-turn conversation / agent
transcripts with columns ``(conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us])``.

Two deterministic sources, no external data:

1. :func:`generate_transcripts` — the synthetic fixture corpus
   (FIXTURES.md §F1): zipfian vocabulary, stopword-like hot tokens (the
   role/tool skew axis), per-turn rare marker tokens (df=1), rows
   shuffled on disk so stable ``(conv_id, turn_idx)`` ordering is
   exercised. The analog of the reference's synthetic
   ``generateMonsterCSV`` perf fixture
   (``/root/reference/src/test/java/com/codingchili/TestParser.java:81-115``),
   seeded so every run is byte-identical.

2. :func:`transcripts_from_documents` — derives a transcript table from
   the driver's ``documents.parquet`` with pure per-row arithmetic, and
   :data:`TRANSCRIPTS_SQL` is the *identical* derivation as a DuckDB CTE,
   so oracle SQL and engine pipelines run over the same logical table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Stopword-like hot tokens: appear in almost every turn — the skew axis
# that makes an unsalted groupby(term) explode (SURVEY.md §4).
HOT_TOKENS = ["the", "to", "a", "and", "of", "call", "run", "ok"]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "code", "browser", "files", "shell", "sql", "fetch", "math"]

TS_EPOCH = np.datetime64("2026-01-01T00:00:00", "us")


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    vocab_size: int = 20_000,
    min_turns: int = 2,
    max_turns: int = 40,
    mean_tokens: int = 30,
    rare_prob: float = 0.02,
) -> pa.Table:
    """Deterministic synthetic transcript table (schema per input_hint).

    Rows are returned in a shuffled order so consumers must handle
    arbitrary on-disk ordering — conv/turn order is a logical property,
    never a physical one.
    """
    rng = np.random.default_rng(seed)

    turns_per_conv = rng.integers(min_turns, max_turns + 1, size=n_convs)
    n_rows = int(turns_per_conv.sum())
    conv_of_row = np.repeat(np.arange(n_convs), turns_per_conv)
    turn_idx = np.concatenate([np.arange(k) for k in turns_per_conv]).astype(np.int32)

    conv_ids = np.array([f"conv-{i:06d}" for i in range(n_convs)])
    conv_col = conv_ids[conv_of_row]

    role_col = np.array(ROLES, dtype=object)[
        (turn_idx % len(ROLES)).astype(np.int64)
    ]
    is_tool_turn = role_col == "tool"
    tool_col = np.where(
        is_tool_turn,
        np.array(TOOLS, dtype=object)[rng.integers(0, len(TOOLS), size=n_rows)],
        None,
    )

    # Token counts per row: lognormal-ish around mean_tokens, clipped 5..200.
    n_tok = np.clip(
        rng.lognormal(np.log(mean_tokens), 0.6, size=n_rows).astype(np.int64), 5, 200
    )
    total = int(n_tok.sum())
    # Zipfian vocabulary draw (fold the unbounded zipf tail into vocab).
    zipf_ids = rng.zipf(1.3, size=total) % vocab_size
    vocab = np.array([f"w{i:05d}" for i in range(vocab_size)], dtype=object)
    tokens = vocab[zipf_ids]
    # Overwrite ~15% of positions with hot stopword-like tokens.
    hot_mask = rng.random(total) < 0.15
    tokens[hot_mask] = np.array(HOT_TOKENS, dtype=object)[
        rng.integers(0, len(HOT_TOKENS), size=int(hot_mask.sum()))
    ]

    offsets = np.concatenate(([0], np.cumsum(n_tok)))
    rare_mask = rng.random(n_rows) < rare_prob
    texts = np.empty(n_rows, dtype=object)
    tok_list = tokens.tolist()
    for i in range(n_rows):
        row_toks = tok_list[offsets[i] : offsets[i + 1]]
        if rare_mask[i]:
            row_toks = row_toks + [f"rare_tok_{i}"]  # df == 1 by construction
        texts[i] = " ".join(row_toks)

    ts = TS_EPOCH + (conv_of_row.astype("int64") * 86_400_000_000) + (
        turn_idx.astype("int64") * 60_000_000
    )

    table = pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role_col, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool_col, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    # Shuffle rows on disk: stable ordering must come from (conv_id, turn_idx).
    perm = rng.permutation(n_rows)
    return table.take(pa.array(perm))


def write_transcripts(path: str, n_files: int = 4, **kwargs) -> str:
    """Write the synthetic corpus as a directory of Parquet files."""
    import os

    table = generate_transcripts(**kwargs)
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(path, f"part-{i:05d}.parquet"))
    return path


# ---------------------------------------------------------------------------
# documents.parquet → transcripts (engine + SQL must agree EXACTLY)
# ---------------------------------------------------------------------------

#: DuckDB CTE body deriving the transcript table from the `documents`
#: view. Keep in lockstep with `transcripts_from_documents` below.
TRANSCRIPTS_SQL = """
    SELECT
        'conv_' || lpad(CAST(doc_id // 8 AS VARCHAR), 6, '0') AS conv_id,
        CAST(doc_id % 8 AS INTEGER) AS turn_idx,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'user'
             WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
        text,
        CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'search'
             WHEN 1 THEN 'code' ELSE '' END AS tool,
        TIMESTAMP '2026-01-01' + CAST(doc_id AS INTEGER) * INTERVAL 1 MINUTE AS ts
    FROM documents
"""


def transcripts_from_documents_table(docs: pa.Table) -> pa.Table:
    """Arrow-level derivation identical to :data:`TRANSCRIPTS_SQL`."""
    doc_id = docs["doc_id"].to_numpy()
    conv_id = np.array([f"conv_{i:06d}" for i in (doc_id // 8)], dtype=object)
    turn_idx = (doc_id % 8).astype(np.int32)
    role = np.array(["user", "assistant", "tool"], dtype=object)[doc_id % 3]
    tool = np.where(
        doc_id % 5 == 0, "search", np.where(doc_id % 5 == 1, "code", "")
    ).astype(object)
    ts = TS_EPOCH + doc_id.astype("int64") * 60_000_000
    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": docs["text"],
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def transcripts_from_documents(sf_dir: str):
    """Ray Dataset of transcripts derived from ``{sf_dir}/documents.parquet``.

    The derivation is a pure per-row map — no shuffle — applied with one
    zero-copy-in `map_batches` over the Parquet read.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(transcripts_from_documents_table, batch_format="pyarrow")
