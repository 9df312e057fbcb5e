"""Build / query configuration.

The reference's tunables (batch size 128 at ``ElasticWriter.java:26``,
mmap page size at ``CSVParser.java:21``) map to Ray-side knobs here:
``batch_size`` for tokenize map_batches, ``chunk_docs`` for the docid-range
salting granularity, ``num_shards`` for the queryable shard count.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # BM25 parameters (Lucene defaults).
    k1: float = 1.2
    b: float = 0.75

    # Posting compression codec: "varint" (delta + LEB128) or "blockpack"
    # (delta + per-block fixed-width packing, PForDelta-simplified).
    codec: str = "varint"

    # Docs per docid-range chunk. The (term, chunk) group key is the
    # explicit hot-term salt: a term that appears in ~every doc (role/tool
    # stopword-like skew) is split into n_chunks groups, so no reducer ever
    # holds more than chunk_docs postings for one term. Must be a power of 2.
    chunk_docs: int = 1 << 20

    # Queryable shards. Shards are DOC-partitioned (contiguous chunk
    # ranges), so each shard answers top-k locally over all query terms and
    # the driver only merges k-sized heaps — no posting list ever ships at
    # query time. (SURVEY.md §7.3 sketched term-partitioned shards; doc
    # partitioning was chosen instead because term-partitioned shards
    # cannot score a document without shipping hot postings to a scorer.)
    num_shards: int = 32

    # Postings per skip block (block-max metadata granularity).
    block_size: int = 128

    # Which columns get tokenized into the index.
    index_fields: tuple[str, ...] = ("text",)

    # Tokenize-stage batch size (rows per map_batches call).
    batch_size: int = 8192

    def __post_init__(self) -> None:
        if self.chunk_docs & (self.chunk_docs - 1):
            raise ValueError("chunk_docs must be a power of 2")
        if self.codec not in ("varint", "blockpack"):
            raise ValueError(f"unknown codec {self.codec!r}")

    @property
    def chunk_bits(self) -> int:
        return self.chunk_docs.bit_length() - 1

    def to_dict(self) -> dict:
        return {
            "k1": self.k1,
            "b": self.b,
            "codec": self.codec,
            "chunk_docs": self.chunk_docs,
            "num_shards": self.num_shards,
            "block_size": self.block_size,
            "index_fields": list(self.index_fields),
            "batch_size": self.batch_size,
        }

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        d = dict(d)
        d["index_fields"] = tuple(d.get("index_fields", ("text",)))
        return IndexConfig(**d)
