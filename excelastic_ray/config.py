"""Build / query configuration.

The reference's tunables (batch size 128 at ``ElasticWriter.java:26``,
mmap page size at ``CSVParser.java:21``) map to Ray-side knobs here:
``batch_size`` for the tokenize map_batches, ``convs_per_chunk`` for the
docid-range shuffle granularity, ``num_shards`` for the queryable shard
count.

Docid scheme
------------
``docid = conv_rank << turn_bits | turn_idx`` where ``conv_rank`` is the
rank of the conversation id in the sorted distinct conv_id list. Docid
ascending order is therefore exactly lexicographic ``(conv_id,
turn_idx)`` order — the transcript analog of the reference's stable
file-order document identity (``ExcelParser.java:147-153``) — and it is
computable *per row* from a broadcast conv-rank table: no global sort of
the turns is ever needed.

``chunk = conv_rank >> convs_per_chunk_bits`` is the build-shuffle key: a
contiguous range of conversations. Keying the posting shuffle by doc
range instead of by term means hot terms (role/tool stopword-like skew)
can never concentrate on one reducer — every reducer handles all terms
for a bounded doc range. This IS the explicit skew/salting strategy: a
hot term's postings are split across all chunks and re-joined at
segment-merge time by concatenating docid-disjoint sub-postings in chunk
order.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class IndexConfig:
    # BM25 parameters (Lucene defaults; the ES default similarity the
    # reference relies on, /root/reference/README.md:3).
    k1: float = 1.2
    b: float = 0.75

    # Posting compression codec: "varint" (delta + LEB128), "blockpack"
    # (delta + per-block fixed-width byte lanes, PForDelta-simplified) or
    # "pfor" (true patched frame-of-reference: b-bit lanes sized for the
    # 90th percentile + exception patches, Zukowski et al. ICDE 2006).
    codec: str = "varint"

    # Bits reserved for turn_idx inside the docid (max turns per
    # conversation = 2**turn_bits).
    turn_bits: int = 12

    # log2 of conversations per build chunk. One chunk = one reducer
    # group = one resumable segment. At 10^12-turn scale with ~10 turns
    # per conversation, 2**12 convs/chunk ≈ 40k docs ≈ a few hundred MB
    # of posting fragments per reducer — bounded regardless of term skew.
    convs_per_chunk_bits: int = 12

    # Queryable shards. Shards are DOC-partitioned: shard = chunk %
    # num_shards, so every shard can score any query locally with global
    # stats and the driver merges k-sized heaps only. (Term-partitioned
    # shards were rejected: they cannot score a doc without shipping hot
    # postings at query time.)
    num_shards: int = 8

    # Postings per skip block (block-max metadata granularity).
    block_size: int = 128

    # Analyzer preset for the CATCH-ALL text stream ("standard" |
    # "english" — see analysis.py). Per-field streams (role/tool) stay
    # unanalyzed keyword-style tokens, matching ES keyword fields. The
    # analyzer is part of the index identity: append refuses a config
    # mismatch, exactly like a codec or field-list change (the
    # reference's --mapping selects ES-side analysis the same way,
    # ImportEvent.java:43,60).
    analyzer: str = "standard"

    # Which columns get tokenized into the index (concatenated into the
    # catch-all stream — the default/unqualified search field).
    index_fields: tuple[str, ...] = ("text",)

    # Columns additionally indexed as their OWN posting streams with
    # per-field doc lengths and avgdl — the ES dynamic-mapping analog
    # (the reference indexes every row column as its own ES field,
    # ExcelParser.java:222-261; Kibana queries `column:value`). Stream
    # terms are keyed FIELD_MARK + field + FIELD_SEP + term and live in
    # the SAME dictionary + merge path as the catch-all stream. When
    # index_fields is a single column, a field query on that column is
    # served from the catch-all stream itself (identical by definition),
    # so don't list it here — listing a column twice doubles its index.
    field_index_fields: tuple[str, ...] = ()

    # ES search_as_you_type analog: when >= 2, the catch-all stream's
    # tokens are ALSO indexed as word n-gram (shingle) streams — 2 =
    # a "_2gram" stream of space-joined adjacent pairs, 3 = "_2gram" +
    # "_3gram" (ES builds ._2gram/._3gram subfields the same way).
    # Shingle streams ride the per-field machinery verbatim: their
    # terms key field_key("_2gram", "a b") in the SAME dictionary and
    # merge path, with their own dl@_2gram lengths and avgdl, so
    # search-as-you-type queries score them with correct per-stream
    # BM25 stats. Off by default (index size: one extra near-text-
    # sized stream per n).
    index_shingles: int = 0

    # Attribute columns stored per doc in the shard doc tables for
    # filtered search (the ES filter-context analog: filters restrict
    # results without changing BM25 stats). Strings filter by equality;
    # datetime columns additionally support range filters and the
    # query-scoped date_histogram aggregation. Absent columns skipped.
    attr_fields: tuple[str, ...] = ("role", "tool", "ts")

    # Tokenize-stage batch size (rows per map_batches call).
    batch_size: int = 4096

    # Materialize a docstore (docid, conv_id, turn_idx, text, ...) next
    # to the index — the ES `_source` analog; enables the per-turn
    # text-equality verification against the source Parquet.
    store_source: bool = True

    # Store a third posting stream of delta-varint token positions
    # (enables match_phrase). Positions are doc-internal, so the merge
    # splice is a plain byte concat in chunk order.
    store_positions: bool = True

    # Row-count threshold above which conversation-rank assignment runs
    # fully distributed (groupby partials → distributed validate →
    # distributed sort → range-file rank offsets → bucket-join stamping)
    # instead of the driver-side census + broadcast. The driver then
    # never holds the conversation table. Set to 0 to force the
    # distributed path (tests do).
    driver_conv_budget: int = 50_000_000

    def __post_init__(self) -> None:
        from excelastic_ray.analysis import ANALYZERS

        if self.analyzer not in ANALYZERS:
            raise ValueError(f"unknown analyzer {self.analyzer!r}")
        if self.codec not in ("varint", "blockpack", "pfor"):
            raise ValueError(f"unknown codec {self.codec!r}")
        if self.codec == "pfor" and self.block_size > 256:
            raise ValueError("pfor blocks are limited to 256 postings "
                             "(exception positions are u8)")
        if not (1 <= self.turn_bits <= 32):
            raise ValueError("turn_bits out of range")
        if not (0 <= self.convs_per_chunk_bits <= 32):
            raise ValueError("convs_per_chunk_bits out of range")
        if self.index_shingles not in (0, 2, 3):
            raise ValueError(
                "index_shingles must be 0 (off), 2 (bigrams) or 3 "
                "(bigrams + trigrams)"
            )

    @property
    def shingle_streams(self) -> tuple[str, ...]:
        """Names of the word-n-gram streams this config indexes."""
        if self.index_shingles < 2:
            return ()
        return tuple(
            f"_{n}gram" for n in range(2, self.index_shingles + 1)
        )

    @property
    def max_turns(self) -> int:
        return 1 << self.turn_bits

    def docid(self, conv_rank, turn_idx):
        """Vector/scalar docid from conv rank + turn index."""
        return (conv_rank << self.turn_bits) | turn_idx

    def chunk_of_rank(self, conv_rank):
        return conv_rank >> self.convs_per_chunk_bits

    def conv_rank_of(self, docid):
        return docid >> self.turn_bits

    def turn_idx_of(self, docid):
        return docid & (self.max_turns - 1)

    def shard_of_chunk(self, chunk):
        return chunk % self.num_shards

    def to_dict(self) -> dict:
        return {
            "k1": self.k1,
            "b": self.b,
            "codec": self.codec,
            "analyzer": self.analyzer,
            "turn_bits": self.turn_bits,
            "convs_per_chunk_bits": self.convs_per_chunk_bits,
            "num_shards": self.num_shards,
            "block_size": self.block_size,
            "index_fields": list(self.index_fields),
            "field_index_fields": list(self.field_index_fields),
            "attr_fields": list(self.attr_fields),
            "batch_size": self.batch_size,
            "store_source": self.store_source,
            "store_positions": self.store_positions,
            "driver_conv_budget": self.driver_conv_budget,
            "index_shingles": self.index_shingles,
        }

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        d = dict(d)
        d["index_fields"] = tuple(d.get("index_fields", ("text",)))
        d["field_index_fields"] = tuple(d.get("field_index_fields", ()))
        d["attr_fields"] = tuple(d.get("attr_fields", ("role", "tool", "ts")))
        d.setdefault("store_positions", False)  # pre-positions indexes
        d.setdefault("driver_conv_budget", 50_000_000)
        d.setdefault("analyzer", "standard")  # pre-analyzer indexes
        d.setdefault("index_shingles", 0)  # pre-shingle indexes
        return IndexConfig(**d)
