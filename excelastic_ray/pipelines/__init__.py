"""Large-scale training-data pipeline operators over Ray Data.

Beyond the reference's own operator set (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs: dedup (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search,
text analysis (language id, quality scoring, token stats,
fingerprinting), windowed event aggregation, and multimodal binary
column plumbing. All stages are vectorized map_batches over Arrow
batches; wide steps pre-aggregate before any groupby.
"""
