"""Training-data pipeline operators over document / embedding tables.

The large-scale companion layer to the reference-derived operator set
(SURVEY.md §2): deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine), similarity search (brute-force and LSH-bucketed ANN), text
analysis (tokenize/quality/lang-id/fingerprint) and multimodal binary-column
plumbing. All ops are JVM-side Catalyst expressions except the explicitly
Arrow-batched multimodal kernels; every hash is the portable
``h32(s) = int(md5(s)[:8], 16)`` so DuckDB oracles reproduce results exactly.
"""

from stream_reader_mzxml_spark.pipeline import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
