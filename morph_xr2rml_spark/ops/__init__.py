"""Large-scale training-data pipeline operators.

Beyond the reference's own operator inventory (SURVEY §2), these are the
data-processing operators a web-scale KG/training-data pipeline needs:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed + IVF ANN), text
analysis (language-ID, quality scoring, token counting, fingerprinting,
winnowing), deterministic hash-bucketed sampling/splitting, and
multimodal column plumbing.

Everything is built from native ``pyspark.sql.functions`` Column
expressions (whole-stage codegen) — no Python row loops; the only UDFs
are Arrow-batched pandas UDFs in the multimodal decode path.
"""
