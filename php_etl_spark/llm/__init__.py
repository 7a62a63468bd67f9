"""Large-scale training-data pipeline operators (BASELINE.json north
star): deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force + LSH ANN), text
analysis (language id, quality, tokens, fingerprints) and multimodal
binary-column plumbing.

Everything stays in JVM expression land (higher-order array
functions, hash functions, relational self-joins) except the
multimodal decode stub, which demonstrates the Arrow-batched
mapInPandas path.
"""

from php_etl_spark.llm import text, dedup, similarity, multimodal  # noqa: F401
