"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's raster operators, a 100 TB corpus engine needs the
standard large-scale training-data ops: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding near-dup), similarity search, text
analysis (language-ID, quality, token stats, fingerprints) and multimodal
column plumbing. All are built Spark-first: JVM Column expressions where
possible, Arrow-vectorized pandas UDFs only for the dense-linear-algebra
kernels (embedding similarity).

Hash portability: every hash is derived from ``md5`` (present and identical
in Spark and ANSI-ish SQL engines), so each operator has an exact relational
oracle — the driver's DuckDB gate checks values, not just row counts.
"""

from . import ann, dedup, multimodal, text  # noqa: F401
