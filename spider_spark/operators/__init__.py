"""Large-scale training-data pipeline operators.

Beyond the reference's own surface, these are the operations a 100 TB
web-text corpus pipeline needs, each Spark-first:

- ``dedup``: exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``: brute-force cosine top-k; LSH-bucketed ANN scale path
- ``textqc``: language-ID, quality scoring, token counting, fingerprinting
- ``multimodal``: binary media columns + decode/feature plumbing (stubs)
"""
