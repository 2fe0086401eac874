"""Engine operators that go beyond single Spark primitives:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search, containment joins, MERGE emulation, text statistics,
multimodal plumbing.
"""
