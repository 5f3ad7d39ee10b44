"""Document-level dedup operators (exact / MinHash-LSH / SimHash / Jaccard)."""
