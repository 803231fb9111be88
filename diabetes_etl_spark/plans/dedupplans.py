"""Deduplication query plans over the `documents` fixture (filled in by
operators/dedup.py — exact, MinHash-LSH, SimHash, n-gram Jaccard)."""
