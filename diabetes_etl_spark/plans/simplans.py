"""Similarity-search query plans over the `embeddings` fixture (filled in
by operators/similarity.py — brute-force cosine top-k, LSH variant)."""
