"""Embedding similarity search operators (brute-force + LSH-bucketed ANN)."""
