"""Multimodal (binary-column) plumbing operators."""
