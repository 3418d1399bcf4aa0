"""Embedding similarity search."""
