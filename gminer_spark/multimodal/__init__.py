"""Opaque-binary multimodal column plumbing."""
