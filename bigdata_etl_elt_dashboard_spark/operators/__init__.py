"""Operators: transforms, data quality, warehouse, and the large-scale
training-data extensions (dedup, similarity, text, multimodal)."""
