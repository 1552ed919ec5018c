"""Composed operators the built-in DataFrame surface lacks as single
primitives: as-of joins, dedup families, similarity search, text
analysis, multimodal column handling."""
