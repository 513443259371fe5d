"""Relational/temporal operators: as-of join, windows, dedup, similarity."""
