"""Structured Streaming stages (sessionization, streaming extraction)."""
