"""Streaming ingest layer (WAL / growing-segment analog)."""
