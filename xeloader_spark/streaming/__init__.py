"""Structured Streaming parity for the ingest dataflow (SURVEY §7.1 M6)."""
