"""Operators: the reference's ingest dataflow (SURVEY §2.1) plus the
LLM-data-pipeline extension operators (dedup, similarity, text,
multimodal) required by BASELINE.json."""
