"""Structured Streaming surface (reference has none — SURVEY.md §2.12;
this is the incremental-ingest path reusing the exact batch rule
expressions)."""
