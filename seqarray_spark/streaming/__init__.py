"""Structured Streaming surface — an extension beyond the batch-only
reference (SURVEY.md §2.11)."""
