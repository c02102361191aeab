"""Operator suite: aggregations, windows, merge, apply, and the
LLM-data-pipeline extensions (dedup / similarity / text / multimodal)."""
