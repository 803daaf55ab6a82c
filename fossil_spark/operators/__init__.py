"""Distributed operators: time-series analytics (resample, as-of join,
sessionization, gap fill, …) and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing)."""
