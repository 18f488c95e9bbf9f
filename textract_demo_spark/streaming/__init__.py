"""Structured Streaming mode of the extraction engine (SURVEY.md §2.9)."""
