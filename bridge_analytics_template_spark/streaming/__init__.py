"""Structured Streaming operators over the events stream (SURVEY.md §2.9)."""
