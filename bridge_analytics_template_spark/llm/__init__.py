"""LLM-training-data pipeline operators: dedup, similarity search,
multimodal columns (SURVEY.md §2.11; north-star extension)."""
