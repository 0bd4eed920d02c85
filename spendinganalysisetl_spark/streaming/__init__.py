"""Structured Streaming jobs (SURVEY.md §2.9) — the streaming twins of
the batch event-time operators."""
