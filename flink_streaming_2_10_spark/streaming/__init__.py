"""Structured Streaming runners and programs (SURVEY.md §7.2 step 5)."""
