"""Readers and writers (SURVEY.md §2.1, S1-S14)."""
