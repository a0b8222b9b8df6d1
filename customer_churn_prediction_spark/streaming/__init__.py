"""Event-stream operators (SURVEY.md §2.9 north-star extension)."""
