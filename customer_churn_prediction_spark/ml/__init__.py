"""ML feature pipeline, model factories, evaluation (SURVEY.md §2.8)."""
