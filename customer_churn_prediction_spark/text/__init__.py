"""Text analysis + deduplication operators (north-star extensions)."""
