"""Embedding similarity search (ANN) — north-star extension."""
