"""Structured Streaming monitors (OP-53..57)."""
