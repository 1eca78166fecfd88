"""Structured Streaming jobs over the events table (north-star extension —
the reference is batch-only, SURVEY §2.11)."""
