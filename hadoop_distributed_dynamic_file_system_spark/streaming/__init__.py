"""Structured Streaming surface (additive — the reference has no
continuous engine; SURVEY §2.9)."""
