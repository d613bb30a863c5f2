"""Structured Streaming pipelines (ST1–ST5)."""
