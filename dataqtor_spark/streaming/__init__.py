"""Structured Streaming variants of the profiler and windowed aggregations."""
