"""Structured Streaming surface: windows, watermarks, stateful dedup."""
