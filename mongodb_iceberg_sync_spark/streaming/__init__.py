"""Structured Streaming operators: windows, dedup, stateful, merge sink."""
