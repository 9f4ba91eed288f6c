"""Structured Streaming jobs: enrichment, windowed aggs, multi-sink."""
