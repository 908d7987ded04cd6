"""Structured Streaming: edge-delta ingestion (dynamic-graph analog)."""
