"""Streaming ingestion: incremental-batch (reference Update semantics)
and Structured Streaming (file source → tier rollup) variants."""
