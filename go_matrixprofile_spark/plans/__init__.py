"""Checkpoint + lineage helpers for resumable staged pipelines."""
