"""Checkpoint/resume, lineage and per-partition metrics."""
