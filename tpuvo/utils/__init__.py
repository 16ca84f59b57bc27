"""Observability, checkpointing and profiling utilities."""
