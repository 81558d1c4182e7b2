"""Deterministic synthetic data for tests and benchmarks (seed 42, no external data)."""
