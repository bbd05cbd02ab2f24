"""Deterministic synthetic data generation (seed-fixed, no wall-clock)."""
