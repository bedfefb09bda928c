"""Deterministic data generation + reference oracles for the CDC engine."""
