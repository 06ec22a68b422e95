"""Scalar function surface (SURVEY §2.9) + cross-engine determinism helpers."""
