"""Structured Streaming surface (beyond the reference, which is batch-only —
SURVEY §2.12): windowed/sessionized event aggregation over the events table.
"""
