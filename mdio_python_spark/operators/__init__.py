"""Operator library (SURVEY §2): grid, stats, index strategies, geometry,
plus the LLM-data-pipeline extensions (dedup, similarity, text, multimodal).
"""
