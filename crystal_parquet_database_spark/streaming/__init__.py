"""Structured Streaming recipes over event tables."""
