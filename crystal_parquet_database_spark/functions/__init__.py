"""Reusable column-level helpers."""
