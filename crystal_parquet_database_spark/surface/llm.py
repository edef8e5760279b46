"""LLM-data-pipeline query surface: dedup, similarity search, text analysis.

Populated incrementally; see operators/dedup.py, operators/similarity.py,
operators/text.py for the implementations.
"""

from __future__ import annotations
