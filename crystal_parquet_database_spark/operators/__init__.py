"""Engine operators: dedup, similarity search, text analysis, multimodal."""
