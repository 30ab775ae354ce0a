"""Engine operators: graph materialization, dedup family, similarity
search, text analysis, multimodal column handling, as-of joins."""
