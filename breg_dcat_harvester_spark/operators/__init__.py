"""Dataflow operators (SURVEY.md §2) — extraction, validation, merge, facets,
search, linking, canonicalization, dedup, ANN, multimodal plumbing."""
