"""Large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside
the geo engine (see repo prompt / SURVEY.md §2)."""
