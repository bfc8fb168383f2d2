"""LLM-training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal plumbing —
first-class components alongside the reference-parity surface, designed
for 100 TB inputs (keyed shuffles only, no driver-side loops, candidate
generation before any pairwise work).
"""
