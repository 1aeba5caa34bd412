"""Operator library: profiling, rules, repair, enrichment, similarity,
dedup, ANN, text analysis, multimodal plumbing."""
