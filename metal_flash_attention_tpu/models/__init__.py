"""Model layer: Llama-3-style transformer built on the fused attention
kernels.  The reference ships no model layer (`SURVEY.md §0`); this is
the serving/benchmark vehicle for BASELINE configs 4-5."""
