"""Model layer: Llama-3-style and Gemma-2-style transformers built on
the fused attention kernels.  The reference ships no model layer
(`SURVEY.md §0`); these are the serving/benchmark vehicles for
BASELINE configs 4-5.  Gemma exercises the window + soft-capping
kernel paths (alternating local/global attention)."""
