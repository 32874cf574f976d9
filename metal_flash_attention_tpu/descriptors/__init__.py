"""Descriptors & heuristics (reference L3): problem descriptors, precision
policy, and block-size parameter tables resolved per TPU generation."""
