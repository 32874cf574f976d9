"""Compute ops: Pallas kernels and golden reference models."""
