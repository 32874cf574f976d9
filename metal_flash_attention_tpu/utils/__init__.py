"""Shared utilities: shape/padding helpers, tolerances, test harness."""
