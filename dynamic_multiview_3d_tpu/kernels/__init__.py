"""Pallas TPU kernels (SURVEY.md T0)."""
