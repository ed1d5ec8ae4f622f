"""Pallas TPU kernels (with XLA fallbacks for CPU / interpret mode)."""
