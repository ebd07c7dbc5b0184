"""Pallas TPU kernels (fused window attention)."""
