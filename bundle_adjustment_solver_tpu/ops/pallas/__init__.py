"""Pallas TPU kernels (hot-path fused ops)."""
